"""End-to-end CLI tests on a synthetic Decathlon dataset (tiny shapes).

Covers the reference's four entry points: train -> checkpoint -> evaluate ->
test-predict -> majority-vote (reference: run_training.py, run_evaluation.py,
run_test.py, majority_vote.py).
"""

import glob
import json
import os

import numpy as np
import pytest

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.data import nifti

from tests.test_nifti_data import _write_decathlon


def _tiny_cfg(root, task, out_dir, log_dir):
    return Config(
        model="nnFormerUNETR", vol_size=16, patch_size=2, hidden_dim=12,
        depths=(1, 1), num_heads=(2, 2), window_size=2,
        output_dim=3, compute_dtype="float32",
        data_path=root, task=task, json_list="dataset.json",
        t_fixed_ct_intensity=True, t_ct_min=-50, t_ct_max=150,
        t_rand_crop_fgbg=True, t_n_patches_per_image=2, t_flip_prob=0.2,
        n_images_per_batch=2, epochs=2, warmup_epochs=0, val_interval=2,
        save_ckpt_freq=2, cv_fold=0, cv_max_folds=3, sw_batch_size=2,
        batch_size_val=2, val_infer_overlap=0.25,
        output_dir=out_dir, log_dir=log_dir, save_eval_output=True,
        t_voxel_spacings=False, lr=1e-3,
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    root, task = _write_decathlon(tmp, n=6, shape=(18, 20, 22))
    out_dir = str(tmp / "out")
    log_dir = str(tmp / "logs")
    os.makedirs(out_dir, exist_ok=True)
    cfg = _tiny_cfg(root, task, out_dir, log_dir)

    from medicalsemseg_tpu.cli.run_training import main as train_main

    result = train_main(cfg)
    return cfg, result, root, task, out_dir, tmp


def test_training_produces_checkpoints_and_logs(trained):
    cfg, result, root, task, out_dir, tmp = trained
    assert os.path.isdir(os.path.join(out_dir, "best_model"))
    assert os.path.isdir(os.path.join(out_dir, "checkpoint-1"))
    log = open(os.path.join(out_dir, "log.txt")).read().strip().splitlines()
    assert len(log) == 2  # one json line per epoch
    rec = json.loads(log[-1])
    assert "train/loss" in rec and "val/mDice" in rec
    assert np.isfinite(rec["train/loss"])
    # CV split persisted (reference: misc.save_decathlon_datalist)
    assert os.path.exists(os.path.join(cfg.log_dir, "dataset_cv_split.json"))
    # scalars written
    assert os.path.exists(os.path.join(cfg.log_dir, "scalars.jsonl"))


def test_resume_from_checkpoint(trained):
    cfg, result, root, task, out_dir, tmp = trained
    from medicalsemseg_tpu.cli.run_training import main as train_main

    cfg2 = cfg.replace(resume=os.path.join(out_dir, "checkpoint-1"),
                       epochs=3, output_dir=str(tmp / "out2"))
    os.makedirs(cfg2.output_dir, exist_ok=True)
    r2 = train_main(cfg2)  # resumes at epoch 2, runs 1 more epoch
    log = open(os.path.join(cfg2.output_dir, "log.txt")).read().strip().splitlines()
    assert len(log) == 1
    assert json.loads(log[0])["epoch"] == 2


def test_evaluation_runs(trained):
    cfg, result, root, task, out_dir, tmp = trained
    from medicalsemseg_tpu.cli.run_evaluation import main as eval_main

    # pre-split json with a validation key for the eval driver
    jpath = os.path.join(root, task, "dataset.json")
    spec = json.load(open(jpath))
    if "validation" not in spec:
        spec["validation"] = spec["training"][:2]
        json.dump(spec, open(jpath, "w"))
    cfg_e = cfg.replace(resume=os.path.join(out_dir, "best_model"),
                        output_dir=str(tmp / "eval_out"))
    eval_main(cfg_e)
    preds = glob.glob(os.path.join(cfg_e.output_dir, "eval_output", "Fold0",
                                   "pred", "*"))
    assert len(preds) == 2
    img = nifti.load(preds[0])
    assert img.data.shape == (18, 20, 22)


def test_test_prediction_and_majority_vote(trained):
    cfg, result, root, task, out_dir, tmp = trained
    from medicalsemseg_tpu.cli.run_test import main as test_main
    from medicalsemseg_tpu.cli.majority_vote import get_args as mv_args
    from medicalsemseg_tpu.cli.majority_vote import main as mv_main

    vote_root = str(tmp / "test_out")
    # simulate 2 folds by running test twice with different fold ids
    for fold in (0, 1):
        cfg_t = cfg.replace(resume=os.path.join(out_dir, "best_model"),
                            output_dir=vote_root, cv_fold=fold)
        test_main(cfg_t)
        preds = glob.glob(os.path.join(vote_root, "test_output",
                                       f"Fold{fold}", "pred", "*"))
        assert len(preds) == 2, f"fold {fold}"

    args = mv_args(["--in_folder", os.path.join(vote_root, "test_output"),
                    "--n_classes", "3", "--folds", "2"])
    mv_main(args)
    voted = glob.glob(os.path.join(vote_root, "test_output", "majority_vote", "*"))
    assert len(voted) == 2
    v = nifti.load(voted[0])
    assert v.data.dtype == np.uint8
    assert v.data.shape == (18, 20, 22)
    assert set(np.unique(v.data)).issubset({0, 1, 2})


def test_training_with_device_pipeline(trained):
    """One epoch through the HBM-resident data path produces finite loss."""
    cfg, result, root, task, out_dir, tmp = trained
    from medicalsemseg_tpu.cli.run_training import main as train_main

    cfg_d = cfg.replace(device_data_pipeline=True, epochs=1, val_interval=1,
                        output_dir=str(tmp / "out_dev"), resume="")
    os.makedirs(cfg_d.output_dir, exist_ok=True)
    train_main(cfg_d)
    log = open(os.path.join(cfg_d.output_dir, "log.txt")).read().splitlines()
    rec = json.loads(log[0])
    assert np.isfinite(rec["train/loss"])


def test_evaluation_with_mirror_tta(trained):
    """8-way flip TTA through the eval driver."""
    cfg, result, root, task, out_dir, tmp = trained
    from medicalsemseg_tpu.cli.run_evaluation import main as eval_main

    cfg_t = cfg.replace(resume=os.path.join(out_dir, "best_model"),
                        output_dir=str(tmp / "eval_tta"), tta_mirror=True,
                        save_eval_output=False)
    eval_main(cfg_t)  # completes without error; metrics are finite
