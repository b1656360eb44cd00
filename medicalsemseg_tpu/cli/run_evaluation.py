"""Labeled evaluation driver (reference: run_evaluation.py:23-95 +
engine/test.py:15-94 eval_model).

Loads a checkpoint, sliding-window inference over the labeled validation
datalist, per-class Dice + 95th-percentile Hausdorff, optional NIfTI dumps of
pred/img/gt.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config, get_args
from medicalsemseg_tpu.data import nifti
from medicalsemseg_tpu.data.datalist import load_decathlon_datalist
from medicalsemseg_tpu.data.dataset import CachedVolumeDataset, EvalLoader
from medicalsemseg_tpu.models import build_model
from medicalsemseg_tpu.train.metrics import dice_per_class, hausdorff95
from medicalsemseg_tpu.train.state import create_train_state
from medicalsemseg_tpu.utils import checkpoint as ckpt
from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache


def eval_model(state, model, loader, cfg: Config, mesh=None):
    """With a multi-device ``mesh``, same-shaped volumes run one-per-chip
    (volume-level DP; reference partitions eval across ranks,
    data/dataset_builder.py:460-464) — per-volume logits are bit-identical
    to the single-device path."""
    n_cls = cfg.output_dim
    air_cval = ((0.0 - cfg.t_norm_mean) / cfg.t_norm_std
                if cfg.t_normalize else 0.0)

    from medicalsemseg_tpu.infer.sliding_window import (
        grouped_padded_volumes,
        jitted_sliding_window,
        jitted_sliding_window_sharded,
    )

    n_group = int(mesh.shape["data"]) if mesh is not None else 1
    sw_run = (jitted_sliding_window_sharded(model, mesh) if n_group > 1
              else jitted_sliding_window(model))
    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    if n_group > 1:  # replicate weights across the inference mesh
        from jax.sharding import NamedSharding, PartitionSpec

        variables = jax.device_put(
            variables, NamedSharding(mesh, PartitionSpec()))

    from medicalsemseg_tpu.train.loop import valid_extent_mask

    @jax.jit
    def pred_and_dice(logits, labels, orig):
        # bucket-padded shapes + dynamic valid-extent mask: one compiled
        # program per bucket, not one per native volume shape
        mask = valid_extent_mask(logits.shape[:-1], orig)
        pred = jnp.argmax(logits, axis=-1)
        dice, nn = dice_per_class(pred, labels, n_cls, mask=mask)
        return pred[0].astype(jnp.uint8), dice[0], nn[0]

    all_dice, all_nn, all_hd = [], [], []
    i = 0

    def one_volume(logits, sample, orig):
        nonlocal i
        gt = sample.label[..., 0].astype(np.int32)
        pads = [(0, logits.shape[1 + k] - gt.shape[k]) for k in range(3)]
        pred_dev, dice_dev, nn_dev = pred_and_dice(
            logits, jnp.asarray(np.pad(gt, pads))[None],
            jnp.asarray(orig, jnp.int32))
        pred = np.asarray(pred_dev)[:orig[0], :orig[1], :orig[2]]
        dice = np.asarray(dice_dev)
        nn = np.asarray(nn_dev)
        hd = hausdorff95(pred, gt, n_cls, include_background=False,
                         device=getattr(cfg, "device_hd95", False))
        all_dice.append(dice)
        all_nn.append(nn)
        all_hd.append(hd)
        finite_hd = hd[np.isfinite(hd)]
        print(f"[{i}] {os.path.basename(sample.name)}: "
              f"mDice {dice[nn > 0].mean():.4f} "
              f"HD95 {finite_hd.mean() if len(finite_hd) else float('nan'):.2f}")
        i += 1

        if cfg.save_eval_output and cfg.output_dir:
            out_dir = os.path.join(cfg.output_dir, "eval_output",
                                   f"Fold{cfg.cv_fold}")
            name = os.path.basename(sample.name)
            for sub, arr in (("pred", pred), ("img", sample.image[..., 0]),
                             ("gt", gt.astype(np.uint8))):
                d = os.path.join(out_dir, sub)
                os.makedirs(d, exist_ok=True)
                nifti.save(nifti.NiftiImage(arr, sample.affine),
                           os.path.join(d, name))

    for vols, affs, samples, origs in grouped_padded_volumes(
            loader, n_group, cfg.sw_bucket_multiple, air_cval,
            policy=getattr(cfg, "val_group_policy", "bucket")):
        logits_all = sw_run(variables, jnp.asarray(vols), jnp.asarray(affs),
                            roi=cfg.vol_size3(), sw_batch=cfg.batch_size_val,
                            overlap=cfg.val_infer_overlap, mode="gaussian",
                            cval=air_cval, tta=cfg.tta_mirror,
                            n_classes=n_cls)
        for k, (sample, orig) in enumerate(zip(samples, origs)):
            one_volume(logits_all[k:k + 1], sample, orig)

    dice_all = np.stack(all_dice)
    nn_all = np.stack(all_nn)
    class_dice = np.where(nn_all.sum(0) > 0,
                          dice_all.sum(0) / np.maximum(nn_all.sum(0), 1),
                          np.nan)
    hd = np.stack(all_hd)
    with np.errstate(invalid="ignore"):
        class_hd = np.nanmean(np.where(np.isfinite(hd), hd, np.nan), axis=0)
    print("Per-class Dice:", np.round(class_dice, 4).tolist())
    print("Per-class HD95:", np.round(class_hd, 2).tolist())
    print(f"Overall mDice: {np.nanmean(class_dice):.4f}  "
          f"mHD95: {np.nanmean(class_hd):.2f}")
    return {"mDice": float(np.nanmean(class_dice)),
            "mHD95": float(np.nanmean(class_hd))}


def main(cfg: Config):
    enable_compilation_cache()
    data_json = os.path.join(cfg.data_path, cfg.task, cfg.json_list)
    files = load_decathlon_datalist(data_json, "validation")
    ds = CachedVolumeDataset(files, cfg, cache_rate=0.0, mode="val")
    loader = EvalLoader(ds)

    model = build_model(cfg)
    v = cfg.vol_size3()
    x_probe = (jnp.zeros((1, *v, cfg.in_chans)), jnp.zeros((1, 3)),
               jnp.ones((1, 3)))
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed),
                                  x_probe, 1)
    if cfg.resume:
        state = ckpt.load_params_only(cfg.resume, state)
        print(f"Loaded checkpoint {cfg.resume}")

    from medicalsemseg_tpu.parallel.mesh import create_mesh

    local = jax.local_devices()
    mesh = create_mesh((len(local),), devices=local) if len(local) > 1 else None
    if mesh is not None:
        print(f"volume-parallel evaluation over {len(local)} devices")
    t0 = time.time()
    eval_model(state, model, loader, cfg, mesh=mesh)
    print(f"Evaluation took {time.time() - t0:.1f}s for {len(ds)} volumes")


if __name__ == "__main__":
    args = get_args()
    if args.output_dir:
        Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)
