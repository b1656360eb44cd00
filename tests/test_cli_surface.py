"""CLI argument-surface smoke tests: all four entry points parse --help and
the reference's flag names are accepted."""

import subprocess
import sys

import pytest


@pytest.mark.parametrize("module", [
    "medicalsemseg_tpu.cli.run_training",
    "medicalsemseg_tpu.cli.run_test",
    "medicalsemseg_tpu.cli.run_evaluation",
    "medicalsemseg_tpu.cli.majority_vote",
])
def test_help_exits_zero(module):
    out = subprocess.run([sys.executable, "-m", module, "--help"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-500:]


def test_reference_flag_names_accepted():
    """A realistic reference-style launch line parses into a Config."""
    from medicalsemseg_tpu.config import get_args

    cfg = get_args([
        "--model", "nnFormerUNETR", "--task", "Task03_Liver",
        "--vol_size", "96", "--patch_size", "2", "--window_size", "6",
        "--depths", "2", "2", "2", "2", "--num_heads", "3", "6", "12", "24",
        "--qkv_bias", "--t_fixed_ct_intensity", "--t_rand_crop_fgbg",
        "--t_n_patches_per_image", "2", "--t_flip_prob", "0.2",
        "--n_images_per_batch", "8", "--loss_fn", "DiceCE",
        "--lr", "4e-4", "--warmup_epochs", "40", "--epochs", "200",
        "--val_interval", "20", "--cv_fold", "0", "--cv_max_folds", "5",
        "--val_infer_overlap", "0.5", "--seed", "13",
        "--no_neptune_logging", "--no_cache_dataset", "--no_pin_memory",
        "--output_dir", "/tmp/x", "--log_dir", "/tmp/y",
    ])
    assert cfg.model == "nnFormerUNETR"
    assert cfg.depths == (2, 2, 2, 2)
    assert cfg.qkv_bias and cfg.t_rand_crop_fgbg
    assert not cfg.neptune_logging and not cfg.cache_dataset and not cfg.pin_mem
