"""Metric and LR-schedule tests."""

import jax.numpy as jnp
import numpy as np

from medicalsemseg_tpu.train.metrics import dice_per_class, hausdorff95, mean_dice
from medicalsemseg_tpu.train.schedule import warmup_cosine_lr
from medicalsemseg_tpu.infer.ensemble import majority_vote_np


def test_dice_perfect_and_absent():
    labels = np.zeros((1, 4, 4, 4), np.int32)
    labels[0, :2] = 1  # class 2 absent
    pred = labels.copy()
    dice, not_nan = dice_per_class(jnp.asarray(pred), jnp.asarray(labels), 3)
    np.testing.assert_allclose(np.asarray(dice[0, :2]), [1.0, 1.0])
    assert float(not_nan[0, 2]) == 0.0  # absent class flagged


def test_dice_analytic_half_overlap():
    labels = np.zeros((1, 1, 1, 4), np.int32)
    labels[..., :2] = 1
    pred = np.zeros_like(labels)
    pred[..., 1:3] = 1
    dice, not_nan = dice_per_class(jnp.asarray(pred), jnp.asarray(labels), 2)
    # class1: I=1, |P|=2, |G|=2 -> 0.5
    np.testing.assert_allclose(float(dice[0, 1]), 0.5)


def test_mean_dice_ignores_empty_classes():
    dice = jnp.asarray([[1.0, 0.0, 0.0]])
    not_nan = jnp.asarray([[1.0, 1.0, 0.0]])
    assert float(mean_dice(dice, not_nan)) == 0.5  # mean of (1.0, 0.0)


def test_hausdorff95_identical_is_zero():
    x = np.zeros((8, 8, 8), np.int32)
    x[2:6, 2:6, 2:6] = 1
    hd = hausdorff95(x, x, 2)
    np.testing.assert_allclose(hd, [0.0])


def test_hausdorff95_shifted_cube():
    a = np.zeros((12, 12, 12), np.int32)
    b = np.zeros((12, 12, 12), np.int32)
    a[2:6, 2:6, 2:6] = 1
    b[4:8, 2:6, 2:6] = 1  # shifted by 2 along axis 0
    hd = hausdorff95(a, b, 2)
    assert 1.0 <= hd[0] <= 3.0


def test_hausdorff95_bbox_crop_matches_bruteforce():
    """The bbox-cropped EDT (the 9x host speedup) is exactly the full-volume
    nearest-surface distance: check against a brute-force O(n^2) pairwise
    computation on random multi-class blobs that sit far from each other
    (distances exceed each class's own extent, exercising the union box)."""
    rng = np.random.default_rng(42)
    a = np.zeros((24, 20, 28), np.int32)
    b = np.zeros((24, 20, 28), np.int32)
    for lab, arr in ((1, a), (1, b), (2, a), (2, b)):
        z, y, x = rng.integers(2, 14), rng.integers(2, 12), rng.integers(2, 18)
        arr[z:z + rng.integers(3, 8), y:y + rng.integers(3, 7),
            x:x + rng.integers(3, 9)] = lab
    hd = hausdorff95(a, b, 3)

    from scipy.ndimage import binary_erosion

    def surf(m):
        return np.argwhere(m & ~binary_erosion(m, border_value=0))

    for ci, c in enumerate((1, 2)):
        ps, ts = surf(a == c), surf(b == c)
        d = np.sqrt(((ps[:, None, :] - ts[None, :, :]) ** 2).sum(-1))
        want = max(np.percentile(d.min(1), 95), np.percentile(d.min(0), 95))
        np.testing.assert_allclose(hd[ci], want, rtol=1e-12)


def test_hausdorff95_device_path_bit_identical():
    """The accelerator pairwise-NN path (--device_hd95) must equal the host
    EDT path bit-for-bit: voxel coords < 2^10 keep every fp32 intermediate
    an exact integer, and the final sqrt runs in fp64 on the host."""
    rng = np.random.default_rng(7)
    a = np.zeros((40, 36, 30), np.int32)
    b = np.zeros((40, 36, 30), np.int32)
    for lab in (1, 2):
        for arr in (a, b):
            z, y, x = (rng.integers(2, 24), rng.integers(2, 20),
                       rng.integers(2, 16))
            arr[z:z + rng.integers(4, 10), y:y + rng.integers(4, 9),
                x:x + rng.integers(4, 8)] = lab
    host = hausdorff95(a, b, 3)
    dev = hausdorff95(a, b, 3, device=True)
    np.testing.assert_array_equal(host, dev)
    # absent-class semantics preserved on the device path too
    c = np.zeros_like(a)
    np.testing.assert_array_equal(hausdorff95(a, c, 3, device=True),
                                  [np.inf, np.inf])


def test_warmup_cosine_schedule_endpoints():
    base, warm, total = 4e-4, 40, 200
    # epoch 0 -> warmup_start (0)
    assert float(warmup_cosine_lr(0, base, warm, total)) == 0.0
    # reaches base one epoch before warmup end (reference chainable form)
    np.testing.assert_allclose(float(warmup_cosine_lr(warm - 1, base, warm, total)),
                               base, rtol=1e-6)
    np.testing.assert_allclose(float(warmup_cosine_lr(warm, base, warm, total)),
                               base, rtol=1e-6)
    # cosine midpoint
    mid = warm + (total - warm) // 2
    np.testing.assert_allclose(float(warmup_cosine_lr(mid, base, warm, total)),
                               base / 2, rtol=1e-5)
    # end -> ~0
    assert float(warmup_cosine_lr(total, base, warm, total)) < 1e-9


def test_majority_vote_background_tiebreak():
    # two folds disagree fg vs bg -> background wins the 1-1 tie (+1 tiebreak)
    folds = np.zeros((2, 2, 2, 2), np.int64)
    folds[0, 0, 0, 0] = 1
    out = majority_vote_np(folds, 3)
    assert out[0, 0, 0] == 0
    # two fg votes beat one other-fg vote and the bg tiebreak
    folds3 = np.zeros((3, 1, 1, 1), np.int64)
    folds3[0] = folds3[1] = 2
    folds3[2] = 1
    out3 = majority_vote_np(folds3, 3)
    assert out3[0, 0, 0] == 2


def test_majority_vote_matches_reference_algorithm():
    rng = np.random.default_rng(0)
    folds = rng.integers(0, 4, (5, 6, 6, 6))
    got = majority_vote_np(folds, 4)
    # reference algorithm (majority_vote.py:23-37)
    votes = np.zeros((4, 6, 6, 6), np.int64)
    for c in range(1, 4):
        votes[c] = (folds == c).sum(0)
    votes[0] = (folds == 0).sum(0) + 1
    expect = votes.argmax(0)
    np.testing.assert_array_equal(got, expect)
