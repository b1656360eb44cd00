"""Loss-function tests: analytic golden values on tiny tensors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.train.losses import (
    build_loss,
    cross_entropy_loss,
    dice_ce_loss,
    dice_loss,
    focal_loss,
    tversky_loss,
)


def perfect_logits(labels, n_classes, confidence=100.0):
    return confidence * jax.nn.one_hot(labels, n_classes)


def test_dice_loss_perfect_prediction_near_zero():
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 3, (2, 4, 4, 4)))
    logits = perfect_logits(labels, 3)
    assert float(dice_loss(logits, labels)) < 1e-3


def test_dice_loss_analytic_value():
    # 1 voxel volume, 2 classes, uniform probs (0.5 each), label 0
    logits = jnp.zeros((1, 1, 1, 1, 2))
    labels = jnp.zeros((1, 1, 1, 1), jnp.int32)
    # per class: p=0.5; class0: I=0.5, denom=0.25+1; class1: I=0, denom=0.25+0
    s = 1e-5
    d0 = 1 - (2 * 0.5 + s) / (1.25 + s)
    d1 = 1 - (0 + s) / (0.25 + s)
    expect = (d0 + d1) / 2
    np.testing.assert_allclose(float(dice_loss(logits, labels)), expect, rtol=1e-5)


def test_cross_entropy_matches_log_softmax():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 2, 2, 2, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (2, 2, 2, 2)))
    got = float(cross_entropy_loss(logits, labels))
    lp = jax.nn.log_softmax(logits, -1)
    expect = float(-jnp.take_along_axis(lp, labels[..., None], -1).mean())
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_tversky_equals_dice_family_at_half():
    """With alpha=beta=0.5, Tversky score == soft Dice (non-squared)."""
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(1, 3, 3, 3, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (1, 3, 3, 3)))
    tv = float(tversky_loss(logits, labels, 0.5, 0.5))
    di = float(dice_loss(logits, labels, squared_pred=False))
    # tversky: (tp+s)/(tp+0.5fp+0.5fn+s); dice: (2I+s)/(sum_p+sum_g+s)
    # tp+0.5(fp+fn) = 0.5(sum_p+sum_g) => identical up to smooth-term scaling
    np.testing.assert_allclose(tv, di, atol=1e-4)


def test_focal_reduces_to_ce_at_gamma0():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(1, 2, 2, 2, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (1, 2, 2, 2)))
    fl = float(focal_loss(logits, labels, gamma=0.0))
    # focal(gamma=0) = mean over cells of -onehot*logp = CE / n_classes... no:
    # sum over class axis picks the true class => equals CE mean over voxels
    ce = float(cross_entropy_loss(logits, labels))
    np.testing.assert_allclose(fl, ce, rtol=1e-6)


def test_build_loss_dispatch():
    cfg = Config()
    fn = build_loss(cfg)
    labels = jnp.zeros((1, 2, 2, 2), jnp.int32)
    logits = perfect_logits(labels, cfg.output_dim)
    assert float(fn(logits, labels)) < 1e-3
    with pytest.raises(ValueError):
        build_loss(cfg.replace(loss_fn="nope"))


def test_losses_differentiable_and_finite():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (1, 4, 4, 4)))
    for fn in (dice_loss, cross_entropy_loss, dice_ce_loss, tversky_loss,
               focal_loss):
        g = jax.grad(lambda lg: fn(lg, labels))(logits)
        assert bool(jnp.isfinite(g).all()), fn.__name__


@pytest.mark.parametrize("fn", [
    lambda lg, lb, m: dice_loss(lg, lb, mask=m),
    lambda lg, lb, m: cross_entropy_loss(lg, lb, mask=m),
    lambda lg, lb, m: dice_ce_loss(lg, lb, mask=m),
    lambda lg, lb, m: tversky_loss(lg, lb, alpha=0.3, beta=0.7, mask=m),
    lambda lg, lb, m: focal_loss(lg, lb, mask=m),
])
def test_masked_loss_equals_sliced(fn):
    """Masked loss over a padded grid == unmasked loss over the valid slice
    (the validation bucket-padding contract, VERDICT r2 #9)."""
    rng = np.random.default_rng(0)
    full = (1, 8, 10, 6)
    orig = (5, 7, 6)
    logits = jnp.asarray(rng.normal(size=(*full, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, size=full).astype(np.int32))
    di, hi, wi = np.indices(full[1:])
    mask = jnp.asarray(((di < orig[0]) & (hi < orig[1]) & (wi < orig[2]))
                       .astype(np.float32))[None]

    want = fn(logits[:, :orig[0], :orig[1], :orig[2]],
              labels[:, :orig[0], :orig[1], :orig[2]], None)
    got = fn(logits, labels, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_val_metrics_one_compile_per_bucket():
    """make_val_metrics must compile ONCE per padded bucket shape: different
    native extents within a bucket reuse the program (orig is a dynamic
    operand), and the masked results equal the sliced-path results."""
    from medicalsemseg_tpu.train.loop import make_val_metrics
    from medicalsemseg_tpu.train.metrics import dice_per_class

    cfg = Config(loss_fn="DiceCE", output_dim=3)
    loss_fn = build_loss(cfg)
    vm = make_val_metrics(loss_fn, 3)

    rng = np.random.default_rng(1)
    bucket = (1, 8, 8, 8)
    logits = jnp.asarray(rng.normal(size=(*bucket, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=bucket).astype(np.int32))

    for orig in [(8, 8, 8), (5, 6, 7), (8, 3, 8)]:
        loss, dice, not_nan = vm(logits, labels,
                                 jnp.asarray(orig, jnp.int32))
        sl = (slice(None), slice(0, orig[0]), slice(0, orig[1]),
              slice(0, orig[2]))
        want_loss = loss_fn(logits[sl], labels[sl])
        pred = jnp.argmax(logits[sl], axis=-1)
        want_dice, want_nn = dice_per_class(pred, labels[sl], 3)
        np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dice), np.asarray(want_dice[0]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(not_nan),
                                      np.asarray(want_nn[0]))
    assert vm._cache_size() == 1  # all three origs share one program

    vm(jnp.zeros((1, 8, 8, 16, 3)), jnp.zeros((1, 8, 8, 16), jnp.int32),
       jnp.asarray((8, 8, 16), jnp.int32))
    assert vm._cache_size() == 2  # a new bucket shape compiles once more
