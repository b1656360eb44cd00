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
