"""Fused DiceCE kernels: value and gradient parity vs train/losses.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import medicalsemseg_tpu.ops.pallas.dice_ce as pdc
from medicalsemseg_tpu.train.losses import dice_ce_loss


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pdc, "_INTERPRET", True)


def _case(shape, n_classes, seed=0):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=shape + (n_classes,)) * 2.0,
                         jnp.float32)
    labels = jnp.asarray(rng.integers(0, n_classes, size=shape), jnp.int32)
    return logits, labels


@pytest.mark.parametrize("shape,c", [
    ((1, 4, 8, 8), 14),   # M = 256, exact tiling
    ((2, 4, 8, 8), 3),    # batch > 1
    ((1, 5, 6, 7), 14),   # M = 210: exercises the padding path
])
def test_loss_value_matches(shape, c):
    logits, labels = _case(shape, c)
    got = float(pdc.dice_ce_fused(logits, labels))
    want = float(dice_ce_loss(logits, labels))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape,c", [
    ((1, 4, 8, 8), 14),
    ((2, 4, 8, 8), 3),
    ((1, 5, 6, 7), 14),   # padding path in the backward too
])
def test_gradients_match(shape, c):
    logits, labels = _case(shape, c, seed=1)
    g_fused = jax.grad(lambda lg: pdc.dice_ce_fused(lg, labels))(logits)
    g_ref = jax.grad(lambda lg: dice_ce_loss(lg, labels))(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_lambda_weights_and_smooth():
    logits, labels = _case((1, 4, 8, 8), 5, seed=2)
    kw = dict(smooth_nr=1e-3, smooth_dr=1e-4, lambda_dice=0.7, lambda_ce=1.3)
    got = float(pdc.dice_ce_fused(logits, labels, True, *kw.values()))
    want = float(dice_ce_loss(logits, labels, squared_pred=True, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    g1 = jax.grad(lambda lg: pdc.dice_ce_fused(lg, labels, True,
                                               *kw.values()))(logits)
    g2 = jax.grad(lambda lg: dice_ce_loss(lg, labels, squared_pred=True,
                                          **kw))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-7)


def test_plain_pred_fallback():
    logits, labels = _case((1, 4, 8, 8), 5, seed=3)
    got = float(pdc.dice_ce_fused(logits, labels, False))
    want = float(dice_ce_loss(logits, labels, squared_pred=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    g1 = jax.grad(lambda lg: pdc.dice_ce_fused(lg, labels, False))(logits)
    g2 = jax.grad(lambda lg: dice_ce_loss(lg, labels,
                                          squared_pred=False))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-7)


def test_bf16_logits_cast():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 5)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 5, size=(1, 4, 8, 8)), jnp.int32)
    got = float(pdc.dice_ce_fused(logits, labels))
    want = float(dice_ce_loss(logits.astype(jnp.float32), labels))
    np.testing.assert_allclose(got, want, rtol=1e-2)
    g = jax.grad(lambda lg: pdc.dice_ce_fused(lg, labels))(logits)
    assert g.dtype == jnp.bfloat16
