"""Pallas im2col conv3d kernel: forward + custom-VJP parity vs the XLA conv.

The kernel is an experimental negative result (copies-bound, see the module
docstring) and is not wired into any model, but its correctness is pinned so
future layout work can iterate against a green baseline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import medicalsemseg_tpu.ops.pallas.conv3d as pc


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pc, "_INTERPRET", True)


def _rand(shape, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


@pytest.mark.parametrize("shape,co", [
    ((1, 4, 8, 8, 8), 8),     # minimal aligned case
    ((2, 3, 16, 8, 16), 24),  # B>1, Co != C, anisotropic
])
def test_forward_matches_xla(shape, co):
    x = _rand(shape, seed=1)
    w = _rand((3, 3, 3, shape[-1], co), scale=0.2, seed=2)
    assert pc.supported(x.shape, (3, 3, 3), (1, 1, 1), shape[-1])
    got = np.asarray(pc.conv3x3x3(x, w))
    ref = np.asarray(pc.conv3x3x3_reference(x, w))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_vjp_matches_xla_grads():
    x = _rand((1, 4, 8, 8, 8), seed=3)
    w = _rand((3, 3, 3, 8, 8), scale=0.2, seed=4)
    cot = _rand((1, 4, 8, 8, 8), seed=5)

    def loss(fn, x, w):
        return (fn(x, w) * cot).sum()

    gx, gw = jax.grad(lambda a, b: loss(pc.conv3x3x3, a, b), (0, 1))(x, w)
    rx, rw = jax.grad(lambda a, b: loss(pc.conv3x3x3_reference, a, b),
                      (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


def test_supported_gates():
    ok = pc.supported((1, 4, 8, 8, 8), (3, 3, 3), (1, 1, 1), 8)
    assert ok
    assert not pc.supported((1, 4, 8, 8, 8), (1, 1, 1), (1, 1, 1), 8)  # kernel
    assert not pc.supported((1, 4, 8, 8, 8), (3, 3, 3), (2, 2, 2), 8)  # stride
    assert not pc.supported((1, 4, 8, 8, 6), (3, 3, 3), (1, 1, 1), 6)  # C%8
    assert not pc.supported((1, 4, 8, 9, 8), (3, 3, 3), (1, 1, 1), 8)  # W%8
    assert not pc.supported((1, 4, 4, 8, 8), (3, 3, 3), (1, 1, 1), 8)  # H<8
