"""One-pass Pallas dW kernel (ops/pallas/dw27.py) vs the XLA tap oracle.

The oracle is ops/convgrad._dw27_single — itself gradient-verified against
jax.vjp of lax.conv_general_dilated in tests/test_convgrad.py — so agreement
here closes the chain dw27_pallas == taps == autodiff dW.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.ops import convgrad
from medicalsemseg_tpu.ops.pallas import dw27


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(dw27, "_FORCE_INTERPRET", True)


@pytest.mark.parametrize("shape,cin,cout", [
    ((1, 8, 8, 16, 16), 16, 16),    # single grid row
    ((2, 6, 12, 8, 24), 24, 16),    # batch > 1, h-chunking divisors
    ((1, 5, 4, 8, 48), 48, 32),     # odd depth
])
def test_dw27_matches_tap_oracle(shape, cin, cout):
    b, d, h, w, _ = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, d, h, w, cin)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(b, d, h, w, cout)).astype(np.float32))

    got = jax.jit(dw27.dw27_pallas, static_argnames="interpret")(x, dy)
    want = jax.jit(convgrad._dw27_single)(x, dy)

    assert got.shape == (3, 3, 3, cin, cout)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


def test_dw27_bf16_inputs_accumulate_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 16))).astype(jnp.bfloat16)
    dy = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 16))).astype(jnp.bfloat16)
    got = dw27.dw27_pallas(x, dy)
    want = convgrad._dw27_single(x, dy)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-2, atol=1e-2)


def test_dw27_hc_chunking_covers_vmem_bound_shapes(monkeypatch):
    # shrink the budget so a small test shape exercises the h-chunk path
    monkeypatch.setattr(dw27, "_X_VMEM_BUDGET", 3 * 3 * 6 * 8 * 16 * 4)
    assert dw27._pick_hc(12, 8, 16, 4) < 12
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 12, 8, 16)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(1, 4, 12, 8, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(dw27.dw27_pallas(x, dy)),
                               np.asarray(convgrad._dw27_single(x, dy)),
                               rtol=2e-5, atol=2e-4)


def test_conv3x3x3_grad_routes_through_kernel_when_gated(monkeypatch):
    monkeypatch.setattr(convgrad, "_DW27_PALLAS", True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)).astype(np.float32))
    assert convgrad._dw27_pallas_eligible(x)  # the gated path IS exercised
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)).astype(np.float32))

    def loss(w_, gate):
        monkeypatch.setattr(convgrad, "_DW27_PALLAS", gate)
        return (convgrad.conv3x3x3_s1(x, w_) * dy).sum()

    gk = jax.grad(lambda w_: loss(w_, True))(w)
    gx = jax.grad(lambda w_: loss(w_, False))(w)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=2e-5, atol=2e-4)


def test_dw27_applicability_gate():
    assert dw27.dw27_applicable((8, 8, 16), 48)
    assert not dw27.dw27_applicable((8, 8, 6), 48)    # w not sublane-aligned
    assert not dw27.dw27_applicable((8, 8, 16), 1)    # degenerate channels
