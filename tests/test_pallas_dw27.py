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
    monkeypatch.setenv("MEDSEG_DW27_PALLAS", "1")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)).astype(np.float32))
    assert convgrad._dw27_pallas_eligible(x)  # the gated path IS exercised
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)).astype(np.float32))

    def loss(w_, gate):
        monkeypatch.setenv("MEDSEG_DW27_PALLAS", gate)
        return (convgrad.conv3x3x3_s1(x, w_) * dy).sum()

    gk = jax.grad(lambda w_: loss(w_, "1"))(w)
    gx = jax.grad(lambda w_: loss(w_, "0"))(w)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=2e-5, atol=2e-4)


def test_dw27_env_gate_is_dynamic(monkeypatch):
    """bench.py's fallback ladder flips MEDSEG_DW27_PALLAS mid-process; the
    eligibility gate must observe the CURRENT value, not an import-time
    snapshot (round-3's module-level read made that rung a silent no-op)."""
    x = jnp.ones((2, 4, 8, 8, 16), jnp.float32)
    monkeypatch.setenv("MEDSEG_DW27_PALLAS", "1")
    assert convgrad._dw27_pallas_eligible(x)
    monkeypatch.setenv("MEDSEG_DW27_PALLAS", "0")
    assert not convgrad._dw27_pallas_eligible(x)


def test_dw27_chunked_matches_unchunked(monkeypatch):
    """Batch chunking (the bs8/bs16 path): partial dW summed over lax.scan
    chunks must match the single-call kernel up to fp32 reassociation."""
    rng = np.random.default_rng(4)
    b, d, h, w, c = 4, 4, 8, 8, 16
    x = jnp.asarray(rng.normal(size=(b, d, h, w, c)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(b, d, h, w, c)).astype(np.float32))
    whole = dw27.dw27_pallas(x, dy)
    # chunk bound of exactly 2 samples -> scan over 2 chunks
    monkeypatch.setattr(convgrad, "_DW27_CHUNK_VOXELS", 2 * d * h * w)
    chunked = jax.jit(convgrad._dw27_pallas_chunked)(x, dy)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                               rtol=2e-6, atol=2e-5)


def test_dw27_eligibility_is_batch_aware(monkeypatch):
    """Auto mode enables the kernel only in the measured win envelope
    (1.5M, chunk-bound] TOTAL voxels, i.e. where it runs UNCHUNKED: the
    chunked bs8+ path is a measured HBM OOM at the 4M chunk (round 4,
    tools/ab_logs/bs8_full.log) and cost the round-4 driver bench its
    budget, so it is forced-only (MEDSEG_DW27_PALLAS=1)."""
    monkeypatch.setenv("MEDSEG_DW27_PALLAS", "auto")
    bs4 = jnp.ones((4, 96, 96, 96, 48), jnp.bfloat16)  # 3.5M: auto-on
    assert convgrad._dw27_pallas_eligible(bs4)
    bs8 = jnp.ones((8, 96, 96, 96, 48), jnp.bfloat16)  # 7.1M: chunk needed
    assert not convgrad._dw27_pallas_eligible(bs8)
    small = jnp.ones((1, 96, 96, 96, 48), jnp.bfloat16)  # 0.88M: XLA taps win
    assert not convgrad._dw27_pallas_eligible(small)
    # forcing still enables the chunked path for hardware sweeps
    monkeypatch.setenv("MEDSEG_DW27_PALLAS", "1")
    assert convgrad._dw27_pallas_eligible(bs8)


def test_dw27_applicability_gate():
    assert dw27.dw27_applicable((8, 8, 16), 48)
    assert not dw27.dw27_applicable((8, 8, 6), 48)    # w not sublane-aligned
    assert not dw27.dw27_applicable((8, 8, 16), 1)    # degenerate channels
