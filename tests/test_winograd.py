"""Winograd F(4^3,3^3) conv: parity with lax.conv at fp32, bounded rounding
at bf16, and correct gating into the conv3x3x3_s1 primal."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.ops.convgrad import _conv
from medicalsemseg_tpu.ops.winograd import (
    winograd_applicable,
    winograd_conv3d_f43,
)


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


@pytest.mark.parametrize("shape,co", [((1, 8, 8, 8, 5), 7),
                                      ((2, 4, 8, 12, 16), 16)])
def test_winograd_fp32_matches_conv(shape, co):
    x = _rand(shape, seed=1)
    w = _rand((3, 3, 3, shape[-1], co), seed=2, scale=0.2)
    got = winograd_conv3d_f43(x, w, mm_dtype=jnp.float32)
    want = _conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_winograd_f43_bf16_is_lossy_hence_gated():
    """Documents WHY F(4,3) is fp32-gated: bf16 V/M loses the inverse
    transform's cancellations (an order of magnitude past the direct bf16
    conv's own rounding). If this ever stops failing at the old threshold
    the gate in conv3x3x3_s1 can be revisited."""
    x = _rand((1, 8, 8, 8, 32), seed=3)
    w = _rand((3, 3, 3, 32, 32), seed=4, scale=0.2)
    ref = np.asarray(_conv(x, w))
    scale = np.abs(ref).max()

    wino = np.asarray(winograd_conv3d_f43(
        x.astype(jnp.bfloat16), w, mm_dtype=jnp.bfloat16)).astype(np.float32)
    direct_bf16 = np.asarray(_conv(x.astype(jnp.bfloat16),
                                   w.astype(jnp.bfloat16))).astype(np.float32)

    err_wino = np.abs(wino - ref).max() / scale
    err_direct = np.abs(direct_bf16 - ref).max() / scale
    assert err_wino > 6 * err_direct, (err_wino, err_direct)


def test_winograd_applicable_gate():
    assert winograd_applicable((96, 96, 96), 48)
    assert winograd_applicable((12, 12, 12), 96)
    assert not winograd_applicable((96, 96, 90), 48)   # not %4
    assert not winograd_applicable((96, 96, 96), 1)    # skinny channels


@pytest.mark.parametrize("shape,co,bd,bh", [
    ((2, 8, 8, 16, 24), 10, 4, 4),
    ((1, 12, 4, 32, 48), 48, 4, 2),
])
def test_winograd_f23_kernel_matches_conv(shape, co, bd, bh):
    """Fused F(2,3) Pallas kernel (interpret mode) == lax.conv at fp32."""
    from medicalsemseg_tpu.ops.pallas.winograd3d import winograd_conv3d_f23

    x = _rand(shape, seed=8)
    w = _rand((3, 3, 3, shape[-1], co), seed=9, scale=0.2)
    got = winograd_conv3d_f23(x, w, block_d=bd, block_h=bh, interpret=True)
    want = _conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_winograd_f23_bf16_error_bounded():
    """bf16 F(2,3) rounding stays the same order as the direct bf16 conv's
    (the reason this transform, unlike F(4,3), ships for bf16)."""
    from medicalsemseg_tpu.ops.pallas.winograd3d import winograd_conv3d_f23

    x = _rand((1, 8, 8, 16, 32), seed=10)
    w = _rand((3, 3, 3, 32, 32), seed=11, scale=0.2)
    ref = np.asarray(_conv(x, w))
    scale = np.abs(ref).max()
    got = np.asarray(winograd_conv3d_f23(
        x.astype(jnp.bfloat16), w, interpret=True)).astype(np.float32)
    direct = np.asarray(_conv(x.astype(jnp.bfloat16),
                              w.astype(jnp.bfloat16))).astype(np.float32)
    err_wino = np.abs(got - ref).max() / scale
    err_direct = np.abs(direct - ref).max() / scale
    assert err_wino < 4 * max(err_direct, 1e-3), (err_wino, err_direct)


def test_winograd_f23_applicable_gate():
    from medicalsemseg_tpu.ops.pallas.winograd3d import (
        winograd_f23_applicable)

    assert winograd_f23_applicable((96, 96, 96), 48)
    assert winograd_f23_applicable((48, 48, 48), 96)
    assert not winograd_f23_applicable((96, 96, 96), 192)  # lanes filled
    assert not winograd_f23_applicable((96, 96, 90), 48)   # W/2 % 8 != 0
    assert not winograd_f23_applicable((96, 96, 96), 1)


def test_winograd_train_routing_matches_autodiff(monkeypatch):
    """MEDSEG_WINOGRAD_TRAIN routes the vjp forward AND dx through the
    F(2,3) kernel (interpret-forced on CPU); gradients must match XLA
    autodiff through the native conv at bf16 tolerance."""
    from medicalsemseg_tpu.ops import convgrad
    from medicalsemseg_tpu.ops.pallas import winograd3d

    monkeypatch.setattr(convgrad, "_WINOGRAD_TRAIN", True)
    monkeypatch.setattr(winograd3d, "_FORCE_INTERPRET", True)
    x = _rand((1, 8, 8, 16, 16), seed=12).astype(jnp.bfloat16)
    w = _rand((3, 3, 3, 16, 16), seed=13, scale=0.2).astype(jnp.bfloat16)
    cot = _rand((1, 8, 8, 16, 16), seed=14).astype(jnp.bfloat16)

    def loss(fn, x, w):
        return (fn(x, w).astype(jnp.float32) * cot.astype(jnp.float32)).sum()

    (v, (gx, gw)) = jax.value_and_grad(
        lambda a, b: loss(convgrad.conv3x3x3_s1, a, b), (0, 1))(x, w)
    (rv, (rx, rw)) = jax.value_and_grad(
        lambda a, b: loss(_conv, a, b), (0, 1))(x, w)
    np.testing.assert_allclose(float(v), float(rv), rtol=2e-2)
    rscale = float(jnp.abs(rx.astype(jnp.float32)).max())
    np.testing.assert_allclose(np.asarray(gx.astype(jnp.float32)),
                               np.asarray(rx.astype(jnp.float32)),
                               atol=3e-2 * rscale)
    wscale = float(jnp.abs(rw.astype(jnp.float32)).max())
    np.testing.assert_allclose(np.asarray(gw.astype(jnp.float32)),
                               np.asarray(rw.astype(jnp.float32)),
                               atol=3e-2 * wscale)


def test_winograd_primal_gate(monkeypatch):
    """With MEDSEG_WINOGRAD forced on, the conv3x3x3_s1 primal routes
    eligible shapes through Winograd and still matches the native conv."""
    from medicalsemseg_tpu.ops import convgrad

    monkeypatch.setattr(convgrad, "_WINOGRAD_INFER", True)
    x = _rand((1, 8, 8, 8, 16), seed=5)
    w = _rand((3, 3, 3, 16, 16), seed=6, scale=0.2)
    got = convgrad.conv3x3x3_s1(x, w)  # fp32 input -> F(4,3) route
    want = _conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # bf16 input does NOT route through F(4,3) (lossy there): must equal the
    # native bf16 conv bit-for-bit
    got_bf = convgrad.conv3x3x3_s1(x.astype(jnp.bfloat16),
                                   w.astype(jnp.bfloat16))
    want_bf = _conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(got_bf.astype(jnp.float32)),
                                  np.asarray(want_bf.astype(jnp.float32)))
    # gradients are untouched by the inference-only transform
    cot = _rand((1, 8, 8, 8, 16), seed=7)
    gx, gw = jax.grad(lambda a, b: (convgrad.conv3x3x3_s1(a, b) * cot).sum(),
                      (0, 1))(x, w)
    rx, rw = jax.grad(lambda a, b: (_conv(a, b) * cot).sum(), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)


def test_winograd_f23_input_epilogue():
    """In-kernel scale/shift+lrelu on the input == lax.conv of the
    explicitly normalized input (zero SAME-padding preserved)."""
    from medicalsemseg_tpu.ops.pallas.winograd3d import winograd_conv3d_f23

    b, c, co = 2, 24, 16
    x = _rand((b, 8, 8, 16, c), seed=20)
    w = _rand((3, 3, 3, c, co), seed=21, scale=0.2)
    rng = np.random.default_rng(22)
    sc = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32) * 0.3 + 1.0)
    sh = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32) * 0.2)

    xn = x * sc[:, None, None, None, :] + sh[:, None, None, None, :]
    xn = jnp.where(xn >= 0, xn, xn * 0.01)
    want = _conv(xn, w)
    got = winograd_conv3d_f23(x, w, epilogue=(sc, sh), lrelu=True,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_unet_res_block_fused_matches_plain(monkeypatch):
    """UnetResBlock(fuse=True) == fuse=False with shared params (fp32,
    interpret): the folded IN1+lrelu epilogue and winograd conv2 reproduce
    the conv->IN->lrelu->conv chain."""
    import jax.numpy as jnp
    from medicalsemseg_tpu.models.decoders import UnetResBlock
    from medicalsemseg_tpu.ops.pallas import winograd3d

    monkeypatch.setattr(winograd3d, "_FORCE_INTERPRET", True)

    blk = UnetResBlock(out_channels=24)
    x = _rand((2, 8, 8, 16, 17), seed=23)
    variables = jax.jit(lambda r, v: blk.init(r, v))(
        jax.random.PRNGKey(0), x)
    plain = blk.apply(variables, x, False)
    fused = blk.apply(variables, x, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=2e-4, atol=2e-4)


def test_decoder_fuse_env_gate(monkeypatch):
    from medicalsemseg_tpu.models.decoders import decoder_fuse_enabled
    from medicalsemseg_tpu.ops.pallas import winograd3d

    monkeypatch.delenv("MEDSEG_FUSED_DECODER", raising=False)
    assert not decoder_fuse_enabled()
    monkeypatch.setenv("MEDSEG_FUSED_DECODER", "1")
    monkeypatch.setattr(winograd3d, "_FORCE_INTERPRET", True)
    assert decoder_fuse_enabled()
