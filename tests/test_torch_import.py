"""Checkpoint-importer tests: reference .pth -> flax params, layout math."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from medicalsemseg_tpu.utils import torch_import as ti  # noqa: E402


def test_conv_transpose_layout_equivalence():
    """flax ConvTranspose with our converted kernel == torch ConvTranspose3d."""
    from flax import linen as nn

    torch.manual_seed(0)
    tct = torch.nn.ConvTranspose3d(3, 5, kernel_size=2, stride=2, bias=False)
    x = np.random.default_rng(0).normal(size=(1, 4, 4, 4, 3)).astype(np.float32)
    with torch.no_grad():
        want = tct(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    want = want.transpose(0, 2, 3, 4, 1)

    sd = {"t.weight": tct.weight}
    kp = ti.conv_transpose(sd, "t")
    fct = nn.ConvTranspose(5, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
                           use_bias=False)
    got = fct.apply({"params": {"kernel": jnp.asarray(kp["kernel"])}},
                    jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_conv_transpose_layout_equivalence_k3_s2():
    """Same check for overlapping kernels (k=3, s=2) where flipping matters."""
    from flax import linen as nn

    torch.manual_seed(1)
    tct = torch.nn.ConvTranspose3d(2, 3, kernel_size=3, stride=2, bias=True)
    x = np.random.default_rng(1).normal(size=(1, 3, 3, 3, 2)).astype(np.float32)
    with torch.no_grad():
        want = tct(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    want = want.transpose(0, 2, 3, 4, 1)

    sd = {"t.weight": tct.weight, "t.bias": tct.bias}
    kp = ti.conv_transpose(sd, "t")
    fct = nn.ConvTranspose(3, (3, 3, 3), strides=(2, 2, 2), padding="VALID",
                           use_bias=True)
    got = fct.apply({"params": {"kernel": jnp.asarray(kp["kernel"]),
                                "bias": jnp.asarray(kp["bias"])}},
                    jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_pth_roundtrip_encoder_import(tmp_path):
    """torch.save a reference encoder checkpoint -> import -> forward parity."""
    from tests.test_reference_parity import (  # installs timm/monai stubs
        _install_monai_stub,
        _install_timm_stub,
    )

    _install_timm_stub()
    _install_monai_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.backbones.swin_nnformer import SwinTransformerNNFormer

    from medicalsemseg_tpu.models.swin import SwinEncoder3D

    torch.manual_seed(7)
    ref = SwinTransformerNNFormer(
        pretrain_img_size=(16, 16, 16), patch_size=(2, 2, 2), in_chans=1,
        embed_dim=12, depths=[1, 1], num_heads=[2, 2], window_size=[2, 2],
        qkv_bias=True, drop_path_rate=0.0).eval()

    # save with DDP-style 'module.' + 'encoder.' prefixes like the reference
    sd = {f"module.encoder.{k}": v for k, v in ref.state_dict().items()}
    path = str(tmp_path / "ckpt.pth")
    torch.save({"model": sd, "epoch": 3}, path)

    loaded = ti.load_reference_pth(path)
    params = ti.import_swin_encoder(loaded, "encoder.", num_layers=2)

    ours = SwinEncoder3D(patch_size=(2, 2, 2), embed_dim=12, depths=(1, 1),
                         num_heads=(2, 2), window_sizes=(2, 2), qkv_bias=True,
                         drop_path_rate=0.0)
    rng = np.random.default_rng(7)
    vol = rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        want = ref((torch.from_numpy(vol.transpose(0, 4, 1, 2, 3)), None, None))
    got = ours.apply({"params": params}, (jnp.asarray(vol), None, None))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g),
                                   w.numpy().transpose(0, 2, 3, 4, 1),
                                   rtol=3e-4, atol=3e-5)


def test_import_tree_matches_model_init_structure():
    """Importer output must be loadable into the real flagship model: the
    param tree structures (names+shapes) line up for encoder keys."""
    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.models import build_model

    cfg = Config(model="nnFormerUNETR", vol_size=16, patch_size=2,
                 hidden_dim=12, depths=(1, 1), num_heads=(2, 2), window_size=2,
                 output_dim=3, compute_dtype="float32", qkv_bias=True)
    model = build_model(cfg)
    x_in = (jnp.zeros((1, 16, 16, 16, 1)), jnp.zeros((1, 3)), jnp.ones((1, 3)))
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    init_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_flatten_with_path(
                      variables["params"])[0]}

    # build a fake reference state dict with the right names/shapes by
    # instantiating torch modules mirroring the reference structure is heavy;
    # instead check the known mapping targets exist in the init tree.
    for needle in ["['encoder']['patch_embed']['Conv_0']['kernel']",
                   "['encoder']['layers_0']['blocks_0']['attn']['qkv_kernel']",
                   "['encoder']['layers_1']['downsample']['reduction']['Conv_0']['kernel']",
                   "['encoder']['norm1']['LayerNorm_0']['scale']",
                   "['decoder']['encoder0']['conv1']['Conv_0']['kernel']",
                   "['decoder']['decoder0']['transp_conv']['ConvTranspose_0']['kernel']",
                   "['decoder']['out']['conv']['Conv_0']['bias']"]:
        assert any(needle in p for p in init_paths), needle


def test_resize_rel_pos_bias_table_matches_torch_trilinear():
    """Window-size surgery: the 3D trilinear table resize matches torch
    F.interpolate(mode='trilinear', align_corners=False) — the 3D-correct
    analogue of the reference's 2D bicubic surgery (utils/checkpoint.py:51-66)."""
    import torch
    import torch.nn.functional as F

    from medicalsemseg_tpu.utils.torch_import import resize_rel_pos_bias_table

    rng = np.random.default_rng(0)
    src_w, dst_w, nh = 4, 6, 3
    s = 2 * src_w - 1
    table = rng.normal(size=(s ** 3, nh)).astype(np.float32)

    got = resize_rel_pos_bias_table(table, (src_w,) * 3, (dst_w,) * 3)
    d = 2 * dst_w - 1
    assert got.shape == (d ** 3, nh)

    t = torch.from_numpy(table).reshape(s, s, s, nh).permute(3, 0, 1, 2)[None]
    want = F.interpolate(t, size=(d, d, d), mode="trilinear",
                         align_corners=False)
    want = want[0].permute(1, 2, 3, 0).reshape(-1, nh).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # same window -> passthrough
    same = resize_rel_pos_bias_table(table, (src_w,) * 3, (src_w,) * 3)
    np.testing.assert_array_equal(same, table)


def test_resize_abs_pos_embed_keeps_extra_tokens():
    from medicalsemseg_tpu.utils.torch_import import resize_abs_pos_embed

    rng = np.random.default_rng(1)
    pos = rng.normal(size=(1, 1 + 4 * 4 * 4, 6)).astype(np.float32)
    out = resize_abs_pos_embed(pos, (4, 4, 4), (8, 6, 4), num_extra_tokens=1)
    assert out.shape == (1, 1 + 8 * 6 * 4, 6)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # cls token unchanged
    # constant field stays constant under interpolation
    pos_c = np.ones((1, 27, 5), np.float32) * 3.25
    out_c = resize_abs_pos_embed(pos_c, (3, 3, 3), (5, 5, 5))
    np.testing.assert_allclose(out_c, 3.25, rtol=1e-6)


def test_import_swin_encoder_resizes_mismatched_tables():
    """An encoder checkpoint trained at window 2 imports into a window-3
    model: tables are resized instead of erroring, and the params apply."""
    import jax
    import jax.numpy as jnp

    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.models import build_model
    from medicalsemseg_tpu.utils.torch_import import import_swin_encoder

    rng = np.random.default_rng(2)
    nh = (2, 2)
    dim = 12
    sd = {}
    for i, (d, h) in enumerate(zip((1, 1), nh)):
        for j in range(d):
            base = f"encoder.layers.{i}.blocks.{j}"
            c = dim * 2 ** i
            sd[f"{base}.norm1.weight"] = np.ones(c, np.float32)
            sd[f"{base}.norm1.bias"] = np.zeros(c, np.float32)
            sd[f"{base}.norm2.weight"] = np.ones(c, np.float32)
            sd[f"{base}.norm2.bias"] = np.zeros(c, np.float32)
            sd[f"{base}.attn.qkv.weight"] = rng.normal(
                size=(3 * c, c)).astype(np.float32) * 0.02
            sd[f"{base}.attn.proj.weight"] = rng.normal(
                size=(c, c)).astype(np.float32) * 0.02
            sd[f"{base}.attn.proj.bias"] = np.zeros(c, np.float32)
            # checkpoint trained at WINDOW 2 -> (2*2-1)^3 = 27 rows
            sd[f"{base}.attn.relative_position_bias_table"] = rng.normal(
                size=(27, h)).astype(np.float32)
            sd[f"{base}.mlp.fc1.weight"] = rng.normal(
                size=(4 * c, c)).astype(np.float32) * 0.02
            sd[f"{base}.mlp.fc1.bias"] = np.zeros(4 * c, np.float32)
            sd[f"{base}.mlp.fc2.weight"] = rng.normal(
                size=(c, 4 * c)).astype(np.float32) * 0.02
            sd[f"{base}.mlp.fc2.bias"] = np.zeros(c, np.float32)
        sd[f"encoder.layers.{i}.downsample.norm.weight"] = np.ones(
            dim * 2 ** i, np.float32)
        sd[f"encoder.layers.{i}.downsample.norm.bias"] = np.zeros(
            dim * 2 ** i, np.float32)
        sd[f"encoder.layers.{i}.downsample.reduction.weight"] = rng.normal(
            size=(dim * 2 ** (i + 1), dim * 2 ** i, 3, 3, 3)).astype(
                np.float32) * 0.02
        sd[f"encoder.layers.{i}.downsample.reduction.bias"] = np.zeros(
            dim * 2 ** (i + 1), np.float32)
    sd["encoder.patch_embed.proj.weight"] = rng.normal(
        size=(dim, 1, 2, 2, 2)).astype(np.float32) * 0.1
    sd["encoder.patch_embed.proj.bias"] = np.zeros(dim, np.float32)
    sd["encoder.patch_embed.norm.weight"] = np.ones(dim, np.float32)
    sd["encoder.patch_embed.norm.bias"] = np.zeros(dim, np.float32)
    for k in range(2):
        c = dim * 2 ** (k + 1)
        sd[f"encoder.norm{k}.weight"] = np.ones(c, np.float32)
        sd[f"encoder.norm{k}.bias"] = np.zeros(c, np.float32)

    # target model uses window 3 -> (2*3-1)^3 = 125 rows expected
    params = import_swin_encoder(sd, "encoder.", 2, window_sizes=(3, 3))
    t = params["layers_0"]["blocks_0"]["attn"]["relative_position_bias_table"]
    assert t.shape == (125, nh[0])

    cfg = Config(model="nnFormerUNETR", vol_size=24, patch_size=2,
                 hidden_dim=dim, depths=(1, 1), num_heads=nh, window_size=3,
                 output_dim=2, compute_dtype="float32")
    model = build_model(cfg)
    x_in = (jnp.zeros((1, 24, 24, 24, 1)), jnp.zeros((1, 3)),
            jnp.ones((1, 3)))
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    merged = dict(variables["params"])
    merged["encoder"] = params
    out = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))(
        {"params": merged}, x_in)
    assert out.shape == (1, 24, 24, 24, 2)
    assert np.isfinite(np.asarray(out)).all()
