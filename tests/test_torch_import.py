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
