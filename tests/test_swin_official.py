"""SwinUNETR (official MONAI variant) parity + checkpoint-surgery tests.

Oracle: the reference's vendored torch model itself
(/root/reference/models/segmentors/swin_unetr_official.py:32-981), imported
with functional monai stubs and driven at a tiny configuration that still
exercises every quirk path: window clamping (stage resolutions < 7 with the
[:n, :n] index slice), the v1 PatchMerging duplicated-octant concat, proj_out
skip normalization, and the 5-level decoder.
"""

from __future__ import annotations

import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.test_full_model_parity import (
    _install_functional_monai_stub,
    _install_timm_stub,
)

REF = "/root/reference"

# 64^3 keeps the deepest decoder stage at 2^3 spatial (InstanceNorm needs
# >1 spatial element) while stage resolutions 4 and 2 still exercise the
# clamped-window [:n, :n] quirk (window 7)
SIZE, FS, DEPTHS, HEADS = 64, 12, (1, 1, 1, 1), (2, 2, 2, 2)


def _build_reference(seed=21):
    _install_timm_stub()
    _install_functional_monai_stub()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.manual_seed(seed)
    from models.segmentors.swin_unetr_official import SwinUNETR

    return SwinUNETR(img_size=SIZE, in_channels=1, out_channels=3,
                     depths=DEPTHS, num_heads=HEADS,
                     feature_size=FS).eval()


def _build_ours():
    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.models import build_model

    cfg = Config(model="SwinUNETR_Official", vol_size=SIZE, hidden_dim=FS,
                 depths=DEPTHS, num_heads=HEADS, output_dim=3,
                 compute_dtype="float32")
    return build_model(cfg)


def test_swin_unetr_official_full_parity():
    """Transplant every weight of the vendored torch SwinUNETR and require
    full-model logits parity (incl. clamped-window [:n,:n] quirk and the v1
    PatchMerging duplicate-slice quirk)."""
    from medicalsemseg_tpu.utils.torch_import import (
        import_swin_unetr_official_full)

    ref = _build_reference()
    ours = _build_ours()
    params = import_swin_unetr_official_full(ref.state_dict(),
                                             depths=DEPTHS)

    rng = np.random.default_rng(21)
    vol = rng.normal(size=(1, SIZE, SIZE, SIZE, 1)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(vol.transpose(0, 4, 1, 2, 3)))
    got = ours.apply({"params": params},
                     (jnp.asarray(vol), jnp.zeros((1, 3)), jnp.ones((1, 3))),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=2e-3, atol=2e-3)


def test_load_from_ssl_surgery_roundtrip():
    """The MONAI SSL-checkpoint load_from surgery: a synthetic
    {'state_dict': {'module.<...>'}} checkpoint imports into the swinViT
    subtree, loads over a model init (decoder stays random like the
    reference's load_from), and drives the encoder to the reference values."""
    from medicalsemseg_tpu.utils.torch_import import (
        import_swin_unetr_official)

    ref = _build_reference(seed=22)
    ours = _build_ours()

    # synthesize the SSL checkpoint format from the torch model's swinViT
    ssl = {"state_dict": {f"module.{k[len('swinViT.'):]}": v
                          for k, v in ref.state_dict().items()
                          if k.startswith("swinViT.")}}
    vit_params = import_swin_unetr_official(ssl, depths=DEPTHS)

    rng = np.random.default_rng(22)
    vol = rng.normal(size=(1, SIZE, SIZE, SIZE, 1)).astype(np.float32)
    x_in = (jnp.asarray(vol), jnp.zeros((1, 3)), jnp.ones((1, 3)))
    variables = jax.jit(
        lambda r, x: ours.init(r, x, deterministic=True))(
            jax.random.PRNGKey(0), x_in)
    params = dict(variables["params"])
    # structure must line up exactly with the init tree
    init_vit = jax.tree_util.tree_structure(params["swinViT"])
    got_vit = jax.tree_util.tree_structure(vit_params["swinViT"])
    assert init_vit == got_vit
    params["swinViT"] = vit_params["swinViT"]

    # encoder outputs must match the torch swinViT's hidden states
    from medicalsemseg_tpu.models.swin_official import SwinViTOfficial

    vit = SwinViTOfficial(in_chans=1, embed_dim=FS, depths=DEPTHS,
                          num_heads=HEADS)
    got_states = vit.apply({"params": vit_params["swinViT"]},
                           jnp.asarray(vol), deterministic=True)
    with torch.no_grad():
        want_states = ref.swinViT(
            torch.from_numpy(vol.transpose(0, 4, 1, 2, 3)), True)
    assert len(got_states) == len(want_states)
    for g, w in zip(got_states, want_states):
        np.testing.assert_allclose(np.asarray(g),
                                   w.numpy().transpose(0, 2, 3, 4, 1),
                                   rtol=2e-3, atol=2e-3)


def test_official_fused_default_off(monkeypatch):
    """The fused kernels at the official model's 7^3 constructor windows are
    a measured Mosaic backend-compile rejection on TPU (round-5 zoo A/B,
    tools/zoo_train_ab.jsonl), so the factory must hand the official model
    use_pallas=False by default even where other models would fuse —
    MEDSEG_OFFICIAL_FUSED=1 re-enables for diagnosis."""
    import medicalsemseg_tpu.models.factory as factory
    from medicalsemseg_tpu.config import Config

    monkeypatch.setattr(factory, "_use_pallas", lambda cfg: True)
    cfg = Config(model="SwinUNETR_Official", vol_size=32, patch_size=2,
                 hidden_dim=12, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                 window_size=7, output_dim=3, compute_dtype="float32")

    monkeypatch.delenv("MEDSEG_OFFICIAL_FUSED", raising=False)
    assert factory.build_model(cfg).use_pallas is False

    monkeypatch.setenv("MEDSEG_OFFICIAL_FUSED", "1")
    assert factory.build_model(cfg).use_pallas is True
