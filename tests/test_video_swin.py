"""Video-Swin 3D backbone parity tests.

Oracle: the reference's vendored Video Swin Transformer backbone
(/root/reference/models/backbones/swin_3d.py:470-708), imported directly
and driven at a tiny configuration that still exercises every quirk path:
shifted windows with the region-id cyclic mask (stage 0/1), window clamping
with the [:n, :n] relative-index slice (stage 3 at resolution 2 < window 4),
the all-8-octant VideoPatchMerging after EVERY stage, and the raw
(un-normalized) 5-scale pyramid output.

The reference's ``ape`` flag is shape-broken upstream (swin_3d.py:700 adds
the flat (1, N, C) table to a channels-first 5-D map), so the ape path is
tested against our own grid-major interpretation only.
"""

from __future__ import annotations

import sys

import numpy as np
import torch

import jax.numpy as jnp

from tests.test_reference_parity import _install_timm_stub

REF = "/root/reference"

SIZE, ED, DEPTHS, HEADS, WIN = 32, 12, (2, 2, 1, 1), (2, 2, 2, 2), (4, 4, 4)


def _build_reference(seed=33):
    _install_timm_stub()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.manual_seed(seed)
    from models.backbones.swin_3d import SwinTransformer3D

    m = SwinTransformer3D(
        vol_size=(SIZE,) * 3, patch_size=(2, 2, 2), in_chans=1,
        embed_dim=ED, depths=list(DEPTHS), num_heads=list(HEADS),
        window_size=WIN, patch_norm=True, drop_path_rate=0.1)
    m.eval()  # the reference's train() override returns None (swin_3d.py:704)
    return m


def _build_ours():
    from medicalsemseg_tpu.models.video_swin import VideoSwin3D

    return VideoSwin3D(in_chans=1, embed_dim=ED, depths=DEPTHS,
                       num_heads=HEADS, window=WIN, patch_size=(2, 2, 2),
                       patch_norm=True, drop_path_rate=0.1)


def test_video_swin_backbone_parity():
    """Transplant every reference weight; require parity on all 5 pyramid
    scales (embed, s1..s4) including shifted-window and clamped stages."""
    from medicalsemseg_tpu.utils.torch_import import import_video_swin

    ref = _build_reference()
    ours = _build_ours()
    params = import_video_swin(ref.state_dict(), depths=DEPTHS)

    rng = np.random.default_rng(33)
    vol = rng.normal(size=(1, SIZE, SIZE, SIZE, 1)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(vol.transpose(0, 4, 1, 2, 3)))
    got = ours.apply({"params": params}, jnp.asarray(vol),
                     deterministic=True)
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.numpy().transpose(0, 2, 3, 4, 1),
            rtol=2e-4, atol=2e-4)


def test_video_swin_ape_import_roundtrip():
    """The flat reference ape table lands grid-major on our (d,h,w) grid and
    the model consumes it (made-functional: upstream add is shape-broken)."""
    from medicalsemseg_tpu.models.video_swin import VideoSwin3D
    from medicalsemseg_tpu.utils.torch_import import import_video_swin

    ref = _build_reference()
    sd = dict(ref.state_dict())
    n = (SIZE // 2) ** 3
    rng = np.random.default_rng(7)
    flat = rng.normal(size=(1, n, ED)).astype(np.float32)
    sd["absolute_pos_embed"] = torch.from_numpy(flat)
    g = SIZE // 2
    params = import_video_swin(sd, depths=DEPTHS, grid=(g, g, g))
    np.testing.assert_array_equal(
        params["absolute_pos_embed"].reshape(1, n, ED), flat)

    model = VideoSwin3D(in_chans=1, embed_dim=ED, depths=DEPTHS,
                        num_heads=HEADS, window=WIN, patch_size=(2, 2, 2),
                        ape=True)
    vol = jnp.zeros((1, SIZE, SIZE, SIZE, 1))
    outs = model.apply({"params": params}, vol, deterministic=True)
    # zero input + patch-norm'd zeros: embed output == LN-free add of ape?
    # patch_norm of a constant map is 0 (bias aside); just check shape/flow.
    assert outs[0].shape == (1, g, g, g, ED)
    assert outs[-1].shape == (1, g // 16, g // 16, g // 16, 16 * ED)
