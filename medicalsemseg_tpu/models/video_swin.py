"""Video-Swin 3D backbone (tuple windows) — TPU-native re-derivation.

The reference vendors the Video Swin Transformer backbone unused
(reference: models/backbones/swin_3d.py:470-708, SURVEY.md §2.2 row 34).
Its blocks are behaviorally identical to the MONAI-official SwinUNETR blocks
already built here (models/swin_official.py): per-axis window clamping with
zeroed shifts (swin_3d.py:67-80 == MONAI get_window_size), the full
constructor-window relative-position index sliced ``[:n, :n]`` at clamped
windows (swin_3d.py:134-167), and the region-id cyclic-shift mask
(swin_3d.py:323-338, ``compute_mask`` — reproduced as a trace-time NumPy
constant instead of an lru_cached device tensor). The block machinery is
therefore shared; what is specific to Video-Swin:

  * VideoPatchMerging (swin_3d.py:274-316): concat of all 8 strided octants
    in Video-Swin's own order -> LN(8C) -> Linear(2C, no bias). No
    duplicated-octant quirk (that is MONAI v1 only), even dims asserted.
  * Patch merging runs after EVERY stage including the last
    (swin_3d.py:549-565: ``downsample=PatchMerging`` unconditionally).
  * Optional learned absolute position embedding over the patch grid
    (``ape``, swin_3d.py:539-543).
  * Optional LayerNorm after the patch-embed conv (patch_norm).
  * Outputs the RAW 5-scale pyramid [embed, s1..s4] with no per-stage
    normalization (swin_3d.py:683-701).

2D-checkpoint inflation (swin_3d.py:589-645 ``inflate_weights``) lives in
utils/torch_import.import_video_swin_2d.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medicalsemseg_tpu.models.layers import LayerNorm, trunc_normal_init
from medicalsemseg_tpu.models.swin_official import OfficialSwinBlock

Dtype = Any
Tuple3 = Tuple[int, int, int]


class VideoPatchMerging(nn.Module):
    """All-8-octant concat -> LN(8C) -> Linear(2C, no bias), octants in
    Video-Swin's order (swin_3d.py:292-313)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, d, h, w, c = x.shape
        assert d % 2 == 0 and h % 2 == 0 and w % 2 == 0, (
            f"VideoPatchMerging needs even dims, got {(d, h, w)}")
        s = lambda i, j, k: x[:, i::2, j::2, k::2, :]  # noqa: E731
        # octant order verbatim from the reference (x0..x7)
        x = jnp.concatenate([s(0, 0, 0), s(1, 0, 0), s(1, 1, 0), s(1, 1, 1),
                             s(0, 0, 1), s(0, 1, 1), s(1, 0, 1), s(0, 1, 0)],
                            axis=-1)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class VideoSwin3D(nn.Module):
    """SwinTransformer3D: conv patch embed (+optional LN, +optional ape),
    4 stages of tuple-window blocks each ending in VideoPatchMerging,
    returning [embed, s1, s2, s3, s4] (swin_3d.py:470-708)."""

    in_chans: int = 1
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: Tuple3 = (6, 6, 6)
    patch_size: Tuple3 = (2, 2, 2)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    ape: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> List[jnp.ndarray]:
        # accepts either the framework tuple contract or a bare volume
        vol = x_in[0] if isinstance(x_in, (tuple, list)) else x_in
        p = self.patch_size
        x = nn.Conv(self.embed_dim, kernel_size=p, strides=p, padding="VALID",
                    dtype=self.dtype, name="patch_embed")(
                        vol.astype(self.dtype))
        if self.patch_norm:
            x = LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        if self.ape:
            grid = x.shape[1:4]
            pe = self.param("absolute_pos_embed", trunc_normal_init,
                            (1,) + tuple(grid) + (self.embed_dim,),
                            jnp.float32)
            x = x + pe.astype(x.dtype)

        outs = [x]
        shift = tuple(w // 2 for w in self.window)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        for k, depth in enumerate(self.depths):
            dim = int(self.embed_dim * 2 ** k)
            for i in range(depth):
                x = OfficialSwinBlock(
                    dim=dim, num_heads=self.num_heads[k],
                    window=tuple(self.window),
                    shift=(0, 0, 0) if i % 2 == 0 else shift,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop_path_rate=float(dpr[sum(self.depths[:k]) + i]),
                    use_pallas=self.use_pallas, dtype=self.dtype,
                    name=f"layers_{k}_blocks_{i}")(x, deterministic)
            # downsample after EVERY stage (swin_3d.py:564: unconditional)
            x = VideoPatchMerging(dim, dtype=self.dtype,
                                  name=f"layers_{k}_downsample")(x)
            outs.append(x)
        return outs
