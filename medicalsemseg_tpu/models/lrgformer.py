"""LRGFormer: joint Local/Region/Global token attention encoder.

The reference version (models/backbones/lrgformer.py:184-304) is dead AND
broken upstream: `LRGAttention.forward` references `self.proj`/`self.proj_drop`
that are never created (only proj_local/region/global exist, :53-55), applies
no softmax (:80-82), `LRGTransformerBlock.forward` uses an undefined `x`
(:124-126), `BasicLayer.forward` unpacks names that don't exist (:175-182),
`PatchEmbed3D` is never imported, and `LRGFormer.forward` returns nothing
(:275-304). This is a functional repair that keeps the architecture's intent:

  * three token granularities — LOCAL tokens (fine grid over the ROI),
    REGION tokens (coarse grid, PatchEmbedRegion), ONE GLOBAL token
    (PatchEmbedGlobal) — jointly attended in every block with per-stream
    QKV and output projections (lrgformer.py:47-55);
  * softmax attention (evidently intended; the reference's raw `attn @ v`
    at :80-82 is unnormalized);
  * hierarchical stages with PatchMerging on the local/region token volumes
    and a Dense(dim -> 2 dim) on the global token (lrgformer.py:166-172).

Token-budget note: the reference config (vol 512, local 24, patch 1) attends
over ~14k local tokens. Mapped onto this framework's sliding-window contract
(the model sees a vol_size ROI crop), the same budget is kept by embedding the
ROI at patch 4 (96³ -> 24³ = 13824 local tokens) instead of cropping a 24³
sub-volume at patch 1 — the full ROI stays predictable so the standard UNETR
decoder and sliding-window engine apply unchanged.

TPU-first: attention is computed in query chunks (static python unroll, no
dynamic shapes) so the (N, N) logits never materialize at the stage-0 token
count; softmax is fp32, matmuls bf16 on the MXU.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medicalsemseg_tpu.models.embeddings import (PatchEmbed3D,
                                                 PatchEmbedGlobal,
                                                 PatchEmbedRegion)
from medicalsemseg_tpu.models.layers import (LayerNorm, Mlp, DropPath,
                                             trunc_normal_init)
from medicalsemseg_tpu.models.swin import PatchMerging

Dtype = Any


def _chunked_softmax_attention(q, k, v, chunk: int = 2048):
    """softmax(q k^T) v over (B, nh, N, hd) with the query axis processed in
    static chunks: peak logits memory is (B, nh, chunk, N) instead of (N, N).
    """
    b, nh, n, hd = q.shape
    if n <= chunk:
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)
    pad = (-n) % chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    outs = []
    for s in range(0, n + pad, chunk):
        logits = jnp.einsum("bhnd,bhmd->bhnm", qp[:, :, s:s + chunk], k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        outs.append(jnp.einsum("bhnm,bhmd->bhnd", p, v))
    return jnp.concatenate(outs, axis=2)[:, :, :n]


class LRGAttention(nn.Module):
    """Joint attention over [local | region | global] token streams with
    per-stream QKV and output projections (reference lrgformer.py:33-85,
    repaired: softmax added, per-stream proj used)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    q_chunk: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xl: jnp.ndarray, xr: jnp.ndarray, xg: jnp.ndarray):
        c = self.dim
        nh = self.num_heads
        hd = c // nh
        scale = hd ** -0.5
        nl, nr = xl.shape[1], xr.shape[1]

        def qkv_of(x, name):
            y = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                         kernel_init=trunc_normal_init, name=name)(x)
            b, n, _ = y.shape
            return y.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)

        ql, kl, vl = qkv_of(xl, "qkv_local")
        qr, kr, vr = qkv_of(xr, "qkv_region")
        qg, kg, vg = qkv_of(xg, "qkv_global")

        q = jnp.concatenate([ql, qr, qg], axis=2) * scale
        k = jnp.concatenate([kl, kr, kg], axis=2)
        v = jnp.concatenate([vl, vr, vg], axis=2)

        out = _chunked_softmax_attention(q, k, v, self.q_chunk)
        b = out.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, c)

        proj = lambda x, name: nn.Dense(  # noqa: E731
            c, dtype=self.dtype, kernel_init=trunc_normal_init, name=name)(x)
        yl = proj(out[:, :nl], "proj_local")
        yr = proj(out[:, nl:nl + nr], "proj_region")
        yg = proj(out[:, nl + nr:], "proj_global")
        return yl, yr, yg


class LRGBlock(nn.Module):
    """pre-LN joint attention + pre-LN MLP, both with residuals over the
    concatenated token sequence (reference lrgformer.py:87-128, repaired)."""

    dim: int
    num_heads: int
    n_local: int
    n_region: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        nl, nr = self.n_local, self.n_region
        xn = LayerNorm(dtype=self.dtype, name="norm1")(x)
        yl, yr, yg = LRGAttention(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            dtype=self.dtype, name="attn")(
                xn[:, :nl], xn[:, nl:nl + nr], xn[:, nl + nr:])
        y = jnp.concatenate([yl, yr, yg], axis=1)
        x = x + DropPath(self.drop_path_rate)(y, deterministic=deterministic)
        mlp_in = LayerNorm(dtype=self.dtype, name="norm2")(x)
        mlp_out = Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                      name="mlp")(mlp_in, deterministic=deterministic)
        return x + DropPath(self.drop_path_rate)(mlp_out,
                                                 deterministic=deterministic)


class LRGFormer3D(nn.Module):
    """Hierarchical LRG encoder producing the standard 5-scale pyramid
    [embed, s1, s2, s3, s4] consumed by SwinUNETRDecoder (same contract as
    SwinEncoder3D). Local tokens: PatchEmbed3D(patch). Region tokens:
    PatchEmbedRegion(region_size). Global: PatchEmbedGlobal (one token).
    (reference lrgformer.py:184-304, repaired as documented in the module
    docstring.)"""

    patch_size: Tuple[int, int, int] = (4, 4, 4)
    region_factor: int = 4          # region grid = local grid / region_factor
    in_chans: int = 1
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> List[jnp.ndarray]:
        vol = x_in[0].astype(self.dtype)
        dims = vol.shape[1:4]
        for d, p in zip(dims, self.patch_size):
            assert d % (p * self.region_factor) == 0, (
                "volume must divide patch*region_factor")

        xl = PatchEmbed3D(patch_size=self.patch_size, embed_dim=self.embed_dim,
                          use_norm=self.patch_norm, dtype=self.dtype,
                          name="patch_embed_local")(vol)
        # region token grid: patch*region_factor voxels per region token
        region_size = tuple(d // (d // (p * self.region_factor))
                            for d, p in zip(dims, self.patch_size))
        xr = PatchEmbedRegion(region_size=region_size,
                              embed_dim=self.embed_dim,
                              use_norm=self.patch_norm, dtype=self.dtype,
                              name="patch_embed_region")(vol)
        xg = PatchEmbedGlobal(vol_size=dims, embed_dim=self.embed_dim,
                              use_norm=self.patch_norm, dtype=self.dtype,
                              name="patch_embed_global")(vol)

        outputs = [xl]
        lgrid = xl.shape[1:4]
        rgrid = xr.shape[1:4]

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        dim = self.embed_dim
        b = vol.shape[0]
        for i in range(len(self.depths)):
            nl = int(np.prod(lgrid))
            nr = int(np.prod(rgrid))
            x = jnp.concatenate([xl.reshape(b, nl, dim),
                                 xr.reshape(b, nr, dim),
                                 xg.reshape(b, 1, dim)], axis=1)
            for j in range(self.depths[i]):
                x = LRGBlock(dim=dim, num_heads=self.num_heads[i],
                             n_local=nl, n_region=nr,
                             mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                             drop_path_rate=dpr[sum(self.depths[:i]) + j],
                             dtype=self.dtype, name=f"layers_{i}_blocks_{j}")(
                                 x, deterministic=deterministic)
            xl = x[:, :nl].reshape(b, *lgrid, dim)
            xr = x[:, nl:nl + nr].reshape(b, *rgrid, dim)
            xg = x[:, nl + nr:].reshape(b, 1, 1, 1, dim)
            # downsample for the next stage (reference lrgformer.py:166-172:
            # PatchMerging on local+region, Linear(dim, 2 dim) on global)
            xl = PatchMerging(dim=dim, dtype=self.dtype,
                              name=f"downsample_local_{i}")(xl)
            xr = PatchMerging(dim=dim, dtype=self.dtype,
                              name=f"downsample_region_{i}")(xr)
            xg = nn.Dense(2 * dim, dtype=self.dtype,
                          kernel_init=trunc_normal_init,
                          name=f"downsample_global_{i}")(xg)
            lgrid = tuple(max(g // 2, 1) for g in lgrid)
            rgrid = tuple(max(g // 2, 1) for g in rgrid)
            dim *= 2
            outputs.append(LayerNorm(dtype=self.dtype, name=f"norm{i}")(xl))
        return outputs
