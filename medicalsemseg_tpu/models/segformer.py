"""SegFormer3D encoder (MixVisionTransformer in 3D).

Reference: models/backbones/segformer_backbone.py:196-343 — four
OverlapPatchEmbed stages (7³/s4 then 3³/s2), efficient attention with
spatial-reduction conv on K/V, depthwise-conv-augmented MLP.

TPU notes: the SR conv shrinks K/V by sr³ before the attention matmuls, so
stage-1 attention is (N x N/512) instead of (N x N) — already MXU-friendly;
softmax in fp32, channels-last throughout.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medicalsemseg_tpu.models.layers import (
    Conv3d,
    DropPath,
    LayerNorm,
    _DenseParams,
    trunc_normal_init,
)

Dtype = Any


class DWConvMlp(nn.Module):
    """fc1 -> depthwise 3³ conv -> GELU -> fc2 (reference: :13-48, :346-357)."""

    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, grid, deterministic: bool = True):
        b, n, c = x.shape
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc1")(x)
        v = x.reshape(b, *grid, self.hidden_dim)
        v = Conv3d(self.hidden_dim, (3, 3, 3),
                   feature_group_count=self.hidden_dim, dtype=self.dtype,
                   name="dwconv")(v)
        x = v.reshape(b, n, self.hidden_dim)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class SRAttention(nn.Module):
    """Attention with spatial-reduction conv on K/V (reference: :51-110).

    With use_pallas the N-token side (q dense -> per-head softmax(qk^T)v ->
    proj [-> +shortcut]) runs as one fused Pallas kernel at inference
    (ops/pallas/sr_attention.py); the tiny M-token K/V branch stays XLA.
    Params keep the nn.Dense tree (q/kv/proj) via _DenseParams."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, grid, deterministic: bool = True,
                 shortcut: jnp.ndarray = None):
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd ** -0.5

        wq, bq = _DenseParams(c, c, use_bias=self.qkv_bias, name="q")()
        wkv, bkv = _DenseParams(c, 2 * c, use_bias=self.qkv_bias,
                                name="kv")()
        wproj, bproj = _DenseParams(c, c, name="proj")()

        kv_in = x
        if self.sr_ratio > 1:
            v = x.reshape(b, *grid, c)
            sr = self.sr_ratio
            v = Conv3d(c, (sr, sr, sr), strides=(sr, sr, sr), padding="VALID",
                       dtype=self.dtype, name="sr")(v)
            kv_in = v.reshape(b, -1, c)
            kv_in = LayerNorm(dtype=self.dtype, name="norm")(kv_in)
        kv = jnp.dot(kv_in, wkv.astype(self.dtype))
        if bkv is not None:
            kv = kv + bkv.astype(self.dtype)
        m = kv_in.shape[1]

        if self.use_pallas and deterministic:
            from medicalsemseg_tpu.ops.pallas.sr_attention import (
                fused_sr_attention,
                fused_sr_attention_fits,
            )
            if fused_sr_attention_fits(c, m, shortcut is not None):
                # kv dense layout: columns [2, nh, hd] -> first c cols are K
                # (head-major hd blocks), last c are V
                return fused_sr_attention(
                    x.astype(self.dtype), kv[:, :, :c], kv[:, :, c:],
                    wq, bq, wproj, bproj, nh, residual=shortcut), True

        q = jnp.dot(x, wq.astype(self.dtype))
        if bq is not None:
            q = q + bq.astype(self.dtype)
        q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        kv = kv.reshape(b, m, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = jnp.dot(out, wproj.astype(self.dtype)) + bproj.astype(self.dtype)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic), False


class MixBlock(nn.Module):
    """LN -> SR-attention -> LN -> DWConv MLP, with stochastic depth
    (reference: :113-150)."""

    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, grid, deterministic: bool = True):
        from medicalsemseg_tpu.ops.pallas import absorb_enabled

        # the fused SR-attention kernel (inference-only) can also absorb the
        # block's shortcut add; the pre-attention LN stays outside because
        # its output feeds the SR conv too (it is materialized either way)
        fuse = self.use_pallas and deterministic and absorb_enabled()
        xn = LayerNorm(dtype=self.dtype, name="norm1")(x)
        h, fused = SRAttention(self.dim, self.num_heads, self.sr_ratio,
                               self.qkv_bias, self.attn_drop, self.drop,
                               use_pallas=fuse, dtype=self.dtype,
                               name="attn")(
            xn, grid, deterministic, shortcut=x if fuse else None)
        if fused and fuse:
            x = h  # kernel returned x + attn(LN(x))
        else:
            x = x + DropPath(self.drop_path_rate)(h,
                                                  deterministic=deterministic)
        h = DWConvMlp(int(self.dim * self.mlp_ratio), self.drop, self.dtype,
                      name="mlp")(
            LayerNorm(dtype=self.dtype, name="norm2")(x), grid, deterministic)
        return x + DropPath(self.drop_path_rate)(h, deterministic=deterministic)


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping conv embed + LN (reference: :153-193)."""

    embed_dim: int
    patch_size: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        p = self.patch_size
        x = Conv3d(self.embed_dim, (p, p, p),
                   strides=(self.stride,) * 3,
                   padding=((p // 2, p // 2),) * 3, dtype=self.dtype,
                   name="proj")(x)
        grid = x.shape[1:4]
        x = x.reshape(x.shape[0], -1, self.embed_dim)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x, grid


class MixVisionTransformer3D(nn.Module):
    """4-stage SegFormer encoder; returns [stage1_tokens_as_volume, s1..s4]
    pyramid with channels embed_dim * 2^i at resolutions /4, /8, /16, /32
    (reference: :299-343; the head consumes the last 4 scales)."""

    in_chans: int = 1
    embed_dim: int = 48
    depths: Tuple[int, ...] = (3, 4, 6, 3)
    num_heads: Tuple[int, ...] = (1, 2, 4, 8)
    mlp_ratios: Tuple[float, ...] = (4.0, 4.0, 4.0, 4.0)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> List[jnp.ndarray]:
        x = x_in[0].astype(self.dtype)
        dims = [self.embed_dim * 2 ** i for i in range(len(self.depths))]
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()

        outs = []
        cur = 0
        for stage in range(len(self.depths)):
            patch = 7 if stage == 0 else 3
            stride = 4 if stage == 0 else 2
            tokens, grid = OverlapPatchEmbed(
                dims[stage], patch, stride, self.dtype,
                name=f"patch_embed{stage + 1}")(x)
            if stage == 0:
                # the reference also emits the raw stage-1 embed (:305)
                outs.append(tokens.reshape(tokens.shape[0], *grid, dims[0]))
            for i in range(self.depths[stage]):
                tokens = MixBlock(
                    dims[stage], self.num_heads[stage], self.sr_ratios[stage],
                    self.mlp_ratios[stage], self.qkv_bias, self.drop_rate,
                    self.attn_drop_rate, dpr[cur + i],
                    use_pallas=self.use_pallas, dtype=self.dtype,
                    name=f"block{stage + 1}_{i}")(tokens, grid, deterministic)
            tokens = LayerNorm(dtype=self.dtype, name=f"norm{stage + 1}")(tokens)
            x = tokens.reshape(tokens.shape[0], *grid, dims[stage])
            outs.append(x)
            cur += self.depths[stage]
        return outs
