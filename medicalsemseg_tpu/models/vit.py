"""3D Vision Transformer encoder (for UNETR) and ViT-MAE-style variant.

Covers the reference's dead/vendored ViT surface (SURVEY.md §2.2):
  * the scratch ViT inside models/segmentors/unetr.py:172-192 and MONAI's ViT
    used by unetr_official.py — a plain 3D-patch transformer that exposes
    intermediate layer outputs as skip taps;
  * models/backbones/vit_mae.py:313-445 — BEiT-style options (cls token,
    layer-scale init values).

The reference never wires these into its factory (model_builder.py), and its
default '--model UNETR_Official' silently builds None; here the name works.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medicalsemseg_tpu.models.embeddings import PatchEmbed3D
from medicalsemseg_tpu.models.layers import (
    DropPath,
    LayerNorm,
    Mlp,
    trunc_normal_init,
)

Dtype = Any


class SelfAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None  # layer-scale (ViT-MAE option)
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        c = self.dim
        if self.init_values is not None:
            g1 = self.param("gamma_1", nn.initializers.constant(self.init_values),
                            (c,), jnp.float32)
            g2 = self.param("gamma_2", nn.initializers.constant(self.init_values),
                            (c,), jnp.float32)
        else:
            g1 = g2 = 1.0
        h = SelfAttention(c, self.num_heads, self.qkv_bias, self.attn_drop,
                          self.drop, self.dtype, name="attn")(
            LayerNorm(dtype=self.dtype, name="norm1")(x), deterministic)
        x = x + DropPath(self.drop_path_rate)(g1 * h, deterministic=deterministic)
        mlp = Mlp(hidden_dim=int(c * self.mlp_ratio), dropout=self.drop,
                  dtype=self.dtype, name="mlp")
        ln2 = LayerNorm(dtype=self.dtype, name="norm2")
        from medicalsemseg_tpu.ops.pallas import absorb_enabled
        if (self.use_pallas and deterministic and x.dtype == self.dtype
                and absorb_enabled()):
            # fused LN->fc1->GELU->fc2[->+x] kernel (ops/pallas/mlp.py); the
            # global self-attention stays XLA (no windowing to tile on)
            s2, b2 = ln2(x, params_only=True)
            if self.init_values is None:
                return mlp(x, ln=(s2, b2), residual=True)
            return x + g2 * mlp(x, ln=(s2, b2))
        h = mlp(ln2(x), deterministic=deterministic)
        return x + DropPath(self.drop_path_rate)(g2 * h, deterministic=deterministic)


class ViT3D(nn.Module):
    """Plain 3D-patch transformer with intermediate-layer taps.

    __call__ returns the (B, gd, gh, gw, C) features of each layer index in
    `out_indices` (1-based, like UNETR's z3/z6/z9/z12 taps) plus the final
    normed output as the last element.
    """

    patch_size: Tuple[int, int, int] = (16, 16, 16)
    in_chans: int = 1
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    out_indices: Tuple[int, ...] = (3, 6, 9, 12)
    use_cls_token: bool = False  # ViT-MAE variant
    init_values: Optional[float] = None
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> List[jnp.ndarray]:
        vol = x_in[0].astype(self.dtype) if isinstance(x_in, (tuple, list)) else x_in
        x = PatchEmbed3D(patch_size=self.patch_size,
                         embed_dim=self.hidden_size, use_norm=False,
                         dtype=self.dtype, name="patch_embed")(vol)
        b, gd, gh, gw, c = x.shape
        tokens = x.reshape(b, -1, c)
        n = tokens.shape[1]

        pos = self.param("pos_embed", trunc_normal_init, (1, n, c), jnp.float32)
        tokens = tokens + pos.astype(self.dtype)
        if self.use_cls_token:
            cls = self.param("cls_token", trunc_normal_init, (1, 1, c),
                             jnp.float32)
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c)), tokens], 1)
        tokens = nn.Dropout(self.drop_rate)(tokens, deterministic=deterministic)

        dpr = np.linspace(0, self.drop_path_rate, self.depth).tolist()
        taps = []
        for i in range(self.depth):
            tokens = TransformerBlock(
                dim=c, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate, drop_path_rate=dpr[i],
                init_values=self.init_values, use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"blocks_{i}")(tokens, deterministic)
            if (i + 1) in self.out_indices:
                t = tokens[:, 1:] if self.use_cls_token else tokens
                taps.append(t.reshape(b, gd, gh, gw, c))
        final = LayerNorm(dtype=self.dtype, name="norm")(tokens)
        final = final[:, 1:] if self.use_cls_token else final
        taps[-1] = final.reshape(b, gd, gh, gw, c)
        return taps
