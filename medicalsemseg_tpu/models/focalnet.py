"""FocalNet 3D encoder (attention-free focal modulation).

Reference: models/backbones/focalnet_3d.py:318-476 — PatchEmbed3D stem,
stages of FocalModulationBlocks (hierarchical depthwise-conv context
aggregation, gated sum, query * h(context)), PatchEmbed3D(patch 2) as the
stage downsampler, per-stage LayerNorm of the downsampled output.

All compute is convs + elementwise — XLA fuses the gate/sum/modulation chain
into the depthwise convolutions; everything runs in the compute dtype.
(The reference's vestigial time.time() instrumentation, :451/:470, is not
reproduced.)
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medicalsemseg_tpu.models.embeddings import PatchEmbed3D
from medicalsemseg_tpu.models.layers import (
    Conv3d,
    DropPath,
    LayerNorm,
    Mlp,
    trunc_normal_init,
)

Dtype = Any


class FocalModulation(nn.Module):
    """f: Linear -> (q, ctx, gates); hierarchical dw-conv context + global
    mean context, gated sum; out = q * h(ctx) (reference: :39-106)."""

    dim: int
    focal_level: int = 2
    focal_window: int = 7
    focal_factor: int = 2
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c = self.dim
        y = nn.Dense(2 * c + self.focal_level + 1, use_bias=True,
                     dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="f")(x)
        q, ctx, gates = jnp.split(y, [c, 2 * c], axis=-1)

        ctx_all = jnp.zeros_like(ctx)
        for k in range(self.focal_level):
            ks = self.focal_factor * k + self.focal_window
            ctx = Conv3d(c, (ks, ks, ks), feature_group_count=c,
                         use_bias=False, dtype=self.dtype,
                         name=f"focal_layers_{k}")(ctx)
            ctx = nn.gelu(ctx, approximate=False)
            ctx_all = ctx_all + ctx * gates[..., k:k + 1]
        ctx_global = nn.gelu(ctx.mean(axis=(1, 2, 3), keepdims=True),
                             approximate=False)
        ctx_all = ctx_all + ctx_global * gates[..., self.focal_level:]

        h = Conv3d(c, (1, 1, 1), use_bias=True, dtype=self.dtype, name="h")(ctx_all)
        out = q * h
        out = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class FocalModulationBlock(nn.Module):
    """LN -> focal modulation -> LN -> MLP (reference: :109-175)."""

    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path_rate: float = 0.0
    focal_level: int = 2
    focal_window: int = 9
    use_layerscale: bool = False
    layerscale_value: float = 1e-4
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, d, h, w, c = x.shape
        if self.use_layerscale:
            g1 = self.param("gamma_1",
                            nn.initializers.constant(self.layerscale_value),
                            (c,), jnp.float32)
            g2 = self.param("gamma_2",
                            nn.initializers.constant(self.layerscale_value),
                            (c,), jnp.float32)
        else:
            g1 = g2 = 1.0

        shortcut = x
        xn = LayerNorm(dtype=self.dtype, name="norm1")(x)
        xn = FocalModulation(dim=c, focal_level=self.focal_level,
                             focal_window=self.focal_window,
                             proj_drop=self.drop, dtype=self.dtype,
                             name="modulation")(xn, deterministic)
        x = shortcut + DropPath(self.drop_path_rate)(
            g1 * xn, deterministic=deterministic)

        ln2 = LayerNorm(dtype=self.dtype, name="norm2")
        mlp = Mlp(hidden_dim=int(c * self.mlp_ratio), dropout=self.drop,
                  dtype=self.dtype, name="mlp")
        from medicalsemseg_tpu.ops.pallas import absorb_enabled
        if (self.use_pallas and deterministic and x.dtype == self.dtype
                and absorb_enabled()):
            # fused LN->fc1->GELU->fc2[->+x] kernel (ops/pallas/mlp.py)
            s2, b2 = ln2(x, params_only=True)
            if not self.use_layerscale:
                return mlp(x.reshape(b, -1, c), ln=(s2, b2),
                           residual=True).reshape(b, d, h, w, c)
            h_out = mlp(x.reshape(b, -1, c),
                        ln=(s2, b2)).reshape(b, d, h, w, c)
            return x + g2 * h_out
        mlp_in = ln2(x).reshape(b, -1, c)
        mlp_out = mlp(mlp_in, deterministic=deterministic).reshape(
            b, d, h, w, c)
        return x + DropPath(self.drop_path_rate)(
            g2 * mlp_out, deterministic=deterministic)


class FocalNet3D(nn.Module):
    """Tuple-input encoder; 5-scale channels-last pyramid
    (reference: :318-476)."""

    patch_size: Tuple[int, int, int] = (2, 2, 2)
    in_chans: int = 1
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    focal_levels: Tuple[int, ...] = (2, 2, 2, 2)
    focal_windows: Tuple[int, ...] = (9, 9, 9, 9)
    use_layerscale: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> List[jnp.ndarray]:
        vol = x_in[0].astype(self.dtype)
        x = PatchEmbed3D(patch_size=self.patch_size, embed_dim=self.embed_dim,
                         use_norm=self.patch_norm, dtype=self.dtype,
                         name="patch_embed")(vol)
        outputs = [x]
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        for i in range(len(self.depths)):
            dim = int(self.embed_dim * 2 ** i)
            for j in range(self.depths[i]):
                x = FocalModulationBlock(
                    dim=dim, mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                    drop_path_rate=dpr[sum(self.depths[:i]) + j],
                    focal_level=self.focal_levels[i],
                    focal_window=self.focal_windows[i],
                    use_layerscale=self.use_layerscale,
                    use_pallas=self.use_pallas, dtype=self.dtype,
                    name=f"layers_{i}_blocks_{j}")(x, deterministic)
            # stage downsampler: PatchEmbed3D(patch 2) with norm
            # (reference BasicLayer downsample, :231-238)
            x = PatchEmbed3D(patch_size=(2, 2, 2), embed_dim=2 * dim,
                             use_norm=True, dtype=self.dtype,
                             name=f"layers_{i}_downsample")(x)
            outputs.append(LayerNorm(dtype=self.dtype, name=f"norm{i}")(x))
        return outputs
