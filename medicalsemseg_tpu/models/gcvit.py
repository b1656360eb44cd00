"""GC-ViT 3D encoder (global-context vision transformer).

Reference: models/backbones/gc_vit_3d.py:549-637 — conv stem (3³ stride-2),
stages alternating local WindowAttention3D and global WindowAttentionGlobal3D
(global queries from a FeatExtract downsampling pyramid, local K/V), SE
blocks, ReduceSize downsampling. Returns the 5-scale pyramid
[stem@R/2, s1@R/4, ..., s4@R/32].

Deviations from the reference (both documented reference quirks, fixed here):
  * rel-pos bias indexing uses the standard (2w-1)-strided index table; the
    reference uses strides (3w-1, 2w-1) (gc_vit_3d.py:209-210) which collides
    table entries;
  * global queries broadcast per batch element (the reference's
    q_global.repeat tiles across the batch, mixing samples when B > 1,
    gc_vit_3d.py:361-366).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medicalsemseg_tpu.models.layers import (
    Conv3d,
    DropPath,
    LayerNorm,
    Mlp,
    trunc_normal_init,
)
from medicalsemseg_tpu.ops.window import (
    relative_position_index,
    relative_position_index_ref_quirk,
    window_partition,
    window_reverse,
)

Dtype = Any


class SE(nn.Module):
    """Squeeze-excitation gate (reference: gc_vit_3d.py:37-52)."""

    dim: int
    expansion: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x.mean(axis=(1, 2, 3))  # (B, C)
        y = nn.Dense(int(self.dim * self.expansion), use_bias=False,
                     dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, None, :]


class _ConvSE(nn.Module):
    """dwconv3 + GELU + SE + 1x1 residual branch (shared by FeatExtract /
    ReduceSize, reference: gc_vit_3d.py:55-116)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Conv3d(self.dim, (3, 3, 3), feature_group_count=self.dim,
                   use_bias=False, dtype=self.dtype)(x)
        h = nn.gelu(h, approximate=False)
        h = SE(self.dim, dtype=self.dtype)(h)
        h = Conv3d(self.dim, (1, 1, 1), use_bias=False, dtype=self.dtype)(h)
        return x + h


class FeatExtract(nn.Module):
    """conv-SE residual + optional 3³ maxpool (reference: :97-116).

    pool_strides generalizes the reference's fixed stride-2 pooling to
    per-axis strides (stride-1 axes keep their size: k=3, pad 1) so
    anisotropic feature maps can be reduced toward a cubic ws³ query grid.
    """

    dim: int
    keep_dim: bool = False
    pool_strides: Tuple[int, int, int] = (2, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _ConvSE(self.dim, dtype=self.dtype)(x)
        if not self.keep_dim:
            x = nn.max_pool(x, (3, 3, 3), strides=self.pool_strides,
                            padding=((1, 1), (1, 1), (1, 1)))
        return x


class ReduceSize(nn.Module):
    """LN -> conv-SE residual -> 3³/s2 conv (2x channels) -> LN
    (reference: :55-82)."""

    dim: int
    keep_dim: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_dim = self.dim if self.keep_dim else 2 * self.dim
        x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = _ConvSE(self.dim, dtype=self.dtype)(x)
        x = Conv3d(out_dim, (3, 3, 3), strides=(2, 2, 2),
                   padding=((1, 1), (1, 1), (1, 1)), use_bias=False,
                   dtype=self.dtype, name="reduction")(x)
        return LayerNorm(dtype=self.dtype, name="norm2")(x)


class GCWindowAttention(nn.Module):
    """Local or global windowed attention with rel-pos bias
    (reference: :182-380).

    The local path exposes its raw projection parameters (qkv_kernel, ...)
    so the fused Pallas window-attention kernel
    (ops/pallas/window_attention.py) can consume them directly via the
    ``x_volume`` fast path — the same pattern as models/swin.WindowAttention.
    The global path (queries from the FeatExtract pyramid) has its own fused
    kernel (fused_global_window_attention: kv dense + global-query attention
    + proj in one VMEM pass), with the params kept under the nn.Dense names
    (attn/qkv/*, attn/proj/*) via _DenseParams.
    """

    dim: int
    num_heads: int
    window_size: int
    use_global: bool = False
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    ref_quirk_index: bool = False  # reproduce the reference's colliding
    # rel-pos strides for bit-compatible checkpoint import (ops/window.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray],
                 q_global: Optional[jnp.ndarray],
                 deterministic: bool = True,
                 x_volume: Optional[jnp.ndarray] = None,
                 ln: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 residual: bool = False) -> jnp.ndarray:
        nh = self.num_heads
        c = self.dim
        hd = c // nh
        scale = hd ** -0.5
        ws = self.window_size

        table_size = (2 * ws - 1) ** 3
        table = self.param("relative_position_bias_table", trunc_normal_init,
                           (table_size, nh), jnp.float32)

        # ref-quirk bias for the fused kernels: pre-gathered outside with
        # the colliding-stride index (the kernels gather the standard index
        # themselves when pre_bias is None)
        pre_bias = None
        if self.ref_quirk_index and x_volume is not None:
            n_q = ws ** 3
            qidx = jnp.asarray(
                relative_position_index_ref_quirk((ws, ws, ws)))
            pre_bias = table[qidx.reshape(-1)].reshape(
                n_q, n_q, nh).transpose(2, 0, 1)

        if self.use_global:
            from medicalsemseg_tpu.models.layers import _DenseParams

            # raw kernel/bias leaves under the names an nn.Dense would own
            # (attn/qkv/*, attn/proj/*) so checkpoints are unchanged and the
            # fused kernel can consume the arrays directly
            wkv, bkv = _DenseParams(c, 2 * c, use_bias=self.qkv_bias,
                                    name="qkv")()
            wproj_g, bproj_g = _DenseParams(c, c, name="proj")()

            if x_volume is not None:
                # fused Pallas path: kv dense + global-query attention +
                # proj (+ optional absorbed LN/shortcut) in one kernel
                from medicalsemseg_tpu.ops.pallas.window_attention import (
                    fused_global_window_attention)

                return fused_global_window_attention(
                    x_volume.astype(self.dtype), q_global, wkv, bkv,
                    wproj_g, bproj_g, table, ws, nh,
                    ln_scale=None if ln is None else ln[0],
                    ln_bias=None if ln is None else ln[1],
                    residual=residual, pre_bias=pre_bias)

            b_, n, _ = x.shape
            kv = jnp.dot(x, wkv.astype(self.dtype))
            if bkv is not None:
                kv = kv + bkv.astype(self.dtype)
            kv = kv.reshape(b_, n, 2, nh, hd).transpose(2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            # broadcast per batch element (fixing the reference's
            # sample-mixing tile, gc_vit_3d.py:361-366)
            bsz = q_global.shape[0]
            qg = jnp.repeat(q_global, b_ // bsz, axis=0)  # (B_, ws,ws,ws,C)
            q = qg.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)
        else:
            wqkv = self.param("qkv_kernel", trunc_normal_init, (c, 3 * c),
                              jnp.float32)
            bqkv = (self.param("qkv_bias", nn.initializers.zeros, (3 * c,),
                               jnp.float32) if self.qkv_bias else None)
            wproj = self.param("proj_kernel", trunc_normal_init, (c, c),
                               jnp.float32)
            bproj = self.param("proj_bias", nn.initializers.zeros, (c,),
                               jnp.float32)

            if x_volume is not None:
                # fused Pallas path: partition+qkv+attention+proj+reverse in
                # one kernel over the (ws-divisible) volume; no shift/mask
                from medicalsemseg_tpu.ops.pallas.window_attention import (
                    fused_window_attention,
                    fused_window_attention_ln_trainable,
                    fused_window_attention_trainable)

                bq = bqkv if bqkv is not None else jnp.zeros(
                    (3 * c,), jnp.float32)
                if ln is not None and not deterministic:
                    # absorbed form under training: the custom VJP chains the
                    # LN backward in-kernel (same as models/swin.py)
                    return fused_window_attention_ln_trainable(
                        x_volume.astype(self.dtype), ln[0], ln[1], wqkv, bq,
                        wproj, bproj, table, ws, nh, 0, 8, False, residual)
                if deterministic and (ln is not None or residual
                                      or pre_bias is not None):
                    # absorbed/quirk form at inference (see models/swin.py)
                    return fused_window_attention(
                        x_volume.astype(self.dtype), wqkv, bq, wproj, bproj,
                        table, ws, nh, 0,
                        ln_scale=None if ln is None else ln[0],
                        ln_bias=None if ln is None else ln[1],
                        residual=residual, pre_bias=pre_bias)
                return fused_window_attention_trainable(
                    x_volume.astype(self.dtype), wqkv, bq, wproj, bproj,
                    table, ws, nh, 0)

            b_, n, _ = x.shape
            qkv = jnp.dot(x, wqkv.astype(self.dtype))
            if bqkv is not None:
                qkv = qkv + bqkv.astype(self.dtype)
            qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        index_fn = (relative_position_index_ref_quirk if self.ref_quirk_index
                    else relative_position_index)
        idx = jnp.asarray(index_fn((ws, ws, ws)))
        attn = attn + table[idx].transpose(2, 0, 1)[None]

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        if self.use_global:
            out = jnp.dot(out, wproj_g.astype(self.dtype)) + bproj_g.astype(
                self.dtype)
        else:
            out = jnp.dot(out, wproj.astype(self.dtype)) + bproj.astype(
                self.dtype)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class GCViTBlock(nn.Module):
    """LN -> (local|global) window attention -> LN -> MLP
    (reference: :410-464)."""

    dim: int
    num_heads: int
    window_size: int
    use_global: bool
    mlp_ratio: float = 3.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    layer_scale: Optional[float] = None
    use_pallas: bool = False
    pallas_train: bool = False
    ref_quirk_index: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, q_global, deterministic: bool = True):
        b, d, h, w, c = x.shape
        ws = min(self.window_size, d, h, w)
        ln1 = LayerNorm(dtype=self.dtype, name="norm1")
        attn = GCWindowAttention(
            dim=c, num_heads=self.num_heads, window_size=ws,
            use_global=self.use_global, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            ref_quirk_index=self.ref_quirk_index, dtype=self.dtype,
            name="attn")
        # the fused kernels cover BOTH the local and the global-query paths
        # at inference (incl. quirk mode — the colliding-stride bias is
        # pre-gathered and fed via pre_bias). Round-4: the LOCAL path also
        # trains through the custom-VJP kernels (pallas_train, same gating
        # as models/swin.py SwinBlock — dropout 0, backward fits scoped
        # VMEM, standard bias index). The GLOBAL-query kernel has no
        # backward kernel and keeps the XLA train path (its q comes from
        # the shared FeatExtract pyramid — dq accumulates across every
        # window, a different scratch shape than the head-split machinery).
        if (not deterministic and self.pallas_train and not self.use_global
                and not self.ref_quirk_index):
            from medicalsemseg_tpu.ops.pallas.window_attention import (
                pallas_train_fits)
            train_fuse = (self.attn_drop == 0.0 and self.drop == 0.0
                          and pallas_train_fits(c, self.num_heads, ws))
            train_absorb = (train_fuse and self.layer_scale is None
                            and pallas_train_fits(c, self.num_heads, ws,
                                                  ln=True))
        else:
            train_fuse = train_absorb = False
        fuse = (self.use_pallas and (deterministic or train_fuse)
                and d % ws == 0 and h % ws == 0 and w % ws == 0)
        # with no layer-scale the kernel also absorbs LN1 and the shortcut
        # (see models/swin.py SwinBlock)
        from medicalsemseg_tpu.ops.pallas import absorb_enabled
        absorb = (fuse and self.layer_scale is None
                  and (deterministic or train_absorb)
                  and x.dtype == self.dtype and absorb_enabled())

        if self.layer_scale is not None:
            g1 = self.param("gamma1", nn.initializers.constant(self.layer_scale),
                            (c,), jnp.float32)
            g2 = self.param("gamma2", nn.initializers.constant(self.layer_scale),
                            (c,), jnp.float32)
        else:
            g1 = g2 = 1.0

        if absorb:
            # the in-kernel shortcut add is exact only when DropPath is
            # inactive (inference, or drop_path_rate == 0 under training)
            res_in = deterministic or self.drop_path_rate == 0.0
            s1, b1 = ln1(x, params_only=True)
            out = attn(None, q_global, deterministic, x_volume=x,
                       ln=(s1, b1), residual=res_in)
            if res_in:
                x = out
            else:
                x = x + DropPath(self.drop_path_rate)(
                    out, deterministic=deterministic)
        else:
            shortcut = x
            xn = ln1(x)
            if fuse:
                xn = attn(None, q_global, deterministic, x_volume=xn)
            else:
                wins = window_partition(xn, ws)
                wins = attn(wins, q_global, deterministic)
                xn = window_reverse(wins, ws, (d, h, w))
            x = shortcut + DropPath(self.drop_path_rate)(
                g1 * xn, deterministic=deterministic)

        mlp = Mlp(hidden_dim=int(c * self.mlp_ratio), dropout=self.drop,
                  dtype=self.dtype, name="mlp")
        ln2 = LayerNorm(dtype=self.dtype, name="norm2")
        if not deterministic and self.pallas_train:
            from medicalsemseg_tpu.ops.pallas.mlp import fused_mlp_train_fits
            mlp_train_fuse = (self.drop == 0.0 and fused_mlp_train_fits(
                c, int(c * self.mlp_ratio)))
        else:
            mlp_train_fuse = False
        if (self.use_pallas and (deterministic or mlp_train_fuse)
                and x.dtype == self.dtype and absorb_enabled()):
            s2, b2 = ln2(x, params_only=True)
            if self.layer_scale is None:
                res_in = deterministic or self.drop_path_rate == 0.0
                out = mlp(x.reshape(b, -1, c), deterministic=deterministic,
                          ln=(s2, b2), residual=res_in).reshape(b, d, h, w, c)
                if res_in:
                    return out
                return x + DropPath(self.drop_path_rate)(
                    out, deterministic=deterministic)
            # layer-scale keeps the scaled add outside; the LN + both
            # projections + GELU still fuse
            h_out = mlp(x.reshape(b, -1, c), deterministic=deterministic,
                        ln=(s2, b2)).reshape(b, d, h, w, c)
            return x + DropPath(self.drop_path_rate)(
                g2 * h_out, deterministic=deterministic)
        h_out = mlp(ln2(x).reshape(b, -1, c),
                    deterministic=deterministic).reshape(b, d, h, w, c)
        return x + DropPath(self.drop_path_rate)(
            g2 * h_out, deterministic=deterministic)


class GCViTLayer(nn.Module):
    """One stage: global-query pyramid + alternating local/global blocks +
    ReduceSize (reference: :467-546)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 3.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rates: Tuple[float, ...] = (0.0,)
    layer_scale: Optional[float] = None
    use_pallas: bool = False
    pallas_train: bool = False
    ref_quirk_index: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        ws = min(self.window_size, min(x.shape[1:4]))
        # reduce the feature map down to ws³ for the global queries,
        # per axis (generalizes the reference's hardcoded cubic resolution
        # cases, :503-531, to anisotropic bucket-padded grids)
        q = x
        n_per_axis = [max(int(np.floor(np.log2(max(s // ws, 1)))), 0)
                      for s in x.shape[1:4]]
        n_steps = max(n_per_axis)
        if n_steps == 0:
            q = FeatExtract(self.dim, keep_dim=True, dtype=self.dtype,
                            name="to_q_global_0")(q)
        else:
            for i in range(n_steps):
                pool = tuple(2 if i < n_per_axis[a] else 1 for a in range(3))
                q = FeatExtract(self.dim, keep_dim=False, pool_strides=pool,
                                dtype=self.dtype, name=f"to_q_global_{i}")(q)
        if q.shape[1:4] != (ws, ws, ws):
            # non-power-of-two axis ratios: exact trilinear resize to ws³
            q = jax.image.resize(
                q, (q.shape[0], ws, ws, ws, q.shape[-1]), "linear")

        for i in range(self.depth):
            x = GCViTBlock(
                dim=self.dim, num_heads=self.num_heads, window_size=ws,
                use_global=(i % 2 == 1), mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path_rate=self.drop_path_rates[i],
                layer_scale=self.layer_scale, use_pallas=self.use_pallas,
                pallas_train=self.pallas_train,
                ref_quirk_index=self.ref_quirk_index, dtype=self.dtype,
                name=f"blocks_{i}")(x, q, deterministic)
        return ReduceSize(dim=self.dim, dtype=self.dtype, name="downsample")(x)


class GCViT3D(nn.Module):
    """The full encoder; tuple-input contract, 5-scale channels-last pyramid
    (reference: :549-637)."""

    in_chans: int = 1
    dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_sizes: Tuple[int, ...] = (6, 6, 6, 6)
    mlp_ratio: float = 3.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    layer_scale: Optional[float] = None
    use_pallas: bool = False
    pallas_train: bool = False
    ref_quirk_index: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> List[jnp.ndarray]:
        vol = x_in[0].astype(self.dtype)
        # conv stem: 3³ stride-2 (reference PatchEmbed, :85-95)
        x = Conv3d(self.dim, (3, 3, 3), strides=(2, 2, 2),
                   padding=((1, 1), (1, 1), (1, 1)), dtype=self.dtype,
                   name="patch_embed")(vol)
        outputs = [x]
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        num_features = [int(self.dim * 2 ** (i + 1))
                        for i in range(len(self.depths))]
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        for i in range(len(self.depths)):
            x = GCViTLayer(
                dim=int(self.dim * 2 ** i), depth=self.depths[i],
                num_heads=self.num_heads[i], window_size=self.window_sizes[i],
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path_rates=tuple(
                    dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])]),
                layer_scale=self.layer_scale, use_pallas=self.use_pallas,
                ref_quirk_index=self.ref_quirk_index, dtype=self.dtype,
                name=f"levels_{i}")(x, deterministic)
            outputs.append(LayerNorm(dtype=self.dtype, name=f"norm{i}")(x))
        return outputs
