"""3D shifted-window transformer encoders (nnFormer-style Swin skeleton).

One TPU-first skeleton covers three reference encoders that differ only in
their token MLP:
  * SwinTransformerNNFormer (dense MLP)      reference: models/backbones/swin_nnformer.py:478-659
  * SwInception (inception-conv MLP)         reference: models/backbones/swinception.py:609-791
  * SwinDepth (depthwise-conv MLP)           reference: models/backbones/swindepth.py:509-691

Design notes (vs. the reference):
  * channels-last volumes everywhere; window partition/reverse are pure
    reshapes fused by XLA into the attention matmuls;
  * SW-MSA masks and relative-position index tables are compile-time NumPy
    constants (the reference rebuilds the mask on device every forward,
    swin_nnformer.py:370-395);
  * attention logits and softmax run in fp32; everything else in the compute
    dtype (bf16 by default) to keep the MXU busy;
  * stochastic depth / dropout use explicit flax RNG collections.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medicalsemseg_tpu.models.embeddings import (
    LearnedClassVectors,
    PatchEmbed3D,
    get_3d_sincos_pos_embed,
)
from medicalsemseg_tpu.models.layers import (
    Conv3d,
    DepthwiseConvMlp,
    DropPath,
    InceptionMlp,
    LayerNorm,
    Mlp,
    remat_module,
    trunc_normal_init,
)
from medicalsemseg_tpu.ops.window import (
    pad_to_multiple,
    relative_position_index,
    relative_position_index_ref_quirk,
    resolve_window,
    shift_window_attn_mask,
    window_partition,
    window_reverse,
)

Dtype = Any


def make_mlp(mlp_type: str, hidden_dim: int, dropout: float, dtype) -> nn.Module:
    if mlp_type == "dense":
        return Mlp(hidden_dim=hidden_dim, dropout=dropout, dtype=dtype)
    if mlp_type == "inception":
        return InceptionMlp(hidden_dim=hidden_dim, dropout=dropout, dtype=dtype)
    if mlp_type == "dwconv":
        return DepthwiseConvMlp(hidden_dim=hidden_dim, dropout=dropout, dtype=dtype)
    raise ValueError(f"unknown mlp_type {mlp_type!r}")


class WindowAttention(nn.Module):
    """W-MSA over (B*nW, N, C) windows with relative-position bias.

    Optional extras, matching the reference flags
    (reference: models/backbones/swin_nnformer.py:67-196):
      * affine-scaled relative position bias (voxel-spacing aware);
      * a per-window global token that attends inside every window and is
        re-projected across windows afterwards.
    """

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    n_windows: int
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    rel_pos_bias_affine: bool = False
    global_token: bool = False
    ref_quirk_index: bool = False  # reproduce the reference's colliding
    # rel-pos strides (official nnFormer, nnformer_official.py:176-177) for
    # bit-compatible checkpoint import — see ops/window.py
    dtype: Dtype = jnp.float32

    def qkv_params(self):
        """Raw projection parameters — shared by the XLA path here and the
        fused Pallas kernel (ops/pallas/window_attention.py)."""
        c = self.dim
        wqkv = self.param("qkv_kernel", trunc_normal_init, (c, 3 * c),
                          jnp.float32)
        bqkv = (self.param("qkv_bias", nn.initializers.zeros, (3 * c,),
                           jnp.float32) if self.qkv_bias else None)
        wproj = self.param("proj_kernel", trunc_normal_init, (c, c),
                           jnp.float32)
        bproj = self.param("proj_bias", nn.initializers.zeros, (c,),
                           jnp.float32)
        return wqkv, bqkv, wproj, bproj

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 affine: Optional[jnp.ndarray] = None,
                 gt: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 x_volume: Optional[jnp.ndarray] = None,
                 shift_size: int = 0,
                 ln: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 residual: bool = False):
        nh = self.num_heads
        n_attn = int(np.prod(self.window_size))

        wqkv, bqkv, wproj, bproj = self.qkv_params()
        table_size = int(np.prod([2 * w - 1 for w in self.window_size]))
        rel_table = self.param("relative_position_bias_table",
                               trunc_normal_init, (table_size, nh), jnp.float32)

        if x_volume is not None:
            # fused Pallas path: partition+qkv+attention+proj+reverse in one
            # kernel over the (already padded/rolled) volume; the trainable
            # variant carries a custom VJP (flash-style recompute backward)
            from medicalsemseg_tpu.ops.pallas.window_attention import (
                fused_window_attention,
                fused_window_attention_ln_trainable,
                fused_window_attention_trainable)

            bq = bqkv if bqkv is not None else jnp.zeros(
                (3 * self.dim,), jnp.float32)
            # ref-quirk bias index (colliding strides, for bit-compatible
            # official-nnFormer checkpoints): pre-gather the (nh, N, N) bias
            # outside the kernel — inference-only, as the trainable VJP
            # scatters dbias with the standard index
            pre_bias = None
            if self.ref_quirk_index:
                qidx = jnp.asarray(relative_position_index_ref_quirk(
                    tuple(self.window_size)))
                pre_bias = rel_table[qidx.reshape(-1)].reshape(
                    n_attn, n_attn, nh).transpose(2, 0, 1)
            if ln is not None and not deterministic:
                # absorbed form under training: custom VJP chains the LN
                # backward in-kernel (and dy->dx for the shortcut)
                out_vol = fused_window_attention_ln_trainable(
                    x_volume.astype(self.dtype), ln[0], ln[1], wqkv, bq,
                    wproj, bproj, rel_table, self.window_size[0], nh,
                    shift_size, 8, False, residual)
            elif ln is not None or residual:
                # absorbed form at inference: x_volume is the RAW (rolled)
                # volume; the kernel applies the block's pre-attention LN
                # and/or adds the shortcut in VMEM (no standalone LN/add
                # passes over HBM)
                out_vol = fused_window_attention(
                    x_volume.astype(self.dtype), wqkv, bq, wproj, bproj,
                    rel_table, self.window_size[0], nh, shift_size,
                    ln_scale=None if ln is None else ln[0],
                    ln_bias=None if ln is None else ln[1],
                    residual=residual, pre_bias=pre_bias)
            elif pre_bias is not None:
                out_vol = fused_window_attention(
                    x_volume.astype(self.dtype), wqkv, bq, wproj, bproj,
                    rel_table, self.window_size[0], nh, shift_size,
                    pre_bias=pre_bias)
            else:
                out_vol = fused_window_attention_trainable(
                    x_volume.astype(self.dtype), wqkv, bq, wproj, bproj,
                    rel_table, self.window_size[0], nh, shift_size)
            return out_vol, gt

        b_, n_tok, c = x.shape
        hd = c // nh
        scale = hd ** -0.5
        assert n_tok == n_attn

        n = n_tok
        if self.global_token:
            assert gt is not None
            batch = gt.shape[0]
            # one shared global token appended to every window (batch-major
            # window ordering matches window_partition).
            gtw = jnp.repeat(gt.reshape(batch, 1, c), self.n_windows, axis=0)
            x = jnp.concatenate([x, gtw.astype(x.dtype)], axis=1)
            n = n_tok + 1

        qkv = jnp.dot(x, wqkv.astype(self.dtype))
        if bqkv is not None:
            qkv = qkv + bqkv.astype(self.dtype)
        qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)

        index_fn = (relative_position_index_ref_quirk if self.ref_quirk_index
                    else relative_position_index)
        rel_idx = jnp.asarray(index_fn(tuple(self.window_size)))
        rel_bias = rel_table[rel_idx]  # (N, N, nh)
        rel_bias = rel_bias.transpose(2, 0, 1)[None]  # (1, nh, N, N)
        if self.global_token:
            rel_bias = jnp.pad(rel_bias, ((0, 0), (0, 0), (0, 1), (0, 1)))
        attn = attn + rel_bias

        if self.rel_pos_bias_affine and affine is not None:
            aff_table = self.param("rel_pos_bias_affine_emb", trunc_normal_init,
                                   (table_size, nh, 3), jnp.float32)
            aff_lin = nn.Dense(1, dtype=jnp.float32,
                               kernel_init=trunc_normal_init, name="rel_pos_bias_affine_lin")
            bias3 = aff_table[rel_idx]  # (N, N, nh, 3)
            # window-batch affine: (B, 3) -> (B_, 3), batch-major window order
            # (reference window_affine, swin_nnformer.py:58-64)
            win_aff = jnp.repeat(affine.astype(jnp.float32),
                                 b_ // affine.shape[0], axis=0)
            rpba = bias3[None] * win_aff[:, None, None, None, :]
            rpba = aff_lin(rpba)[..., 0]  # (B_, N0, N0, nh)
            rpba = rpba.transpose(0, 3, 1, 2)
            if self.global_token:
                rpba = jnp.pad(rpba, ((0, 0), (0, 0), (0, 1), (0, 1)))
            attn = attn + rpba

        if mask is not None:
            nw = mask.shape[0]
            m = mask.astype(jnp.float32)
            if self.global_token:
                m = jnp.pad(m, ((0, 0), (0, 1), (0, 1)))
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + m[None, :, None]
            attn = attn.reshape(b_, nh, n, n)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        out = jnp.dot(out, wproj.astype(self.dtype)) + bproj.astype(self.dtype)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

        new_gt = None
        if self.global_token:
            gt_out = out[:, n - 1, :]  # (B_ , C)
            gt_out = gt_out.reshape(-1, self.n_windows, c).transpose(0, 2, 1)
            # mix the per-window global tokens back into one (Dense over windows)
            new_gt = nn.Dense(1, dtype=self.dtype, kernel_init=trunc_normal_init,
                              name="gt_proj")(gt_out)[..., 0]  # (B, C)
            new_gt = new_gt.reshape(-1, 1, 1, c)
            out = out[:, : n - 1, :]
        return out, new_gt


class SwinBlock(nn.Module):
    """One W-MSA/SW-MSA block over a (B, D, H, W, C) volume.

    (reference: models/backbones/swin_nnformer.py:199-289)
    """

    dim: int
    input_resolution: Tuple[int, int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    rel_pos_bias_affine: bool = False
    global_token: bool = False
    mlp_type: str = "dense"
    use_pallas: bool = False
    pallas_train: bool = False
    ref_quirk_index: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, affine=None, gt=None,
                 deterministic: bool = True):
        b, d, h, w, c = x.shape
        ws, ss = resolve_window((d, h, w), self.window_size, self.shift_size)

        ln1 = LayerNorm(dtype=self.dtype)
        dp, hp, wp = (v + (-v) % ws for v in (d, h, w))
        n_windows = (dp // ws) * (hp // ws) * (wp // ws)

        attn = WindowAttention(
            dim=c, window_size=(ws, ws, ws), num_heads=self.num_heads,
            n_windows=n_windows, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            rel_pos_bias_affine=self.rel_pos_bias_affine,
            global_token=self.global_token,
            ref_quirk_index=self.ref_quirk_index, dtype=self.dtype,
            name="attn")

        # the fused Pallas kernel covers the plain path (no global token,
        # no affine bias, standard rel-pos index). Training opts in via
        # pallas_train (custom VJP; gradient-verified); a block joins only
        # if its backward kernel fits scoped VMEM — the flagship's stage 4
        # (c=384, 24 heads) does not (25.14M vs the 16M limit) and keeps
        # the XLA backward, which is cheap there (8 windows).
        if not deterministic and self.pallas_train:
            from medicalsemseg_tpu.ops.pallas.window_attention import (
                pallas_train_fits)
            train_fuse = (self.attn_drop == 0.0 and self.drop == 0.0
                          and pallas_train_fits(c, self.num_heads, ws))
            train_absorb = train_fuse and pallas_train_fits(
                c, self.num_heads, ws, ln=True)
        else:
            train_fuse = train_absorb = False
        fuse = (self.use_pallas and not self.global_token
                and not self.rel_pos_bias_affine
                # quirk-index blocks fuse at inference (bias pre-gathered
                # with the colliding-stride index, passed via pre_bias);
                # the trainable VJP scatters dbias with the standard index,
                # so quirk training keeps the XLA path
                and (deterministic or not self.ref_quirk_index)
                and (deterministic or train_fuse))
        # LN(+residual) absorption: valid when no window padding is needed
        # (zero-padding RAW tokens would LN to `bias`, not 0). The kernel
        # then computes x + attn(LN(x)) in one pass — the standalone LN and
        # the shortcut add each saved a full HBM round-trip over the volume
        # (and, under training, the same again in the backward). The
        # shortcut stays outside when DropPath is live.
        from medicalsemseg_tpu.ops.pallas import absorb_enabled
        absorb = (fuse and (deterministic or train_absorb)
                  and (dp, hp, wp) == (d, h, w) and x.dtype == self.dtype
                  and absorb_enabled())
        if absorb:
            res_in = deterministic or self.drop_path_rate == 0.0
            scale, bias = ln1(x, params_only=True)
            xr = (jnp.roll(x, shift=(-ss, -ss, -ss), axis=(1, 2, 3))
                  if ss > 0 else x)
            xn, gt = attn(None, gt=gt, deterministic=deterministic,
                          x_volume=xr, shift_size=ss, ln=(scale, bias),
                          residual=res_in)
            out = (jnp.roll(xn, shift=(ss, ss, ss), axis=(1, 2, 3))
                   if ss > 0 else xn)
            if res_in:
                x = out
            else:
                x = x + DropPath(self.drop_path_rate)(
                    out, deterministic=deterministic)
        else:
            shortcut = x
            xn = ln1(x)
            xn = pad_to_multiple(xn, (ws, ws, ws))
            if ss > 0:
                xn = jnp.roll(xn, shift=(-ss, -ss, -ss), axis=(1, 2, 3))
            if fuse:
                xn, gt = attn(None, gt=gt, deterministic=deterministic,
                              x_volume=xn, shift_size=ss)
            else:
                mask = (shift_window_attn_mask((dp, hp, wp), ws, ss)
                        if ss > 0 else None)
                x_win = window_partition(xn, ws)  # (B*nW, ws³, C)
                x_win, gt = attn(x_win, mask=mask, affine=affine, gt=gt,
                                 deterministic=deterministic)
                xn = window_reverse(x_win, ws, (dp, hp, wp))
            if ss > 0:
                xn = jnp.roll(xn, shift=(ss, ss, ss), axis=(1, 2, 3))
            if (dp, hp, wp) != (d, h, w):
                xn = xn[:, :d, :h, :w, :]
            x = shortcut + DropPath(self.drop_path_rate)(
                xn, deterministic=deterministic)

        ln2 = LayerNorm(dtype=self.dtype)
        mlp = make_mlp(self.mlp_type, int(c * self.mlp_ratio), self.drop, self.dtype)
        if not deterministic and self.pallas_train and self.mlp_type == "dense":
            from medicalsemseg_tpu.ops.pallas.mlp import fused_mlp_train_fits
            mlp_train_fuse = (self.drop == 0.0 and fused_mlp_train_fits(
                c, int(c * self.mlp_ratio)))
        else:
            mlp_train_fuse = False
        if (self.use_pallas and self.mlp_type == "dense"
                and x.dtype == self.dtype
                and (deterministic or mlp_train_fuse)
                and absorb_enabled()):
            # LN -> fc1 -> GELU -> fc2 -> +residual as ONE fused kernel over
            # VMEM token tiles (ops/pallas/mlp.py); training goes through
            # the custom VJP, with the shortcut outside when DropPath lives
            scale2, bias2 = ln2(x, params_only=True)
            res_in = deterministic or self.drop_path_rate == 0.0
            out = mlp(x.reshape(b, d * h * w, c), deterministic=deterministic,
                      grid=(d, h, w), ln=(scale2, bias2),
                      residual=res_in).reshape(b, d, h, w, c)
            if res_in:
                x = out
            else:
                x = x + DropPath(self.drop_path_rate)(
                    out, deterministic=deterministic)
        else:
            mlp_in = ln2(x).reshape(b, d * h * w, c)
            mlp_out = mlp(mlp_in, deterministic=deterministic, grid=(d, h, w))
            mlp_out = mlp_out.reshape(b, d, h, w, c)
            x = x + DropPath(self.drop_path_rate)(
                mlp_out, deterministic=deterministic)
        return x, gt


class PatchMerging(nn.Module):
    """GELU -> LN -> 3³ stride-2 conv doubling channels
    (reference: models/backbones/swin_nnformer.py:292-312)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.gelu(x, approximate=False)
        x = LayerNorm(dtype=self.dtype)(x)
        return Conv3d(2 * self.dim, (3, 3, 3), strides=(2, 2, 2),
                      padding=((1, 1), (1, 1), (1, 1)), dtype=self.dtype,
                      name="reduction")(x)


class BasicLayer(nn.Module):
    """A stage: `depth` alternating W-MSA / SW-MSA blocks + patch merging
    (reference: models/backbones/swin_nnformer.py:315-405)."""

    dim: int
    input_resolution: Tuple[int, int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rates: Sequence[float] = (0.0,)
    rel_pos_bias_affine: bool = False
    global_token: bool = False
    mlp_type: str = "dense"
    use_pallas: bool = False
    pallas_train: bool = False
    ref_quirk_index: bool = False
    remat: Any = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, affine=None, gt=None,
                 deterministic: bool = True):
        # rematerialize block activations to trade FLOPs for HBM during
        # training (jax.checkpoint; enables bigger crop batches per chip)
        block_cls = remat_module(SwinBlock, self.remat, static_argnums=(4,))
        for i in range(self.depth):
            x, gt = block_cls(
                dim=self.dim, input_resolution=self.input_resolution,
                num_heads=self.num_heads, window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop, attn_drop=self.attn_drop,
                drop_path_rate=self.drop_path_rates[i],
                rel_pos_bias_affine=self.rel_pos_bias_affine,
                global_token=self.global_token, mlp_type=self.mlp_type,
                use_pallas=self.use_pallas, pallas_train=self.pallas_train,
                ref_quirk_index=self.ref_quirk_index,
                dtype=self.dtype, name=f"blocks_{i}")(
                    x, affine, gt, deterministic)
        x_down = PatchMerging(dim=self.dim, dtype=self.dtype, name="downsample")(x)
        if self.global_token and gt is not None:
            gt = nn.Dense(2 * self.dim, dtype=self.dtype,
                          kernel_init=trunc_normal_init, name="gt_upsample")(gt)
        return x, x_down, gt


class SwinEncoder3D(nn.Module):
    """The nnFormer-style hierarchical encoder.

    __call__ takes the reference's tuple input contract
    (volume, rel_crop_loc, affine_xyz) (reference: swin_nnformer.py:609-612;
    engine/train.py:58) with channels-last volume (B, D, H, W, C) and returns
    the 5-scale pyramid [stem, s1, s2, s3, s4] where s_i is the LayerNorm of
    the *downsampled* stage output (reference: swin_nnformer.py:650-658).
    """

    patch_size: Tuple[int, int, int] = (2, 2, 2)
    in_chans: int = 1
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_sizes: Tuple[int, ...] = (6, 6, 6, 6)
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    mlp_type: str = "dense"
    # encoder options (reference flags, utils/arguments.py:57-122)
    use_learned_cls_vectors: bool = False
    lcv_transform: Optional[Callable] = None
    lcv_vector_dim: int = 6
    lcv_sincos_emb: bool = False
    lcv_final_layer: bool = False
    lcv_concat_vector: bool = False
    lcv_only: bool = False
    lcv_linear_comb: bool = False
    lcv_patch_voxel_mean: bool = False
    rel_crop_pos_emb: bool = False
    rel_pos_bias_affine: bool = False
    use_abs_pos_emb: bool = False
    global_token: bool = False
    use_pallas: bool = False
    pallas_train: bool = False
    remat: Any = "none"
    dtype: Dtype = jnp.float32

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> List[int]:
        return [int(self.embed_dim * 2 ** (i + 1)) for i in range(self.num_layers)]

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> List[jnp.ndarray]:
        vol, crop_loc, affine = x_in
        vol = vol.astype(self.dtype)

        pe_dim = self.embed_dim
        x_cls = None
        if self.use_learned_cls_vectors:
            lcv_out = self.lcv_vector_dim if self.lcv_concat_vector else self.embed_dim
            if self.lcv_concat_vector:
                pe_dim = self.embed_dim - lcv_out
            x_cls = LearnedClassVectors(
                patch_size=self.patch_size, out_dim=lcv_out,
                vector_dim=self.lcv_vector_dim,
                intensity_transform=self.lcv_transform,
                sincos_emb=self.lcv_sincos_emb, final_layer=self.lcv_final_layer,
                concat_vector=self.lcv_concat_vector,
                linear_comb=self.lcv_linear_comb,
                patch_voxel_mean=self.lcv_patch_voxel_mean,
                dtype=self.dtype, name="lcv")(vol)

        if self.lcv_only:
            x = x_cls
        else:
            x = PatchEmbed3D(patch_size=self.patch_size, embed_dim=pe_dim,
                             use_norm=self.patch_norm, dtype=self.dtype,
                             name="patch_embed")(vol)
            if x_cls is not None:
                if self.lcv_concat_vector:
                    x = jnp.concatenate([x, x_cls], axis=-1)
                else:
                    x = x + x_cls

        if self.rel_crop_pos_emb and crop_loc is not None:
            rcpe = nn.Dense(self.embed_dim, dtype=self.dtype,
                            kernel_init=trunc_normal_init,
                            name="rel_crop_pos_emb")(crop_loc.astype(self.dtype))
            x = x + rcpe[:, None, None, None, :]

        gt = None
        if self.global_token:
            gt_param = self.param("global_token", trunc_normal_init,
                                  (1, 1, 1, self.embed_dim), jnp.float32)
            gt = jnp.broadcast_to(gt_param, (x.shape[0],) + gt_param.shape[1:])
            gt = gt.astype(self.dtype)

        outputs = [x]

        if self.use_abs_pos_emb:
            grid = x.shape[1:4]
            table = get_3d_sincos_pos_embed(self.embed_dim, tuple(grid))
            x = x + jnp.asarray(table.reshape(grid + (self.embed_dim,)),
                                dtype=x.dtype)

        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        grid0 = x.shape[1:4]
        for i in range(self.num_layers):
            res_i = tuple(g // (2 ** i) for g in grid0)
            x_out, x, gt = BasicLayer(
                dim=int(self.embed_dim * 2 ** i), input_resolution=res_i,
                depth=self.depths[i], num_heads=self.num_heads[i],
                window_size=self.window_sizes[i], mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rates=dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])],
                rel_pos_bias_affine=self.rel_pos_bias_affine,
                global_token=self.global_token, mlp_type=self.mlp_type,
                use_pallas=self.use_pallas, pallas_train=self.pallas_train,
                remat=self.remat,
                dtype=self.dtype, name=f"layers_{i}")(
                    x, affine=affine, gt=gt, deterministic=deterministic)
            # the reference norms the *downsampled* tensor as the stage output
            # (swin_nnformer.py:653-658)
            outputs.append(LayerNorm(dtype=self.dtype, name=f"norm{i}")(x))
        return outputs
