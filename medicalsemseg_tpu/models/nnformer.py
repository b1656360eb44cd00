"""nnFormer (official): symmetric Swin encoder-decoder with cross-attention
skip fusion and deep supervision.

Re-derivation of the reference's vendored official nnFormer
(models/segmentors/nnformer_official/nnformer_official.py:918-978 — dead code
there, SURVEY.md §2.2):
  * Encoder: two-stage conv stem ('project' blocks, :408-476), Swin stages
    with conv PatchMerging, per-stage normed skip outputs;
  * Decoder: Patch_Expanding (LN + ConvTranspose k2 s2 halving channels,
    :414-434), x = up + skip, then a stage whose FIRST block is
    SwinTransformerBlock_kv — window attention with K/V from the skip and Q
    from the upsampled path (:56-221) — followed by standard shifted blocks;
  * deep supervision: a ConvTranspose(patch) head per decoder scale
    (:906-915, wiring :952-978).

Deviation (documented): rel-pos index tables use the standard (2w-1) strides
by default; the reference's (3w-1, 2w-1) strides collide table entries (same
quirk as its GC-ViT). ``ref_quirk_index=True`` (--ref_quirk_rel_pos)
reproduces the reference indexing in EVERY attention block — the cross
blocks, the regular encoder/decoder SwinBlocks (nnformer_official.py:254-255
uses the same colliding strides), and GC-ViT — for bit-compatible checkpoint
import. The stem uses total stride == patch_size (the reference's stride
arithmetic only yields that for patch 2, its shipped configuration).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medicalsemseg_tpu.models.layers import (
    Conv3d,
    ConvTranspose3d,
    DropPath,
    LayerNorm,
    Mlp,
    trunc_normal_init,
)
from medicalsemseg_tpu.models.swin import BasicLayer, SwinBlock
from medicalsemseg_tpu.ops.window import (
    pad_to_multiple,
    relative_position_index,
    relative_position_index_ref_quirk,
    resolve_window,
    window_partition,
    window_reverse,
)

Dtype = Any


class ProjectStem(nn.Module):
    """Two conv-GELU-LN stages totalling `patch` stride (reference 'project'
    + PatchEmbed, nnformer_official.py:408-476)."""

    embed_dim: int
    patch_size: Tuple[int, int, int] = (2, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        s1 = tuple(max(v // 2, 1) for v in p)
        s2 = tuple(p[i] // s1[i] for i in range(3))
        x = Conv3d(self.embed_dim // 2, (3, 3, 3), strides=s1,
                   dtype=self.dtype, name="proj1_conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = LayerNorm(dtype=self.dtype, name="proj1_norm")(x)
        x = Conv3d(self.embed_dim // 2, (3, 3, 3), dtype=self.dtype,
                   name="proj1_conv2")(x)
        x = nn.gelu(x, approximate=False)
        x = LayerNorm(dtype=self.dtype, name="proj1_norm2")(x)
        x = Conv3d(self.embed_dim, (3, 3, 3), strides=s2, dtype=self.dtype,
                   name="proj2_conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = LayerNorm(dtype=self.dtype, name="proj2_norm")(x)
        x = Conv3d(self.embed_dim, (3, 3, 3), dtype=self.dtype,
                   name="proj2_conv2")(x)
        return LayerNorm(dtype=self.dtype, name="norm")(x)


class CrossWindowAttention(nn.Module):
    """Window attention with Q from the decoder path and K/V from the skip
    (reference WindowAttention_kv, nnformer_official.py:148-221)."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    ref_quirk_index: bool = False  # reproduce the reference's colliding
    # rel-pos strides for bit-compatible checkpoint import (ops/window.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip_win: jnp.ndarray, up_win: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b_, n, c = skip_win.shape
        nh = self.num_heads
        hd = c // nh
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                      kernel_init=trunc_normal_init, name="kv")(skip_win)
        kv = kv.reshape(b_, n, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        # the reference uses the (unprojected) upsampled tokens as Q directly
        q = up_win.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        table = self.param("relative_position_bias_table", trunc_normal_init,
                           (int(np.prod([2 * w - 1 for w in self.window_size])),
                            nh), jnp.float32)
        index_fn = (relative_position_index_ref_quirk if self.ref_quirk_index
                    else relative_position_index)
        idx = jnp.asarray(index_fn(tuple(self.window_size)))
        attn = attn + table[idx].transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + \
                mask.astype(jnp.float32)[None, :, None]
            attn = attn.reshape(b_, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init,
                        name="proj")(out)


class CrossSwinBlock(nn.Module):
    """First decoder block per stage: cross W-MSA + MLP
    (reference SwinTransformerBlock_kv, :56-146)."""

    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    ref_quirk_index: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 up: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, d, h, w, c = x.shape
        ws, _ = resolve_window((d, h, w), self.window_size, 0)
        shortcut = x
        norm = LayerNorm(dtype=self.dtype, name="norm1")
        skip_n = pad_to_multiple(norm(skip), (ws, ws, ws))
        up_n = pad_to_multiple(norm(up), (ws, ws, ws))
        dp, hp, wp = skip_n.shape[1:4]
        skip_w = window_partition(skip_n, ws)
        up_w = window_partition(up_n, ws)
        out_w = CrossWindowAttention(
            dim=c, window_size=(ws, ws, ws), num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, ref_quirk_index=self.ref_quirk_index,
            dtype=self.dtype, name="attn")(skip_w, up_w)
        out = window_reverse(out_w, ws, (dp, hp, wp))[:, :d, :h, :w]
        x = shortcut + DropPath(self.drop_path_rate)(
            out, deterministic=deterministic)
        mlp_in = LayerNorm(dtype=self.dtype, name="norm2")(x).reshape(b, -1, c)
        mlp_out = Mlp(hidden_dim=int(c * self.mlp_ratio), dtype=self.dtype,
                      name="mlp")(mlp_in, deterministic=deterministic)
        return x + DropPath(self.drop_path_rate)(
            mlp_out.reshape(b, d, h, w, c), deterministic=deterministic)


class PatchExpanding(nn.Module):
    """LN + ConvTranspose k2 s2, channels halved (reference: :414-434)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = False) -> jnp.ndarray:
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return ConvTranspose3d(self.dim // 2, (2, 2, 2), (2, 2, 2),
                               dtype=self.dtype, name="up")(x, deterministic)


class NNFormer(nn.Module):
    """The full symmetric model; tuple-input contract.

    Returns fp32 logits (B, D, H, W, n_classes); with deep_supervision=True,
    a list [full-res, 1/2, 1/4] like the reference's ds outputs (:952-978).
    """

    out_channels: int
    in_chans: int = 1
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_sizes: Tuple[int, ...] = (4, 4, 4, 4)
    patch_size: Tuple[int, int, int] = (2, 2, 2)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    deep_supervision: bool = False
    ref_quirk_index: bool = False
    use_pallas: bool = False
    pallas_train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True):
        vol = x_in[0].astype(self.dtype)
        nl = len(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()

        # ---------------- encoder ----------------
        x = ProjectStem(self.embed_dim, self.patch_size, dtype=self.dtype,
                        name="patch_embed")(vol)
        skips = []
        for i in range(nl):
            dim = int(self.embed_dim * 2 ** i)
            # per-stage normed skip of the PRE-downsample features
            x_out, x_down, _ = BasicLayer(
                dim=dim, input_resolution=x.shape[1:4], depth=self.depths[i],
                num_heads=self.num_heads[i], window_size=self.window_sizes[i],
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop_path_rates=tuple(
                    dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])]),
                ref_quirk_index=self.ref_quirk_index,
                use_pallas=self.use_pallas, pallas_train=self.pallas_train,
                dtype=self.dtype, name=f"layers_{i}")(
                    x, deterministic=deterministic)
            skips.append(LayerNorm(dtype=self.dtype, name=f"norm{i}")(x_out))
            x = x_down
        # the neck is the (un-downsampled) deepest skip (reference skips[-1])
        x = skips[-1]

        # ---------------- decoder ----------------
        dec_heads = tuple(reversed(self.num_heads))[1:]
        dec_windows = tuple(reversed(self.window_sizes))[1:]
        dec_depths = tuple(reversed(self.depths))[1:]
        outs = []
        for j in range(nl - 1):
            dim_in = int(self.embed_dim * 2 ** (nl - 1 - j))
            dim = dim_in // 2
            up = PatchExpanding(dim_in, dtype=self.dtype,
                                name=f"up_{j}")(x, deterministic)
            skip = skips[nl - 2 - j]
            x = up + skip
            x = CrossSwinBlock(
                dim=dim, num_heads=dec_heads[j], window_size=dec_windows[j],
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop_path_rate=0.0, ref_quirk_index=self.ref_quirk_index,
                dtype=self.dtype,
                name=f"dec_{j}_cross")(x, skip, up, deterministic)
            for b in range(1, dec_depths[j]):
                x = SwinBlock(
                    dim=dim, input_resolution=x.shape[1:4],
                    num_heads=dec_heads[j], window_size=dec_windows[j],
                    shift_size=dec_windows[j] // 2, mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    ref_quirk_index=self.ref_quirk_index,
                    use_pallas=self.use_pallas,
                    pallas_train=self.pallas_train, dtype=self.dtype,
                    name=f"dec_{j}_blocks_{b}")(
                        x, deterministic=deterministic)[0]
            outs.append(x)

        # deep-supervision heads: ConvTranspose(patch) per scale (:906-915)
        heads = []
        for j, feat in enumerate(reversed(outs)):  # full-res first
            dim = feat.shape[-1]
            logits = ConvTranspose3d(self.out_channels, self.patch_size,
                                     self.patch_size, dtype=self.dtype,
                                     name=f"final_{j}")(feat, deterministic)
            heads.append(logits.astype(jnp.float32))
        if self.deep_supervision and not deterministic:
            # ds heads feed the training loss only; inference (deterministic)
            # returns the full-res head — nn-UNet flips network.do_ds=False
            # before predict_3D (reference neural_network.py usage)
            return heads
        return heads[0]
