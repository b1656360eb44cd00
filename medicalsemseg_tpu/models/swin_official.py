"""SwinUNETR (official MONAI variant) — TPU-native re-derivation.

The reference vendors MONAI's SwinUNETR wholesale
(reference: models/segmentors/swin_unetr_official.py:32-981, 981 LoC). It
differs from the nnFormer-style combo in load-bearing ways, all reproduced
here so its checkpoints import bit-compatibly:

  * PatchMerging v1: concat of 8 strided slices -> LN(8C) -> Linear(2C, no
    bias) — INCLUDING MONAI v1's duplicated-octant quirk (slices x5/x6 repeat
    x2/x3 and octants (1,1,0)/(0,1,1) are never read;
    swin_unetr_official.py:700-708). Bit-compatible import requires the quirk.
  * Fixed constructor window 7^3; at small resolutions get_window_size clamps
    the window per-dim and zeroes its shift (swin_unetr_official.py:374-388),
    while the bias lookup keeps the FULL 7^3 relative_position_index sliced
    to [:n, :n] (swin_unetr_official.py:483-485) — i.e. deliberately "wrong"
    rel-pos geometry at clamped windows, faithfully reproduced.
  * Each stage's hidden state is taken BEFORE the stage's own blocks see it
    (x_{k+1} = stage_k(x_k) includes the trailing PatchMerging), and every
    skip is normalized by a parameterless LayerNorm when normalize=True
    (proj_out, swin_unetr_official.py:957-981).
  * Decoder: 5 up-blocks (R/32 -> R), encoders on x0..x2 and x4, raw-input
    encoder1 (swin_unetr_official.py:282-295).

Channels-last throughout; masks and index tables are trace-time NumPy
constants; the decoder reuses this framework's UnetrBasicBlock-equivalent
blocks (models/decoders.py).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medicalsemseg_tpu.models.decoders import (
    UnetOutBlock,
    UnetResBlock,
    UnetrUpBlock,
)
from medicalsemseg_tpu.models.layers import (
    Conv3d,
    DropPath,
    LayerNorm,
    Mlp,
    trunc_normal_init,
)

Dtype = Any
Tuple3 = Tuple[int, int, int]


def resolve_window_official(x_size: Tuple3, window: Tuple3,
                            shift: Tuple3) -> Tuple[Tuple3, Tuple3]:
    """MONAI get_window_size: clamp the window per-dim to the input size and
    zero that dim's shift (swin_unetr_official.py:374-388)."""
    ws = list(window)
    ss = list(shift)
    for i in range(3):
        if x_size[i] <= window[i]:
            ws[i] = x_size[i]
            ss[i] = 0
    return tuple(ws), tuple(ss)


def _partition(x: jnp.ndarray, ws: Tuple3) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B*nW, prod(ws), C) for an anisotropic window."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2],
                  c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws[0] * ws[1] * ws[2], c)


def _reverse(win: jnp.ndarray, ws: Tuple3, dims: Tuple3) -> jnp.ndarray:
    d, h, w = dims
    b = win.shape[0] // ((d // ws[0]) * (h // ws[1]) * (w // ws[2]))
    x = win.reshape(b, d // ws[0], h // ws[1], w // ws[2], ws[0], ws[1],
                    ws[2], -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


@functools.lru_cache(maxsize=None)
def _official_attn_mask(dims: Tuple3, ws: Tuple3, ss: Tuple3) -> np.ndarray:
    """compute_mask (swin_unetr_official.py:726-752): region ids from the
    slice decomposition, -100 where ids differ. (nW, N, N) fp32."""
    img = np.zeros(dims, np.int32)
    cnt = 0
    for sd in (slice(0, -ws[0]), slice(-ws[0], -ss[0] if ss[0] else None),
               slice(-ss[0], None) if ss[0] else None):
        if sd is None:
            continue
        for sh in (slice(0, -ws[1]), slice(-ws[1], -ss[1] if ss[1] else None),
                   slice(-ss[1], None) if ss[1] else None):
            if sh is None:
                continue
            for sw in (slice(0, -ws[2]),
                       slice(-ws[2], -ss[2] if ss[2] else None),
                       slice(-ss[2], None) if ss[2] else None):
                if sw is None:
                    continue
                img[sd, sh, sw] = cnt
                cnt += 1
    d, h, w = dims
    win = img.reshape(d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2],
                      ws[2]).transpose(0, 2, 4, 1, 3, 5).reshape(
                          -1, ws[0] * ws[1] * ws[2])
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _full_window_index(window: Tuple3) -> np.ndarray:
    """The CONSTRUCTOR-window rel-pos index (identical math to
    ops/window.relative_position_index, kept separate because the official
    model slices it [:n, :n] at clamped runtime windows)."""
    w0, w1, w2 = window
    coords = np.stack(np.meshgrid(np.arange(w0), np.arange(w1),
                                  np.arange(w2), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel = rel.astype(np.int64)
    rel[:, :, 0] += w0 - 1
    rel[:, :, 1] += w1 - 1
    rel[:, :, 2] += w2 - 1
    rel[:, :, 0] *= (2 * w1 - 1) * (2 * w2 - 1)
    rel[:, :, 1] *= 2 * w2 - 1
    return rel.sum(-1).astype(np.int32)


class OfficialWindowAttention(nn.Module):
    """W-MSA with the official table/index contract: table rows always for
    the full constructor window; lookup index sliced [:n, :n]
    (swin_unetr_official.py:390-496)."""

    dim: int
    num_heads: int
    window: Tuple3  # constructor window (7, 7, 7)
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], mask=None,
                 x_volume: Optional[jnp.ndarray] = None, ws: Tuple3 = None,
                 ss: Tuple3 = None,
                 ln: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 residual: bool = False) -> jnp.ndarray:
        from medicalsemseg_tpu.models.layers import _DenseParams

        c = self.dim
        nh = self.num_heads
        hd = c // nh
        table_rows = int(np.prod([2 * w - 1 for w in self.window]))
        table = self.param("relative_position_bias_table", trunc_normal_init,
                           (table_rows, nh), jnp.float32)
        # raw kernel/bias leaves under the nn.Dense names (qkv/*, proj/*) so
        # checkpoints are unchanged and the fused kernel gets the arrays
        lecun = nn.initializers.lecun_normal()
        wqkv, bqkv = _DenseParams(c, 3 * c, use_bias=self.qkv_bias,
                                  kernel_init=lecun, name="qkv")()
        wproj, bproj = _DenseParams(c, c, kernel_init=lecun, name="proj")()

        if x_volume is not None:
            # fused Pallas path over the (padded, rolled) volume; the
            # clamped-window bias slice [:n, :n] is gathered here and passed
            # pre-built (the kernel's standard gather assumes a runtime-
            # window table)
            from medicalsemseg_tpu.ops.pallas.window_attention import (
                fused_window_attention)

            n = int(np.prod(ws))
            idx = _full_window_index(tuple(self.window))[:n, :n]
            pre_bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, nh)
            pre_bias = pre_bias.transpose(2, 0, 1)
            return fused_window_attention(
                x_volume.astype(self.dtype), wqkv, bqkv, wproj, bproj,
                None, tuple(ws), nh, shift_size=tuple(ss),
                pre_bias=pre_bias,
                ln_scale=None if ln is None else ln[0],
                ln_bias=None if ln is None else ln[1],
                residual=residual)

        b_, n, _ = x.shape
        qkv = jnp.dot(x, wqkv.astype(self.dtype))
        if bqkv is not None:
            qkv = qkv + bqkv.astype(self.dtype)
        qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)

        idx = _full_window_index(tuple(self.window))[:n, :n]
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, nh)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + \
                mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b_, nh, n, n)
        attn = jnp.asarray(nn.softmax(attn, axis=-1), self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return jnp.dot(out, wproj.astype(self.dtype)) + bproj.astype(
            self.dtype)


class OfficialSwinBlock(nn.Module):
    """Pre-norm swin block with runtime window clamping
    (swin_unetr_official.py:499-663)."""

    dim: int
    num_heads: int
    window: Tuple3
    shift: Tuple3
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        b, d, h, w, c = x.shape
        ws, ss = resolve_window_official((d, h, w), self.window, self.shift)
        pads = [(0, (-s) % ws[i]) for i, s in enumerate((d, h, w))]
        padded = any(p != (0, 0) for p in pads)

        attn = OfficialWindowAttention(self.dim, self.num_heads, self.window,
                                       self.qkv_bias, self.dtype, name="attn")
        ln1 = LayerNorm(dtype=self.dtype, name="norm1")
        from medicalsemseg_tpu.ops.pallas import absorb_enabled
        fuse = (self.use_pallas and deterministic and x.dtype == self.dtype)
        # pad-free volumes absorb LN1 + shortcut in-kernel (zero-padding RAW
        # tokens would LayerNorm the pad to `bias`, so padded shapes fuse
        # without absorption); roll commutes with the per-token LN and the
        # in-rolled-coordinates residual add is valid (roll is a bijection)
        if fuse and not padded and absorb_enabled():
            s1, b1 = ln1(x, params_only=True)
            xr = (jnp.roll(x, shift=(-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
                  if any(ss) else x)
            out = attn(None, None, x_volume=xr, ws=ws, ss=ss, ln=(s1, b1),
                       residual=True)
            x = jnp.roll(out, shift=ss, axis=(1, 2, 3)) if any(ss) else out
        else:
            shortcut = x
            xn = ln1(x)
            xn = jnp.pad(xn, [(0, 0)] + pads + [(0, 0)])
            dp, hp, wp = xn.shape[1:4]
            if any(ss):
                xn = jnp.roll(xn, shift=(-ss[0], -ss[1], -ss[2]),
                              axis=(1, 2, 3))
            if fuse:
                xn = attn(None, None, x_volume=xn, ws=ws, ss=ss)
            else:
                mask = (jnp.asarray(_official_attn_mask((dp, hp, wp), ws, ss))
                        if any(ss) else None)
                xn = _reverse(attn(_partition(xn, ws), mask), ws,
                              (dp, hp, wp))
            if any(ss):
                xn = jnp.roll(xn, shift=ss, axis=(1, 2, 3))
            xn = xn[:, :d, :h, :w, :]
            x = shortcut + DropPath(self.drop_path_rate)(
                xn, deterministic=deterministic)

        ln2 = LayerNorm(dtype=self.dtype, name="norm2")
        mlp = Mlp(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")
        from medicalsemseg_tpu.ops.pallas import absorb_enabled
        if (self.use_pallas and deterministic and x.dtype == self.dtype
                and absorb_enabled()):
            # fused LN->fc1->GELU->fc2->+x kernel (ops/pallas/mlp.py)
            s2, b2 = ln2(x, params_only=True)
            return mlp(x.reshape(b, d * h * w, c), ln=(s2, b2),
                       residual=True).reshape(b, d, h, w, c)
        mlp_in = ln2(x).reshape(b, d * h * w, c)
        mlp_out = mlp(mlp_in, deterministic=deterministic)
        return x + DropPath(self.drop_path_rate)(
            mlp_out.reshape(b, d, h, w, c), deterministic=deterministic)


class OfficialPatchMerging(nn.Module):
    """MONAI v1 patch merging WITH the duplicated-octant quirk
    (swin_unetr_official.py:692-723): slices x5/x6 repeat x2/x3."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, d, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, d % 2), (0, h % 2), (0, w % 2), (0, 0)))
        s = lambda i, j, k: x[:, i::2, j::2, k::2, :]  # noqa: E731
        # slice list verbatim from the reference (x5 == x2, x6 == x3)
        x = jnp.concatenate([s(0, 0, 0), s(1, 0, 0), s(0, 1, 0), s(0, 0, 1),
                             s(1, 0, 1), s(0, 1, 0), s(0, 0, 1), s(1, 1, 1)],
                            axis=-1)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinViTOfficial(nn.Module):
    """The official swinViT: patch embed + 4 stages (PatchMerging at the END
    of each), hidden states [x0..x4] each proj_out-normalized
    (swin_unetr_official.py:866-981)."""

    in_chans: int = 1
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: Tuple3 = (7, 7, 7)
    patch_size: Tuple3 = (2, 2, 2)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    normalize: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        def proj_out(v):
            if not self.normalize:
                return v
            # parameterless F.layer_norm over channels (fp32 statistics)
            vf = v.astype(jnp.float32)
            mu = vf.mean(-1, keepdims=True)
            var = ((vf - mu) ** 2).mean(-1, keepdims=True)
            return ((vf - mu) / jnp.sqrt(var + 1e-5)).astype(v.dtype)

        x = Conv3d(self.embed_dim, self.patch_size, strides=self.patch_size,
                   padding="VALID", dtype=self.dtype,
                   name="patch_embed")(x.astype(self.dtype))
        outs = [proj_out(x)]
        shift = tuple(w // 2 for w in self.window)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        for k, depth in enumerate(self.depths):
            dim = self.embed_dim * 2 ** k
            for i in range(depth):
                x = OfficialSwinBlock(
                    dim=dim, num_heads=self.num_heads[k], window=self.window,
                    shift=(0, 0, 0) if i % 2 == 0 else shift,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop_path_rate=float(dpr[sum(self.depths[:k]) + i]),
                    use_pallas=self.use_pallas, dtype=self.dtype,
                    name=f"layers{k + 1}_blocks{i}")(x, deterministic)
            x = OfficialPatchMerging(dim, dtype=self.dtype,
                                     name=f"layers{k + 1}_downsample")(x)
            outs.append(proj_out(x))
        return outs


class SwinUNETROfficial(nn.Module):
    """Full official SwinUNETR: swinViT + 5-level UNETR decoder
    (swin_unetr_official.py:32-295). Tuple input contract, channels-last
    fp32 logits like every model in this framework."""

    out_channels: int
    in_chans: int = 1
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    drop_path_rate: float = 0.0
    normalize: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True) -> jnp.ndarray:
        vol = x_in[0]
        fs = self.feature_size
        z = SwinViTOfficial(
            in_chans=self.in_chans, embed_dim=fs, depths=self.depths,
            num_heads=self.num_heads, drop_path_rate=self.drop_path_rate,
            normalize=self.normalize, use_pallas=self.use_pallas,
            dtype=self.dtype, name="swinViT")(vol, deterministic)

        enc0 = UnetResBlock(fs, dtype=self.dtype, name="encoder1")(
            vol.astype(self.dtype))
        enc1 = UnetResBlock(fs, dtype=self.dtype, name="encoder2")(z[0])
        enc2 = UnetResBlock(2 * fs, dtype=self.dtype, name="encoder3")(z[1])
        enc3 = UnetResBlock(4 * fs, dtype=self.dtype, name="encoder4")(z[2])
        dec4 = UnetResBlock(16 * fs, dtype=self.dtype, name="encoder10")(z[4])
        x = UnetrUpBlock(8 * fs, dtype=self.dtype, name="decoder5")(
            dec4, z[3], deterministic)
        x = UnetrUpBlock(4 * fs, dtype=self.dtype, name="decoder4")(
            x, enc3, deterministic)
        x = UnetrUpBlock(2 * fs, dtype=self.dtype, name="decoder3")(
            x, enc2, deterministic)
        x = UnetrUpBlock(fs, dtype=self.dtype, name="decoder2")(
            x, enc1, deterministic)
        x = UnetrUpBlock(fs, dtype=self.dtype, name="decoder1")(
            x, enc0, deterministic)
        return UnetOutBlock(self.out_channels, dtype=self.dtype,
                            name="out")(x)
