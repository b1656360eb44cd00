"""Winograd F(4^3, 3^3) convolution for the decoder's SAME/stride-1 3^3 convs.

The flagship decoder's convolutions are PE-bound at the C=48 lane ceiling:
(48/128)^2 of the MXU's PEs do useful work, and XLA's native conv emitter
already runs at ~80% of that structural ceiling (5.09 ms at 96^3 48->48
bf16 = 21.6 TF/s vs the 26.8 TF/s ceiling — NOTES.md round-3 sweep). No
scheduling change can beat that; only an arithmetic transform can. Winograd
F(4,3) computes each 4^3 output tile from a 6^3 input tile with 6^3 = 216
pointwise products instead of 4^3 * 27 = 1728 multiply-accumulates — an 8x
MXU-work reduction (reference workload: the UnetrBasicBlock convs,
/root/reference/models/segmentors/swin_unetr.py:73-130, where cuDNN applies
the same family of transforms under the hood).

Pipeline (channels-last, all shapes static):
    xp   = pad(x, 1)                                  (SAME halo)
    Xr   = 216 strided views xp[a::4, b::4, c::4]     (tile gather, free)
    V    = B^T-transform along d/h/w (fp32 adds)      -> bf16 (216, M, C)
    M_   = batched dot V @ W_wino                     (MXU, fp32 accum)
    Y    = A^T-transform along d/h/w (fp32)           (216 -> 64 per tile)
    y    = tile interleave (transpose+reshape)

Numerics — measured (tests/test_winograd.py, unit-variance inputs, C=32):
  * fp32 V/M: max rel err ~3e-3 of the direct fp32 conv — fine;
  * bf16 V/M: max rel err ~0.36, RMS ~0.024 — UNUSABLE. B^T entries reach
    +-5, so the Winograd-domain values span ~1000x the data range over three
    axes and the inverse transform's cancellations lose bf16's 8 mantissa
    bits. Row-rescaling BT/G (compensated in AT) does NOT help (measured
    0.44/0.45 max): the loss is cancellation, not representation range.
F(4^3,3^3) is therefore gated to fp32 inference only, where it still wins
big: fp32 direct convs run the MXU in multi-pass mode (~4x bf16 cost), so
an 8x FLOP cut dominates the V/M HBM traffic. For bf16 the right transform
is F(2^3,3^3) (coefficients 0,+-1,+-1/2: measured bf16 max err 0.7% vs the
direct bf16 conv's own 0.3%) — but ITS 8-points-per-output V/M tensors make
the XLA formulation traffic-bound (a wash vs the 5.09 ms direct conv), so
F(2,3) ships as the VMEM-resident Pallas kernel in ops/pallas/winograd3d.py.

The transform is inference-only (conv3x3x3_s1's PRIMAL): training gradients
keep their measured-fastest formulations (ops/convgrad.py). Enable with
MEDSEG_WINOGRAD=1 (A/B-gated until the benchmarks confirm end-to-end wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# F(4,3) at interpolation points (0, 1, -1, 2, -2, inf) — the standard
# Lavin & Gray / wincnn construction.
BT = np.array([
    [4.0,  0.0, -5.0,  0.0, 1.0, 0.0],
    [0.0, -4.0, -4.0,  1.0, 1.0, 0.0],
    [0.0,  4.0, -4.0, -1.0, 1.0, 0.0],
    [0.0, -2.0, -1.0,  2.0, 1.0, 0.0],
    [0.0,  2.0, -1.0, -2.0, 1.0, 0.0],
    [0.0,  4.0,  0.0, -5.0, 0.0, 1.0],
], np.float32)

G = np.array([
    [1.0 / 4.0,   0.0,         0.0],
    [-1.0 / 6.0, -1.0 / 6.0, -1.0 / 6.0],
    [-1.0 / 6.0,  1.0 / 6.0, -1.0 / 6.0],
    [1.0 / 24.0,  1.0 / 12.0, 1.0 / 6.0],
    [1.0 / 24.0, -1.0 / 12.0, 1.0 / 6.0],
    [0.0,         0.0,        1.0],
], np.float32)

AT = np.array([
    [1.0, 1.0, 1.0, 1.0, 1.0, 0.0],
    [0.0, 1.0, -1.0, 2.0, -2.0, 0.0],
    [0.0, 1.0, 1.0, 4.0, 4.0, 0.0],
    [0.0, 1.0, -1.0, 8.0, -8.0, 1.0],
], np.float32)


def transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,C,Co) -> (6,6,6,C,Co) Winograd-domain weights, fp32."""
    g = jnp.asarray(G)
    u = jnp.einsum("ar,rstio->astio", g, w.astype(jnp.float32))
    u = jnp.einsum("bs,astio->abtio", g, u)
    return jnp.einsum("ct,abtio->abcio", g, u)


def _axis_transform(mat: np.ndarray, x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Apply a small (P, Q) matrix along `axis` (size Q) of x."""
    x = jnp.moveaxis(x, axis, 0)
    y = jnp.tensordot(jnp.asarray(mat), x, axes=((1,), (0,)))
    return jnp.moveaxis(y, 0, axis)


def winograd_conv3d_f43(x: jnp.ndarray, w: jnp.ndarray,
                        mm_dtype=jnp.bfloat16) -> jnp.ndarray:
    """SAME/stride-1 3^3 conv via Winograd F(4^3, 3^3).

    x (B, D, H, W, C) with D/H/W % 4 == 0; w (3, 3, 3, C, Co).
    Matches lax.conv_general_dilated(..., "SAME") up to transform rounding
    (exactly, at fp32 tolerance, with mm_dtype=float32).
    """
    b, d, h, wd, c = x.shape
    co = w.shape[-1]
    assert d % 4 == 0 and h % 4 == 0 and wd % 4 == 0, (d, h, wd)
    td, th, tw = d // 4, h // 4, wd // 4

    wino_w = transform_weights(w).astype(mm_dtype)
    wino_w = wino_w.reshape(216, c, co)

    # tile gather: xp[(4i+a, 4j+b, 4k+cc)] for a,b,cc in 6^3 as strided views.
    # SAME halo pad of 1 suffices: the largest index read is a=5 at the last
    # tile, 5 + 4*(t-1) = D+1, the final row of the (1,1)-padded array.
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    def gather_axis(arr, axis, t):
        # (6, ...) stack of strided views along `axis`
        views = []
        for a in range(6):
            idx = [slice(None)] * arr.ndim
            idx[axis] = slice(a, a + 4 * t, 4)
            views.append(arr[tuple(idx)])
        return jnp.stack(views, axis=0)

    # Xr: (6, 6, 6, B, td, th, tw, C) built one axis at a time
    xr = gather_axis(xp, 1, td)                 # (6a, B, td, Hp, Wp, C)
    xr = gather_axis(xr, 3, th)                 # (6b, 6a, B, td, th, Wp, C)
    xr = gather_axis(xr, 5, tw)                 # (6c, 6b, 6a, B, td, th, tw, C)
    # each gather prepends its axis -> ordering (c, b, a); restore (a, b, c)
    xr = jnp.transpose(xr, (2, 1, 0, 3, 4, 5, 6, 7))

    # B^T transform along each of the three 6-point axes, fp32
    v = _axis_transform(BT, xr, 0)
    v = _axis_transform(BT, v, 1)
    v = _axis_transform(BT, v, 2)

    m = b * td * th * tw
    v = v.reshape(216, m, c).astype(mm_dtype)

    # the 216 Winograd-domain pointwise products = one batched matmul
    mm = lax.dot_general(v, wino_w, (((2,), (1,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32)
    mm = mm.reshape(6, 6, 6, b, td, th, tw, co).astype(mm_dtype)

    # inverse transform (216 -> 4^3 per tile), fp32
    y = _axis_transform(AT, mm.astype(jnp.float32), 0)
    y = _axis_transform(AT, y, 1)
    y = _axis_transform(AT, y, 2)               # (4, 4, 4, B, td, th, tw, Co)

    # interleave tiles: out[b, 4i+u, 4j+vv, 4k+ww] = y[u, vv, ww, b, i, j, k]
    y = jnp.transpose(y, (3, 4, 0, 5, 1, 6, 2, 7))
    y = y.reshape(b, d, h, wd, co)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def winograd_applicable(shape, cin: int) -> bool:
    """Spatial dims % 4 == 0 and channels wide enough that the Winograd
    batched matmul (contraction dim C) beats the direct emitter."""
    return all(s % 4 == 0 for s in shape) and cin >= 16
