"""Fused 3D windowed attention as a Pallas TPU kernel.

Replaces the XLA chain
    qkv dense -> QK^T -> +bias/+mask -> softmax -> @V -> proj dense
per window (reference hot loop #2, models/backbones/swin_nnformer.py:235-289)
with ONE kernel: each program instance owns a tile of windows resident in
VMEM, runs the QKV projection, attention (fp32 logits + softmax in VMEM — the
(N, N) attention matrices never touch HBM), and the output projection.

SW-MSA masking is computed IN-KERNEL from the window's grid coordinates: a
token pair is visible iff its pre-shift region labels match along every axis,
and the labels depend only on (is this the last window along the axis?, token
position) — three VPU compares per pair. The reference materializes a
(nW, N, N) mask tensor on device every forward
(swin_nnformer.py:370-395; ~95 MB fp32 at the flagship stage-0 shape); here
the mask never exists in memory at all.

Window partition/reverse remain XLA reshapes outside the kernel (their block
shapes violate the TPU (8, 128) tile constraint for window_size 6; XLA fuses
them into the surrounding ops). The cyclic shift stays an XLA roll.

v1 is forward-only (used on inference/validation paths); training uses the
XLA path until a custom VJP pairs with this kernel.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medicalsemseg_tpu.ops.window import (
    relative_position_index,
    window_partition,
    window_reverse,
)




def _norm3(v) -> Tuple[int, int, int]:
    """int -> cubic tuple; tuple passes through."""
    return (int(v),) * 3 if np.isscalar(v) else tuple(int(x) for x in v)


def _window_mask(wpb: int, n: int, grid_dims: Tuple[int, int, int],
                 ws, ss):
    """In-kernel SW-MSA mask for the current tile of wpb windows.

    A token pair is visible iff its pre-shift region labels match along every
    axis; labels depend only on (is this the last window along the axis?,
    token position). Token coordinates come from iota (pallas kernels cannot
    capture host array constants). ws/ss may be per-axis tuples (the official
    SwinUNETR / Video-Swin clamped-window scheme zeroes individual shifts;
    a zero-shift axis labels each window uniformly, masking nothing).
    """
    w3 = _norm3(ws)
    s3 = _norm3(ss)
    nwd, nwh, nww = grid_dims
    blk = pl.program_id(0)
    g0 = blk * wpb
    gids = g0 + jax.lax.broadcasted_iota(jnp.int32, (wpb, 1), 0)[:, 0]
    # batch-major window ordering: g = ((b*nwd + i)*nwh + j)*nww + k
    kk = gids % nww
    jj = (gids // nww) % nwh
    ii = (gids // (nww * nwh)) % nwd
    tok = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
    pd = tok // (w3[1] * w3[2])
    ph = (tok // w3[2]) % w3[1]
    pw = tok % w3[2]
    # region label along an axis: 0 unless last window; there, tokens past
    # ws-ss are wrapped from the volume start (label 2 vs 1)
    lab = lambda pos, last, nlast, w, s: jnp.where(  # noqa: E731
        (last == nlast - 1)[:, None],
        jnp.where(pos[None, :] < w - s, 1, 2), 0)
    ld = lab(pd, ii, nwd, w3[0], s3[0])  # (wpb, N)
    lh = lab(ph, jj, nwh, w3[1], s3[1])
    lw = lab(pw, kk, nww, w3[2], s3[2])
    same = ((ld[:, :, None] == ld[:, None, :])
            & (lh[:, :, None] == lh[:, None, :])
            & (lw[:, :, None] == lw[:, None, :]))
    return jnp.where(same, 0.0, -100.0)  # (wpb, N, N) fp32, VMEM-only


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
            out_ref, *, num_heads: int, wpb: int, shifted: bool,
            grid_dims: Tuple[int, int, int], ws: int, ss: int,
            ln_ref=None, ln_eps: float = 1e-5, residual: bool = False):
    """A tile of `wpb` windows: [LN ->] qkv -> per-head attention -> proj
    [-> +residual]. All VMEM.

    With ln_ref (a (2, C) fp32 block: scale row 0, bias row 1) the kernel
    absorbs the block's pre-attention LayerNorm — fp32 fast-variance stats
    per token, matching flax.linen.LayerNorm — so the standalone LN pass
    over the volume (one full HBM read+write) disappears. With residual the
    kernel adds the RAW x tile to the projection output, absorbing the
    block's shortcut add (valid because roll/partition are bijections:
    adding in rolled-window coordinates then reversing equals reversing
    then adding)."""
    n = x_ref.shape[1]
    c = x_ref.shape[-1]
    hd = c // num_heads
    scale = hd ** -0.5

    xr = x_ref[:]
    if ln_ref is not None:
        xf = xr.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.maximum(0.0, (xf * xf).mean(axis=-1, keepdims=True)
                          - mu * mu)
        xn = ((xf - mu) * (jax.lax.rsqrt(var + ln_eps) * ln_ref[0])
              + ln_ref[1])
        xw = xn.astype(x_ref.dtype).reshape(wpb * n, c)
    else:
        xw = xr.reshape(wpb * n, c)
    qkv = jnp.dot(xw, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:]).astype(x_ref.dtype)
    qkv = qkv.reshape(wpb, n, 3 * c)

    mask = (_window_mask(wpb, n, grid_dims, ws, ss) if shifted else None)

    outs = []
    for h in range(num_heads):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        attn = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        attn = attn + bias_ref[h][None]
        if mask is not None:
            attn = attn + mask
        attn = jax.nn.softmax(attn, axis=-1).astype(x_ref.dtype)
        outs.append(jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    out = jnp.concatenate(outs, axis=-1).astype(x_ref.dtype)

    out = jnp.dot(out.reshape(wpb * n, c), wproj_ref[:],
                  preferred_element_type=jnp.float32)
    out = (out + bproj_ref[:]).astype(x_ref.dtype)
    if residual:
        # bf16 add of the raw tile, matching the module's shortcut + attn
        out = out + xr.reshape(wpb * n, c)
    out_ref[:] = out.reshape(wpb, n, c)


def fused_window_attention(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: Optional[jnp.ndarray],
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    rel_bias_table: Optional[jnp.ndarray],
    window_size,
    num_heads: int,
    shift_size=0,
    windows_per_block: int = 8,
    interpret: bool = False,
    ln_scale: Optional[jnp.ndarray] = None,
    ln_bias: Optional[jnp.ndarray] = None,
    ln_eps: float = 1e-5,
    residual: bool = False,
    pre_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x (B, D, H, W, C) -> attention output (B, D, H, W, C).

    window_size / shift_size may be ints (cubic) or per-axis tuples (the
    official SwinUNETR / Video-Swin contract). D/H/W must be multiples of
    the window (callers pad first, as the XLA path does). When any shift is
    nonzero, x must already be cyclically rolled by -shift; the SW-MSA mask
    is derived in-kernel.

    The (nh, N, N) attention bias is gathered from rel_bias_table with the
    standard per-axis index, or passed pre-gathered via pre_bias (the
    official models slice a constructor-window table at clamped runtime
    windows — swin_unetr_official.py:506-516).

    With ln_scale/ln_bias the kernel absorbs the block's pre-attention
    LayerNorm (x is then the RAW volume); with residual=True it also absorbs
    the shortcut add, returning x + attn(LN(x)) already combined.
    """
    b, d, h, w, c = x.shape
    ws3 = _norm3(window_size)
    ss3 = _norm3(shift_size)
    n = int(np.prod(ws3))
    grid_dims = (d // ws3[0], h // ws3[1], w // ws3[2])
    total = b * int(np.prod(grid_dims))
    ln = ln_scale is not None

    # fit the window tile into scoped VMEM (16 MB limit): the rel-pos bias is
    # shared; per window the working set is qkv (fp32 + bf16 copies), two
    # live (N, N) attention buffers (fp32 + bf16), and x/out/proj tiles
    # (+ the fp32 normalized tile when the LN is absorbed)
    bias_bytes = num_heads * n * n * 4
    per_win = n * 3 * c * 6 + 2 * n * n * 6 + n * c * (16 if ln else 12)
    budget = 8 * 1024 * 1024
    wpb_fit = max(int((budget - bias_bytes) // max(per_win, 1)), 1)
    wpb = max(min(windows_per_block, wpb_fit), 1)
    while total % wpb != 0:
        wpb -= 1

    if bqkv is None:
        bqkv = jnp.zeros((3 * c,), jnp.float32)

    if pre_bias is not None:
        bias = pre_bias.astype(jnp.float32)  # (nh, N, N)
    else:
        idx = relative_position_index(ws3)
        bias = rel_bias_table[jnp.asarray(idx.reshape(-1))]
        bias = bias.reshape(n, n, num_heads).transpose(2, 0, 1)  # (nh, N, N)
        bias = bias.astype(jnp.float32)

    wins = window_partition(x, ws3)  # (total, N, C)

    in_specs = [
        pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [wins, wqkv.astype(x.dtype), bqkv.astype(jnp.float32),
            wproj.astype(x.dtype), bproj.astype(jnp.float32), bias]

    shifted = any(s > 0 for s in ss3)
    if ln:
        def kern(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
                 ln_ref, out_ref):
            _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                    bias_ref, out_ref, num_heads=num_heads, wpb=wpb,
                    shifted=shifted, grid_dims=grid_dims, ws=ws3,
                    ss=ss3, ln_ref=ln_ref, ln_eps=ln_eps,
                    residual=residual)
        in_specs.append(pl.BlockSpec((2, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.stack([ln_scale, ln_bias]).astype(jnp.float32))
    else:
        kern = functools.partial(_kernel, num_heads=num_heads, wpb=wpb,
                                 shifted=shifted, grid_dims=grid_dims,
                                 ws=ws3, ss=ss3, residual=residual)

    out = pl.pallas_call(
        kern,
        grid=(total // wpb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, n, c), x.dtype),
        interpret=interpret,
    )(*args)
    return window_reverse(out, ws3, (d, h, w))


def pallas_train_bwd_vmem_bytes(c: int, num_heads: int, window_size: int,
                                windows_per_block: int = 8,
                                ln: bool = False) -> int:
    """Scoped-VMEM estimate for the backward kernel at one block shape.

    Calibrated against the AOT compiler's report for the flagship stage-4
    shape (c=384, nh=24, n=216): estimate ~23.5M vs reported 25.14M against
    a 16M scoped limit. Dominant terms: the three (nh, N, N) fp32 buffers
    (rel-pos bias in, dbias out, bacc scratch) and the flat weight-grad
    accumulator. With ln (absorbed LayerNorm) add the fp32 raw-x / xhat /
    dxhat tile temporaries."""
    n = window_size ** 3
    bias_bytes = num_heads * n * n * 4
    per_win = n * 3 * c * 6 + 2 * n * n * 6 + n * c * 12
    wpb_fit = max(int((6 * 1024 * 1024 - 2 * bias_bytes)
                      // max(per_win, 1)), 1)
    wpb = max(min(windows_per_block, wpb_fit), 1)
    return (3 * bias_bytes                # bias in + dbias out + bacc scratch
            + (2 * c + (4 if ln else 2)) * 3 * c * 4   # wacc scratch
            + c * 4 * c * 4              # dwqkv + dwproj outputs
            + c * 4 * c * 2              # weight inputs (bf16)
            + wpb * n * c * 12           # x/dy/dx tiles, double-buffered
            + wpb * n * 3 * c * 6        # qkv fp32 + bf16 copy
            + 4 * wpb * n * n * 4        # live per-head attention temps
            + (wpb * n * c * 12 if ln else 0))  # xr32/xhat/dxhat fp32 temps


def _hsplit_enabled() -> bool:
    """MEDSEG_HSPLIT=0 disables the head-split backward (A/B + hardware
    fallback knob; read at trace time)."""
    return os.environ.get("MEDSEG_HSPLIT", "1") != "0"


def pallas_train_fits(c: int, num_heads: int, window_size: int,
                      limit: int = 14 * 1024 * 1024,
                      ln: bool = False) -> bool:
    """Whether a custom-VJP backward kernel fits scoped VMEM (16M on v5e;
    14M threshold leaves headroom for compiler temporaries). The flagship's
    stage 4 (c=384, nh=24, 25.14M) does NOT fit the whole-head kernel; the
    head-split variant (grid over head groups, `_bwd_kernel_hsplit`) covers
    it unless MEDSEG_HSPLIT=0, in which case those blocks keep the XLA
    backward (cheap there — 8 windows)."""
    if pallas_train_bwd_vmem_bytes(c, num_heads, window_size,
                                   ln=ln) <= limit:
        return True
    return (_hsplit_enabled()
            and pick_head_split(c, num_heads, window_size, ln=ln,
                                limit=limit) is not None)


def _bwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, dy_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                dbias_ref, *, num_heads: int, wpb: int, shifted: bool,
                grid_dims: Tuple[int, int, int], ws: int, ss: int,
                acc_ref=None, ln_ref=None, dln_ref=None,
                ln_eps: float = 1e-5, residual: bool = False):
    """Flash-style backward: recompute qkv + softmax in VMEM, produce dx per
    tile; weight/bias grads accumulate in fp32 VMEM scratch across the
    (sequential on TPU) grid steps and are written out at the last step.

    With ln_ref the block's pre-attention LayerNorm is absorbed: x_ref holds
    the RAW volume, the kernel recomputes xhat/stats for qkv AND chains the
    LN backward onto dx in VMEM (dscale/dbias accumulate in scratch rows
    2c+2/2c+3). With residual, dy flows straight into dx (the forward added
    the raw shortcut in-kernel)."""
    n = x_ref.shape[1]
    c = x_ref.shape[-1]
    hd = c // num_heads
    scale = hd ** -0.5
    nblk = pl.num_programs(0)
    blk = pl.program_id(0)

    # scratch layout: one flat fp32 buffer holding all weight-grad
    # accumulators: dwqkv (c,3c) | dwproj (c,c) | dbqkv (1,3c) | dbproj (1,c);
    # dbias (nh, n, n) as a second scratch; when LN is absorbed, a dedicated
    # (2, c) scratch accumulates dscale/dbias_ln (sublane-aligned)
    if ln_ref is not None:
        wacc, bacc, lnacc = acc_ref
    else:
        wacc, bacc = acc_ref
        lnacc = None

    @pl.when(blk == 0)
    def _init():
        wacc[:] = jnp.zeros_like(wacc)
        bacc[:] = jnp.zeros_like(bacc)
        if lnacc is not None:
            lnacc[:] = jnp.zeros_like(lnacc)

    if ln_ref is not None:
        xr32 = x_ref[:].reshape(wpb * n, c).astype(jnp.float32)
        mu = xr32.mean(axis=-1, keepdims=True)
        var = jnp.maximum(0.0, (xr32 * xr32).mean(axis=-1, keepdims=True)
                          - mu * mu)
        inv = jax.lax.rsqrt(var + ln_eps)
        xhat = (xr32 - mu) * inv
        xw = (xhat * ln_ref[0] + ln_ref[1]).astype(x_ref.dtype)
    else:
        xw = x_ref[:].reshape(wpb * n, c)
    qkv = jnp.dot(xw, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:]).astype(x_ref.dtype).reshape(wpb, n, 3 * c)

    mask = (_window_mask(wpb, n, grid_dims, ws, ss) if shifted else None)

    dy = dy_ref[:].reshape(wpb * n, c)
    # out-projection grads: dout = dy Wproj^T; dWproj = o^T dy (o recomputed)
    dout = jnp.dot(dy, wproj_ref[:].T,
                   preferred_element_type=jnp.float32).astype(x_ref.dtype)
    dout = dout.reshape(wpb, n, c)

    o_parts = []
    dqkv_parts = []
    for h in range(num_heads):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[h][None]
        if mask is not None:
            s = s + mask
        p32 = jax.nn.softmax(s, axis=-1)
        p = p32.astype(x_ref.dtype)

        o_parts.append(jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x_ref.dtype))

        do_h = dout[:, :, h * hd:(h + 1) * hd]
        # dp = do v^T ; dv = p^T do
        dp = jax.lax.dot_general(do_h, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(p, do_h, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        # softmax backward (fp32)
        ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
        # bias grad: sum over this tile's windows (flushed at the last step)
        bacc[h] += ds.sum(axis=0)
        ds_l = (ds * scale).astype(x_ref.dtype)
        dq = jax.lax.dot_general(ds_l, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds_l, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqkv_parts.append((dq, dk, dv))

    o = jnp.concatenate(o_parts, axis=-1).reshape(wpb * n, c)
    # weight-grad accumulation (fp32 MXU)
    dwproj = jax.lax.dot_general(o, dy, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dbproj = dy.astype(jnp.float32).sum(axis=0)

    dqkv = jnp.concatenate(
        [jnp.concatenate([t[0] for t in dqkv_parts], axis=-1),
         jnp.concatenate([t[1] for t in dqkv_parts], axis=-1),
         jnp.concatenate([t[2] for t in dqkv_parts], axis=-1)], axis=-1)
    dqkv = dqkv.reshape(wpb * n, 3 * c).astype(x_ref.dtype)

    dx = jnp.dot(dqkv, wqkv_ref[:].T, preferred_element_type=jnp.float32)
    if ln_ref is not None:
        # LN backward (fp32 VPU): dxn is the grad wrt the normalized tokens
        dxn = dx
        dxhat = dxn * ln_ref[0]
        m1 = dxhat.mean(axis=-1, keepdims=True)
        m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
        dx = (dxhat - m1 - xhat * m2) * inv
        lnacc[0] += (dxn * xhat).sum(axis=0)
        lnacc[1] += dxn.sum(axis=0)
    if residual:
        dx = dx + dy.astype(jnp.float32)
    dx_ref[:] = dx.astype(x_ref.dtype).reshape(wpb, n, c)

    dwqkv = jax.lax.dot_general(xw, dqkv, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = dqkv.astype(jnp.float32).sum(axis=0)

    wacc[0:c, 0:3 * c] += dwqkv
    wacc[c:2 * c, 0:c] += dwproj
    wacc[2 * c, 0:3 * c] += dbqkv
    wacc[2 * c + 1, 0:c] += dbproj

    @pl.when(blk == nblk - 1)
    def _flush():
        cc = c
        dwqkv_ref[:] = wacc[0:cc, 0:3 * cc]
        dwproj_ref[:] = wacc[cc:2 * cc, 0:cc]
        dbqkv_ref[:] = wacc[2 * cc, 0:3 * cc]
        dbproj_ref[:] = wacc[2 * cc + 1, 0:cc]
        dbias_ref[:] = bacc[:]
        if dln_ref is not None:
            dln_ref[:] = lnacc[:]


def _fused_bwd_windows(wins, wqkv, bqkv, wproj, bias, dy_wins, *, num_heads,
                       wpb, shifted, grid_dims, ws, ss, interpret=False,
                       ln=None, ln_eps=1e-5, residual=False):
    """Run the backward kernel over all window tiles; returns grads
    (+ the (2, C) dscale/dbias of the absorbed LN when `ln` is given)."""
    total, n, c = wins.shape
    grid = (total // wpb,)
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads, wpb=wpb,
                               shifted=shifted, grid_dims=grid_dims, ws=ws,
                               ss=ss, ln_eps=ln_eps, residual=residual)

    in_specs = [
        pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((total, n, c), wins.dtype),
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((3 * c,), jnp.float32),
        jax.ShapeDtypeStruct((c, c), jnp.float32),
        jax.ShapeDtypeStruct((c,), jnp.float32),
        jax.ShapeDtypeStruct((num_heads, n, n), jnp.float32),
    ]
    args = [wins, wqkv.astype(wins.dtype), bqkv.astype(jnp.float32),
            wproj.astype(wins.dtype), bias, dy_wins]
    scratch = [
        pltpu.VMEM((2 * c + 2, 3 * c), jnp.float32),
        pltpu.VMEM((num_heads, n, n), jnp.float32),
    ]

    if ln is not None:
        in_specs.append(pl.BlockSpec((2, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_specs.append(pl.BlockSpec((2, c), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((2, c), jnp.float32))
        args.append(jnp.stack([ln[0], ln[1]]).astype(jnp.float32))
        scratch.append(pltpu.VMEM((2, c), jnp.float32))

        def wrapped(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, dy_ref,
                    ln_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                    dbproj_ref, dbias_ref, dln_ref, wacc, bacc, lnacc):
            kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, dy_ref,
                   dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                   dbias_ref, acc_ref=(wacc, bacc, lnacc), ln_ref=ln_ref,
                   dln_ref=dln_ref)
    else:
        def wrapped(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, dy_ref,
                    dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                    dbias_ref, wacc, bacc):
            kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, dy_ref,
                   dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                   dbias_ref, acc_ref=(wacc, bacc))

    outs = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return outs


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10))
def fused_window_attention_trainable(
        x, wqkv, bqkv, wproj, bproj, rel_bias_table, window_size: int,
        num_heads: int, shift_size: int = 0, windows_per_block: int = 8,
        interpret: bool = False):
    """Differentiable fused window attention (custom VJP).

    Identical forward to :func:`fused_window_attention`; the backward is a
    second Pallas kernel that recomputes qkv + softmax tile-by-tile
    (flash-style — no (N, N) attention matrices or residuals in HBM) and
    accumulates weight/bias grads in VMEM scratch across the sequential grid.
    bqkv must be a concrete array here (pass zeros for no-bias).
    """
    return fused_window_attention(x, wqkv, bqkv, wproj, bproj, rel_bias_table,
                                  window_size, num_heads, shift_size,
                                  windows_per_block, interpret)


def _fwa_fwd(x, wqkv, bqkv, wproj, bproj, rel_bias_table, window_size,
             num_heads, shift_size, windows_per_block, interpret):
    out = fused_window_attention(x, wqkv, bqkv, wproj, bproj, rel_bias_table,
                                 window_size, num_heads, shift_size,
                                 windows_per_block, interpret)
    return out, (x, wqkv, bqkv, wproj, rel_bias_table)


def _fwa_bwd(window_size, num_heads, shift_size, windows_per_block, interpret,
             residuals, dy):
    x, wqkv, bqkv, wproj, rel_bias_table = residuals
    b, d, h, w, c = x.shape
    ws = window_size
    n = ws ** 3
    grid_dims = (d // ws, h // ws, w // ws)
    total = b * int(np.prod(grid_dims))

    bias_bytes = num_heads * n * n * 4
    per_win = n * 3 * c * 6 + 2 * n * n * 6 + n * c * 12
    wpb_fit = max(int((6 * 1024 * 1024 - 2 * bias_bytes) // max(per_win, 1)), 1)
    wpb = max(min(windows_per_block, wpb_fit), 1)
    while total % wpb != 0:
        wpb -= 1

    idx = relative_position_index((ws, ws, ws))
    bias = rel_bias_table[jnp.asarray(idx.reshape(-1))]
    bias = bias.reshape(n, n, num_heads).transpose(2, 0, 1).astype(jnp.float32)

    wins = window_partition(x, ws)
    dy_wins = window_partition(dy.astype(x.dtype), ws)

    hsplit = pick_head_split(c, num_heads, ws)
    if hsplit is not None and hsplit > 1 and _hsplit_enabled():
        dx_wins, dwqkv, dbqkv, dwproj, dbproj, dbias = (
            _fused_bwd_windows_hsplit(
                wins, wqkv, bqkv, wproj, bias, dy_wins, num_heads=num_heads,
                hg_count=hsplit, wpb=wpb, shifted=shift_size > 0,
                grid_dims=grid_dims, ws=ws, ss=shift_size,
                interpret=interpret))
    else:
        dx_wins, dwqkv, dbqkv, dwproj, dbproj, dbias = _fused_bwd_windows(
            wins, wqkv, bqkv, wproj, bias, dy_wins, num_heads=num_heads,
            wpb=wpb, shifted=shift_size > 0, grid_dims=grid_dims, ws=ws,
            ss=shift_size, interpret=interpret)

    dx = window_reverse(dx_wins, ws, (d, h, w))
    # scatter the (nh, N, N) bias grad back onto the rel-pos table
    table_size = rel_bias_table.shape[0]
    flat = dbias.transpose(1, 2, 0).reshape(-1, num_heads)  # (N*N, nh)
    dtable = jax.ops.segment_sum(flat, jnp.asarray(idx.reshape(-1)),
                                 num_segments=table_size)
    return (dx.astype(x.dtype), dwqkv.astype(wqkv.dtype),
            dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
            dbproj, dtable.astype(rel_bias_table.dtype))


fused_window_attention_trainable.defvjp(_fwa_fwd, _fwa_bwd)


def _bwd_tile_params(c, num_heads, ws, windows_per_block):
    """Shared wpb sizing for the backward kernel (see _fwa_bwd)."""
    n = ws ** 3
    bias_bytes = num_heads * n * n * 4
    per_win = n * 3 * c * 6 + 2 * n * n * 6 + n * c * 12
    wpb_fit = max(int((6 * 1024 * 1024 - 2 * bias_bytes)
                      // max(per_win, 1)), 1)
    return max(min(windows_per_block, wpb_fit), 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def fused_window_attention_ln_trainable(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, rel_bias_table,
        window_size: int, num_heads: int, shift_size: int = 0,
        windows_per_block: int = 8, interpret: bool = False,
        residual: bool = False, ln_eps: float = 1e-5):
    """Differentiable fused LN + window attention [+ shortcut] (custom VJP).

    The training counterpart of the absorbed inference form: x is the RAW
    (rolled) volume; the forward kernel applies the pre-attention LayerNorm
    in VMEM (and adds the shortcut when residual=True), and the backward
    kernel chains the LN gradient onto dx tile-by-tile — the LN'd volume and
    its gradient never exist in HBM in either direction.
    """
    return fused_window_attention(x, wqkv, bqkv, wproj, bproj, rel_bias_table,
                                  window_size, num_heads, shift_size,
                                  windows_per_block, interpret,
                                  ln_scale=ln_scale, ln_bias=ln_bias,
                                  ln_eps=ln_eps, residual=residual)


def _fwa_ln_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                rel_bias_table, window_size, num_heads, shift_size,
                windows_per_block, interpret, residual, ln_eps):
    out = fused_window_attention(x, wqkv, bqkv, wproj, bproj, rel_bias_table,
                                 window_size, num_heads, shift_size,
                                 windows_per_block, interpret,
                                 ln_scale=ln_scale, ln_bias=ln_bias,
                                 ln_eps=ln_eps, residual=residual)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, rel_bias_table)


def _fwa_ln_bwd(window_size, num_heads, shift_size, windows_per_block,
                interpret, residual, ln_eps, residuals, dy):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, rel_bias_table = residuals
    b, d, h, w, c = x.shape
    ws = window_size
    n = ws ** 3
    grid_dims = (d // ws, h // ws, w // ws)
    total = b * int(np.prod(grid_dims))
    wpb = _bwd_tile_params(c, num_heads, ws, windows_per_block)
    while total % wpb != 0:
        wpb -= 1

    idx = relative_position_index((ws, ws, ws))
    bias = rel_bias_table[jnp.asarray(idx.reshape(-1))]
    bias = bias.reshape(n, n, num_heads).transpose(2, 0, 1).astype(jnp.float32)

    wins = window_partition(x, ws)
    dy_wins = window_partition(dy.astype(x.dtype), ws)

    hsplit = pick_head_split(c, num_heads, ws, ln=True)
    if hsplit is not None and hsplit > 1 and _hsplit_enabled():
        (dx_wins, dwqkv, dbqkv, dwproj, dbproj, dbias, dln) = (
            _fused_bwd_windows_hsplit(
                wins, wqkv, bqkv, wproj, bias, dy_wins, num_heads=num_heads,
                hg_count=hsplit, wpb=wpb, shifted=shift_size > 0,
                grid_dims=grid_dims, ws=ws, ss=shift_size,
                interpret=interpret, ln=(ln_scale, ln_bias), ln_eps=ln_eps,
                residual=residual))
    else:
        (dx_wins, dwqkv, dbqkv, dwproj, dbproj, dbias,
         dln) = _fused_bwd_windows(
            wins, wqkv, bqkv, wproj, bias, dy_wins, num_heads=num_heads,
            wpb=wpb, shifted=shift_size > 0, grid_dims=grid_dims, ws=ws,
            ss=shift_size, interpret=interpret, ln=(ln_scale, ln_bias),
            ln_eps=ln_eps, residual=residual)

    dx = window_reverse(dx_wins, ws, (d, h, w))
    table_size = rel_bias_table.shape[0]
    flat = dbias.transpose(1, 2, 0).reshape(-1, num_heads)
    dtable = jax.ops.segment_sum(flat, jnp.asarray(idx.reshape(-1)),
                                 num_segments=table_size)
    return (dx.astype(x.dtype), dln[0].astype(ln_scale.dtype),
            dln[1].astype(ln_bias.dtype), dwqkv.astype(wqkv.dtype),
            dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
            dbproj, dtable.astype(rel_bias_table.dtype))


fused_window_attention_ln_trainable.defvjp(_fwa_ln_fwd, _fwa_ln_bwd)


# ---------------------------------------------------------------------------
# Global-query windowed attention (GC-ViT): queries come from the stage's
# FeatExtract pyramid (one ws³ query grid per batch element, shared by every
# window), K/V from each local window (reference gc_vit_3d.py:292-380 —
# WindowAttentionGlobal3D). Fuses [LN ->] kv dense -> per-head attention
# (fp32 softmax in VMEM) -> proj dense [-> +shortcut] exactly like the local
# kernel; the (N, N) attention matrices never touch HBM. Inference-only
# (GC-ViT training keeps the XLA path, as the local blocks do).
# ---------------------------------------------------------------------------


def _global_kernel(x_ref, q_ref, wkv_ref, bkv_ref, wproj_ref, bproj_ref,
                   bias_ref, out_ref, *, num_heads: int, wpb: int,
                   ln_ref=None, ln_eps: float = 1e-5,
                   residual: bool = False):
    n = x_ref.shape[1]
    c = x_ref.shape[-1]
    hd = c // num_heads
    scale = hd ** -0.5

    xr = x_ref[:]
    if ln_ref is not None:
        xf = xr.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.maximum(0.0, (xf * xf).mean(axis=-1, keepdims=True)
                          - mu * mu)
        xn = ((xf - mu) * (jax.lax.rsqrt(var + ln_eps) * ln_ref[0])
              + ln_ref[1])
        xw = xn.astype(x_ref.dtype).reshape(wpb * n, c)
    else:
        xw = xr.reshape(wpb * n, c)
    kv = jnp.dot(xw, wkv_ref[:], preferred_element_type=jnp.float32)
    kv = (kv + bkv_ref[:]).astype(x_ref.dtype).reshape(wpb, n, 2 * c)

    qg = (q_ref[0].astype(jnp.float32) * scale).astype(x_ref.dtype)  # (N, C)

    outs = []
    for h in range(num_heads):
        # two basic-index steps, NOT qg[None, :, a:b]: the combined
        # (newaxis, slice, slice) tuple rewrites to a lax.gather, which
        # Mosaic's TPU lowering rejects ("Shape mismatch in input, indices
        # and output" — only 2D take_along_axis gathers are supported)
        q = jnp.broadcast_to(qg[:, h * hd:(h + 1) * hd][None], (wpb, n, hd))
        k = kv[:, :, h * hd:(h + 1) * hd]
        v = kv[:, :, c + h * hd:c + (h + 1) * hd]
        attn = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        attn = attn + bias_ref[h][None]
        attn = jax.nn.softmax(attn, axis=-1).astype(x_ref.dtype)
        outs.append(jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    out = jnp.concatenate(outs, axis=-1).astype(x_ref.dtype)

    out = jnp.dot(out.reshape(wpb * n, c), wproj_ref[:],
                  preferred_element_type=jnp.float32)
    out = (out + bproj_ref[:]).astype(x_ref.dtype)
    if residual:
        out = out + xr.reshape(wpb * n, c)
    out_ref[:] = out.reshape(wpb, n, c)


def fused_global_window_attention(
    x: jnp.ndarray,
    q_global: jnp.ndarray,
    wkv: jnp.ndarray,
    bkv: Optional[jnp.ndarray],
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    rel_bias_table: jnp.ndarray,
    window_size: int,
    num_heads: int,
    windows_per_block: int = 8,
    interpret: bool = False,
    ln_scale: Optional[jnp.ndarray] = None,
    ln_bias: Optional[jnp.ndarray] = None,
    ln_eps: float = 1e-5,
    residual: bool = False,
    pre_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x (B, D, H, W, C), q_global (B, ws, ws, ws, C) -> (B, D, H, W, C).

    D/H/W must be multiples of window_size. Each tile of windows belongs to
    one batch element (wpb divides the per-batch window count), whose query
    grid is streamed in as a second VMEM block. With ln_scale/ln_bias the
    kernel absorbs the block's pre-attention LayerNorm (x is the RAW
    volume; the queries were computed from the stage input and are NOT
    re-normalized, matching the module); residual absorbs the shortcut add.
    """
    b, d, h, w, c = x.shape
    ws = window_size
    n = ws ** 3
    grid_dims = (d // ws, h // ws, w // ws)
    nwin = int(np.prod(grid_dims))  # windows per batch element
    total = b * nwin
    ln = ln_scale is not None

    bias_bytes = num_heads * n * n * 4
    per_win = n * 2 * c * 6 + 2 * n * n * 6 + n * c * (16 if ln else 12)
    budget = 8 * 1024 * 1024
    wpb_fit = max(int((budget - bias_bytes - n * c * 6) // max(per_win, 1)), 1)
    wpb = max(min(windows_per_block, wpb_fit), 1)
    while nwin % wpb != 0:  # a tile must not straddle batch elements
        wpb -= 1

    if bkv is None:
        bkv = jnp.zeros((2 * c,), jnp.float32)

    if pre_bias is not None:
        bias = pre_bias.astype(jnp.float32)  # (nh, N, N), e.g. quirk-indexed
    else:
        idx = relative_position_index((ws, ws, ws))
        bias = rel_bias_table[jnp.asarray(idx.reshape(-1))]
        bias = bias.reshape(n, n, num_heads).transpose(2, 0, 1).astype(
            jnp.float32)

    wins = window_partition(x, ws)          # (total, N, C), batch-major
    qg = q_global.reshape(b, n, c).astype(x.dtype)

    in_specs = [
        pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, c), lambda i: ((i * wpb) // nwin, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 2 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [wins, qg, wkv.astype(x.dtype), bkv.astype(jnp.float32),
            wproj.astype(x.dtype), bproj.astype(jnp.float32), bias]

    if ln:
        def kern(x_ref, q_ref, wkv_ref, bkv_ref, wproj_ref, bproj_ref,
                 bias_ref, ln_ref, out_ref):
            _global_kernel(x_ref, q_ref, wkv_ref, bkv_ref, wproj_ref,
                           bproj_ref, bias_ref, out_ref,
                           num_heads=num_heads, wpb=wpb, ln_ref=ln_ref,
                           ln_eps=ln_eps, residual=residual)
        in_specs.append(pl.BlockSpec((2, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.stack([ln_scale, ln_bias]).astype(jnp.float32))
    else:
        kern = functools.partial(_global_kernel, num_heads=num_heads,
                                 wpb=wpb, residual=residual)

    out = pl.pallas_call(
        kern,
        grid=(total // wpb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, n, c), x.dtype),
        interpret=interpret,
    )(*args)
    return window_reverse(out, ws, (d, h, w))


# ---------------------------------------------------------------------------
# Head-split backward: the flagship's stage-4 shape (c=384, 24 heads, 216
# tokens) overflows scoped VMEM in the whole-head backward above (25.14M
# reported vs the 16M limit — the three (nh, N, N) fp32 bias buffers alone
# are 13.4M). Splitting heads across a second grid axis shrinks every
# per-head buffer to a head-group slice:
#   * grid (window_tiles, head_groups), head axis fastest: dx accumulates
#     in its (fp32) output block across the consecutive head-group steps;
#   * per-tile dbias PARTIALS go to HBM (one unique block per grid step, no
#     (nh, N, N) accumulator in VMEM) and are summed by XLA outside;
#   * weight grads accumulate in head-group-major fp32 scratch and are
#     written out at the last grid step.
# Weights are streamed in head-sliced layouts whose trailing dims tile
# cleanly: wqkv as (3, nh, hd, c), wproj as (nh, hd, c).
# ---------------------------------------------------------------------------


def _bwd_hsplit_vmem_bytes(c: int, num_heads: int, hg_count: int, n: int,
                           wpb: int = 1, ln: bool = False) -> int:
    """Scoped-VMEM estimate for one (tile, head-group) step of the
    head-split backward (double-buffered blocks counted twice)."""
    nh_g = num_heads // hg_count
    khg = 3 * nh_g * (c // num_heads)
    return (2 * wpb * n * c * (2 + 2 + 4)       # x, dy (bf16), dx out (fp32), dbl-buffered
            + (3 * wpb * n * c * 8 if ln else 0)  # xr32/xhat/dxhat fp32 temps
            + 2 * (khg * c * 2 + nh_g * (c // num_heads) * c * 2)  # wqkv/wproj blocks
            + 2 * 2 * nh_g * n * n * 4          # bias in + dbias partial out
            + wpb * n * khg * 6                 # qkv_hg fp32 + bf16
            + 4 * wpb * n * n * 4               # live per-head attention temps
            + 3 * wpb * n * khg * 6             # dout/o/dqkv head-group temps
            + hg_count * c * khg * 4            # dwqkv scratch (full, persists)
            + hg_count * khg // 3 * c * 4       # dwproj scratch
            + hg_count * khg * 4 + c * 4        # dbqkv + dbproj scratch
            + (2 * c + 2) * c * 4)              # ln scratch + slack


def pick_head_split(c: int, num_heads: int, window_size: int,
                    ln: bool = False,
                    limit: int = 14 * 1024 * 1024) -> Optional[int]:
    """Smallest head-group count whose backward step fits scoped VMEM, or
    None (1 means the whole-head kernel above fits)."""
    n = window_size ** 3
    if pallas_train_bwd_vmem_bytes(c, num_heads, window_size,
                                   ln=ln) <= limit:
        return 1
    for hg in range(2, num_heads + 1):
        if num_heads % hg:
            continue
        if _bwd_hsplit_vmem_bytes(c, num_heads, hg, n, ln=ln) <= limit:
            return hg
    return None


def _bwd_kernel_hsplit(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref,
                       dy_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                       dbproj_ref, dbias_ref, *, nh_g: int, wpb: int,
                       shifted: bool, grid_dims: Tuple[int, int, int],
                       ws: int, ss: int, acc_ref=None, ln_ref=None,
                       dln_ref=None, ln_eps: float = 1e-5,
                       residual: bool = False):
    """One (window-tile, head-group) step. Refs:
      x (wpb, n, c) · wqkv (3, nh_g, hd, c) · bqkv (1, 8, 3*nh_g*hd) ·
      wproj (nh_g, hd, c) · bias (nh_g, n, n) · dy (wpb, n, c)
    Outs: dx (wpb, n, c) fp32 (accumulated over head groups) · dwqkv
      (HG, c, 3*nh_g*hd) · dbqkv (HG, 3*nh_g*hd) · dwproj (HG, nh_g*hd, c) ·
      dbproj (1, c) · dbias partials (1, nh_g, n, n) per step."""
    n = x_ref.shape[1]
    c = x_ref.shape[-1]
    hd = wqkv_ref.shape[2]
    scale = hd ** -0.5
    khg = 3 * nh_g * hd
    nblk = pl.num_programs(0)
    n_hg = pl.num_programs(1)
    blk = pl.program_id(0)
    hg = pl.program_id(1)

    wacc_qkv, wacc_proj, bacc_v, lnacc = acc_ref

    @pl.when((blk == 0) & (hg == 0))
    def _init():
        wacc_qkv[:] = jnp.zeros_like(wacc_qkv)
        wacc_proj[:] = jnp.zeros_like(wacc_proj)
        bacc_v[:] = jnp.zeros_like(bacc_v)
        if lnacc is not None:
            lnacc[:] = jnp.zeros_like(lnacc)

    if ln_ref is not None:
        xr32 = x_ref[:].reshape(wpb * n, c).astype(jnp.float32)
        mu = xr32.mean(axis=-1, keepdims=True)
        var = jnp.maximum(0.0, (xr32 * xr32).mean(axis=-1, keepdims=True)
                          - mu * mu)
        inv = jax.lax.rsqrt(var + ln_eps)
        xhat = (xr32 - mu) * inv
        xw = (xhat * ln_ref[0] + ln_ref[1]).astype(x_ref.dtype)
    else:
        xw = x_ref[:].reshape(wpb * n, c)

    # head-group qkv recompute: (M, c) x (3*nh_g*hd, c) -> (M, 3*nh_g*hd)
    w_hg = wqkv_ref[:].reshape(khg, c)
    qkv = jax.lax.dot_general(xw, w_hg, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0, 0]).astype(x_ref.dtype)
    qkv = qkv.reshape(wpb, n, khg)

    mask = (_window_mask(wpb, n, grid_dims, ws, ss) if shifted else None)

    dy = dy_ref[:].reshape(wpb * n, c)
    wp_hg = wproj_ref[:].reshape(nh_g * hd, c)
    dout = jax.lax.dot_general(dy, wp_hg, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dout = dout.astype(x_ref.dtype).reshape(wpb, n, nh_g * hd)

    o_parts = []
    dq_parts, dk_parts, dv_parts = [], [], []
    dbias_parts = []
    for h in range(nh_g):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, (nh_g + h) * hd:(nh_g + h + 1) * hd]
        v = qkv[:, :, (2 * nh_g + h) * hd:(2 * nh_g + h + 1) * hd]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[h][None]
        if mask is not None:
            s = s + mask
        p32 = jax.nn.softmax(s, axis=-1)
        p = p32.astype(x_ref.dtype)

        o_parts.append(jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x_ref.dtype))

        do_h = dout[:, :, h * hd:(h + 1) * hd]
        dp = jax.lax.dot_general(do_h, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(p, do_h, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
        dbias_parts.append(ds.sum(axis=0))
        ds_l = (ds * scale).astype(x_ref.dtype)
        dq_parts.append(jax.lax.dot_general(
            ds_l, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        dk_parts.append(jax.lax.dot_general(
            ds_l, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        dv_parts.append(dv)

    dbias_ref[:] = jnp.stack(dbias_parts)[None]  # (1, nh_g, n, n) partials

    o = jnp.concatenate(o_parts, axis=-1).reshape(wpb * n, nh_g * hd)
    dwproj = jax.lax.dot_general(o, dy, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    wacc_proj[hg] += dwproj

    @pl.when(hg == 0)
    def _dbproj():
        on_first = dy.astype(jnp.float32).sum(axis=0)
        bp = jnp.where(blk == 0, on_first, dbproj_ref[0] + on_first)
        dbproj_ref[0] = bp

    dqkv = jnp.concatenate(
        [jnp.concatenate([t for t in dq_parts], axis=-1),
         jnp.concatenate([t for t in dk_parts], axis=-1),
         jnp.concatenate([t for t in dv_parts], axis=-1)], axis=-1)
    dqkv = dqkv.reshape(wpb * n, khg).astype(x_ref.dtype)

    # dx (normed-space for LN) accumulates over head groups in the output
    dx_part = jax.lax.dot_general(dqkv, w_hg, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dx_part = dx_part.reshape(wpb, n, c)

    @pl.when(hg == 0)
    def _dx_init():
        dx_ref[:] = dx_part

    @pl.when(hg > 0)
    def _dx_acc():
        dx_ref[:] = dx_ref[:] + dx_part

    @pl.when(hg == n_hg - 1)
    def _dx_final():
        t = dx_ref[:].reshape(wpb * n, c)
        if ln_ref is not None:
            dxhat = t * ln_ref[0]
            m1 = dxhat.mean(axis=-1, keepdims=True)
            m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
            out = (dxhat - m1 - xhat * m2) * inv
            lnacc[0] += (t * xhat).sum(axis=0)
            lnacc[1] += t.sum(axis=0)
        else:
            out = t
        if residual:
            out = out + dy.astype(jnp.float32)
        dx_ref[:] = out.reshape(wpb, n, c)

    dwqkv = jax.lax.dot_general(xw, dqkv, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    wacc_qkv[hg] += dwqkv
    bacc_v[hg] += dqkv.astype(jnp.float32).sum(axis=0)

    @pl.when((blk == nblk - 1) & (hg == n_hg - 1))
    def _flush():
        dwqkv_ref[:] = wacc_qkv[:]
        dwproj_ref[:] = wacc_proj[:]
        dbqkv_ref[:] = bacc_v[:]
        if dln_ref is not None:
            dln_ref[:] = lnacc[:]


def _fused_bwd_windows_hsplit(wins, wqkv, bqkv, wproj, bias, dy_wins, *,
                              num_heads, hg_count, wpb, shifted, grid_dims,
                              ws, ss, interpret=False, ln=None, ln_eps=1e-5,
                              residual=False):
    """Head-split variant of :func:`_fused_bwd_windows`; same return
    contract (dx in fp32; dbias summed over tiles outside)."""
    total, n, c = wins.shape
    nh = num_heads
    nh_g = nh // hg_count
    hd = c // nh
    khg = 3 * nh_g * hd
    nblk = total // wpb

    # head-sliced weight layouts whose trailing dims tile cleanly
    wqkv4 = wqkv.reshape(c, 3, nh, hd).transpose(1, 2, 3, 0)   # (3, nh, hd, c)
    wproj3 = wproj.reshape(nh, hd, c)                          # (nh, hd, c)
    # qkv bias in group-major (HG, 8, khg) layout: one pre-flattened
    # (3*nh_g*hd) row per head group, tiled to 8 sublanes so the (1, 8, khg)
    # block satisfies Mosaic's (8,128) tiling rule for any head-group count
    # (a (3, nh_g, hd) block with nh_g not 8-divisible is rejected at
    # lowering — stage 4 hit this — and an in-kernel reshape of the loaded
    # vector is an unsupported Mosaic shape cast)
    bqkv_grp = (bqkv.reshape(3, hg_count, nh_g * hd)
                .transpose(1, 0, 2).reshape(hg_count, 1, khg))
    bqkv_grp = jnp.broadcast_to(bqkv_grp, (hg_count, 8, khg))

    kernel = functools.partial(_bwd_kernel_hsplit, nh_g=nh_g, wpb=wpb,
                               shifted=shifted, grid_dims=grid_dims, ws=ws,
                               ss=ss, ln_eps=ln_eps, residual=residual)

    in_specs = [
        pl.BlockSpec((wpb, n, c), lambda i, g: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, nh_g, hd, c), lambda i, g: (0, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, khg), lambda i, g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nh_g, hd, c), lambda i, g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nh_g, n, n), lambda i, g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wpb, n, c), lambda i, g: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((wpb, n, c), lambda i, g: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hg_count, c, khg), lambda i, g: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hg_count, khg), lambda i, g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hg_count, nh_g * hd, c), lambda i, g: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, g: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nh_g, n, n), lambda i, g: (i, g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((total, n, c), jnp.float32),
        jax.ShapeDtypeStruct((hg_count, c, khg), jnp.float32),
        jax.ShapeDtypeStruct((hg_count, khg), jnp.float32),
        jax.ShapeDtypeStruct((hg_count, nh_g * hd, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((nblk, nh, n, n), jnp.float32),
    ]
    args = [wins, wqkv4.astype(wins.dtype), bqkv_grp.astype(jnp.float32),
            wproj3.astype(wins.dtype), bias, dy_wins]
    scratch = [
        pltpu.VMEM((hg_count, c, khg), jnp.float32),
        pltpu.VMEM((hg_count, nh_g * hd, c), jnp.float32),
        pltpu.VMEM((hg_count, khg), jnp.float32),
    ]

    if ln is not None:
        in_specs.append(pl.BlockSpec((2, c), lambda i, g: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_specs.append(pl.BlockSpec((2, c), lambda i, g: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((2, c), jnp.float32))
        args.append(jnp.stack([ln[0], ln[1]]).astype(jnp.float32))
        scratch.append(pltpu.VMEM((2, c), jnp.float32))

        def wrapped(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, dy_ref,
                    ln_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                    dbproj_ref, dbias_ref, dln_ref, wacc_q, wacc_p, bacc_v,
                    lnacc):
            kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, dy_ref,
                   dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                   dbias_ref, acc_ref=(wacc_q, wacc_p, bacc_v, lnacc),
                   ln_ref=ln_ref, dln_ref=dln_ref)
    else:
        def wrapped(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, dy_ref,
                    dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                    dbias_ref, wacc_q, wacc_p, bacc_v):
            kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, dy_ref,
                   dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                   dbias_ref, acc_ref=(wacc_q, wacc_p, bacc_v, None))

    bias_h = bias.reshape(nh, n, n)
    outs = pl.pallas_call(
        wrapped,
        grid=(nblk, hg_count),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(args[0], args[1], args[2], args[3], bias_h, *args[5:])

    if ln is not None:
        dx, dwq3, dbq3, dwp3, dbp, dbias_parts, dln = outs
    else:
        dx, dwq3, dbq3, dwp3, dbp, dbias_parts = outs

    # reassemble full-weight layouts
    dwqkv = dwq3.reshape(hg_count, c, 3, nh_g, hd).transpose(1, 2, 0, 3, 4)
    dwqkv = dwqkv.reshape(c, 3 * c)
    dbqkv = dbq3.reshape(hg_count, 3, nh_g, hd).transpose(1, 0, 2, 3)
    dbqkv = dbqkv.reshape(3 * c)
    dwproj = dwp3.reshape(c, c)
    dbproj = dbp[0]
    dbias = dbias_parts.sum(axis=0)  # (nh, n, n)

    ret = (dx.astype(wins.dtype), dwqkv, dbqkv, dwproj, dbproj, dbias)
    if ln is not None:
        ret = ret + (dln,)
    return ret
