"""Pallas TPU kernel (EXPERIMENTAL, not wired into models): 3x3x3 conv via
in-VMEM im2col.

The UNETR decoder's full-resolution residual blocks run 3^3 convs at 48
channels (reference: models/segmentors/swin_unetr.py:73-130). XLA's native 5D
conv lowering reaches only ~11% MFU there (measured, tools/bench_conv3d.py):
the 48-channel contraction underfills the 128-wide MXU on both operands.

The original hypothesis — "the same conv as one (M, 27*C) @ (27*C, Co)
matmul runs at ~59 TF/s" — came from a FLAWED benchmark whose dot got
algebraically simplified away (see tools/bench_matmul_shapes.py's docstring);
the honest number for that shape is 11 TF/s, HBM-bound. The kernel still
documents the in-VMEM im2col design:

  grid (B, D, H/TH); three input specs give the kd in {-1,0,+1} d-slabs of a
  halo-chunked input; per step 27 VMEM copies assemble cols (TH*W, 27*C) and
  one MXU dot produces the (TH, W, Co) output tile in fp32.

MEASURED OUTCOME (96^3, C=48, bf16, v5e): the kernel is correct but
copies-bound and LOSES to XLA — full kernel 6.7 ms vs XLA 5.0 ms; the 27
lane-misaligned VMEM writes alone cost 6.5 ms (Mosaic lowers each (TH*W, 48)
store at lane offset t*48 to rotate+masked read-modify-writes, ~350 GB/s
effective), while the dense dot costs 3.5 ms. Without im2col, the MXU ceiling
at C=48 is peak*48/128 (tap-by-tap K=48 passes) — no arrangement beats the
measured XLA path. Kept as documented negative result + test coverage; all
production conv paths use lax.conv_general_dilated.

The same im2col builder powers the weight-grad kernel (cols^T @ dy with an
fp32 VMEM accumulator across the sequential grid), and dx is the forward
kernel applied to dy with the spatially-flipped, in/out-transposed weights —
together they form the custom VJP `conv3x3x3`.

Layout contract: channels-last NDHWC, SAME padding, stride 1, any B/D; H
must be divisible by a tile TH (8 or 16) and C should be a multiple of 8.
Callers fall back to lax.conv_general_dilated otherwise (`supported()`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_INTERPRET = False  # tests flip this to run the kernels on CPU


def _pick_th(h: int, c_in: int) -> int:
    """H-tile size: smaller tiles for wide inputs to bound the cols buffer."""
    target = 16 if c_in <= 64 else 8
    th = min(target, h)
    while h % th != 0:
        th -= 1
    return th


def supported(x_shape: Tuple[int, ...], kernel_size, strides, c_in: int) -> bool:
    if tuple(kernel_size) != (3, 3, 3) or tuple(strides) != (1, 1, 1):
        return False
    b, d, h, w, c = x_shape
    if c != c_in or c % 8 != 0 or c > 128:
        return False
    if h < 8 or _pick_th(h, c) < 4:
        return False
    if w % 8 != 0:
        return False
    # cols tile must fit VMEM alongside slabs/out (~12 MB ceiling)
    th = _pick_th(h, c)
    cols_bytes = th * w * 27 * c * 2
    return cols_bytes <= 6 * 1024 * 1024


def _build_cols(slabs, th: int, w: int, c: int, cols_ref):
    """Assemble the im2col tile: cols[(h,w), (kd,kh,kw,c)] in VMEM.

    slabs[kd] is the (TH+2, W+2, C) input chunk for d-offset kd. Sublane
    slices at kw in {0,1,2} and 48-wide lane writes are misaligned to the
    (8, 128) tile; Mosaic lowers them to rotate/masked ops — measured cheap
    relative to the MXU dot.
    """
    for kd in range(3):
        for kh in range(3):
            rows = slabs[kd][0, 0, 0, kh:kh + th]  # (TH, W+2, C)
            for kw in range(3):
                t = (kd * 3 + kh) * 3 + kw
                blk = rows[:, kw:kw + w, :].reshape(th * w, c)
                cols_ref[:, t * c:(t + 1) * c] = blk


def _fwd_kernel(s0_ref, s1_ref, s2_ref, w_ref, out_ref, cols_ref, *,
                th: int, w: int, c: int, co: int):
    _build_cols((s0_ref, s1_ref, s2_ref), th, w, c, cols_ref)
    acc = jnp.dot(cols_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc.reshape(th, w, co).astype(out_ref.dtype)


def _chunk_input(x: jnp.ndarray, th: int) -> jnp.ndarray:
    """SAME-pad x and split H into overlapping (TH+2)-row chunks:
    (B, D+2, nH, TH+2, W+2, C). The ~(1 + 2/TH)x duplication buys
    non-overlapping BlockSpecs (Pallas blocks cannot overlap)."""
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    n_h = h // th
    chunks = [xp[:, :, i * th:i * th + th + 2] for i in range(n_h)]
    return jnp.stack(chunks, axis=2)


def _conv_fwd(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    b, d, h, ww, c = x.shape
    co = w.shape[-1]
    th = _pick_th(h, c)
    n_h = h // th
    xc = _chunk_input(x, th)
    w_flat = w.reshape(27 * c, co).astype(x.dtype)

    grid = (b, d, n_h)
    slab = (1, 1, 1, th + 2, ww + 2, c)

    def slab_spec(kd):
        return pl.BlockSpec(slab, lambda bi, di, hi, kd=kd: (bi, di + kd, hi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, w=ww, c=c, co=co),
        grid=grid,
        in_specs=[slab_spec(0), slab_spec(1), slab_spec(2),
                  pl.BlockSpec((27 * c, co), lambda bi, di, hi: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, th, ww, co),
                               lambda bi, di, hi: (bi, di, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, ww, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((th * ww, 27 * c), x.dtype)],
        interpret=_INTERPRET,
    )(xc, xc, xc, w_flat)


def _dw_kernel(s0_ref, s1_ref, s2_ref, dy_ref, dw_ref, cols_ref, acc_ref, *,
               th: int, w: int, c: int, co: int):
    nb = pl.num_programs(0) * pl.num_programs(1) * pl.num_programs(2)
    blk = ((pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
           * pl.num_programs(2) + pl.program_id(2))

    @pl.when(blk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _build_cols((s0_ref, s1_ref, s2_ref), th, w, c, cols_ref)
    dy = dy_ref[0, 0, 0].reshape(th * w, co)
    acc_ref[:] += jax.lax.dot_general(
        cols_ref[:], dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(blk == nb - 1)
    def _flush():
        dw_ref[:] = acc_ref[:]


def _conv_dw(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """dW (27*C, Co) fp32 = im2col(x)^T @ dy, accumulated across the grid."""
    b, d, h, ww, c = x.shape
    co = dy.shape[-1]
    th = _pick_th(h, c)
    n_h = h // th
    xc = _chunk_input(x, th)
    dyc = dy.reshape(b, d, n_h, th, ww, co)

    grid = (b, d, n_h)
    slab = (1, 1, 1, th + 2, ww + 2, c)

    def slab_spec(kd):
        return pl.BlockSpec(slab, lambda bi, di, hi, kd=kd: (bi, di + kd, hi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_dw_kernel, th=th, w=ww, c=c, co=co),
        grid=grid,
        in_specs=[slab_spec(0), slab_spec(1), slab_spec(2),
                  pl.BlockSpec((1, 1, 1, th, ww, co),
                               lambda bi, di, hi: (bi, di, hi, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((27 * c, co), lambda bi, di, hi: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27 * c, co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((th * ww, 27 * c), x.dtype),
                        pltpu.VMEM((27 * c, co), jnp.float32)],
        interpret=_INTERPRET,
    )(xc, xc, xc, dyc)


@jax.custom_vjp
def conv3x3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME, stride-1, channels-last 3x3x3 conv: x (B,D,H,W,C) * w (3,3,3,C,Co).

    Forward and both backward passes are Pallas im2col kernels; check
    `supported(x.shape, (3,3,3), (1,1,1), x.shape[-1])` before calling.
    """
    return _conv_fwd(x, w)


def _vjp_fwd(x, w):
    return _conv_fwd(x, w), (x, w)


def _vjp_bwd(res, dy):
    x, w = res
    dy = dy.astype(x.dtype)
    # dx: correlate dy with the flipped, in/out-swapped kernel
    w_t = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _conv_fwd(dy, w_t.astype(x.dtype))
    dw = _conv_dw(x, dy).reshape(3, 3, 3, x.shape[-1], dy.shape[-1])
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3x3.defvjp(_vjp_fwd, _vjp_bwd)


def conv3x3x3_reference(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """XLA oracle for tests."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                        dimension_numbers=dn)
