"""One-HBM-pass 3x3x3 weight gradient as a Pallas TPU kernel.

The decoder's conv weight gradients dominate the flagship train step
(reference workload: the UnetrBasicBlock/UnetrUpBlock convs,
/root/reference/models/segmentors/swin_unetr.py:73-130). ops/convgrad.py's
tap decomposition — dW as 27 (C, M) @ (M, Co) dots on shifted slices of the
padded input — runs AT the (C/128)*(Co/128) MXU PE ceiling (27.2 TF/s for
C=Co=48, 2.7x XLA's native dW lowering), but as an XLA formulation each tap
re-reads the whole padded x from HBM: 27 volume passes. Above ~1.5M voxels
(per-chip batch >= 2, or the 96->48-channel up-block convs) the re-reads turn
the gradient HBM-bound and the decomposition LOSES to XLA's native lowering
(measured bs4: 898 vs 753 ms/step), which is why bs>=2 kept the slow native
path — the root cause of the negative per-crop batch scaling (BENCH_r02).

This kernel keeps the 27-tap formulation but holds the f32[27, C, Co]
accumulator resident in VMEM across a sequential grid, so x and dy stream
from HBM O(1) times instead of 27:

  * w-axis shifts (kw) are pre-split host-side into 3 shifted HBM arrays —
    every in-kernel access is then aligned and contiguous (the same trick as
    ops/pallas/winograd3d.py's even/odd phase split);
  * h-axis shifts (kh) are free leading-dim slices of the VMEM block;
  * d-axis shifts (kd) ride the 3-plane DMA block fetched per grid step
    (each input plane is read 3x — the only redundancy left).

HBM traffic: 3 shifted-copy materializations + 3 kernel passes over x + 1
over dy, vs 27 x-passes (XLA taps) — at bs4 C=48 that is ~2.4 GB vs ~9.2 GB.
MXU work is unchanged (the taps are already at the PE ceiling).

Gated by MEDSEG_DW27_PALLAS (read in ops/convgrad.py) pending the on-TPU
A/B; correctness is oracle-tested against the XLA tap decomposition in
interpret mode (tests/test_pallas_dw27.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# test hook: CPU suites force interpret mode (monkeypatched; not an env knob)
_FORCE_INTERPRET = False

# per-step VMEM budget for the three (3, Hc+2, W, C) x blocks; the rest of
# the 16M scoped limit is left to dy's pipelined block + the accumulator
_X_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_hc(h: int, w: int, c: int, itemsize: int) -> int:
    """Largest divisor of h whose three x blocks fit the VMEM budget."""
    for hc in range(h, 0, -1):
        if h % hc:
            continue
        if 3 * 3 * (hc + 2) * w * c * itemsize <= _X_VMEM_BUDGET:
            return hc
    return 1


def _kernel(xw0_hbm, xw1_hbm, xw2_hbm, dy_ref, out_ref, x0_v, x1_v, x2_v,
            sems, *, hc: int):
    b = pl.program_id(0)
    d = pl.program_id(1)
    j = pl.program_id(2)

    cps = []
    for k, (hbm, v) in enumerate(((xw0_hbm, x0_v), (xw1_hbm, x1_v),
                                  (xw2_hbm, x2_v))):
        cp = pltpu.make_async_copy(
            hbm.at[b, pl.ds(d, 3), pl.ds(j * hc, hc + 2)], v, sems.at[k])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    co = dy_ref.shape[-1]
    dyf = dy_ref[0, 0].reshape(-1, co)

    xv = (x0_v, x1_v, x2_v)
    c = x0_v.shape[-1]
    taps = []
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                xs = xv[kw][kd, kh:kh + hc]          # (hc, W, C)
                taps.append(lax.dot_general(
                    xs.reshape(-1, c), dyf, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
    contrib = jnp.stack(taps)                        # (27, C, Co) f32

    first = (b == 0) & (d == 0) & (j == 0)

    @pl.when(first)
    def _():
        out_ref[...] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[...] = out_ref[...] + contrib


def dw27_applicable(shape, cin: int) -> bool:
    """Eligible inputs: W a sublane multiple (the in-kernel (Hc*W, C)
    flatten must be layout-free) and channels wide enough that the tap dots
    don't degenerate to outer products."""
    _, _, w = shape
    return cin >= 16 and w % 8 == 0 and w >= 8


def dw27_pallas(x: jnp.ndarray, dy: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """dW for the SAME/stride-1 3^3 conv: x (B,D,H,W,C), dy (B,D,H,W,Co)
    -> (3,3,3,C,Co) f32. One accumulator pass; see module docstring."""
    b, d, h, w, c = x.shape
    co = dy.shape[-1]
    assert dy.shape[:4] == x.shape[:4], (x.shape, dy.shape)
    assert dw27_applicable((d, h, w), c), (x.shape,)
    interpret = interpret or _FORCE_INTERPRET

    # lane-pad C to a 128 multiple: the manual HBM->VMEM DMA requires the
    # sliced memref's last dim to be tiling-aligned (a full-but-96-lane
    # slice of the 128-padded tiled memref is rejected at lowering). The
    # extra lanes are zeros, so the tap dots produce zero rows that are
    # sliced off below; MXU cost is unchanged (the contraction already
    # runs on 128-wide tiles).
    c_pad = -(-c // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, c_pad - c)))
    # pre-split w shifts: xw[k][..., i, :] == xp[..., i + k, :]
    xw = [xp[:, :, :, k:k + w] for k in range(3)]  # (B, D+2, H+2, W, c_pad)

    hc = _pick_hc(h, w, c_pad, np.dtype(x.dtype).itemsize)
    grid = (b, d, h // hc)

    out = pl.pallas_call(
        functools.partial(_kernel, hc=hc),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, hc, w, co), lambda b, d, j: (b, d, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((27, c_pad, co), lambda b, d, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27, c_pad, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, hc + 2, w, c_pad), x.dtype),
            pltpu.VMEM((3, hc + 2, w, c_pad), x.dtype),
            pltpu.VMEM((3, hc + 2, w, c_pad), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(xw[0], xw[1], xw[2], dy)

    return out[:, :c].reshape(3, 3, 3, c, co)
