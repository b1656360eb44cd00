"""Fused Winograd F(2^3, 3^3) 3D convolution as a Pallas TPU kernel.

Why: the decoder's SAME/stride-1 3^3 convolutions are PE-bound at the C=48
lane ceiling — XLA's direct emitter already runs at ~80% of the structural
(48/128)^2 limit (NOTES.md), so only an arithmetic transform can go faster.
F(2,3) computes each 2^3 output tile from a 4^3 input tile with 4^3 = 64
products instead of 2^3 * 27 = 216 MACs: a 3.375x MXU-work cut. Its
transform coefficients are {0, +-1, +-1/2} — bf16-exact scaling, measured
max rel error 0.7% vs the direct bf16 conv's own 0.3% (tests/test_winograd.py)
— unlike F(4,3), whose +-5 coefficients destroy bf16 cancellation
(ops/winograd.py docstring).

Why Pallas: the Winograd-domain V/M tensors hold 8 values per output voxel.
In an XLA formulation they round-trip HBM (~679 MB each at 96^3 C=48) and the
transform is a wash against the direct conv (estimated ~4.8 vs 5.09 ms).
Here each program keeps its block's V/M entirely in VMEM: HBM traffic is
x-read (+halo) and y-write only.

Layout strategy (the whole trick — Mosaic tiles only the last two dims):
  * the w axis is pre-split host-side into even/odd phase arrays, so every
    in-kernel stride-2 access becomes a CONTIGUOUS slice;
  * d/h phase splits are reshapes of MAJOR dims — layout-free;
  * the matmul flattens (T, U, bwq, C) -> (T*U*bwq, C), which is
    layout-free because bwq % 8 == 0 keeps sublane tiles intact (same trick
    as ops/pallas/window_attention.py's (wpb, n, c) -> (wpb*n, c));
  * outputs are written as separate even/odd w-phase arrays (no sublane
    interleave in-kernel); the host interleaves with one fused reshape.

Inference-only (conv3x3x3_s1's no-gradient PRIMAL): training keeps the
measured-fastest gradient formulations in ops/convgrad.py.
Reference workload: the UnetrBasicBlock convs,
/root/reference/models/segmentors/swin_unetr.py:73-130.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2,3): B^T (4x4), G (4x3), A^T (2x4)
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)


def transform_weights_f23(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,C,Co) -> (64, C, Co) Winograd-domain weights, a-major order."""
    g = jnp.asarray(G)
    u = jnp.einsum("ar,rstio->astio", g, w.astype(jnp.float32))
    u = jnp.einsum("bs,astio->abtio", g, u)
    u = jnp.einsum("ct,abtio->abcio", g, u)
    return u.reshape(64, w.shape[3], w.shape[4])


def _combine4(p0, p1, p2, p3):
    """B^T combos of the 4 phase arrays along one axis (rows of BT)."""
    return (p0 - p2, p1 + p2, p2 - p1, p1 - p3)


def _kernel(xe_hbm, xo_hbm, w_ref, ye_ref, yo_ref, xe_v, xo_v, sems, *,
            bd: int, bh: int, bwq: int, bwq_pad: int, cin: int, cout: int,
            out_dtype, ep_ref=None, lrelu: bool = False,
            neg_slope: float = 0.01, dims=None):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    cp_e = pltpu.make_async_copy(
        xe_hbm.at[b, pl.ds(bd * i, bd + 2), pl.ds(bh * j, bh + 2)],
        xe_v, sems.at[0])
    cp_o = pltpu.make_async_copy(
        xo_hbm.at[b, pl.ds(bd * i, bd + 2), pl.ds(bh * j, bh + 2)],
        xo_v, sems.at[1])
    cp_e.start()
    cp_o.start()
    cp_e.wait()
    cp_o.wait()

    t, u = bd // 2, bh // 2
    mrows = t * u * bwq

    xe = xe_v[:]            # (bd+2, bh+2, bwq_pad, C) bf16
    xo = xo_v[:]

    if ep_ref is not None:
        # input epilogue: per-(sample, channel) scale/shift (+ LeakyReLU)
        # applied to the RAW conv input in VMEM — absorbs the preceding
        # InstanceNorm's normalize pass (and its activation). The outer
        # SAME-padding halo voxels must stay 0 (the reference pads AFTER the
        # activation), so positions at padded coords 0 / dim+1 are re-zeroed.
        dd, hh, ww = dims
        sc = ep_ref[0, 0].astype(jnp.float32)  # (C,)
        sh = ep_ref[0, 1].astype(jnp.float32)

        def _apply(tile, wphase):
            v = tile.astype(jnp.float32) * sc + sh
            if lrelu:
                v = jnp.where(v >= 0, v, v * neg_slope)
            gd = (bd * i
                  + jax.lax.broadcasted_iota(jnp.int32,
                                             (bd + 2, 1, 1, 1), 0))
            gh = (bh * j
                  + jax.lax.broadcasted_iota(jnp.int32,
                                             (1, bh + 2, 1, 1), 1))
            gw = (2 * jax.lax.broadcasted_iota(jnp.int32,
                                               (1, 1, bwq_pad, 1), 2)
                  + wphase)
            pad = ((gd == 0) | (gd == dd + 1) | (gh == 0) | (gh == hh + 1)
                   | (gw == 0) | (gw == ww + 1))
            return jnp.where(pad, 0.0, v).astype(tile.dtype)

        xe = _apply(xe, 0)
        xo = _apply(xo, 1)

    # w-axis: phases c=0..3 of tile k are xe[k], xo[k], xe[k+1], xo[k+1]
    w0 = xe[:, :, 0:bwq]
    w1 = xo[:, :, 0:bwq]
    w2 = xe[:, :, 1:bwq + 1]
    w3 = xo[:, :, 1:bwq + 1]
    cw = _combine4(w0, w1, w2, w3)  # 4 x (bd+2, bh+2, bwq, C)

    # h-axis: phase split is a MAJOR-dim reshape (layout-free)
    ch = []
    for a in cw:
        lo = a[:, 0:bh].reshape(bd + 2, u, 2, bwq, cin)
        hi = a[:, 2:bh + 2].reshape(bd + 2, u, 2, bwq, cin)
        ch.append(_combine4(lo[:, :, 0], lo[:, :, 1], hi[:, :, 0],
                            hi[:, :, 1]))
    # ch[c][b_]: (bd+2, u, bwq, C)

    at_rows = ((1.0, 1.0, 1.0, 0.0), (0.0, 1.0, -1.0, -1.0))

    # progressive inverse-transform accumulators Y[u'][v'][w'] (mrows, Co) f32
    y_acc = [[[None, None] for _ in range(2)] for _ in range(2)]

    for ia in range(4):
        # Q[v'][w'] accumulators for this a (reduced over b then c)
        q_acc = [[None, None], [None, None]]
        for ib in range(4):
            # d-axis phase split (major reshape) + combos, per w-combo c
            p0 = p1 = None
            for ic in range(4):
                a_full = ch[ic][ib]
                lo = a_full[0:bd].reshape(t, 2, u, bwq, cin)
                hi = a_full[2:bd + 2].reshape(t, 2, u, bwq, cin)
                cd = _combine4(lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1])
                v = cd[ia].reshape(mrows, cin)
                m = jnp.dot(v, w_ref[(ia * 4 + ib) * 4 + ic],
                            preferred_element_type=jnp.float32)
                # c-stage inverse: N0 = M0+M1+M2 ; N1 = M1-M2-M3
                if ic == 0:
                    p0 = m
                elif ic == 1:
                    p0 = p0 + m
                    p1 = m
                elif ic == 2:
                    p0 = p0 + m
                    p1 = p1 - m
                else:
                    p1 = p1 - m
            # b-stage inverse into Q
            for iv in range(2):
                cb = at_rows[iv][ib]
                if cb == 0.0:
                    continue
                for iw in range(2):
                    term = (p0 if iw == 0 else p1)
                    term = term if cb == 1.0 else -term
                    q_acc[iv][iw] = (term if q_acc[iv][iw] is None
                                     else q_acc[iv][iw] + term)
        # a-stage inverse into Y
        for iu in range(2):
            ca = at_rows[iu][ia]
            if ca == 0.0:
                continue
            for iv in range(2):
                for iw in range(2):
                    term = q_acc[iv][iw]
                    term = term if ca == 1.0 else -term
                    y_acc[iu][iv][iw] = (term if y_acc[iu][iv][iw] is None
                                         else y_acc[iu][iv][iw] + term)

    # assemble (bd, bh, bwq, Co) per w-phase: interleave u' into d and v'
    # into h — all MAJOR-dim stacks/transposes/reshapes
    for iw, ref in ((0, ye_ref), (1, yo_ref)):
        rows = [[y_acc[iu][iv][iw].reshape(t, u, bwq, cout)
                 for iv in range(2)] for iu in range(2)]
        blk = jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)
        # (2u', 2v', t, u, bwq, Co) -> (t, 2u', u, 2v', bwq, Co)
        blk = blk.transpose(2, 0, 3, 1, 4, 5)
        ref[0] = blk.reshape(bd, bh, bwq, cout).astype(out_dtype)


# test hook: CPU suites force interpret mode to exercise the kernel without
# a TPU backend (monkeypatched; not an env knob)
_FORCE_INTERPRET = False


def winograd_conv3d_f23(x: jnp.ndarray, w: jnp.ndarray,
                        block_d: int = 4, block_h: int = 4,
                        interpret: bool = False,
                        epilogue=None, lrelu: bool = False,
                        neg_slope: float = 0.01) -> jnp.ndarray:
    """SAME/stride-1 3^3 conv via the fused F(2^3,3^3) kernel.

    x (B, D, H, W, C) with D % block_d == 0, H % block_h == 0, W even and
    (W/2) % 8 == 0; w (3,3,3,C,Co). Returns (B, D, H, W, Co) in x.dtype.

    epilogue=(scale, shift), each (B, C) fp32, applies
    ``lrelu?(x * scale + shift)`` to the INPUT inside the kernel (zero
    SAME-padding preserved) — the folded form of a preceding
    InstanceNorm(+LeakyReLU), so conv -> IN -> lrelu -> conv chains skip the
    normalize pass over HBM entirely.
    """
    b, d, h, wd, c = x.shape
    co = w.shape[-1]
    assert d % block_d == 0 and h % block_h == 0, (d, h, block_d, block_h)
    assert wd % 2 == 0 and (wd // 2) % 8 == 0, wd
    bwq = wd // 2
    interpret = interpret or _FORCE_INTERPRET

    # tiling-align BOTH trailing dims of the manual HBM->VMEM DMA (Mosaic
    # rejects unaligned extents at lowering, measured on v5e): the phase
    # axis (W/2+1=49) pads to an 8-multiple and the channel axis lane-pads
    # to a 128-multiple. Zero input lanes contribute zero to the tap dots
    # and cost no MXU cycles (the contraction already runs on 128-wide
    # tiles); only the input DMA bytes grow.
    c_pad = -(-c // 128) * 128
    bwq_pad = -(-(bwq + 1) // 8) * 8
    wino_w = transform_weights_f23(w).astype(x.dtype)
    wino_w = jnp.pad(wino_w, ((0, 0), (0, c_pad - c), (0, 0)))

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1),
                     (1, 2 * bwq_pad - wd - 1), (0, c_pad - c)))
    xe = xp[:, :, :, 0::2]   # (B, D+2, H+2, bwq_pad, c_pad)
    xo = xp[:, :, :, 1::2]

    grid = (b, d // block_d, h // block_h)
    kern = functools.partial(_kernel, bd=block_d, bh=block_h, bwq=bwq,
                             bwq_pad=bwq_pad, cin=c_pad, cout=co,
                             out_dtype=x.dtype, lrelu=lrelu,
                             neg_slope=neg_slope, dims=(d, h, wd))
    in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((64, c_pad, co), lambda b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
    ]
    args = [xe, xo, wino_w]
    if epilogue is not None:
        scale, shift = epilogue
        ep = jnp.stack([scale, shift], axis=1).astype(jnp.float32)  # (B,2,C)
        ep = jnp.pad(ep, ((0, 0), (0, 0), (0, c_pad - c)))
        in_specs.append(pl.BlockSpec((1, 2, c_pad), lambda b, i, j: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(ep)

        base = kern

        def kern(xe_hbm, xo_hbm, w_ref, ep_ref, ye_ref, yo_ref,
                 xe_v, xo_v, sems):
            base(xe_hbm, xo_hbm, w_ref, ye_ref, yo_ref, xe_v, xo_v, sems,
                 ep_ref=ep_ref)

    ye, yo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_d, block_h, bwq, co),
                         lambda b, i, j: (b, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d, block_h, bwq, co),
                         lambda b, i, j: (b, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, h, bwq, co), x.dtype),
            jax.ShapeDtypeStruct((b, d, h, bwq, co), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_d + 2, block_h + 2, bwq_pad, c_pad), x.dtype),
            pltpu.VMEM((block_d + 2, block_h + 2, bwq_pad, c_pad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)

    # interleave the two w phases: y[..., 2k + p, :] = (ye, yo)[p][..., k, :]
    y = jnp.stack([ye, yo], axis=-2)          # (B, D, H, W/2, 2, Co)
    return y.reshape(b, d, h, wd, co)


def winograd_f23_applicable(shape, cin: int, block_d: int = 4,
                            block_h: int = 4) -> bool:
    """Eligible shapes: lane-underfilled channels (where the direct conv is
    PE-limited), even dims with (W/2) % 8 == 0, block-divisible D/H."""
    d, h, wd = shape
    return (cin >= 16 and cin < 128
            and d % block_d == 0 and h % block_h == 0
            and wd % 2 == 0 and (wd // 2) % 8 == 0)
