"""Fused DiceCE loss as Pallas TPU kernels with a custom VJP.

The reference trains with MONAI DiceCELoss (softmax, to_onehot_y,
squared_pred; reference: run_training.py:103-105). The straightforward XLA
formulation (train/losses.py) materializes the one-hot target in HBM and
runs several separate softmax/log-softmax reduction chains over the
(B, 96^3, 14) fp32 logits — measured ~25 ms of the flagship train step
(NOTES.md), almost all of it HBM traffic.

Fused formulation: keep the logits' native voxel-major (M, C) layout (a
class-major relayout was measured SLOWER overall — three 50 MB XLA
transposes cost more than they save in VPU lane occupancy) and stream
M-tiles through two kernels:

  * forward/reduce — ONE pass over the logits; per grid step computes the
    tile's log-softmax (lane-axis reductions over C), builds the one-hot
    mask by comparing the labels column against a class iota (never
    materialized in HBM), and accumulates the per-(batch, class) Dice sums
    [intersection, sum p^2, class voxel counts] and the CE row into a small
    VMEM accumulator.
  * backward/elementwise — ONE pass recomputing the tile softmax and
    emitting d loss/d logits from the saved per-(batch, class) sums:
       g = A_bc * t + 2 B_bc * p          (A = df/dI, B = df/dD)
       dDice/dlogit = p * (g - sum_c g p)  (chain through softmax)
       dCE/dlogit   = (p - t) / (B*M)

Loss math matches train/losses.dice_ce_loss:
  dice_bc = 1 - (2 I + nr) / (D + dr), mean over (B, C); CE mean over voxels.
squared_pred=False (never used by the reference driver) falls back to XLA
autodiff of the unfused loss.

MEASURED OUTCOME (flagship 96^3 x 14, v5e): standalone the fusion wins 3.3x
(6.0 vs 20.0 ms fwd+bwd). Inside the full train step it is NEUTRAL: XLA
already fuses the unfused loss + argmax/Dice metric tail into the decoder's
out-conv cluster (value_and_grad bisect: xla 240.9 / xla+metrics 234.3 /
fused 238.8 / fused+metrics 288.7 ms — the kernel boundary un-fuses the
metric tail). Shipped as opt-in (--fused_loss); the default training path
keeps the XLA formulation.

Mosaic constraint learned on this pod: sublane-misaligned slices of stacked
coefficient arrays (e.g. rows [C:C+1) of a (C+1, 1) block) crash the remote
compile helper — every coefficient is its own lane-aligned input instead.
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


def _pick_tile(m: int) -> int:
    """Voxel-tile rows per grid step (sublane axis; lanes hold the classes)."""
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if m % t == 0:
            return t
    return 2048  # caller pads m up to a multiple of this


def _softmax_rows(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    z = x - m
    ez = jnp.exp(z)
    se = jnp.sum(ez, axis=-1, keepdims=True)
    return ez / se, z - jnp.log(se)


def _fwd_kernel(lt_ref, lb_ref, out_ref, acc_ref, *, c: int, t: int):
    mi = pl.program_id(1)
    nm = pl.num_programs(1)

    @pl.when(mi == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = lt_ref[0].astype(jnp.float32)          # (T, C)
    lbl = lb_ref[0].astype(jnp.int32)          # (T, 1)
    cls = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1)
    onehot = (cls == lbl).astype(jnp.float32)  # (T, C); all-zero on padding

    p, logp = _softmax_rows(x)

    # padded voxels carry label -1: onehot is all-zero there, but the uniform
    # softmax of the zero-padded logits would still pollute sum p^2 — mask it
    valid = (lbl >= 0).astype(jnp.float32)     # (T, 1)

    # accumulator rows: 0 intersection, 1 sum p^2, 2 class voxel counts,
    # 3 per-class CE sums (total CE = their sum)
    acc_ref[0:1, :] += jnp.sum(p * onehot, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(p * p * valid, axis=0, keepdims=True)
    acc_ref[2:3, :] += jnp.sum(onehot, axis=0, keepdims=True)
    acc_ref[3:4, :] += jnp.sum(-(logp * onehot), axis=0, keepdims=True)

    @pl.when(mi == nm - 1)
    def _flush():
        out_ref[0] = acc_ref[:]


def _bwd_kernel(lt_ref, lb_ref, ca_ref, cp_ref, ce_ref, dlt_ref, *, c: int,
                t: int):
    x = lt_ref[0].astype(jnp.float32)
    lbl = lb_ref[0].astype(jnp.int32)
    cls = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1)
    onehot = (cls == lbl).astype(jnp.float32)

    p, _ = _softmax_rows(x)

    g = ca_ref[0] * onehot + cp_ref[0] * p      # (1,C)x(T,C) broadcasts
    gsum = jnp.sum(g * p, axis=-1, keepdims=True)
    dl = p * (g - gsum) + ce_ref[0] * (p - onehot)
    dlt_ref[0] = dl.astype(dlt_ref.dtype)


def _flatten(logits: jnp.ndarray) -> Tuple[jnp.ndarray, int, int, int]:
    b = logits.shape[0]
    c = logits.shape[-1]
    m = int(np.prod(logits.shape[1:-1]))
    return logits.reshape(b, m, c), b, c, m


def _pad_m(lm: jnp.ndarray, lb: jnp.ndarray, m: int):
    t = _pick_tile(m)
    mp = ((m + t - 1) // t) * t
    if mp != m:
        lm = jnp.pad(lm, ((0, 0), (0, mp - m), (0, 0)))
        lb = jnp.pad(lb, ((0, 0), (0, mp - m), (0, 0)), constant_values=-1)
    return lm, lb, mp, t


def _fwd_sums(lm, lb, b, c, m):
    lm, lb, mp, t = _pad_m(lm, lb, m)
    nt = mp // t
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, t=t),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, c), lambda bi, mi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 4, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, c), jnp.float32)],
        interpret=_INTERPRET,
    )(lm, lb)
    return out[:, 0], out[:, 1], out[:, 2], out[:, 3].sum(-1)  # (B,C)x3,(B,)


def dice_ce_fused(logits: jnp.ndarray, labels: jnp.ndarray,
                  squared_pred: bool = True, smooth_nr: float = 1e-5,
                  smooth_dr: float = 1e-5, lambda_dice: float = 1.0,
                  lambda_ce: float = 1.0) -> jnp.ndarray:
    """MONAI DiceCELoss semantics; logits (B, *spatial, C) fp32-castable,
    labels (B, *spatial) int. Matches train/losses.dice_ce_loss."""
    if not squared_pred:
        # never used by the reference driver; XLA autodiff handles it
        from medicalsemseg_tpu.train.losses import dice_ce_loss
        return dice_ce_loss(logits, labels, squared_pred, smooth_nr,
                            smooth_dr, lambda_dice, lambda_ce)
    fn = _fused_for(tuple(logits.shape), jnp.dtype(logits.dtype).name,
                    float(smooth_nr), float(smooth_dr), float(lambda_dice),
                    float(lambda_ce))
    return fn(logits, labels)


@functools.lru_cache(maxsize=64)
def _fused_for(out_shape, dtype_name, smooth_nr, smooth_dr, lambda_dice,
               lambda_ce):
    """custom_vjp instance closed over the static shape/dtype/config (the
    residual pytree can only carry arrays)."""
    out_dtype = jnp.dtype(dtype_name)

    def _fwd(logits, labels):
        lm, b, c, m = _flatten(logits.astype(jnp.float32))
        lb = labels.reshape(b, m, 1).astype(jnp.int32)
        inter, pden, tden, ce_sum = _fwd_sums(lm, lb, b, c, m)

        denom = pden + tden
        f = 1.0 - (2.0 * inter + smooth_nr) / (denom + smooth_dr)
        loss = lambda_dice * f.mean() + lambda_ce * ce_sum.sum() / (b * m)
        return loss, (lm, lb, inter, denom)

    def _bwd(res, ct):
        lm, lb, inter, denom = res
        b, m, c = lm.shape

        # per-(batch, class) Dice coefficients from the saved sums:
        #   f = 1 - (2I + nr)/(D + dr), loss contrib = f / (B*C)
        #   df/dI = -2/(D+dr);  df/dD = (2I+nr)/(D+dr)^2;  dD/dp = 2p
        dd = denom + smooth_dr
        scale = ct * lambda_dice / (b * c)
        ca = (scale * (-2.0 / dd))[:, None, :]                   # (B, 1, C)
        cp = (scale * 2.0 * (2.0 * inter + smooth_nr)
              / (dd * dd))[:, None, :]                           # (B, 1, C)
        ce = jnp.broadcast_to(
            jnp.reshape(ct * lambda_ce / (b * m), (1, 1, 1)),
            (b, 1, 1)).astype(jnp.float32)

        lm_p, lb_p, mp, t = _pad_m(lm, lb, m)
        nt = mp // t
        dlm = pl.pallas_call(
            functools.partial(_bwd_kernel, c=c, t=t),
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, t, c), lambda bi, mi: (bi, mi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, 1), lambda bi, mi: (bi, mi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda bi, mi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda bi, mi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda bi, mi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, t, c), lambda bi, mi: (bi, mi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, mp, c), jnp.float32),
            interpret=_INTERPRET,
        )(lm_p, lb_p, ca, cp, ce)
        dlogits = dlm[:, :m, :].reshape(out_shape).astype(out_dtype)
        return dlogits, None

    @jax.custom_vjp
    def fused(logits, labels):
        return _fwd(logits, labels)[0]

    fused.defvjp(_fwd, _bwd)
    return fused
