"""Fused token-MLP (LN -> Dense -> GELU -> Dense -> +residual) Pallas kernel.

The MLP half of every transformer block (reference: swin_nnformer.py:24-42,
applied at :270-272) is HBM-bound on TPU: its matmuls are lane-underfilled at
the flagship widths (C=48..384 against the 128-lane MXU) and the XLA chain
LN -> fc1 -> gelu -> fc2 -> add round-trips the token tensor through HBM
between fusion clusters (~4 volume-sized reads + writes per block; the
round-3 roofline ledger bills these under "loop fusions", ~465 GB/s).

Here each program instance owns a tile of tokens resident in VMEM and runs
the whole chain — the block's pre-MLP LayerNorm (fp32 fast-variance stats,
matching flax.linen.LayerNorm), both projections (fp32 MXU accumulation),
the exact (erf) GELU, and the shortcut add — so HBM traffic is one x read
and one output write.

Training uses :func:`fused_mlp_trainable` (custom VJP): the backward kernel
recomputes LN/h/gelu per tile, chains the GELU' and LN gradients in VMEM,
and accumulates dW1/dW2/db/dscale/dbias in fp32 scratch across the
(sequential on TPU) grid — the hidden (M, 4C) activations never exist in
HBM in either direction. Same recompute-not-store tradeoff the step already
makes under remat="conv".
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """fp32 erf via Abramowitz & Stegun 7.1.26 (|abs err| <= 1.5e-7).

    Mosaic TPU (jax 0.9) has no lowering for erf/erfc, so the in-kernel
    exact GELU evaluates this polynomial instead of jax.nn.gelu's erfc —
    the 1.5e-7 absolute error is ~fp32 ulp scale and far below the bf16
    activation precision the kernels run at."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_cdf(h: jnp.ndarray) -> jnp.ndarray:
    """Phi(h) = 0.5 * (1 + erf(h / sqrt(2))) — the exact-GELU gate."""
    return 0.5 * (1.0 + _erf(h * _INV_SQRT2))

# test hook: CPU suites force interpret mode (monkeypatched, not an env knob)
_FORCE_INTERPRET = False


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
            ln_ref=None, ln_eps: float = 1e-5, residual: bool = False):
    xr = x_ref[:]
    if ln_ref is not None:
        xf = xr.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.maximum(0.0, (xf * xf).mean(axis=-1, keepdims=True)
                          - mu * mu)
        xn = ((xf - mu) * (jax.lax.rsqrt(var + ln_eps) * ln_ref[0])
              + ln_ref[1]).astype(x_ref.dtype)
    else:
        xn = xr
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    h = (h * _gelu_cdf(h)).astype(x_ref.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = (y + b2_ref[:]).astype(x_ref.dtype)
    if residual:
        y = y + xr
    out_ref[:] = y


def fused_mlp(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    ln_scale: Optional[jnp.ndarray] = None,
    ln_bias: Optional[jnp.ndarray] = None,
    ln_eps: float = 1e-5,
    residual: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (..., C) -> MLP output (..., Co); Co must equal C when residual.

    With ln_scale/ln_bias, x is the RAW tensor and the kernel applies the
    pre-MLP LayerNorm in VMEM. Token tiles are blocked to fit scoped VMEM;
    the token count is padded up to the block size (pad rows compute garbage
    and are sliced off — LN/GELU of zeros is finite).
    """
    c = x.shape[-1]
    hdim = w1.shape[-1]
    co = w2.shape[-1]
    assert not residual or co == c, (co, c)
    lead = x.shape[:-1]
    m = int(np.prod(lead))
    interpret = interpret or _FORCE_INTERPRET
    ln = ln_scale is not None

    # per-row VMEM bytes: x (bf16) + fp32 LN temp, hidden fp32 + bf16 copy,
    # y fp32 + bf16; weights are shared across the grid
    per_row = c * (6 if ln else 2) + hdim * 6 + co * 6
    w_bytes = (c * hdim + hdim * co) * 2 + (hdim + co) * 4
    budget = 8 * 1024 * 1024
    blk = int((budget - w_bytes) // max(per_row, 1))
    blk = max(min(blk - blk % 256, 4096), 256)

    xt = x.reshape(m, c)
    mp = -(-m // blk) * blk
    if mp != m:
        xt = jnp.pad(xt, ((0, mp - m), (0, 0)))

    in_specs = [
        pl.BlockSpec((blk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hdim,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((hdim, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((co,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    args = [xt, w1.astype(x.dtype), b1.astype(jnp.float32),
            w2.astype(x.dtype), b2.astype(jnp.float32)]

    if ln:
        def kern(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln_ref, out_ref):
            _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                    ln_ref=ln_ref, ln_eps=ln_eps, residual=residual)
        in_specs.append(pl.BlockSpec((2, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.stack([ln_scale, ln_bias]).astype(jnp.float32))
    else:
        kern = functools.partial(_kernel, ln_eps=ln_eps, residual=residual)

    out = pl.pallas_call(
        kern,
        grid=(mp // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((blk, co), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, co), x.dtype),
        interpret=interpret,
    )(*args)
    if mp != m:
        out = out[:m]
    return out.reshape(*lead, co)


def _choose_block(c: int, hdim: int, co: int, ln: bool,
                  train: bool = False) -> int:
    """Token-tile rows that fit scoped VMEM (shared fwd/bwd sizing)."""
    per_row = c * (6 if ln else 2) + hdim * 6 + co * 6
    if train:
        per_row += c * 14 + hdim * 10   # xr32/xhat/dxn/dx + da/dh fp32
    w_bytes = (c * hdim + hdim * co) * 2 + (hdim + co) * 4
    if train:
        w_bytes += (c * hdim + hdim * co + c + hdim) * 4 * 2  # grads+scratch
    budget = 8 * 1024 * 1024
    blk = int((budget - w_bytes) // max(per_row, 1))
    return max(min(blk - blk % 256, 4096), 256)


def fused_mlp_train_fits(c: int, hdim: int,
                         limit: int = 14 * 1024 * 1024) -> bool:
    """Whether the backward kernel's working set fits scoped VMEM."""
    blk = _choose_block(c, hdim, c, ln=True, train=True)
    per_row = c * 20 + hdim * 16
    w_bytes = ((c * hdim + hdim * c) * 2
               + (c * hdim + hdim * c + c + hdim) * 4 * 2
               + 2 * c * 4 * 2)
    return blk * per_row + w_bytes <= limit


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln_ref, dy_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dln_ref,
                w1acc, w2acc, lnacc, *, ln_eps: float, residual: bool):
    """Recompute LN/h/gelu per tile; chain GELU' and LN backward in VMEM;
    accumulate weight/bias/LN grads in fp32 scratch across the grid."""
    nblk = pl.num_programs(0)
    blk = pl.program_id(0)
    c = x_ref.shape[-1]

    @pl.when(blk == 0)
    def _init():
        w1acc[:] = jnp.zeros_like(w1acc)
        w2acc[:] = jnp.zeros_like(w2acc)
        lnacc[:] = jnp.zeros_like(lnacc)

    # --- recompute forward (fp32 stats, bf16 matmul inputs) ---
    xr32 = x_ref[:].astype(jnp.float32)
    mu = xr32.mean(axis=-1, keepdims=True)
    var = jnp.maximum(0.0, (xr32 * xr32).mean(axis=-1, keepdims=True)
                      - mu * mu)
    inv = jax.lax.rsqrt(var + ln_eps)
    xhat = (xr32 - mu) * inv
    xn = (xhat * ln_ref[0] + ln_ref[1]).astype(x_ref.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    Phi = _gelu_cdf(h)
    hb = (h * Phi).astype(x_ref.dtype)

    dy = dy_ref[:]
    dy32 = dy.astype(jnp.float32)

    # --- second projection backward ---
    w2acc[0:h.shape[-1], :] += jax.lax.dot_general(
        hb, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    w2acc[h.shape[-1], :] += dy32.sum(axis=0)
    da = jnp.dot(dy, w2_ref[:].T, preferred_element_type=jnp.float32)

    # --- exact-GELU backward: Phi(h) + h * phi(h) ---
    phi = jnp.exp(-0.5 * h * h) * _INV_SQRT_2PI
    dh = da * (Phi + h * phi)
    dhb = dh.astype(x_ref.dtype)

    # --- first projection backward ---
    w1acc[0:c, :] += jax.lax.dot_general(
        xn, dhb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    w1acc[c, :] += dh.sum(axis=0)
    dxn = jnp.dot(dhb, w1_ref[:].T, preferred_element_type=jnp.float32)

    # --- LayerNorm backward ---
    dxhat = dxn * ln_ref[0]
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * inv
    lnacc[0] += (dxn * xhat).sum(axis=0)
    lnacc[1] += dxn.sum(axis=0)

    if residual:
        dx = dx + dy32
    dx_ref[:] = dx.astype(x_ref.dtype)

    @pl.when(blk == nblk - 1)
    def _flush():
        hd = h.shape[-1]
        dw1_ref[:] = w1acc[0:c, :]
        db1_ref[:] = w1acc[c, :]
        dw2_ref[:] = w2acc[0:hd, :]
        db2_ref[:] = w2acc[hd, :]
        dln_ref[:] = lnacc[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_mlp_trainable(x, ln_scale, ln_bias, w1, b1, w2, b2,
                        residual: bool = True, ln_eps: float = 1e-5,
                        interpret: bool = False):
    """Differentiable fused LN -> fc1 -> GELU -> fc2 [-> +x] (custom VJP).

    x (..., C); the forward is :func:`fused_mlp` with the LN absorbed; the
    backward is a second kernel that recomputes the hidden activations
    tile-by-tile (flash-style — the (M, 4C) intermediates never touch HBM).
    Requires w2's output width == C.
    """
    return fused_mlp(x, w1, b1, w2, b2, ln_scale=ln_scale, ln_bias=ln_bias,
                     ln_eps=ln_eps, residual=residual, interpret=interpret)


def _fm_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, residual, ln_eps,
            interpret):
    out = fused_mlp(x, w1, b1, w2, b2, ln_scale=ln_scale, ln_bias=ln_bias,
                    ln_eps=ln_eps, residual=residual, interpret=interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fm_bwd(residual, ln_eps, interpret, residuals, dy):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = residuals
    c = x.shape[-1]
    hdim = w1.shape[-1]
    lead = x.shape[:-1]
    m = int(np.prod(lead))
    interp = interpret or _FORCE_INTERPRET

    blk = _choose_block(c, hdim, c, ln=True, train=True)
    mp = -(-m // blk) * blk
    xt = x.reshape(m, c)
    dyt = dy.astype(x.dtype).reshape(m, c)
    if mp != m:
        # zero-padded dy rows contribute exactly zero to every accumulated
        # gradient (dW2 += hb^T 0, da = 0 -> dh = 0 -> dW1/dln += 0)
        xt = jnp.pad(xt, ((0, mp - m), (0, 0)))
        dyt = jnp.pad(dyt, ((0, mp - m), (0, 0)))

    kern = functools.partial(_bwd_kernel, ln_eps=ln_eps, residual=residual)
    outs = pl.pallas_call(
        kern,
        grid=(mp // blk,),
        in_specs=[
            pl.BlockSpec((blk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, c), x.dtype),
            jax.ShapeDtypeStruct((c, hdim), jnp.float32),
            jax.ShapeDtypeStruct((hdim,), jnp.float32),
            jax.ShapeDtypeStruct((hdim, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c + 1, hdim), jnp.float32),
            pltpu.VMEM((hdim + 1, c), jnp.float32),
            pltpu.VMEM((2, c), jnp.float32),
        ],
        interpret=interp,
    )(xt, w1.astype(x.dtype), b1.astype(jnp.float32),
      w2.astype(x.dtype), b2.astype(jnp.float32),
      jnp.stack([ln_scale, ln_bias]).astype(jnp.float32), dyt)
    dx, dw1, db1, dw2, db2, dln = outs
    if mp != m:
        dx = dx[:m]
    return (dx.reshape(*lead, c).astype(x.dtype),
            dln[0].astype(ln_scale.dtype), dln[1].astype(ln_bias.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


fused_mlp_trainable.defvjp(_fm_fwd, _fm_bwd)
