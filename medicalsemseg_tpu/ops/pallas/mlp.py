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

Inference-only, like the attention kernel's LN/residual absorption
(SwinBlock routes through it only when `deterministic`); training keeps the
XLA chain, whose backward XLA already fuses well.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    h = jax.nn.gelu(h, approximate=False).astype(x_ref.dtype)
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
