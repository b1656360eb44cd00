"""Fused SegFormer spatial-reduction attention as a Pallas TPU kernel.

The SegFormer/MixViT attention (reference: models/backbones/
segformer_backbone.py:51-110) attends every token against a spatially
reduced K/V set (M = N / sr_ratio**3 tokens — 27 at the flagship stage-1
shape). The K/V branch (SR conv + LN + kv dense over M tokens) is tiny and
stays in XLA; the N-token side is HBM-bound: XLA runs
q dense -> (N, M) logits -> softmax -> @V -> proj as separate fusion
clusters, round-tripping the token tensor through HBM between them.

Here each program instance owns a tile of tokens in VMEM and runs the whole
chain — q projection, per-head fp32 logits + softmax (the (N, M) attention
matrix never touches HBM), the V contraction, the output projection, and
optionally the block's shortcut add (the pre-attention LN stays outside:
its output also feeds the SR conv, so it is materialized either way).

Inference-only, like the GC-ViT fused paths (SegFormer training keeps XLA).
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


def _kernel(x_ref, k_ref, v_ref, wq_ref, bq_ref, wproj_ref, bproj_ref,
            out_ref, *, num_heads: int, res_ref=None):
    blk = x_ref.shape[1]
    c = x_ref.shape[-1]
    m = k_ref.shape[1]
    hd = c // num_heads
    scale = hd ** -0.5

    xn = x_ref[0]  # (blk, C), already LayerNorm'd by the block
    q = jnp.dot(xn, wq_ref[:], preferred_element_type=jnp.float32)
    q = (q + bq_ref[:]).astype(x_ref.dtype)

    kk = k_ref[0]  # (M, C), head-major hd blocks (kv dense layout)
    vv = v_ref[0]

    outs = []
    for h in range(num_heads):
        qh = q[:, h * hd:(h + 1) * hd]
        kh = kk[:, h * hd:(h + 1) * hd]
        vh = vv[:, h * hd:(h + 1) * hd]
        # logits fp32, scaled after the dot (matches the module's
        # einsum(..., preferred fp32) * scale)
        attn = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (blk, M)
        attn = jax.nn.softmax(attn, axis=-1).astype(x_ref.dtype)
        outs.append(jnp.dot(attn, vh, preferred_element_type=jnp.float32))
    out = jnp.concatenate(outs, axis=-1).astype(x_ref.dtype)

    out = jnp.dot(out, wproj_ref[:], preferred_element_type=jnp.float32)
    out = (out + bproj_ref[:]).astype(x_ref.dtype)
    if res_ref is not None:
        out = out + res_ref[0]
    out_ref[0] = out


def _tile_rows(c: int, m: int, residual: bool) -> int:
    """Token-tile rows that fit scoped VMEM (x/q/out tiles + (blk, M) fp32
    logits per live head + the shared weight/kv blocks)."""
    per_row = c * (16 if residual else 14) + m * 10
    w_bytes = 2 * c * c * 2 + 2 * m * c * 2 + 2 * c * 4
    budget = 8 * 1024 * 1024
    blk = int((budget - w_bytes) // max(per_row, 1))
    return max(min(blk - blk % 256, 4096), 0)


def fused_sr_attention_fits(c: int, m: int, residual: bool = True) -> bool:
    return _tile_rows(c, m, residual) >= 256


def fused_sr_attention(
    x: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    wq: jnp.ndarray,
    bq: Optional[jnp.ndarray],
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    num_heads: int,
    residual: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, N, C) LN'd tokens; k, v (B, M, C) precomputed K/V (head-major
    hd blocks, i.e. the first/second half of the kv dense output). Returns
    (B, N, C) = proj(softmax(q k^T / sqrt(hd)) v) [+ residual].

    residual, when given, is the block's raw input (B, N, C) added in-kernel
    (absorbing the shortcut's HBM round-trip).
    """
    b, n, c = x.shape
    m = k.shape[1]
    interpret = interpret or _FORCE_INTERPRET

    blk = _tile_rows(c, m, residual is not None)
    assert blk >= 256, (c, m)
    blk = min(blk, -(-n // 256) * 256)
    np_tok = -(-n // blk) * blk
    ntiles = np_tok // blk

    if bq is None:
        bq = jnp.zeros((c,), jnp.float32)

    xt = x
    res = residual
    if np_tok != n:
        xt = jnp.pad(x, ((0, 0), (0, np_tok - n), (0, 0)))
        if res is not None:
            res = jnp.pad(res, ((0, 0), (0, np_tok - n), (0, 0)))

    in_specs = [
        pl.BlockSpec((1, blk, c), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, c), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, c), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda bi, i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda bi, i: (0,), memory_space=pltpu.VMEM),
    ]
    args = [xt, k.astype(x.dtype), v.astype(x.dtype), wq.astype(x.dtype),
            bq.astype(jnp.float32), wproj.astype(x.dtype),
            bproj.astype(jnp.float32)]

    if res is not None:
        def kern(x_ref, k_ref, v_ref, wq_ref, bq_ref, wproj_ref, bproj_ref,
                 res_ref, out_ref):
            _kernel(x_ref, k_ref, v_ref, wq_ref, bq_ref, wproj_ref,
                    bproj_ref, out_ref, num_heads=num_heads, res_ref=res_ref)
        in_specs.append(pl.BlockSpec((1, blk, c), lambda bi, i: (bi, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(res.astype(x.dtype))
    else:
        kern = functools.partial(_kernel, num_heads=num_heads)

    out = pl.pallas_call(
        kern,
        grid=(b, ntiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk, c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_tok, c), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :n]
