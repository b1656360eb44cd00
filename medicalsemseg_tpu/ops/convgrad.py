"""3x3x3 stride-1 SAME convolution with a tap-decomposed weight gradient.

XLA's native weight-grad lowering for the decoder's 3^3 convolutions runs at
~4% MFU on TPU (profiled: the three full-resolution dW convs cost 12.2-12.8 ms
each of the flagship train step — reference workload:
models/segmentors/swin_unetr.py:73-130). The gradient

    dW[kd,kh,kw,ci,co] = sum_m x[m + (kd,kh,kw) - 1, ci] * dy[m, co]

is 27 independent (C, M) @ (M, Co) contractions with M = B*D*H*W huge — a
shape the MXU runs at its (C/128)*(Co/128) PE ceiling (measured 27.2 TF/s for
C=Co=48, i.e. AT the 14% ceiling). Decomposing dW into 27 tap dots over
slices of the padded input measures 4.19 ms vs 11.32 ms for XLA's lowering
at (96^3, 48->48) — 2.7x — and 8.8 vs 10.1 ms at 96->48 (that case is
HBM-bound on the repeated x reads).

The input gradient keeps XLA's lowering (correlation with the spatially
flipped, in/out-transposed kernel — efficient already), and the forward is
the unchanged lax.conv_general_dilated.

Round-3 extension: when a gradient IS being taken (custom_vjp fwd/bwd), the
forward and input-gradient can also run as 27 tap dots. Alone the dot
forward loses to XLA's conv emitter (9.26 vs 5.09 ms at 96^3 48->48 bf16),
but in the fwd+bwd graph XLA shares the padded-slice reads between the
forward taps and the dW taps, and the whole train triple measures 12.04 ms
vs 15.31 native / ~14.4 for the round-2 hybrid (tools/bench_conv3d.py
--grad). The custom_vjp PRIMAL keeps lax.conv_general_dilated, so
inference — which never calls the vjp — is untouched. Gated by the same
voxel bound as the dW decomposition (HBM-bound above ~1.5M voxels) and by
MEDSEG_DOTS27_TRAIN (default OFF until the flagship-step A/B on real TPU
confirms the microbench win end-to-end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                 ("NDHWC", "DHWIO", "NDHWC"))


def _conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                    dimension_numbers=_DN)


def _dw27_single(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Tap-decomposed weight gradient for one batch element, fp32 accum.

    Skinny-channel inputs (the stem / encoder0 C=1 convs) take a stacked
    im2col dot instead: 27 separate (C, M) @ (M, Co) dots at C=1 are
    outer-product-shaped (1 useful MXU row of 128, ~0.3% utilization), while
    one (27C, M) @ (M, Co) contraction fills 27C rows for the same FLOPs —
    and at C<=4 the 27 shifted x copies are cheap (x is 27x smaller than dy).
    """
    b, d, h, w_, c = x.shape
    co = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    dyf = dy.reshape(-1, co)
    if c <= 4:
        cols = [lax.dynamic_slice(xp, (0, kd, kh, kw, 0), (b, d, h, w_, c))
                for kd in range(3) for kh in range(3) for kw in range(3)]
        xcol = jnp.stack(cols, axis=-2).reshape(-1, 27 * c)  # (M, 27, c)
        dw = lax.dot_general(xcol, dyf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        return dw.reshape(3, 3, 3, c, co)
    taps = []
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                xt = lax.dynamic_slice(xp, (0, kd, kh, kw, 0),
                                       (b, d, h, w_, c))
                taps.append(lax.dot_general(
                    xt.reshape(-1, c), dyf, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(3, 3, 3, c, co)


# above ~1.5M voxels the 27 whole-volume tap reads turn HBM-bound and lose
# to XLA's native dW lowering (measured at bs4: 898 vs 753 ms/step; a
# per-sample scan variant didn't recover it either at 874 ms) — so the
# decomposition applies only to single-crop-sized gradients
_DW27_MAX_VOXELS = 1_500_000

import os as _os

# dots27 train formulation (see module docstring); measured A/B on the
# flagship step before flipping the default
_DOTS27_TRAIN = _os.environ.get("MEDSEG_DOTS27_TRAIN", "0") != "0"

# Winograd F(4^3,3^3) inference formulation (ops/winograd.py): 8x less MXU
# work on the PE-bound decoder convs; PRIMAL path only (training gradients
# keep their own measured-fastest formulations below). A/B-gated like dots27.
_WINOGRAD_INFER = _os.environ.get("MEDSEG_WINOGRAD", "0") != "0"

# Winograd F(2,3) in the TRAIN direction: the custom_vjp's forward value and
# the backward's dx are themselves plain 3^3 convs, so both can run through
# the fused kernel (no autodiff ever traces through it). dW keeps the tap
# decomposition. A/B-gated separately — kernels inside large backward graphs
# have tripped this pod's AOT compiler before (NOTES.md pallas_train saga).
_WINOGRAD_TRAIN = _os.environ.get("MEDSEG_WINOGRAD_TRAIN", "0") != "0"

# One-HBM-pass Pallas dW (ops/pallas/dw27.py): same tap formulation, VMEM-
# resident accumulator — covers the sizes where the XLA taps turn HBM-bound.
# Measured on v5e (tools/ab_r3c.jsonl): bs4 flagship step 543.9 ms with the
# kernel vs 628.7 ms XLA (+15.6%), but bs1 213.5 vs 180 ms (the XLA taps
# win below the HBM-bound crossover). Default is therefore size-based
# ("auto": kernel above _DW27_MAX_VOXELS only); MEDSEG_DW27_PALLAS=1/0
# forces it on/off everywhere (A/B hook). Read DYNAMICALLY (not at import):
# bench.py's fallback ladder flips the var mid-process and re-traces.
def _dw27_pallas_mode() -> str:
    return _os.environ.get("MEDSEG_DW27_PALLAS", "auto")


# Batch-chunk bound for the Pallas dW: the kernel's three lane-padded shifted
# x copies are materialized per call; at bs8 96^3 (7.1M voxels, remat=full)
# the unchunked copies tipped the flagship step into HBM OOM (16.15G/15.75G
# measured, round 3). Batches beyond this bound run as a lax.scan over batch
# chunks whose partial dW accumulate in fp32 — only ONE chunk's copies are
# live at a time (~2.8G at the 4M bound for C=48), so bs8/bs16 get the
# measured dW win instead of falling back to XLA's native lowering.
_DW27_CHUNK_VOXELS = 4_000_000


def _dw27_chunk_voxels() -> int:
    """Env-tunable (MEDSEG_DW27_CHUNK) for hardware sweeps: smaller chunks
    shrink the per-call lane-padded shifted-copy footprint (~0.7 GB per
    1M voxels at C=48) at the cost of more scan iterations."""
    return int(_os.environ.get("MEDSEG_DW27_CHUNK", _DW27_CHUNK_VOXELS))


def _dw27_pallas_eligible(x: jnp.ndarray) -> bool:
    import jax as _jax
    from medicalsemseg_tpu.ops.pallas import dw27 as _k

    mode = _dw27_pallas_mode()
    if mode == "0":
        return False
    voxels = int(np.prod(x.shape[:-1]))
    per_sample = int(np.prod(x.shape[1:-1]))
    # Auto mode is batch-aware: the kernel only auto-enables in the measured
    # win envelope (1.5M, chunk-bound] TOTAL voxels — i.e. where it runs
    # UNCHUNKED. The chunked path (> chunk bound, e.g. bs8 96³ = 7.1M voxels)
    # is a measured HBM OOM at the 4M chunk on the 15.75G v5e
    # ("Used 15.94G of 15.75G", tools/ab_logs/bs8_full.log, round 4) and cost
    # the round-4 driver bench its budget in fallback compiles; it stays
    # forced-only (MEDSEG_DW27_PALLAS=1) until a chunk size that both fits
    # and wins is demonstrated on hardware.
    if mode == "1":
        want = True
    else:
        want = _DW27_MAX_VOXELS < voxels <= _dw27_chunk_voxels()
    # a batch chunk of at least one sample must fit the chunk bound (a
    # single >4M-voxel sample has no chunkable axis here)
    return (want
            and per_sample <= _dw27_chunk_voxels()
            and (_jax.default_backend() != "cpu" or _k._FORCE_INTERPRET)
            and _k.dw27_applicable(tuple(x.shape[1:4]), x.shape[-1]))


def _dw27_pallas_chunked(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Pallas dW over batch chunks of <= _DW27_CHUNK_VOXELS voxels.

    lax.scan keeps exactly one chunk's shifted lane-padded copies live per
    iteration; partials accumulate in the fp32 carry (tap-dot order within a
    chunk is unchanged, so chunk-boundary summation is the only reassociation
    vs the unchunked kernel — tested to ~1e-6 rel in tests/test_pallas_dw27).
    """
    from medicalsemseg_tpu.ops.pallas.dw27 import dw27_pallas

    b = x.shape[0]
    per = int(np.prod(x.shape[1:-1]))
    bc = 1
    bound = _dw27_chunk_voxels()
    for cand in range(b, 0, -1):
        if b % cand == 0 and cand * per <= bound:
            bc = cand
            break
    if bc == b:
        return dw27_pallas(x, dy)
    c, co = x.shape[-1], dy.shape[-1]
    xr = x.reshape(b // bc, bc, *x.shape[1:])
    dyr = dy.reshape(b // bc, bc, *dy.shape[1:])

    def body(acc, xd):
        xc, dyc = xd
        return acc + dw27_pallas(xc, dyc), None

    out, _ = lax.scan(body, jnp.zeros((3, 3, 3, c, co), jnp.float32),
                      (xr, dyr))
    return out


def _wino23_eligible(x: jnp.ndarray) -> bool:
    import jax as _jax
    from medicalsemseg_tpu.ops.pallas import winograd3d as _w3

    return (x.dtype == jnp.bfloat16
            and (_jax.default_backend() != "cpu" or _w3._FORCE_INTERPRET)
            and _w3.winograd_f23_applicable(tuple(x.shape[1:4]),
                                            x.shape[-1]))


def _wino23(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    from medicalsemseg_tpu.ops.pallas.winograd3d import winograd_conv3d_f23

    return winograd_conv3d_f23(x, w.astype(jnp.float32))


def _conv_via_dots27(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """The same SAME/stride-1 3^3 conv as 27 tap matmuls on slices of the
    padded input. The 27-tap sum accumulates in fp32 with ONE rounding to
    x.dtype at the end — a bf16 tree-sum of bf16-rounded taps measures ~4x
    the native conv's rounding (tests/test_convgrad.py), fp32 accumulation
    matches it."""
    b, d, h, ww, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = None
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                xs = lax.dynamic_slice(xp, (0, kd, kh, kw, 0),
                                       (b, d, h, ww, c))
                t = lax.dot_general(xs.reshape(-1, c), w[kd, kh, kw],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                y = t if y is None else y + t
    return y.astype(x.dtype).reshape(b, d, h, ww, co)


def _use_dots27(x: jnp.ndarray) -> bool:
    # per-call gate: the tap-dot contraction dim is the input's channel
    # count, so skinny-channel convs (e.g. the C=1 stem) would degenerate to
    # 27 rank-<16 outer products — those keep the native conv emitter
    return (_DOTS27_TRAIN
            and x.shape[-1] >= 16
            and int(np.prod(x.shape[:-1])) <= _DW27_MAX_VOXELS)


def _dw27(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Weight gradient: tap decomposition for single-crop-sized inputs,
    XLA's native lowering beyond (see _DW27_MAX_VOXELS). The one-pass Pallas
    accumulator kernel, when enabled, covers every size (its HBM traffic
    does not scale with the tap count)."""
    if _dw27_pallas_eligible(x):
        return _dw27_pallas_chunked(x, dy)
    if x.shape[-1] <= 4:
        # stacked im2col dot: the 27 x re-reads behind _DW27_MAX_VOXELS are
        # negligible at skinny C (x is Co/C times smaller than dy)
        return _dw27_single(x, dy)
    if int(np.prod(x.shape[:-1])) <= _DW27_MAX_VOXELS:
        return _dw27_single(x, dy)
    c, co = x.shape[-1], dy.shape[-1]
    _, vjp = jax.vjp(lambda w: _conv(x, w),
                     jnp.zeros((3, 3, 3, c, co), x.dtype))
    return vjp(dy)[0].astype(jnp.float32)


@jax.custom_vjp
def conv3x3x3_s1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME, stride-1, channels-last 3x3x3 conv: x (B,D,H,W,C) * w
    (3,3,3,C,Co) -> (B,D,H,W,Co). Forward and dx are XLA convolutions; dW is
    the 27-tap dot decomposition above. The no-gradient PRIMAL (inference)
    can route through Winograd F(4^3,3^3) — see _WINOGRAD_INFER."""
    if _WINOGRAD_INFER:
        if x.dtype == jnp.float32:
            # F(4,3) is fp32-only: bf16 V/M loses the inverse-transform
            # cancellations (measured 0.36 max rel err — ops/winograd.py);
            # the fp32 direct conv it replaces runs the MXU in multi-pass
            # mode, so the 8x FLOP cut wins despite the XLA-level V/M traffic
            from medicalsemseg_tpu.ops.winograd import (
                winograd_applicable, winograd_conv3d_f43)
            if winograd_applicable(tuple(x.shape[1:4]), x.shape[-1]):
                return winograd_conv3d_f43(x, w.astype(jnp.float32),
                                           mm_dtype=jnp.float32)
        elif _wino23_eligible(x):
            # bf16 takes the fused F(2,3) Pallas kernel (VMEM-resident V/M,
            # bf16-exact transform coefficients)
            return _wino23(x, w)
    return _conv(x, w)


def _vjp_fwd(x, w):
    # under a gradient, the dot forward lets XLA share the padded-slice
    # reads with the dW taps (module docstring); the primal (inference)
    # path above keeps the native conv emitter
    if _WINOGRAD_TRAIN and _wino23_eligible(x):
        return _wino23(x, w), (x, w)
    if _use_dots27(x):
        return _conv_via_dots27(x, w), (x, w)
    return _conv(x, w), (x, w)


def _vjp_bwd(res, dy):
    x, w = res
    dy = dy.astype(x.dtype)
    w_t = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    # dx gates on DY: its tap dots contract over dy's channels (Co), not Cin
    if _WINOGRAD_TRAIN and _wino23_eligible(dy):
        dx = _wino23(dy, w_t)
    elif _use_dots27(dy):
        dx = _conv_via_dots27(dy, w_t.astype(x.dtype))
    else:
        dx = _conv(dy, w_t.astype(x.dtype))
    dw = _dw27(x, dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3x3_s1.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Patchify conv: kernel == strides, VALID (the PatchEmbed3D stem,
# reference models/blocks/patch_embeddings.py:115-133). Non-overlapping taps
# make the conv a per-patch dense projection — under training that turns
# XLA's grad-conv dW (slow on the C=1 stem: lane-degenerate, 2.7x padding
# expansion) into one (K, M) @ (M, Co) dot, the same lesson as
# layers._MatmulConvTranspose. The PRIMAL keeps the native conv: inference
# avoids the space-to-depth relayout (d2s cost the sliding window ~3%).
# ---------------------------------------------------------------------------

_PATCHIFY_TRAIN = _os.environ.get("MEDSEG_PATCHIFY_TRAIN", "1") != "0"


def _patchify_cols(x: jnp.ndarray, patch) -> jnp.ndarray:
    """(B, D, H, W, Ci) -> (B, D/pd, H/ph, W/pw, pd*ph*pw*Ci), tap-major
    column order matching kernel.reshape(-1, Co)."""
    b, d, h, w, ci = x.shape
    pd, ph, pw = patch
    x = x.reshape(b, d // pd, pd, h // ph, ph, w // pw, pw, ci)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, d // pd, h // ph, w // pw, pd * ph * pw * ci)


def _uncols(cols: jnp.ndarray, x_shape, patch) -> jnp.ndarray:
    b, d, h, w, ci = x_shape
    pd, ph, pw = patch
    x = cols.reshape(b, d // pd, h // ph, w // pw, pd, ph, pw, ci)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, ci)


def _conv_ks(x: jnp.ndarray, w: jnp.ndarray, patch) -> jnp.ndarray:
    return lax.conv_general_dilated(x, w, tuple(patch), "VALID",
                                    dimension_numbers=_DN)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_patchify(x: jnp.ndarray, w: jnp.ndarray, patch) -> jnp.ndarray:
    """k == s == patch, VALID conv: x (B,D,H,W,Ci) * w (*patch,Ci,Co)."""
    return _conv_ks(x, w, patch)


def _patchify_vjp_fwd(x, w, patch):
    if not _PATCHIFY_TRAIN:
        return _conv_ks(x, w, patch), (x, w)
    co = w.shape[-1]
    cols = _patchify_cols(x, patch)
    y = lax.dot_general(cols.reshape(-1, cols.shape[-1]), w.reshape(-1, co),
                        (((1,), (0,)), ((), ())))
    return y.reshape(*cols.shape[:4], co), (cols, w, x.shape)


def _patchify_vjp_bwd(patch, res, dy):
    if not _PATCHIFY_TRAIN:
        x, w = res
        _, vjp = jax.vjp(lambda a, b: _conv_ks(a, b, patch), x, w)
        return vjp(dy)
    cols, w, x_shape = res
    co = w.shape[-1]
    k = cols.shape[-1]
    colsf = cols.reshape(-1, k)
    dyf = dy.reshape(-1, co).astype(cols.dtype)
    dw = lax.dot_general(colsf, dyf, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dcols = lax.dot_general(dyf, w.reshape(k, co).astype(dyf.dtype),
                            (((1,), (1,)), ((), ())))
    dx = _uncols(dcols.reshape(*cols.shape), x_shape, patch)
    return dx.astype(cols.dtype), dw.reshape(w.shape).astype(w.dtype)


conv_patchify.defvjp(_patchify_vjp_fwd, _patchify_vjp_bwd)
