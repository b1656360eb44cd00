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
"""

from __future__ import annotations

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
    """Tap-decomposed weight gradient for one batch element, fp32 accum."""
    b, d, h, w_, c = x.shape
    co = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    dyf = dy.reshape(-1, co)
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


def _dw27(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Weight gradient: tap decomposition for single-crop-sized inputs,
    XLA's native lowering beyond (see _DW27_MAX_VOXELS)."""
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
    the 27-tap dot decomposition above."""
    return _conv(x, w)


def _vjp_fwd(x, w):
    return _conv(x, w), (x, w)


def _vjp_bwd(res, dy):
    x, w = res
    dy = dy.astype(x.dtype)
    w_t = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _conv(dy, w_t.astype(x.dtype))
    dw = _dw27(x, dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3x3_s1.defvjp(_vjp_fwd, _vjp_bwd)
