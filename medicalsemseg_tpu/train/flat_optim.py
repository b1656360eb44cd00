"""Flat-buffer AdamW: the whole optimizer as ONE elementwise pass.

The reference steps torch AdamW per parameter tensor (run_training.py:93);
optax's chain(clip_by_global_norm, adamw) likewise lowers to one small
fusion per pytree leaf — ~700 leaves for the 77.5M-param flagship, each
paying kernel-launch and tiling overhead on TPU (measured: AdamW+grad_norm
10.1 ms at bs1 vs a ~4 ms HBM roofline for the ~2.6 GB of moment/param
traffic; NOTES.md train-step cost ledger).

Here the gradients/params/moments are raveled into single flat fp32 buffers
(jax.flatten_util.ravel_pytree), so clip + bias-corrected Adam + masked
weight decay fuse into ONE XLA loop over contiguous memory. The weight-decay
mask (timm semantics: decay only >=2-D kernels, train/state.py:56-59) is
materialized once at init() as a flat fp32 0/1 vector CARRIED IN THE
OPTIMIZER STATE — never baked into the HLO (this pod's remote compiler
rejects programs with embedded weight-size constants, NOTES.md).

Round-4 rework (VERDICT r3 item 8 — the round-3 version measured 183.0 vs
180 ms, a LOSS against the predicted ~6 ms win). Root cause: the fused pass
collapsed the per-leaf CHAIN but added three full-buffer copies and lost a
CSE the per-leaf path gets for free —

  * ravel_pytree(params) every step (310 MB read + write),
  * unravel(updates) back to ~700 leaves, followed by ~700 per-leaf
    optax.apply_updates adds (the per-leaf path has those adds fused into
    its chains),
  * metrics' optax.global_norm(grads) could no longer CSE with the clip
    norm (computed on the raveled buffer — different HLO).

With ``fused_apply=True`` (the default used by make_optimizer when
grad_accum is off) the pass now:

  * carries the master copy of the params as ONE flat fp32 buffer in the
    optimizer state (``flat_p``) — no per-step params ravel;
  * applies the update in the flat domain (``pn = p + u``) and unravels the
    NEW PARAMS once — update() returns (new_params, new_state) and
    TrainState.apply_gradients skips optax.apply_updates entirely (the
    ``returns_new_params`` marker);
  * computes the pre-clip global grad norm in-pass and carries it in the
    state (``grad_norm``) so the train step's metric is free.

Numerics still match optax.chain(clip_by_global_norm(c), adamw(...))
exactly (same bias correction, eps placement, decay-before-lr ordering);
parity is pinned by tests/test_flat_optim.py for both modes.

CONCLUSION (round 5, 2026-08-20): NEGATIVE RESULT — kept as an opt-in A/B
hook only. Even with fused_apply the pass must ravel_pytree(grads) and
unravel the new flat params every step: ~1.24 GB of pure shape-changing
copy traffic (~1.8 ms at the 680 GB/s roofline), which cancels the per-leaf
launch-overhead saving; measured bs1 179.4 ms vs ~175 per-leaf anchors and
bs8 879.4 vs 876.3 (tools/ab_r4.jsonl). Donation cannot alias the copies
(shapes differ). The per-leaf optax chain stays the default (NOTES.md
round-5 log).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class FlatAdamWState(NamedTuple):
    count: jnp.ndarray    # int32 step counter
    m: jnp.ndarray        # (P,) fp32 first moment
    v: jnp.ndarray        # (P,) fp32 second moment
    wd_mask: jnp.ndarray  # (P,) fp32 0/1 weight-decay mask
    # fused_apply extras (scalar zeros / empty in plain mode):
    flat_p: jnp.ndarray     # (P,) fp32 master params ((0,) in plain mode)
    grad_norm: jnp.ndarray  # () fp32 pre-clip global grad norm of last step


class FlatGradientTransformation(NamedTuple):
    """optax-shaped (init, update) plus the returns_new_params marker that
    tells TrainState.apply_gradients update() already applied the step."""

    init: Callable
    update: Callable
    returns_new_params: bool = False


def flat_adamw(learning_rate, b1: float = 0.9, b2: float = 0.95,
               eps: float = 1e-6, weight_decay: float = 0.0,
               mask_fn: Optional[Callable] = None,
               clip_norm: Optional[float] = None,
               fused_apply: bool = False) -> FlatGradientTransformation:
    """optax-compatible transformation; pass params to update() (required).

    learning_rate may be a schedule (callable of the step count) or a float.
    mask_fn(params) -> bool pytree gates the decay term per leaf (timm
    add_weight_decay semantics when set to train.state.weight_decay_mask).
    clip_norm folds optax.clip_by_global_norm into the same fused pass.
    With fused_apply, update() returns (new_params, new_state) — see module
    docstring; without it, plain optax updates (works under optax.MultiSteps
    for --grad_accum_steps).
    """

    def init(params):
        flat, _ = ravel_pytree(params)
        flat = flat.astype(jnp.float32)
        if mask_fn is not None:
            mask_tree = jax.tree_util.tree_map(
                lambda keep, p: jnp.full(p.shape, float(keep), jnp.float32),
                mask_fn(params), params)
            wd_mask, _ = ravel_pytree(mask_tree)
        else:
            wd_mask = jnp.ones_like(flat)
        return FlatAdamWState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(flat),
            v=jnp.zeros_like(flat),
            wd_mask=wd_mask.astype(jnp.float32),
            flat_p=flat if fused_apply else jnp.zeros((0,), jnp.float32),
            grad_norm=jnp.zeros((), jnp.float32))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("flat_adamw requires params in update()")
        g, unravel = ravel_pytree(grads)
        g = g.astype(jnp.float32)
        if fused_apply:
            p = state.flat_p
            # grads and params share a tree structure; reuse grads' unravel
            # (dtype: params are fp32 throughout this framework)
        else:
            p, _ = ravel_pytree(params)
            p = p.astype(jnp.float32)

        gnorm = jnp.sqrt(jnp.sum(g * g))
        if clip_norm is not None:
            # optax.clip_by_global_norm: scale by clip/norm only when
            # norm > clip (trust_ratio = minimum(1, clip/norm))
            g = g * jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-38))

        count_inc = state.count + 1
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * (g * g)
        cf = count_inc.astype(jnp.float32)
        mhat = m / (1.0 - b1 ** cf)
        vhat = v / (1.0 - b2 ** cf)
        u = mhat / (jnp.sqrt(vhat) + eps)
        if weight_decay:
            u = u + weight_decay * state.wd_mask * p
        lr = (learning_rate(count_inc - 1) if callable(learning_rate)
              else learning_rate)
        u = -lr * u

        if fused_apply:
            pn = p + u
            new_state = FlatAdamWState(count=count_inc, m=m, v=v,
                                       wd_mask=state.wd_mask, flat_p=pn,
                                       grad_norm=gnorm)
            return unravel(pn), new_state
        new_state = FlatAdamWState(count=count_inc, m=m, v=v,
                                   wd_mask=state.wd_mask,
                                   flat_p=state.flat_p, grad_norm=gnorm)
        return unravel(u), new_state

    return FlatGradientTransformation(init, update,
                                      returns_new_params=fused_apply)
