"""Dice-family segmentation losses.

Functional re-derivations of the MONAI losses the reference trains with
(reference: run_training.py:103-113):
  * DiceCE  (to_onehot_y, softmax, squared_pred, smooth 1e-5) — the default
  * Tversky (alpha/beta false-positive/negative weights)
  * DiceFocal (gamma=2.0)

All losses take fp32 logits (B, D, H, W, n_classes) channels-last and integer
labels (B, D, H, W) and reduce to a scalar. Computation is fp32 throughout;
on TPU the softmax/reduction chain fuses into a handful of VPU passes.

Every loss accepts an optional 0/1 ``mask`` (B, D, H, W): masked losses equal
(bit-for-bit up to reduction order) the unmasked loss over the mask's
bounding-box slice. Validation uses this to evaluate bucket-PADDED volumes
with ONE compiled program per bucket shape instead of one per native volume
shape (the pad voxels are excluded exactly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config

_SPATIAL = (1, 2, 3)


def _onehot(labels: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)


def _masked_mean(x: jnp.ndarray, mask) -> jnp.ndarray:
    """Mean over voxels; with a 0/1 mask, mean over the masked voxels only."""
    if mask is None:
        return x.mean()
    m = mask.astype(jnp.float32)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def _apply_mask(probs, target_1h, mask):
    """Zero both operands at masked-out voxels: every per-(batch, class)
    spatial sum then equals the sum over the valid region exactly (0/1 mask,
    so p**2 * m == (p*m)**2 as well)."""
    if mask is None:
        return probs, target_1h
    m = mask.astype(jnp.float32)[..., None]
    return probs * m, target_1h * m


def _dice_terms(probs, target_1h, squared_pred: bool):
    """Per (batch, class) intersection and denominator over spatial dims."""
    intersection = jnp.sum(probs * target_1h, axis=_SPATIAL)
    if squared_pred:
        denom = jnp.sum(probs ** 2, axis=_SPATIAL) + jnp.sum(target_1h ** 2,
                                                             axis=_SPATIAL)
    else:
        denom = jnp.sum(probs, axis=_SPATIAL) + jnp.sum(target_1h, axis=_SPATIAL)
    return intersection, denom


def dice_loss(logits: jnp.ndarray, labels: jnp.ndarray,
              squared_pred: bool = True, smooth_nr: float = 1e-5,
              smooth_dr: float = 1e-5, mask=None) -> jnp.ndarray:
    """MONAI DiceLoss(softmax, to_onehot_y, include_background) semantics."""
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    target = _onehot(labels, n_classes)
    probs, target = _apply_mask(probs, target, mask)
    inter, denom = _dice_terms(probs, target, squared_pred)
    f = 1.0 - (2.0 * inter + smooth_nr) / (denom + smooth_dr)
    return f.mean()


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       mask=None) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss equivalent (mean over voxels).

    Formulated as -sum(logp * onehot) rather than a take_along_axis gather:
    the gather lowers to a ~11 ms custom-call at 96^3 on TPU, while the
    one-hot product fuses with the Dice terms (which materialize the same
    one-hot) into the shared softmax pass."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    n_classes = logits.shape[-1]
    nll = -(logp * _onehot(labels, n_classes)).sum(-1)
    return _masked_mean(nll, mask)


def dice_ce_loss(logits, labels, squared_pred: bool = True,
                 smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
                 lambda_dice: float = 1.0, lambda_ce: float = 1.0,
                 mask=None):
    """MONAI DiceCELoss = lambda_dice*Dice + lambda_ce*CE
    (reference: run_training.py:104-105)."""
    return (lambda_dice * dice_loss(logits, labels, squared_pred, smooth_nr,
                                    smooth_dr, mask=mask)
            + lambda_ce * cross_entropy_loss(logits, labels, mask=mask))


def tversky_loss(logits, labels, alpha: float = 0.5, beta: float = 0.5,
                 smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
                 mask=None):
    """MONAI TverskyLoss(softmax, to_onehot_y) semantics
    (reference: run_training.py:106-109)."""
    n_classes = logits.shape[-1]
    p0 = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    g0 = _onehot(labels, n_classes)
    m = (jnp.ones(p0.shape[:-1], jnp.float32) if mask is None
         else mask.astype(jnp.float32))[..., None]
    tp = jnp.sum(p0 * g0 * m, axis=_SPATIAL)
    fp = alpha * jnp.sum(p0 * (1.0 - g0) * m, axis=_SPATIAL)
    fn = beta * jnp.sum((1.0 - p0) * g0 * m, axis=_SPATIAL)
    score = (tp + smooth_nr) / (tp + fp + fn + smooth_dr)
    return (1.0 - score).mean()


def focal_loss(logits, labels, gamma: float = 2.0, mask=None):
    """MONAI FocalLoss(include_background, to_onehot_y) semantics: mean over
    all (voxel, class) cells of -(1-p)^gamma * log(p) with one-hot targets."""
    n_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.exp(logp)
    target = _onehot(labels, n_classes)
    cell = -target * ((1.0 - p) ** gamma) * logp
    return _masked_mean(cell.sum(-1), mask)


def dice_focal_loss(logits, labels, gamma: float = 2.0,
                    squared_pred: bool = True, smooth_nr: float = 1e-5,
                    smooth_dr: float = 1e-5, mask=None):
    """MONAI DiceFocalLoss (reference: run_training.py:110-113)."""
    return (dice_loss(logits, labels, squared_pred, smooth_nr, smooth_dr,
                      mask=mask)
            + focal_loss(logits, labels, gamma, mask=mask))


def build_loss(cfg: Config):
    """--loss_fn name -> loss(logits, labels) (reference: run_training.py:103-113)."""
    if cfg.loss_fn == "DiceCE":
        if getattr(cfg, "fused_loss", False) and jax.default_backend() != "cpu":
            # opt-in fused Pallas kernels (ops/pallas/dice_ce.py): 3.3x the
            # XLA loss standalone, but neutral inside the train step — see
            # the Config.fused_loss comment for the measured A/B
            from medicalsemseg_tpu.ops.pallas.dice_ce import dice_ce_fused
            return lambda lg, lb, mask=None: (
                dice_ce_fused(lg, lb, True, cfg.smooth_nr, cfg.smooth_dr)
                if mask is None else  # the fused kernel has no masked form
                dice_ce_loss(lg, lb, smooth_nr=cfg.smooth_nr,
                             smooth_dr=cfg.smooth_dr, mask=mask))
        return lambda lg, lb, mask=None: dice_ce_loss(
            lg, lb, smooth_nr=cfg.smooth_nr, smooth_dr=cfg.smooth_dr,
            mask=mask)
    if cfg.loss_fn == "Tversky":
        return lambda lg, lb, mask=None: tversky_loss(
            lg, lb, alpha=cfg.tversky_alpha, beta=cfg.tversky_beta,
            smooth_nr=cfg.smooth_nr, smooth_dr=cfg.smooth_dr, mask=mask)
    if cfg.loss_fn == "DiceFocal":
        return lambda lg, lb, mask=None: dice_focal_loss(
            lg, lb, smooth_nr=cfg.smooth_nr, smooth_dr=cfg.smooth_dr,
            mask=mask)
    raise ValueError(f"unknown loss_fn {cfg.loss_fn!r}; "
                     "available: DiceCE, Tversky, DiceFocal")
