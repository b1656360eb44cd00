"""Learning-rate schedules.

linear_warmup_cosine reproduces the reference's epoch-stepped
LinearWarmupCosineAnnealingLR (reference: models/optimizers/lr_scheduler.py:93-169,
stepped once per epoch at run_training.py:174): lr(0)=warmup_start, linear to
base_lr at epoch==warmup_epochs, then cosine to eta_min at epoch==max_epochs.

The chainable form in the reference evaluates, for epoch e in
[1, warmup_epochs-1], lr = warmup_start + e * (base-warmup_start)/(warmup-1),
i.e. base lr is reached one epoch *before* warmup_epochs and held once; we
reproduce that exactly so training dynamics match.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cosine_lr(epoch, base_lr: float, warmup_epochs: int,
                     max_epochs: int, warmup_start_lr: float = 0.0,
                     eta_min: float = 0.0):
    """lr for an (integer or traced) epoch index; fp32 scalar."""
    e = jnp.asarray(epoch, jnp.float32)
    warm = warmup_start_lr + e * (base_lr - warmup_start_lr) / max(warmup_epochs - 1, 1)
    t = (e - warmup_epochs) / max(max_epochs - warmup_epochs, 1)
    cos = eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t))
    return jnp.where(e < warmup_epochs, warm, cos)


def make_epoch_schedule(base_lr: float, warmup_epochs: int, max_epochs: int,
                        steps_per_epoch: int) -> optax.Schedule:
    """Step-indexed optax schedule that holds the epoch-level LR constant
    within each epoch, matching the reference's per-epoch scheduler.step()."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.int32) // max(steps_per_epoch, 1)
        return warmup_cosine_lr(epoch, base_lr, warmup_epochs, max_epochs)

    return schedule
