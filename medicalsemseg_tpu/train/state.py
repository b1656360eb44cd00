"""Train state + jitted train/eval steps.

The TPU-native re-layering of the reference's training machinery
(reference: run_training.py:77-131, engine/train.py:14-128):

  * one `TrainState` pytree {params, batch_stats, opt_state, step} checkpointed
    by orbax — torch's model/optimizer/scaler/scheduler quartet collapses here
    (GradScaler disappears entirely: bf16 needs no loss scaling);
  * AdamW(betas=(0.9, 0.95), eps=1e-6) with timm-style weight-decay masking —
    no decay for biases/1-D params (reference: run_training.py:92-93);
  * the whole step (forward, loss, backward, clip, update, train-Dice metrics)
    is a single jitted function; under a sharded batch XLA inserts the gradient
    all-reduce over ICI, which is the reference's DDP backward
    (engine/train.py:73) without the machinery;
  * SyncBN (reference: run_training.py:83) needs no machinery here: the train
    step is ONE global SPMD program, so the BatchNorm batch-mean/var
    reductions inside it are computed over the full sharded batch — XLA
    inserts the cross-device (and cross-host) all-reduce. Stats are therefore
    globally synchronized by construction on every step, which is strictly
    stronger than torch's SyncBN wrapper (verified in
    tests/test_sharding.py::test_batchnorm_stats_are_globally_reduced).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.train.losses import build_loss
from medicalsemseg_tpu.train.metrics import dice_per_class
from medicalsemseg_tpu.train.schedule import make_epoch_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        if getattr(self.tx, "returns_new_params", False):
            # fused-apply flat optimizer (train/flat_optim.py): update()
            # already added the step in its single flat pass — `updates`
            # IS the new params tree
            new_params = updates
        else:
            new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def weight_decay_mask(params):
    """timm add_weight_decay semantics: decay only >=2-D kernels
    (reference: run_training.py:92)."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = make_epoch_schedule(cfg.lr, cfg.warmup_epochs, cfg.epochs,
                                   steps_per_epoch)
    if getattr(cfg, "flat_optimizer", False):
        # one fused elementwise pass over flat fp32 buffers (numerics
        # identical to the optax chain below — train/flat_optim.py).
        # fused_apply (params updated inside the flat pass) is incompatible
        # with optax.MultiSteps' update-accumulation, so grad-accum runs
        # keep the plain returns-updates mode.
        from medicalsemseg_tpu.train.flat_optim import flat_adamw

        tx = flat_adamw(schedule, b1=0.9, b2=0.95, eps=1e-6,
                        weight_decay=cfg.weight_decay,
                        mask_fn=weight_decay_mask,
                        clip_norm=cfg.gradient_clipping,
                        fused_apply=getattr(cfg, "grad_accum_steps", 1) <= 1)
    else:
        chain = []
        if cfg.gradient_clipping is not None:
            chain.append(optax.clip_by_global_norm(cfg.gradient_clipping))
        chain.append(optax.adamw(schedule, b1=0.9, b2=0.95, eps=1e-6,
                                 weight_decay=cfg.weight_decay,
                                 mask=weight_decay_mask))
        tx = optax.chain(*chain)
    if getattr(cfg, "grad_accum_steps", 1) > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx, schedule


def create_train_state(cfg: Config, model, rng: jax.Array,
                       sample_input, steps_per_epoch: int) -> Tuple[TrainState, Callable]:
    variables = model.init(rng, sample_input, deterministic=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx, schedule = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params),
                       apply_fn=model.apply, tx=tx)
    return state, schedule


def _deep_supervision_loss(loss_fn, heads, labels):
    """nnU-Net-style deep supervision: per-scale losses against
    nearest-downsampled labels, weights 1/2^i normalized."""
    weights = np.asarray([1.0 / 2 ** i for i in range(len(heads))])
    weights = weights / weights.sum()
    total = 0.0
    for i, logits in enumerate(heads):
        factor = labels.shape[1] // logits.shape[1]
        lab = labels[:, ::factor, ::factor, ::factor] if factor > 1 else labels
        total = total + weights[i] * loss_fn(logits, lab)
    return total


def make_train_step(cfg: Config):
    """Build the jitted train step. batch keys: image (B,D,H,W,C) fp32,
    label (B,D,H,W) int32, crop_loc (B,3), affine (B,3). Models returning a
    list of logits (deep supervision) get per-scale weighted losses."""
    loss_fn = build_loss(cfg)
    n_classes = cfg.output_dim

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        model_in = (batch["image"], batch.get("crop_loc"), batch.get("affine"))
        has_bn = bool(jax.tree_util.tree_leaves(state.batch_stats))

        def compute_loss(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                logits, mutated = state.apply_fn(
                    variables, model_in, deterministic=False,
                    rngs={"dropout": rng}, mutable=["batch_stats"])
                new_stats = mutated["batch_stats"]
            else:
                logits = state.apply_fn(variables, model_in,
                                        deterministic=False,
                                        rngs={"dropout": rng})
                new_stats = state.batch_stats
            if isinstance(logits, (list, tuple)):
                loss = _deep_supervision_loss(loss_fn, logits, batch["label"])
                logits = logits[0]  # full-res head for metrics
            else:
                loss = loss_fn(logits, batch["label"])
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=new_stats)

        if getattr(state.tx, "returns_new_params", False):
            # the fused flat pass already reduced the pre-clip global norm
            # over its raveled buffer — reading it back is free, while
            # optax.global_norm(grads) would re-read every gradient leaf
            grad_norm = new_state.opt_state.grad_norm
        else:
            grad_norm = optax.global_norm(grads)
        pred = jnp.argmax(logits, axis=-1)
        dice, not_nan = dice_per_class(pred, batch["label"], n_classes)
        metrics = {
            "loss": loss,
            "dice_sum": dice.sum(0),       # (C,) — accumulated host-side
            "dice_count": not_nan.sum(0),  # (C,)
            "grad_norm": grad_norm,
        }
        return new_state, metrics

    return train_step


def make_eval_forward(cfg: Config, model):
    """deterministic forward for validation / sliding-window prediction."""

    def forward(state: TrainState, model_in):
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        return model.apply(variables, model_in, deterministic=True)

    return forward


# NOTE: there is deliberately no sync_batch_stats() here. The reference wraps
# the model in torch SyncBatchNorm because DDP computes BN stats per-replica
# (run_training.py:83); in this framework the train step is one global SPMD
# program over the mesh, so BN's batch reductions already span the entire
# sharded batch across all devices and hosts — the stats in
# state.batch_stats are identical on every chip after every step.
