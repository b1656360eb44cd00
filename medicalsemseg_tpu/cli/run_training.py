"""Training driver (reference: run_training.py:26-197).

Full session: config -> data (cached, fold-split, host-partitioned) ->
model -> jitted sharded train step -> epoch loop with periodic validation,
best-model tracking, periodic checkpoints + end-of-run cleanup, JSON-lines
logging.
"""

from __future__ import annotations

import datetime
import json
import os
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config, get_args
from medicalsemseg_tpu.data.datalist import (
    build_cv_file_lists,
    partition_dataset,
    save_decathlon_datalist,
)
from medicalsemseg_tpu.data.dataset import CachedVolumeDataset, EvalLoader, TrainLoader
from medicalsemseg_tpu.models import build_model
from medicalsemseg_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from medicalsemseg_tpu.train.loop import run_validation, train_one_epoch
from medicalsemseg_tpu.train.state import create_train_state, make_train_step
from medicalsemseg_tpu.utils import checkpoint as ckpt
from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache


class JsonlWriter:
    """Minimal scalar sink (tensorboardX stand-in; reference logs scalars at
    epoch_1000x, run_training.py:43-47 + engine/train.py:117-123)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.logdir = log_dir
        self.path = os.path.join(log_dir, "scalars.jsonl")

    def add_scalar(self, tag: str, value, step: int):
        with open(self.path, "a") as f:
            f.write(json.dumps({"tag": tag, "value": float(value),
                                "step": int(step)}) + "\n")

    def flush(self):
        pass


def main(cfg: Config) -> dict:
    from medicalsemseg_tpu.parallel.dist import init_distributed_mode

    if cfg.input_dim != 3:
        # the CLI data pipeline is volumetric (as in the reference, whose
        # --input_dim is parsed but never consumed); the 2D Swin2D model
        # trains through the library API (models/swin2d.py docstring)
        raise ValueError(
            "the CLI drivers feed 3D volumes only (--input_dim 3); for 2D "
            "use the library API: build_model(cfg) with --model Swin2D")

    init_distributed_mode(cfg)  # multi-host rendezvous (no-op single-process)
    enable_compilation_cache()
    if cfg.anomaly_detection:
        jax.config.update("jax_debug_nans", True)

    # -- seed (reference: run_training.py:34-37: seed + rank) --
    seed = cfg.seed + jax.process_index()
    rng = jax.random.PRNGKey(seed)

    log_writer = JsonlWriter(cfg.log_dir) if cfg.log_dir else None

    # experiment tags + run parameters (Neptune stand-in; reference:
    # run_training.py:48-52 + utils/misc.py:317-336)
    from medicalsemseg_tpu.utils.tags import log_metrics, tag_builder

    if cfg.log_dir and jax.process_index() == 0:
        log_metrics(cfg.log_dir, {
            "tags": tag_builder(cfg),
            "parameters": {k: (list(v) if isinstance(v, tuple) else v)
                           for k, v in vars(cfg).items()
                           if isinstance(v, (int, float, str, bool, tuple,
                                             type(None)))},
        })

    # -- data: CV split + per-host partition + RAM cache --
    train_files, val_files = build_cv_file_lists(cfg)
    save_decathlon_datalist(os.path.join(cfg.data_path, cfg.task, cfg.json_list),
                            train_files, val_files, cfg.log_dir)
    n_hosts, host = jax.process_count(), jax.process_index()
    train_part = partition_dataset(train_files, n_hosts, even_divisible=True)[host]
    val_part = partition_dataset(val_files, n_hosts, even_divisible=True)[host]
    print(f"host {host}: {len(train_part)} train / {len(val_part)} val volumes")

    ds_train = CachedVolumeDataset(train_part, cfg,
                                   cfg.cache_rate_train if cfg.cache_dataset else 0.0)
    ds_val = CachedVolumeDataset(val_part, cfg,
                                 cfg.cache_rate_val if cfg.cache_dataset else 0.0,
                                 mode="val")
    if cfg.device_data_pipeline:
        from medicalsemseg_tpu.data.device_pipeline import (
            DeviceCachedDataset,
            DeviceTrainLoader,
        )

        loader_train = DeviceTrainLoader(DeviceCachedDataset(ds_train, cfg),
                                         cfg, seed=seed)
        print("device data pipeline: volumes cached in HBM")
    else:
        loader_train = TrainLoader(ds_train, cfg, seed=seed)
    loader_val = EvalLoader(ds_val)

    # -- model + state --
    model = build_model(cfg)
    v = cfg.vol_size3()
    b = cfg.n_images_per_batch * cfg.t_n_patches_per_image
    x_probe = (jnp.zeros((b, *v, cfg.in_chans)), jnp.zeros((b, 3)),
               jnp.ones((b, 3)))
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(seed),
                                  x_probe, loader_train.steps_per_epoch())
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    print(f"Model = {cfg.model}, params = {n_params / 1e6:.2f}M")

    # -- mesh: data-parallel batch sharding (the DDP equivalent) --
    mesh_shape = cfg.mesh_shape
    if mesh_shape is None:
        # largest device count that divides the global batch
        n_dev = len(jax.devices())
        dp = max(d for d in range(1, n_dev + 1) if b % d == 0)
        if dp < n_dev:
            print(f"batch {b} not divisible by {n_dev} devices; "
                  f"using {dp}-way data parallelism")
        mesh_shape = (dp,)
    mesh = create_mesh(mesh_shape, devices=jax.devices()[:int(np.prod(mesh_shape))])
    data_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    state = jax.device_put(state, repl)

    # validation spreads whole volumes one-per-chip over the local devices
    # (reference: val partitioned per rank, dataset_builder.py:460-464); the
    # train mesh may be smaller when the batch doesn't divide the chip count
    local = jax.local_devices()
    val_mesh = create_mesh((len(local),), devices=local) if len(local) > 1 \
        else None

    def put_batch(batch):
        # host numpy batches and device-pipeline jax arrays both reshard here
        # (no host round-trip for arrays already in HBM)
        return {k: jax.device_put(val, data_sh) for k, val in batch.items()}

    train_step = jax.jit(make_train_step(cfg), donate_argnums=(0,),
                         out_shardings=(repl, repl))

    start_epoch = cfg.start_epoch
    if cfg.pretrained:
        # load reference-format .pth backbone weights (the reference declares
        # --pretrained but never consumes it, utils/arguments.py:293 /
        # utils/checkpoint.py dead loader — functional here)
        from medicalsemseg_tpu.utils.torch_import import (
            import_swin_encoder,
            load_reference_pth,
        )

        sd = load_reference_pth(cfg.pretrained)
        enc_params = import_swin_encoder(sd, "encoder.", len(cfg.depths),
                                         window_sizes=cfg.window_sizes())
        merged = dict(state.params)
        merged["encoder"] = enc_params
        state = state.replace(params=merged)
        print(f"Loaded pretrained encoder from {cfg.pretrained}")
    if cfg.resume:
        state, start_epoch = ckpt.load_checkpoint(cfg.resume, state)
        print(f"Resumed from {cfg.resume} at epoch {start_epoch}")

    best_val_metric, best_epoch = 0.0, 0
    checkpoint_dirs = []
    start_time = time.time()

    for epoch in range(start_epoch, cfg.epochs):
        # device trace of the first trained epoch when --profile_dir is set
        from medicalsemseg_tpu.utils.profiling import trace

        with trace(cfg.profile_dir if epoch == start_epoch else None):
            state, train_stats = train_one_epoch(
                state, train_step, loader_train, epoch, cfg, rng,
                log_writer=log_writer, put_batch=put_batch)
        log_stats = {**train_stats, "epoch": epoch}

        if not (epoch + 1) % cfg.val_interval:
            val_stats = run_validation(state, model, loader_val, cfg, epoch,
                                       log_writer=log_writer, mesh=val_mesh)
            log_stats.update(val_stats)
            if val_stats["val/mDice"] > best_val_metric:
                print(f"New record at epoch {epoch}! Previous best: "
                      f"{best_val_metric}, new best: {val_stats['val/mDice']}")
                best_val_metric, best_epoch = val_stats["val/mDice"], epoch
                if cfg.output_dir and host == 0:
                    ckpt.save_checkpoint(cfg.output_dir, "best_model", state, epoch)

        if cfg.output_dir and host == 0 and (
                (epoch + 1) % cfg.save_ckpt_freq == 0 or epoch + 1 == cfg.epochs):
            path = ckpt.save_checkpoint(cfg.output_dir,
                                        f"checkpoint-{epoch}", state, epoch)
            checkpoint_dirs.append(path)

        if cfg.output_dir and host == 0:
            with open(os.path.join(cfg.output_dir, "log.txt"), "a",
                      encoding="utf-8") as f:
                f.write(json.dumps(log_stats) + "\n")
        if cfg.log_dir and host == 0:
            # per-epoch metric record (reference log_to_neptune,
            # run_training.py:165-166)
            log_metrics(cfg.log_dir, log_stats)

    total = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    print(f"Training complete! Total training time {total}. "
          f"Best validation metric {best_val_metric} at epoch {best_epoch}")
    ckpt.cleanup_checkpoints(checkpoint_dirs)
    return {"best_val_metric": best_val_metric, "best_epoch": best_epoch}


if __name__ == "__main__":
    args = get_args()
    if args.output_dir:
        Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)
