"""Label-free prediction driver (reference: run_test.py:18-63 +
engine/test.py:96-173).

Loads a checkpoint, runs Gaussian sliding-window prediction over the test
datalist, argmaxes to uint8 labels, restores original spacing by
nearest-neighbour resampling, and dumps per-fold NIfTIs under
test_output/Fold{k}/{pred,img,rs}.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config, get_args
from medicalsemseg_tpu.data import nifti
from medicalsemseg_tpu.data.datalist import load_decathlon_datalist
from medicalsemseg_tpu.data.dataset import CachedVolumeDataset, EvalLoader
from medicalsemseg_tpu.models import build_model
from medicalsemseg_tpu.train.state import create_train_state
from medicalsemseg_tpu.utils import checkpoint as ckpt
from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache


def resample_3d_nearest(vol: np.ndarray, target_size) -> np.ndarray:
    """scipy zoom(order=0) equivalent (reference: utils/misc.py:420-424)."""
    from scipy import ndimage

    ratios = tuple(float(t) / float(s) for t, s in zip(target_size, vol.shape))
    return ndimage.zoom(vol, ratios, order=0, prefilter=False)


def test_model(state, model, loader, cfg: Config, mesh=None):
    """With a multi-device ``mesh``, same-shaped volumes are predicted
    one-per-chip (volume-level DP; logits bit-identical per volume)."""
    air_cval = ((0.0 - cfg.t_norm_mean) / cfg.t_norm_std
                if cfg.t_normalize else 0.0)

    from medicalsemseg_tpu.infer.sliding_window import (
        grouped_padded_volumes,
        jitted_sliding_window,
        jitted_sliding_window_sharded,
    )

    n_group = int(mesh.shape["data"]) if mesh is not None else 1
    sw_run = (jitted_sliding_window_sharded(model, mesh) if n_group > 1
              else jitted_sliding_window(model))
    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    if n_group > 1:  # replicate weights across the inference mesh
        from jax.sharding import NamedSharding, PartitionSpec

        variables = jax.device_put(
            variables, NamedSharding(mesh, PartitionSpec()))

    def one_volume(logits, sample, orig, t0):
        logits = logits[:, :orig[0], :orig[1], :orig[2]]
        pred = np.asarray(jnp.argmax(logits[0], axis=-1)).astype(np.uint8)

        pred_rs = None
        if cfg.t_voxel_spacings:
            pred_rs = resample_3d_nearest(pred, sample.original_shape)

        img_name = os.path.basename(sample.name).split("img")[-1]
        if cfg.save_eval_output and cfg.output_dir:
            out_dir = os.path.join(cfg.output_dir, "test_output",
                                   f"Fold{cfg.cv_fold}")
            # zero translation like the reference (engine/test.py:152-153)
            affine = sample.affine.copy()
            affine[0:3, 3] = 0
            orig_affine = sample.original_affine.copy()
            orig_affine[0:3, 3] = 0
            for sub, arr, aff in (("pred", pred, affine),
                                  ("img", sample.image[..., 0], affine)):
                d = os.path.join(out_dir, sub)
                os.makedirs(d, exist_ok=True)
                nifti.save(nifti.NiftiImage(arr, aff), os.path.join(d, img_name))
            if pred_rs is not None:
                d = os.path.join(out_dir, "rs")
                os.makedirs(d, exist_ok=True)
                nifti.save(nifti.NiftiImage(pred_rs, orig_affine),
                           os.path.join(d, img_name))
        print(f"{img_name}: predicted in {time.time() - t0:.1f}s "
              f"shape {pred.shape}")

    for vols, affs, samples, origs in grouped_padded_volumes(
            loader, n_group, cfg.sw_bucket_multiple, air_cval,
            policy=getattr(cfg, "val_group_policy", "bucket")):
        t0 = time.time()
        logits_all = sw_run(variables, jnp.asarray(vols), jnp.asarray(affs),
                            roi=cfg.vol_size3(), sw_batch=cfg.batch_size_val,
                            overlap=cfg.val_infer_overlap, mode="gaussian",
                            cval=air_cval, tta=cfg.tta_mirror,
                            n_classes=cfg.output_dim)
        for k, (sample, orig) in enumerate(zip(samples, origs)):
            one_volume(logits_all[k:k + 1], sample, orig, t0)


def main(cfg: Config):
    enable_compilation_cache()
    data_json = os.path.join(cfg.data_path, cfg.task, cfg.json_list)
    files = load_decathlon_datalist(data_json, "test")
    ds = CachedVolumeDataset(files, cfg, cache_rate=0.0, mode="test")
    loader = EvalLoader(ds)

    model = build_model(cfg)
    v = cfg.vol_size3()
    x_probe = (jnp.zeros((1, *v, cfg.in_chans)), jnp.zeros((1, 3)),
               jnp.ones((1, 3)))
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed),
                                  x_probe, 1)
    if cfg.resume:
        state = ckpt.load_params_only(cfg.resume, state)
        print(f"Loaded checkpoint {cfg.resume}")

    from medicalsemseg_tpu.parallel.mesh import create_mesh

    local = jax.local_devices()
    mesh = create_mesh((len(local),), devices=local) if len(local) > 1 else None
    if mesh is not None:
        print(f"volume-parallel prediction over {len(local)} devices")
    t0 = time.time()
    test_model(state, model, loader, cfg, mesh=mesh)
    print(f"Testing took {time.time() - t0:.1f}s for {len(ds)} volumes")


if __name__ == "__main__":
    args = get_args()
    if args.output_dir:
        Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)
