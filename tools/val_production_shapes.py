"""Production-shape validation readiness probe (VERDICT r3 item 10/#9).

No BTCV volumes exist in this environment, so Dice parity on real data stays
open — but the *mechanics* of the validation path at production CT shapes
can and should be proven: raw 512x512x~150 scans at sub-millimetre in-plane
spacing resample to odd, large post-Spacingd grids (e.g. 273x273x112), which
stress exactly the parts the 240x240x140 benchmark volume does not:

  * host resample cost at real sizes (native C++ vs the scipy fallback),
  * bucket-padding behaviour / compile counts per bucket
    (`--sw_bucket_multiple`, infer/sliding_window.bucket_pad),
  * sliding-window + masked-metrics wall time per volume (cold vs warm),
  * grouped volume-DP idle fraction on a realistic mixed shape set
    (train/loop.py run_validation groups only same-bucket volumes; VERDICT
    r3 weakness #6).

Reference workload being modelled: data/dataset_builder.py:30-36 (Spacingd
to `--t_voxel_dims`) feeding engine/val.py:15-110. The BTCV recipe uses
1.5/1.5/2.0 mm target spacing with fixed-range CT intensity scaling.

Writes one JSON line per volume plus a summary block to stdout; run on TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/val_production_shapes.py
CPU smoke (tiny shapes): MEDSEG_PROD_SMOKE=1 JAX_PLATFORMS=cpu python ...
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SMOKE = os.environ.get("MEDSEG_PROD_SMOKE", "0") == "1"

# (raw shape, voxel spacing mm) — a realistic abdominal-CT mix: thin-slice
# and thick-slice scanners, odd slice counts, one small-FOV scan
CASES = [
    ((512, 512, 148), (0.79, 0.79, 1.50)),
    ((512, 512, 121), (0.72, 0.72, 3.00)),
    ((512, 512, 199), (0.91, 0.91, 1.00)),
    ((512, 512, 150), (0.80, 0.80, 1.50)),
    ((320, 390, 110), (1.17, 1.17, 2.50)),
    ((512, 512, 163), (0.68, 0.68, 2.00)),
]
if SMOKE:
    CASES = [((64, 72, 40), (1.2, 1.2, 2.0)), ((64, 64, 33), (0.9, 0.9, 3.0))]


def synth_ct(shape, rng):
    """CT-like HU volume: air background, soft-tissue ellipsoid, bone rim,
    a couple of organs — enough structure for foreground cropping and a
    non-trivial label map."""
    d, h, w = shape
    zz, yy, xx = np.meshgrid(np.linspace(-1, 1, d), np.linspace(-1, 1, h),
                             np.linspace(-1, 1, w), indexing="ij")
    body = (zz ** 2 / 0.9 + yy ** 2 / 0.6 + xx ** 2 / 0.8) < 1.0
    img = np.full(shape, -1000.0, np.float32)
    img[body] = 40.0 + 20.0 * rng.standard_normal(int(body.sum())).astype(np.float32)
    rim = ((zz ** 2 / 0.9 + yy ** 2 / 0.6 + xx ** 2 / 0.8) < 1.0) & (
        (zz ** 2 / 0.75 + yy ** 2 / 0.48 + xx ** 2 / 0.65) >= 1.0)
    img[rim] = 700.0
    lab = np.zeros(shape, np.uint8)
    organ1 = ((zz + 0.2) ** 2 + (yy - 0.1) ** 2 + (xx + 0.15) ** 2) < 0.09
    organ2 = ((zz - 0.25) ** 2 + (yy + 0.2) ** 2 + (xx - 0.2) ** 2) < 0.04
    img[organ1] = 90.0
    img[organ2] = 55.0
    lab[organ1] = 1
    lab[organ2] = 2
    return img, lab


def main():
    import jax
    import jax.numpy as jnp

    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.data import native, nifti
    from medicalsemseg_tpu.data.transforms import load_and_preprocess
    from medicalsemseg_tpu.infer.sliding_window import (
        bucket_pad, grouped_padded_volumes, jitted_sliding_window)
    from medicalsemseg_tpu.models import build_model
    from medicalsemseg_tpu.ops.resize import spacing_resample_np
    from medicalsemseg_tpu.train.loop import make_val_metrics
    from medicalsemseg_tpu.train.losses import build_loss
    from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache

    enable_compilation_cache()
    if SMOKE:
        # JAX_PLATFORMS=cpu alone does not stick on this machine (the axon
        # plugin overrides it at import) — pin explicitly so a smoke run can
        # never contend with a TPU benchmark in flight
        from medicalsemseg_tpu.utils.jitutil import force_cpu
        force_cpu()
    if SMOKE:
        cfg = Config(model="nnFormerUNETR", vol_size=32, patch_size=2,
                     hidden_dim=12, depths=(1, 1), num_heads=(2, 2),
                     window_size=2, output_dim=3, compute_dtype="float32",
                     t_voxel_spacings=True, t_voxel_dims=(1.5, 1.5, 2.0),
                     t_fixed_ct_intensity=True, t_normalize=True,
                     t_crop_foreground_img=True, t_spatial_pad=True,
                     sw_batch_size=4)
    else:
        # the flagship BTCV-recipe config (bench.py + reference defaults)
        cfg = Config(model="nnFormerUNETR", vol_size=96, patch_size=2,
                     hidden_dim=48, depths=(2, 2, 2, 2),
                     num_heads=(3, 6, 12, 24), window_size=6, output_dim=14,
                     compute_dtype="bfloat16", use_pallas_attention=True,
                     t_voxel_spacings=True, t_voxel_dims=(1.5, 1.5, 2.0),
                     t_fixed_ct_intensity=True, t_normalize=True,
                     t_crop_foreground_img=True, t_spatial_pad=True)
    roi = cfg.vol_size3()
    cval = (0.0 - cfg.t_norm_mean) / cfg.t_norm_std if cfg.t_normalize else 0.0

    model = build_model(cfg)
    rngk = jax.random.PRNGKey(0)
    probe = (jnp.zeros((1, *roi, 1), jnp.float32),
             jnp.full((1, 3), 0.5, jnp.float32), jnp.ones((1, 3), jnp.float32))
    variables = jax.jit(
        lambda r, x: model.init(r, x, deterministic=True))(rngk, probe)
    sw_run = jitted_sliding_window(model)
    val_metrics = make_val_metrics(build_loss(cfg), cfg.output_dim)

    rng = np.random.default_rng(7)
    tmp = tempfile.mkdtemp(prefix="prodshapes_")
    samples, rows = [], []
    for i, (shape, spacing) in enumerate(CASES):
        img, lab = synth_ct(shape, rng)
        affine = np.diag(list(spacing) + [1.0]).astype(np.float64)
        ip = os.path.join(tmp, f"img{i}.nii.gz")
        lp = os.path.join(tmp, f"lab{i}.nii.gz")
        nifti.save(nifti.NiftiImage(img, affine), ip)
        nifti.save(nifti.NiftiImage(lab.astype(np.float32), affine), lp)

        t0 = time.time()
        s = load_and_preprocess(ip, lp, cfg, mode="val")
        t_pre = time.time() - t0

        # isolated resample timings at the raw shape: native vs scipy
        t0 = time.time()
        spacing_resample_np(img, affine, cfg.t_voxel_dims, mode="trilinear")
        t_native = time.time() - t0
        avail = native.available
        try:
            native.available = lambda: False
            t0 = time.time()
            spacing_resample_np(img, affine, cfg.t_voxel_dims,
                                mode="trilinear")
            t_scipy = time.time() - t0
        finally:
            native.available = avail

        padded, orig = bucket_pad(s.image, cfg.sw_bucket_multiple, cval)
        rows.append({
            "raw_shape": list(shape), "spacing_mm": list(spacing),
            "post_resample_shape": list(s.image.shape[:3]),
            "bucket_shape": list(padded.shape[:3]),
            "pad_voxel_frac": round(1.0 - np.prod(s.image.shape[:3])
                                    / np.prod(padded.shape[:3]), 3),
            "host_preprocess_s": round(t_pre, 2),
            "resample_native_s": round(t_native, 2),
            "resample_scipy_s": round(t_scipy, 2),
        })
        samples.append((s, padded, orig))

    # sliding-window + masked metrics per volume; cold (compile) vs warm
    buckets_seen = {}
    for (s, padded, orig), row in zip(samples, rows):
        vol = jnp.asarray(padded)[None]
        aff = jnp.asarray(np.diag(s.original_affine)[:3], jnp.float32)[None]
        key = padded.shape

        def run_once():
            t0 = time.time()
            logits = sw_run(variables, vol, aff, roi=roi,
                            sw_batch=cfg.sw_batch_size,
                            overlap=cfg.val_infer_overlap, mode="gaussian",
                            cval=cval, n_classes=cfg.output_dim)
            lab = s.label[..., 0].astype(np.int32)
            pads = [(0, logits.shape[1 + i] - lab.shape[i]) for i in range(3)]
            labels = jnp.asarray(np.pad(lab, pads))[None]
            loss, dice, nn = val_metrics(logits, labels,
                                         jnp.asarray(orig, jnp.int32))
            _ = float(loss)  # forced completion through the tunnel
            return time.time() - t0, float(loss), np.asarray(dice), np.asarray(nn)

        dt_first, loss, dice, nn = run_once()
        dt_second, _, _, _ = run_once()
        row.update({
            "sw_cold_s": round(dt_first, 2),
            "sw_warm_s": round(dt_second, 2),
            "new_bucket": key not in buckets_seen,
            "val_loss": round(loss, 4),
            "val_mdice": round(float(dice[nn > 0].mean()), 4),
        })
        buckets_seen.setdefault(key, 0)
        buckets_seen[key] += 1
        print(json.dumps(row), flush=True)

    # grouped volume-DP idle fraction at n_group=8 on this shape mix
    class _L:
        def __iter__(self):
            return iter([s for s, _, _ in samples])

        def __len__(self):
            return len(samples)

    n_group = 8
    slots = real = 0
    for vols, affs, group_samples, _origs in grouped_padded_volumes(
            _L(), n_group, cfg.sw_bucket_multiple, cval):
        slots += n_group
        real += len(group_samples)
    summary = {
        "n_volumes": len(samples),
        "distinct_buckets": len(buckets_seen),
        "bucket_histogram": {str(k): v for k, v in buckets_seen.items()},
        "grouped_val_n_group": n_group,
        "grouped_val_idle_fraction": round(1.0 - real / max(slots, 1), 3),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps({"summary": summary}, indent=1))


if __name__ == "__main__":
    main()
