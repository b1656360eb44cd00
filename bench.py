"""Benchmark: Gaussian sliding-window inference volumes/sec/chip.

The north-star workload (BASELINE.md): flagship nnFormerUNETR, 96³ roi,
overlap 0.5, Gaussian blending, bf16 compute, on a BTCV-like CT volume
(240x240x140 after 1.5mm resampling + foreground crop) -> 32 windows.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the CPU reference throughput for the identical
workload, extrapolated from a measured single-window fp32 forward on this
pod's CPU (recorded in BASELINE.json under "cpu_measured").
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.infer.sliding_window import sliding_window_inference
from medicalsemseg_tpu.models import build_model
from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache

VOLUME_SHAPE = (240, 240, 140)
ROI = (96, 96, 96)
OVERLAP = 0.5
SW_BATCH = 16

# CPU baseline: measured single 96³ window forward (fp32, jitted, this host),
# extrapolated to the 32-window blended volume. See BASELINE.json.
CPU_SECONDS_PER_WINDOW = None  # loaded from BASELINE.json at runtime


def _load_cpu_baseline() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    with open(path) as f:
        data = json.load(f)
    return float(data["cpu_measured"]["seconds_per_window_fp32"])


def main():
    enable_compilation_cache()
    use_pallas = os.environ.get("MEDSEG_BENCH_PALLAS", "1") == "1"
    cfg = Config(model="nnFormerUNETR", vol_size=96, patch_size=2,
                 hidden_dim=48, depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                 window_size=6, output_dim=14, compute_dtype="bfloat16",
                 use_pallas_attention=use_pallas)
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(1, *VOLUME_SHAPE, 1)).astype(np.float32))
    affine = jnp.ones((1, 3), jnp.float32)
    x_probe = (vol[:, :96, :96, :96], jnp.full((1, 3), 0.5), affine)
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_probe)

    from medicalsemseg_tpu.infer.sliding_window import sliding_window_inference

    @jax.jit
    def run(variables, vol, affine, salt):
        def predictor(model_in):
            return model.apply(variables, model_in, deterministic=True)

        out = sliding_window_inference(
            vol + salt * 1e-4, affine, ROI, SW_BATCH, predictor,
            overlap=OVERLAP, mode="gaussian", n_classes=cfg.output_dim)
        # scalar checksum forces completion through the host readback —
        # block_until_ready does not actually block on the axon tunnel
        return out.mean()

    vol = jax.device_put(vol)  # resident once; iterations vary only a scalar
    _ = float(run(variables, vol, affine, jnp.float32(0)))  # compile + warm

    # measured tunnel round-trip is subtracted via a trivial jitted readback
    trivial = jax.jit(lambda x: x.sum())
    _ = float(trivial(jnp.ones(8)))
    t0 = time.time()
    for _ in range(5):
        _ = float(trivial(jnp.ones(8)))
    rt = (time.time() - t0) / 5

    n_iters = 5
    t0 = time.time()
    for i in range(n_iters):
        _ = float(run(variables, vol, affine, jnp.float32(i)))
    dt = (time.time() - t0) / n_iters - rt
    assert dt > 0, "timing anomaly: round-trip exceeded measured iteration"

    vols_per_sec = 1.0 / dt

    from medicalsemseg_tpu.infer.sliding_window import (
        dense_patch_starts, scan_interval)
    n_windows = len(dense_patch_starts(
        VOLUME_SHAPE, ROI, scan_interval(VOLUME_SHAPE, ROI, OVERLAP)))
    cpu_vols_per_sec = 1.0 / (n_windows * _load_cpu_baseline())

    print(json.dumps({
        "metric": "sliding_window_volumes_per_sec_per_chip",
        "value": round(vols_per_sec, 4),
        "unit": "volumes/sec",
        "vs_baseline": round(vols_per_sec / cpu_vols_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
