"""Device-HD95 compile-count probe (VERDICT r4 weakness 8 / item 10).

Question: across a realistic 14-class eval with diverse organ sizes, how
many distinct (p_pad, t_pad) shape buckets does the device NN kernel
compile, and does the LRU hold them all? Builds synthetic label volumes
with 13 foreground "organs" spanning radii from a few voxels to ~70 voxels
(surface point counts from ~10^2 to ~10^5 — the production spread), runs
hausdorff95(device=True) pred-vs-target per volume, and prints the
compile/call counters plus wall time per volume.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/hd95_compile_count.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from medicalsemseg_tpu.train import metrics

N_VOLUMES = int(os.environ.get("MEDSEG_HD95_VOLS", "6"))
SHAPE = (226, 226, 139)  # post-Spacingd BTCV-like grid
N_CLASSES = 14


def synth_labels(rng: np.random.Generator) -> np.ndarray:
    """13 spheres of geometrically-spread radii at random centers."""
    lab = np.zeros(SHAPE, np.int16)
    zz, yy, xx = np.ogrid[:SHAPE[0], :SHAPE[1], :SHAPE[2]]
    # largest radius must leave a valid center range in the SMALLEST dim
    # (geomspace(3, 70) made rng.integers(71, 68) throw for dim 139)
    radii = np.geomspace(3, min(SHAPE) // 2 - 4, N_CLASSES - 1)
    for c, r in enumerate(radii, start=1):
        ctr = [rng.integers(int(r) + 1, s - int(r) - 1) for s in SHAPE]
        m = ((zz - ctr[0]) ** 2 + (yy - ctr[1]) ** 2
             + (xx - ctr[2]) ** 2) <= r * r
        lab[m] = c
    return lab


def main() -> None:
    rng = np.random.default_rng(7)
    times = []
    for i in range(N_VOLUMES):
        target = synth_labels(rng)
        # prediction: the same organs, jittered centers (realistic near-miss)
        pred = synth_labels(np.random.default_rng(100 + i))
        t0 = time.time()
        hd = metrics.hausdorff95(pred, target, N_CLASSES, device=True)
        dt = time.time() - t0
        times.append(dt)
        finite = np.isfinite(hd).sum()
        print(f"[hd95] vol {i}: {dt:.2f}s, {finite}/{N_CLASSES - 1} finite, "
              f"compiles so far {metrics._compile_stats['compiles']}, "
              f"calls {metrics._compile_stats['calls']}", flush=True)
    info = metrics._nn_compiled.cache_info()
    print(f"[hd95] TOTAL volumes {N_VOLUMES}: "
          f"distinct compiled buckets {metrics._compile_stats['compiles']}, "
          f"device calls {metrics._compile_stats['calls']}, "
          f"lru hits {info.hits} misses {info.misses} maxsize {info.maxsize}, "
          f"mean {np.mean(times):.2f}s/vol warm-tail {np.mean(times[2:]):.2f}s")


if __name__ == "__main__":
    main()
