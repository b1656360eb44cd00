"""Grouped-validation bucket-policy sweep (VERDICT r3 weakness #6 / item 9).

`train/loop.py run_validation` groups only same-bucket volumes for volume-DP,
so a fold whose post-Spacingd shapes straddle buckets runs partially-filled
device groups. This tool measures that on a realistic abdominal-CT population
— hundreds of simulated scans pushed through the REAL bucket/grouping/window
code (infer/sliding_window.{bucket_pad,grouped_padded_volumes-policy,
scan_interval,dense_patch_starts}) — and sweeps the two policy knobs:

  * --sw_bucket_multiple m in {32, 48, 64, 96, 128}: coarser buckets mean
    fewer compiles and fuller groups but more padded air voxels (each padded
    voxel costs real sliding-window compute);
  * n_group g in {1, 2, 4, 8}: the volume-DP width (number of chips).

Cost model (per group, one program run on g chips concurrently):
  wall  ∝ n_windows(bucket shape)   [all chips run the same window grid]
so fold wall-clock ∝ Σ_groups n_windows(bucket) and the single-chip baseline
is Σ_volumes n_windows(own bucket). Idle fraction = filled-but-discarded
slots / total slots. Window counts use the production roi 96³ / overlap 0.5.

Population model (shapes only — no voxel data): BTCV-like abdominal CTs,
512×512 in-plane at 0.60-0.98 mm, 85-198 slices at 2.5-5.0 mm, Spacingd to
(1.5, 1.5, 2.0) mm via the ceil rule of ops/resize.spacing_resample_np:78,
then CropForegroundd modelled as the body bbox (55-85%% of in-plane FOV,
90-100%% of z). Reference workload: data/dataset_builder.py:30-36 feeding
engine/val.py:15-110 one volume at a time (the reference never groups; g=1
is its policy).

Run (host-only, no device): python tools/bucket_policy_sim.py
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from medicalsemseg_tpu.infer.sliding_window import (
    dense_patch_starts, scan_interval)

ROI = (96, 96, 96)
OVERLAP = 0.5
TARGET = np.array([1.5, 1.5, 2.0])


def simulate_shapes(n: int, rng: np.random.Generator) -> list:
    """Post-preprocess (cropped, resampled) spatial shapes, (D, H, W)."""
    out = []
    for _ in range(n):
        sp_xy = rng.uniform(0.60, 0.98)
        st = rng.choice([2.5, 3.0, 4.0, 5.0])
        nz = int(rng.integers(85, 199))
        raw = np.array([512, 512, nz], dtype=float)
        spacing = np.array([sp_xy, sp_xy, st])
        post = np.maximum(np.ceil(raw * spacing / TARGET), 1).astype(int)
        body_xy = rng.uniform(0.55, 0.85)
        body_z = rng.uniform(0.90, 1.0)
        crop = np.array([max(1, int(round(post[0] * body_xy))),
                         max(1, int(round(post[1] * body_xy))),
                         max(1, int(round(post[2] * body_z)))])
        out.append(tuple(int(v) for v in crop))
    return out


def bucket_shape(shape, multiple):
    return tuple(s + ((-s) % multiple) for s in shape)


def n_windows(shape) -> int:
    # volumes smaller than the roi are padded up to it by the SW runner
    shape = tuple(max(s, r) for s, r in zip(shape, ROI))
    interval = scan_interval(shape, ROI, OVERLAP)
    return len(dense_patch_starts(shape, ROI, interval))


def group_fill(shapes, multiple, n_group):
    """Reproduce grouped_padded_volumes' slot accounting on shapes alone."""
    pending = Counter()
    groups = []  # (bucket, n_real)
    for s in shapes:
        key = bucket_shape(s, multiple)
        pending[key] += 1
        if pending[key] == n_group:
            groups.append((key, n_group))
            pending[key] = 0
    for key, cnt in pending.items():
        if cnt:
            groups.append((key, cnt))
    return groups


def sorted_max_policy(shapes, multiple, n_group):
    """Candidate policy: sort volumes by padded size, group ANY n_group
    consecutive, pad each group to the elementwise max of its members'
    buckets. Full groups by construction (idle only in the last one); the
    window grid of a volume can differ from its own-bucket grid, so logits
    are MONAI-equivalent (air-padded, masked metrics) but not bit-identical
    to the single-device path — hence opt-in, never the default."""
    keyed = sorted((bucket_shape(s, multiple) for s in shapes),
                   key=lambda b: (np.prod(b), b))
    groups = []
    for i in range(0, len(keyed), n_group):
        chunk = keyed[i:i + n_group]
        gmax = tuple(int(max(b[d] for b in chunk)) for d in range(3))
        groups.append((gmax, len(chunk)))
    return groups


def main():
    rng = np.random.default_rng(20260819)
    populations = {
        "fold_val_6": 6,      # one CV fold's validation split (BTCV 24/6)
        "dataset_30": 30,     # the full BTCV train set, e.g. final eval
        "large_120": 120,     # a production-scale eval sweep
    }
    rows = []
    for pop_name, n in populations.items():
        shapes = simulate_shapes(n, rng)
        base_windows = None
        for multiple in (32, 48, 64, 96, 128):
            buckets = Counter(bucket_shape(s, multiple) for s in shapes)
            win_single = sum(n_windows(b) * c for b, c in buckets.items())
            if multiple == 32:
                base_windows = win_single
            pad_frac = 1.0 - (sum(np.prod(s) for s in shapes)
                              / sum(np.prod(bucket_shape(s, multiple))
                                    for s in shapes))
            for g in (1, 2, 4, 8):
                groups = group_fill(shapes, multiple, g)
                slots = len(groups) * g
                real = sum(c for _, c in groups)
                wall = sum(n_windows(b) for b, _ in groups)
                sgroups = sorted_max_policy(shapes, multiple, g)
                swall = sum(n_windows(b) for b, _ in sgroups)
                sreal = sum(c for _, c in sgroups)
                rows.append({
                    "population": pop_name, "n_volumes": n,
                    "multiple": multiple, "n_group": g,
                    "distinct_buckets": len(buckets),
                    "pad_voxel_frac": round(float(pad_frac), 3),
                    "idle_fraction": round(1.0 - real / slots, 3),
                    "wall_windows": wall,
                    "speedup_vs_m32_g1": round(base_windows / wall, 2),
                    "sorted_max_wall": swall,
                    "sorted_max_idle": round(
                        1.0 - sreal / (len(sgroups) * g), 3),
                    "sorted_max_compiles": len({b for b, _ in sgroups}),
                    "sorted_max_speedup": round(base_windows / swall, 2),
                })
                print(json.dumps(rows[-1]), flush=True)
    # policy verdict: best (multiple, g=8) per population
    print("\n# best g=8 policy per population (by wall_windows):",
          file=sys.stderr)
    for pop_name in populations:
        cand = [r for r in rows
                if r["population"] == pop_name and r["n_group"] == 8]
        best = min(cand, key=lambda r: r["wall_windows"])
        print(f"#  {pop_name}: multiple={best['multiple']} "
              f"idle={best['idle_fraction']} compiles={best['distinct_buckets']} "
              f"speedup={best['speedup_vs_m32_g1']}x", file=sys.stderr)


if __name__ == "__main__":
    main()
