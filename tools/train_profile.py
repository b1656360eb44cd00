"""Per-op roofline ledger for the flagship train step (VERDICT r2 #1).

Runs the bs1 (default) flagship train step under jax.profiler.trace, parses
the trace-viewer JSON the plugin writes, and prints a ledger: op (fusion)
name -> total ms over the traced steps, grouped into buckets (conv fwd, conv
dW, attention, loss, optimizer, elementwise, ...). This is the measurement
backbone for the MFU campaign: every bucket >= 5 ms/step must either shrink
or be shown at its structural ceiling.

Usage:  python tools/train_profile.py [--bs N] [--steps N] [--top N]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np


def build_and_trace(bs: int, steps: int, outdir: str, remat: str = "conv",
                    pallas_train: bool = False,
                    model_name: str = "nnFormerUNETR"):
    import jax
    import jax.numpy as jnp

    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.models import build_model
    from medicalsemseg_tpu.train.state import (create_train_state,
                                               make_train_step)
    from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config(model=model_name, vol_size=96, patch_size=2,
                 hidden_dim=48, depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                 window_size=6, output_dim=14, compute_dtype="bfloat16",
                 remat=remat, pallas_train=pallas_train)
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    v = cfg.vol_size3()
    batch = {
        "image": jnp.asarray(rng.normal(size=(bs, *v, 1)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, cfg.output_dim,
                                          (bs, *v)).astype(np.int32)),
        "crop_loc": jnp.full((bs, 3), 0.5, jnp.float32),
        "affine": jnp.ones((bs, 3), jnp.float32),
    }
    x_probe = (batch["image"], batch["crop_loc"], batch["affine"])
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0), x_probe,
                                  steps_per_epoch=100)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    state, m = step(state, batch, jax.random.PRNGKey(2))
    print("warm loss:", float(m["loss"]), flush=True)

    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        for i in range(steps):
            state, m = step(state, batch,
                            jax.random.fold_in(jax.random.PRNGKey(3), i))
            _ = float(m["loss"])


def parse_trace(outdir: str, steps: int, top: int):
    """Roofline ledger from the 'XLA Ops' device track: per-op ms/step,
    achieved TF/s (model_flops) and GB/s (bytes_accessed), HLO category,
    and python source attribution."""
    files = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    if not files:
        print("no trace files found under", outdir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    ops_tracks = {k for k, n in tid_name.items() if n == "XLA Ops"}

    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e["pid"], e["tid"]) not in ops_tracks:
            continue
        name = e.get("name", "?")
        args = e.get("args", {})
        dur = e.get("dur", 0) / 1e3  # us -> ms
        a = agg.setdefault(name, dict(ms=0.0, n=0, flops=0.0, bytes=0.0,
                                      cat=args.get("hlo_category", "?"),
                                      src=args.get("source", ""),
                                      long=args.get("long_name", "")))
        a["ms"] += dur
        a["n"] += 1
        a["flops"] += float(args.get("model_flops", 0) or 0)
        a["bytes"] += float(args.get("raw_bytes_accessed",
                                     args.get("bytes_accessed", 0)) or 0)
        total += dur

    print(f"total device op time: {total:.1f} ms over {steps} steps "
          f"= {total / steps:.1f} ms/step\n")
    print(f"{'ms/step':>8} {'%':>5} {'TF/s':>6} {'GB/s':>6}  "
          f"{'category':<18} op  [source]")
    items = sorted(agg.items(), key=lambda kv: -kv[1]["ms"])
    for name, a in items[:top]:
        tfs = a["flops"] / (a["ms"] * 1e-3) / 1e12 if a["ms"] else 0
        gbs = a["bytes"] / (a["ms"] * 1e-3) / 1e9 if a["ms"] else 0
        src = a["src"].split("/")[-1][:40]
        shape = ""
        m = re.search(r"= (\S+?)\{", a["long"])
        if m:
            shape = m.group(1)
        print(f"{a['ms'] / steps:8.2f} {100 * a['ms'] / max(total, 1e-9):5.1f} "
              f"{tfs:6.1f} {gbs:6.0f}  {a['cat']:<18} {name[:48]:<48} "
              f"{shape[:28]} [{src}]")

    cats = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
    for a in agg.values():
        cats[a["cat"]][0] += a["ms"]
        cats[a["cat"]][1] += a["flops"]
        cats[a["cat"]][2] += a["bytes"]
    print("\nby HLO category:")
    print(f"{'ms/step':>8} {'%':>5} {'TF/s':>6} {'GB/s':>6}  category")
    for cat, (ms, fl, by) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        tfs = fl / (ms * 1e-3) / 1e12 if ms else 0
        gbs = by / (ms * 1e-3) / 1e9 if ms else 0
        print(f"{ms / steps:8.2f} {100 * ms / max(total, 1e-9):5.1f} "
              f"{tfs:6.1f} {gbs:6.0f}  {cat}")

    srcs = collections.defaultdict(float)
    for a in agg.values():
        srcs[a["src"].split("/")[-1][:60]] += a["ms"]
    print("\nby python source line:")
    for src, ms in sorted(srcs.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms / steps:8.2f} {100 * ms / max(total, 1e-9):5.1f}  {src}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--remat", default="conv")
    ap.add_argument("--pallas_train", action="store_true")
    ap.add_argument("--outdir", default="/tmp/jaxtrace_r3")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--model", default="nnFormerUNETR",
                    help="any factory model name (the zoo-declination\n                    profiles of VERDICT r3 item 7 use GCViTUNETR,\n                    SegFormer3D, SwinUNETR_Official)")
    args = ap.parse_args()
    if not args.parse_only:
        build_and_trace(args.bs, args.steps, args.outdir, args.remat,
                        args.pallas_train, args.model)
    parse_trace(args.outdir, args.steps, args.top)


if __name__ == "__main__":
    main()
