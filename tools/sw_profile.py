"""Per-op roofline ledger for the sliding-window PREDICTOR forward.

Profiles the jitted eval-mode flagship forward on one sw_batch of 96^3
windows (the op that dominates sliding-window inference; blending measured
~free) and prints the same ledger as tools/train_profile.py. Measurement
backbone for the inference-throughput campaign (VERDICT r2 #5).

Usage:  python tools/sw_profile.py [--sw_batch N] [--steps N] [--top N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.train_profile import parse_trace  # noqa: E402


def build_and_trace(sw_batch: int, steps: int, outdir: str,
                    pallas: bool = True):
    import jax
    import jax.numpy as jnp

    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.models import build_model
    from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config(model="nnFormerUNETR", vol_size=96, patch_size=2,
                 hidden_dim=48, depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                 window_size=6, output_dim=14, compute_dtype="bfloat16",
                 use_pallas_attention=pallas)
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    v = cfg.vol_size3()
    img = jnp.asarray(rng.normal(size=(sw_batch, *v, 1)).astype(np.float32))
    x_probe = (img, jnp.full((sw_batch, 3), 0.5, jnp.float32),
               jnp.ones((sw_batch, 3), jnp.float32))
    # params only — create_train_state would park ~1 GB of AdamW moments in
    # HBM for an eval-only profile (it pushed the bs16 forward into OOM)
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_probe)
    # mean computed IN-GRAPH: an eager mean over (16,96^3,14) logits both
    # costs a round-trip and doubles peak HBM (it OOMed this pod)
    fwd = jax.jit(lambda vs, x: jnp.mean(
        model.apply(vs, x, deterministic=True).astype(jnp.float32)))
    print("warm out:", float(fwd(variables, x_probe)), flush=True)

    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            _ = float(fwd(variables, x_probe))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sw_batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--no_pallas", action="store_true")
    ap.add_argument("--outdir", default="/tmp/jaxtrace_sw")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        build_and_trace(args.sw_batch, args.steps, args.outdir,
                        not args.no_pallas)
    parse_trace(args.outdir, args.steps, args.top)


if __name__ == "__main__":
    main()
