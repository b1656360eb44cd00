"""Per-op roofline ledger for the sliding-window INFERENCE path (VERDICT r3:
push SW >= 1.3 vol/s/chip). Traces bench.py's exact headline workload
(flagship nnFormerUNETR, 240x240x140 volume, 96^3 roi, overlap 0.5, Gaussian,
sw_batch 16) under jax.profiler and reuses train_profile.parse_trace.

Usage:  python tools/sw_profile.py [--iters 2] [--sw_batch 16] [--top 45]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_profile import parse_trace  # noqa: E402


def build_and_trace(iters: int, sw_batch: int, outdir: str,
                    use_pallas: bool = True):
    import jax
    import jax.numpy as jnp

    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.infer.sliding_window import sliding_window_inference
    from medicalsemseg_tpu.models import build_model
    from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config(model="nnFormerUNETR", vol_size=96, patch_size=2,
                 hidden_dim=48, depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                 window_size=6, output_dim=14, compute_dtype="bfloat16",
                 use_pallas_attention=use_pallas)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(1, 240, 240, 140, 1)).astype(np.float32))
    affine = jnp.ones((1, 3), jnp.float32)
    x_probe = (vol[:, :96, :96, :96], jnp.full((1, 3), 0.5), affine)
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_probe)

    @jax.jit
    def run(variables, vol, affine, salt):
        def predictor(model_in):
            return model.apply(variables, model_in, deterministic=True)

        out = sliding_window_inference(
            vol + salt * 1e-4, affine, (96, 96, 96), sw_batch, predictor,
            overlap=0.5, mode="gaussian", n_classes=cfg.output_dim)
        return out.mean()

    _ = float(run(variables, vol, affine, jnp.float32(0)))  # compile + warm

    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        for i in range(iters):
            _ = float(run(variables, vol, affine, jnp.float32(i + 1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--sw_batch", type=int, default=16)
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--outdir", default="/tmp/jaxtrace_sw")
    ap.add_argument("--no_pallas", action="store_true")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        build_and_trace(args.iters, args.sw_batch, args.outdir,
                        not args.no_pallas)
    # "steps" = traced volume inferences
    parse_trace(args.outdir, args.iters, args.top)


if __name__ == "__main__":
    main()
