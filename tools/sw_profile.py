"""Per-op roofline ledger for sliding-window inference.

Default: profiles the jitted eval-mode flagship forward on one sw_batch of
96^3 windows (the op that dominates sliding-window inference) and prints the
same ledger as tools/train_profile.py. Measurement backbone for the
inference-throughput campaign (VERDICT r2 #5).

--full_volume: profiles the ENTIRE sliding_window_inference program on the
bench workload (240x240x140 @ roi 96^3, overlap 0.5, sw_batch 16, 14
classes) instead — predictor steps PLUS window gather, Gaussian blend
accumulation, normalization and crop. Motivation (round 5): the r3 ledger's
"2 predictor steps + ~free blending" arithmetic predicts 1.235 vol/s but
the bench measures 1.136-1.146, i.e. ~60 ms/volume of non-predictor device
time the per-step ledger cannot see.

Usage:  python tools/sw_profile.py [--sw_batch N] [--steps N] [--top N]
        [--full_volume]
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


def build_and_trace_full_volume(sw_batch: int, steps: int, outdir: str,
                                pallas: bool = True):
    """Profile the whole-volume SW program exactly as bench.py runs it."""
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
                 use_pallas_attention=pallas)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(1, 240, 240, 140, 1)).astype(np.float32))
    affine = jnp.ones((1, 3), jnp.float32)
    x_probe = (vol[:, :96, :96, :96], jnp.full((1, 3), 0.5, jnp.float32),
               affine)
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_probe)

    def _run(variables, vol, affine, salt):
        def predictor(model_in):
            return model.apply(variables, model_in, deterministic=True)

        out = sliding_window_inference(
            vol + salt * 1e-4, affine, (96, 96, 96), sw_batch, predictor,
            overlap=0.5, mode="gaussian", n_classes=cfg.output_dim)
        return out.mean()

    run = jax.jit(_run)
    print("warm out:", float(run(variables, vol, affine, jnp.float32(0))),
          flush=True)

    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        for i in range(steps):
            _ = float(run(variables, vol, affine, jnp.float32(i + 1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sw_batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--no_pallas", action="store_true")
    ap.add_argument("--full_volume", action="store_true")
    ap.add_argument("--outdir", default="/tmp/jaxtrace_sw")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        if args.full_volume:
            build_and_trace_full_volume(args.sw_batch, args.steps,
                                        args.outdir, not args.no_pallas)
        else:
            build_and_trace(args.sw_batch, args.steps, args.outdir,
                            not args.no_pallas)
    parse_trace(args.outdir, args.steps, args.top)


if __name__ == "__main__":
    main()
