"""Analytic model-flops constant for the flagship train step.

VERDICT r3 weakness #1: MFU computed from `compiled.cost_analysis()["flops"]`
of the ACTUAL benchmarked program is inconsistent across configs — it counts
remat recompute flops (bs8 remat=full reported 2.42 TF/crop) and misses
Pallas custom-call flops (bs1 with fused attention reported 1.88, bs4 with
the dw27 kernel 1.35), so the per-config MFU numbers were not comparable.

This tool pins ONE number: the required forward+backward flops per 96³ crop
of the flagship (nnFormerUNETR, DiceCE), measured as XLA's flop count for
`value_and_grad(model+loss)` at bs1 with

  * remat = "none"           (no recompute in the graph),
  * use_pallas_attention off (every op visible to cost_analysis),

on the CPU backend (flop counting happens on the optimized HLO before any
backend-specific emission; dot/conv flops are backend-independent). The
optimizer update and train-Dice metrics are deliberately excluded — they are
per-step constants (~0.1% of 2 TF), not per-crop model work; documented in
MODEL_FLOPS.json. Model flops are linear in batch, so
`model_flops(bs) = flops_per_crop * bs` and

  model_mfu = model_flops(bs) / step_seconds / peak_flops

is comparable across every batch size, remat policy, and kernel set.
bench.py reads MODEL_FLOPS.json and reports `train_model_mfu*` alongside the
raw cost_analysis number (kept as `train_mfu_raw*` for continuity).

Run: JAX_PLATFORMS=cpu python tools/model_flops.py   (writes MODEL_FLOPS.json)
Drift-guard: tests/test_model_flops.py recomputes and compares.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compute_model_flops_per_crop() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.models import build_model
    from medicalsemseg_tpu.train.losses import build_loss

    cfg = Config(model="nnFormerUNETR", vol_size=96, patch_size=2,
                 hidden_dim=48, depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                 window_size=6, output_dim=14, compute_dtype="bfloat16",
                 use_pallas_attention=False, remat="none")
    model = build_model(cfg)
    loss_fn = build_loss(cfg)

    rng = np.random.default_rng(0)
    v = cfg.vol_size3()
    image = jnp.asarray(rng.normal(size=(1, *v, 1)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, cfg.output_dim, (1, *v)).astype(np.int32))
    model_in = (image, jnp.full((1, 3), 0.5, jnp.float32),
                jnp.ones((1, 3), jnp.float32))
    params = jax.eval_shape(
        lambda r: model.init(r, model_in, deterministic=True),
        jax.random.PRNGKey(0))["params"]
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)

    def fwd(p):
        logits = model.apply({"params": p}, model_in, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return loss_fn(logits, label)

    def fwd_bwd(p):
        return jax.value_and_grad(fwd)(p)

    out = {}
    for name, fn in (("fwd", fwd), ("fwd_bwd", fwd_bwd)):
        compiled = jax.jit(fn).lower(params).compile()
        out[name] = float(compiled.cost_analysis()["flops"])
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    return {
        "model": "nnFormerUNETR 96^3 patch2 hd48 d(2,2,2,2) heads(3,6,12,24) w6 c14",
        "definition": ("XLA flop count of value_and_grad(model.apply + DiceCE)"
                       " at bs1, remat=none, pallas off, CPU backend; excludes"
                       " optimizer + train-Dice metrics (per-step constants)"),
        "flops_per_crop_fwd": out["fwd"],
        "flops_per_crop_fwd_bwd": out["fwd_bwd"],
        "n_params": n_params,
    }


def main():
    data = compute_model_flops_per_crop()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MODEL_FLOPS.json")
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")
    print(json.dumps(data, indent=1))


if __name__ == "__main__":
    main()
