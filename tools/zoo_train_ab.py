"""Per-model train/forward timing across the zoo — the VERDICT-r3 item-7
measurement: each non-flagship model gets either a fused train path or a
measured declination ("XLA training is within noise / the opportunity is
bounded by X ms").

For every model we time, same-window:
  * train step (bs1, DiceCE+AdamW) with the config-default kernel gating
    (pallas_train on — only models whose blocks HAVE a custom-VJP train path
    use it: the Swin family and, since round 4, GC-ViT's local-attention
    blocks) and with --no_pallas_train (pure XLA);
  * a single sw-batch forward (16 windows x 96^3 — the sliding-window
    predictor step) with fused kernels on vs MEDSEG_ABSORB=0 + XLA attention.
    The fwd delta BOUNDS the train-side opportunity for models whose fused
    kernels are inference-only: backward work is ~2x forward, so a fused-fwd
    saving of X ms bounds the train-step saving at roughly 3X before any
    custom-VJP even exists.

Usage: PYTHONPATH=. python tools/zoo_train_ab.py [model ...]
Writes tools/zoo_train_ab.jsonl (one line per (model, leg)).

Reference hot loops being matched: engine/train.py:60-87 (train),
engine/utils.py:120-151 (sliding-window predictor).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.models import build_model
from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache

MODELS = [
    # (factory name, model-specific config overrides)
    ("GCViTUNETR", {}),
    ("SegFormer3D", {}),
    ("FocalNetUNETR", {}),
    ("SwinUNETR_Official", {}),
    ("nnFormer", {}),
]

SW_BATCH = 16
N_TRAIN_ITERS = 8
N_FWD_ITERS = 6


def _measure_roundtrip(n: int = 8) -> float:
    trivial = jax.jit(lambda x: x.sum())
    _ = float(trivial(jnp.ones(8)))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        _ = float(trivial(jnp.ones(8)))
        best = min(best, time.time() - t0)
    return best


def _timed_min(fn, n_iters: int) -> float:
    rt = _measure_roundtrip()
    best = float("inf")
    for i in range(n_iters):
        t0 = time.time()
        fn(i)
        best = min(best, time.time() - t0)
    rt = min(rt, _measure_roundtrip())
    return best - rt


def _cfg(name: str, **kw) -> Config:
    return Config(model=name, vol_size=96, patch_size=2, hidden_dim=48,
                  depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                  window_size=6, output_dim=14, compute_dtype="bfloat16",
                  **kw)


def time_train_step(cfg: Config) -> float:
    from medicalsemseg_tpu.train.state import create_train_state, make_train_step

    model = build_model(cfg)
    rng = np.random.default_rng(1)
    v = cfg.vol_size3()
    batch = {
        "image": jnp.asarray(rng.normal(size=(1, *v, 1)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, cfg.output_dim,
                                          (1, *v)).astype(np.int32)),
        "crop_loc": jnp.full((1, 3), 0.5, jnp.float32),
        "affine": jnp.ones((1, 3), jnp.float32),
    }
    x_probe = (batch["image"], batch["crop_loc"], batch["affine"])
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0), x_probe,
                                  steps_per_epoch=100)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    state, m = step(state, batch, jax.random.PRNGKey(2))
    _ = float(m["loss"])
    states = {"state": state}

    def _one(i):
        states["state"], m = step(states["state"], batch,
                                  jax.random.fold_in(jax.random.PRNGKey(3), i))
        _ = float(m["loss"])

    return _timed_min(_one, N_TRAIN_ITERS)


def time_forward(cfg: Config) -> float:
    model = build_model(cfg)
    rng = np.random.default_rng(2)
    v = cfg.vol_size3()
    wins = jnp.asarray(rng.normal(size=(SW_BATCH, *v, 1)).astype(np.float32))
    ctr = jnp.full((SW_BATCH, 3), 0.5, jnp.float32)
    aff = jnp.ones((SW_BATCH, 3), jnp.float32)
    x_probe = (wins, ctr, aff)
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_probe)

    @jax.jit
    def fwd(variables, salt):
        out = model.apply(variables, (wins + salt * 1e-4, ctr, aff),
                          deterministic=True)
        return out.mean()

    _ = float(fwd(variables, jnp.float32(0)))
    return _timed_min(lambda i: float(fwd(variables, jnp.float32(i))),
                      N_FWD_ITERS)


def main():
    enable_compilation_cache()
    names = sys.argv[1:] or [n for n, _ in MODELS]
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "zoo_train_ab.jsonl")
    platform = jax.devices()[0].platform
    results = []
    with open(out_path, "a") as f:
        for name, over in MODELS:
            if name not in names:
                continue
            rec = {"model": name, "platform": platform,
                   "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
            for leg, cfgkw, env in (
                ("train_pallas_ms", dict(pallas_train=True), {}),
                ("train_xla_ms", dict(pallas_train=False,
                                      use_pallas_attention=False), {}),
                ("fwd_fused_ms", {}, {}),
                ("fwd_xla_ms", dict(use_pallas_attention=False),
                 {"MEDSEG_ABSORB": "0"}),
            ):
                snap = {k: os.environ.get(k) for k in env}
                os.environ.update(env)
                jax.clear_caches()
                try:
                    cfg = _cfg(name, **{**over, **cfgkw})
                    if leg.startswith("train"):
                        dt = time_train_step(cfg)
                    else:
                        dt = time_forward(cfg)
                    rec[leg] = round(dt * 1e3, 1)
                except Exception as e:  # noqa: BLE001 — record, move on
                    rec[leg + "_error"] = f"{type(e).__name__}"
                    rec[leg + "_error_msg"] = str(e)[:400]
                finally:
                    for k, v in snap.items():
                        if v is None:
                            os.environ.pop(k, None)
                        else:
                            os.environ[k] = v
                print(name, leg, rec.get(leg, rec.get(leg + "_error")),
                      file=sys.stderr)
            f.write(json.dumps(rec) + "\n")
            f.flush()
            results.append(rec)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
