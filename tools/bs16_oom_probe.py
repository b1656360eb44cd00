"""Capture the exact HBM byte-summary line for direct per-chip bs16.

The round-4 ledger (tools/ledger_r4_train_ceilings.md) closes direct bs16 as
a structural HBM OOM by byte math + all-rungs-fail logs, but the stored bs16
rung logs predate the OOM-line-surfacing logger, so the "Used X.XXG of
15.75G" evidence line is missing. This probe compiles ONE configuration
(no fallback ladder — the ladder is ~45 min of equally doomed compiles) and
prints the OOM summary lines from the compiler's HLO-temp dump.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bs16_oom_probe.py [remat]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.models import build_model
from medicalsemseg_tpu.train.state import create_train_state, make_train_step
from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache


def main() -> None:
    enable_compilation_cache()
    remat = sys.argv[1] if len(sys.argv) > 1 else "full"
    bs = int(os.environ.get("MEDSEG_PROBE_BS", "16"))
    cfg = Config(model="nnFormerUNETR", vol_size=96, patch_size=2,
                 hidden_dim=48, depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                 window_size=6, output_dim=14, compute_dtype="bfloat16",
                 remat=remat)
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
    print(f"[probe] compiling bs{bs} remat={remat} ...", flush=True)
    try:
        step.lower(state, batch, jax.random.PRNGKey(1)).compile()
        print(f"[probe] bs{bs} remat={remat}: COMPILED OK (no OOM)")
    except Exception as e:  # expected: HBM OOM behind the HTTP-500 wrapper
        msg = f"{type(e).__name__}: {e}"
        lines = [ln.strip() for ln in msg.splitlines()
                 if "out of memory" in ln.lower()
                 or "hbm capacity" in ln.lower() or "Used " in ln
                 or "Total hbm" in ln.lower()]
        print(f"[probe] bs{bs} remat={remat}: compile FAILED")
        for ln in lines[:8] or [msg[:500]]:
            print(f"[probe]   {ln}")


if __name__ == "__main__":
    main()
