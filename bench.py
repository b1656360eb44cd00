"""Benchmark: Gaussian sliding-window inference volumes/sec/chip + training.

The north-star workload (BASELINE.md): flagship nnFormerUNETR, 96³ roi,
overlap 0.5, Gaussian blending, bf16 compute, on a BTCV-like CT volume
(240x240x140 after 1.5mm resampling + foreground crop) -> 32 windows.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
vs_baseline compares against the CPU reference throughput for the identical
workload, extrapolated from a measured single-window fp32 forward on this
pod's CPU (recorded in BASELINE.json under "cpu_measured"). "extra" carries
the training benchmark (reference workload: run_training.py:26-191):
train_steps_per_sec, train_crops_per_sec and train_mfu — MFU computed from
XLA's HLO flop count for the full train step against the chip's peak bf16
throughput (v5e: 197 TFLOP/s; override with MEDSEG_PEAK_TFLOPS).
"""

from __future__ import annotations

import json
import os
import sys
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
SW_BATCH = int(os.environ.get("MEDSEG_SW_BATCH", "16"))

# CPU baseline: measured single 96³ window forward (fp32, jitted, this host),
# extrapolated to the 32-window blended volume. See BASELINE.json.
CPU_SECONDS_PER_WINDOW = None  # loaded from BASELINE.json at runtime


def _load_cpu_baseline() -> float:
    """Seconds per 96³ window on this host's CPU — the REFERENCE torch model
    when measured (tools/measure_reference_cpu.py), else our own XLA:CPU
    build (the round-1 self-referential extrapolation)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    with open(path) as f:
        data = json.load(f)
    ref = data.get("reference_cpu_measured")
    if ref and ref.get("seconds_per_window_fp32"):
        return float(ref["seconds_per_window_fp32"])
    return float(data["cpu_measured"]["seconds_per_window_fp32"])


def _load_model_flops_per_crop() -> float | None:
    """Analytic fwd+bwd flops per 96³ crop (tools/model_flops.py): ONE
    constant independent of remat recompute and of which ops ran as Pallas
    custom calls, so `train_model_mfu` is comparable across every config
    (VERDICT r3 weakness #1). None if MODEL_FLOPS.json is absent."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "MODEL_FLOPS.json")
    try:
        with open(path) as f:
            return float(json.load(f)["flops_per_crop_fwd_bwd"])
    except Exception:
        return None


def _measure_roundtrip(n: int = 10) -> float:
    """MINIMUM tunnel round-trip over n trivial jitted readbacks
    (block_until_ready does not block through the axon tunnel). The
    minimum pairs with per-iteration minimum timing below: tunnel latency
    drifts by tens of ms across a matrix run, and mean-minus-mean mixes
    two different drift windows."""
    trivial = jax.jit(lambda x: x.sum())
    _ = float(trivial(jnp.ones(8)))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        _ = float(trivial(jnp.ones(8)))
        best = min(best, time.time() - t0)
    return best


def _timed_min(fn, n_iters: int) -> float:
    """Best single-iteration wall time minus the best measured round-trip.
    Each iteration ends in a scalar readback, so iter time = device time +
    that iteration's tunnel round-trip; the minimum over iterations is the
    device time plus the BEST round-trip seen, which the subtraction
    matches. Robust to one-sided latency spikes that skew a mean."""
    rt = _measure_roundtrip()
    best = float("inf")
    for i in range(n_iters):
        t0 = time.time()
        fn(i)
        best = min(best, time.time() - t0)
    rt = min(rt, _measure_roundtrip())
    dt = best - rt
    assert dt > 0, "timing anomaly: round-trip exceeded iteration time"
    return dt


# env knobs _train_bench's internal degradation ladder mutates; each leg
# snapshots and restores them (plus the jit cache) so one leg's fallback
# cannot silently contaminate the next leg's A/B configuration
_LADDER_ENV = ("MEDSEG_HSPLIT", "MEDSEG_ABSORB", "MEDSEG_DW27_PALLAS")


def _log_rung_failure(rung: str) -> None:
    """Record WHY a degradation rung failed (stderr → the A/B leg log).
    Only the exception's head+tail: TPU OOMs carry multi-KB HLO dumps, and
    the byte counts we need are in the first line of the message."""
    e = sys.exc_info()[1]
    msg = f"{type(e).__name__}: {e}" if e is not None else "?"
    # surface the OOM summary line wherever it sits in the HLO dump
    oom = [ln for ln in msg.splitlines()
           if "out of memory" in ln.lower() or "hbm capacity" in ln.lower()
           or "Used " in ln]
    head = msg[:2000]
    tail = msg[-1000:] if len(msg) > 3000 else ""
    print(f"[bench] rung '{rung}' failed: {head}"
          + (f" ... {tail}" if tail else "")
          + ("".join(f"\n[bench]   OOM: {ln.strip()}" for ln in oom[:4])),
          file=sys.stderr, flush=True)


def _train_bench(cfg, bs: int = 1) -> dict:
    snap = {k: os.environ.get(k) for k in _LADDER_ENV}
    try:
        return _train_bench_inner(cfg, bs)
    finally:
        dirty = False
        for k, v in snap.items():
            if os.environ.get(k) != v:
                dirty = True
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        if dirty:
            jax.clear_caches()


def _train_bench_inner(cfg, bs: int = 1) -> dict:
    """Train-step throughput + MFU on the reference training workload:
    `bs` 96³ crops per chip, DiceCE, AdamW (run_training.py:92-105).
    bs >= 2 runs under the conv-saving remat policy (the config default),
    which unblocks the whole-graph backward on this pod's AOT compiler."""
    from medicalsemseg_tpu.train.state import create_train_state, make_train_step

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

    flops = None
    try:
        compiled = step.lower(state, batch,
                              jax.random.PRNGKey(1)).compile()
        cost = compiled.cost_analysis()
        if cost and cost.get("flops", 0) > 0:
            flops = float(cost["flops"])
    except Exception:
        pass

    # warm/compile, with graceful degradation if a kernel set the compiler
    # rejects on this hardware. Rungs are INDEPENDENT single-knob disables
    # applied to the leg's baseline env (NOT cumulative — round 4's bs8
    # matrix showed the cumulative ladder landing in an all-kernels-off
    # config 31 ms slower than the single culprit knob would give), ordered
    # most-likely-culprit first: at bs >= 8 the Pallas dW's lane-padded
    # shifted copies are the known HBM-OOM trigger, at bs1 the head-split
    # stage-4 backward is the historical compile-reject. A final all-off
    # rung catches multi-knob failures; pallas_train off is the last resort.
    snap0 = {k: os.environ.get(k) for k in _LADDER_ENV}

    def _apply(over: dict) -> None:
        for k, v in snap0.items():
            if k in over:
                os.environ[k] = over[k]
            elif v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    single = [("no_dw27", {"MEDSEG_DW27_PALLAS": "0"}),
              ("no_hsplit", {"MEDSEG_HSPLIT": "0"}),
              ("no_absorb", {"MEDSEG_ABSORB": "0"})]
    if bs < 8:
        single = single[1:] + single[:1]
    rungs = [(None, {})] + single + [
        ("no_kernel_extras", {"MEDSEG_DW27_PALLAS": "0", "MEDSEG_HSPLIT": "0",
                              "MEDSEG_ABSORB": "0"})]

    fallback = None
    ok = False
    for name, over in rungs:
        if name is not None:
            _apply(over)
            jax.clear_caches()  # the failed jaxpr is cached on fn identity
            step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        try:
            state, m = step(state, batch, jax.random.PRNGKey(2))
            _ = float(m["loss"])
            fallback, ok = name, True
            break
        except Exception:
            _log_rung_failure(name or "primary")
    if not ok:
        cfg = cfg.replace(pallas_train=False)
        jax.clear_caches()
        model = build_model(cfg)
        state, _sched = create_train_state(
            cfg, model, jax.random.PRNGKey(0), x_probe,
            steps_per_epoch=100)
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        state, m = step(state, batch, jax.random.PRNGKey(2))
        _ = float(m["loss"])
        fallback = "no_pallas_train"
    states = {"state": state}

    # With gradient accumulation, alternate micro-steps differ in cost (the
    # optimizer-apply lands only every k-th step), so a min over single
    # micro-steps would select the cheap accumulate-only step and overstate
    # throughput (ADVICE r4). Time one FULL accumulation cycle per iteration
    # (k micro-steps, one readback) and report per-micro-step time.
    k = int(getattr(cfg, "grad_accum_steps", 1) or 1)

    def _one(i):
        for j in range(k):
            states["state"], m = step(
                states["state"], batch,
                jax.random.fold_in(jax.random.PRNGKey(3), i * k + j))
        _ = float(m["loss"])  # forces completion of the enqueued cycle

    dt = _timed_min(_one, n_iters=12) / k

    peak_tflops = float(os.environ.get("MEDSEG_PEAK_TFLOPS", "197"))
    suffix = "" if bs == 1 else f"_bs{bs}"
    out = {
        f"train_steps_per_sec{suffix}": round(1.0 / dt, 3),
        f"train_crops_per_sec{suffix}": round(bs / dt, 3),
        f"train_step_ms{suffix}": round(dt * 1e3, 1),
        f"train_remat{suffix}": cfg.remat,
    }
    # headline MFU: the analytic per-crop fwd+bwd flop constant
    # (MODEL_FLOPS.json) — comparable across batch/remat/kernel configs.
    # The raw cost_analysis number (counts remat recompute, misses Pallas
    # custom-call flops) is kept as *_raw for continuity with r2/r3 tables.
    model_flops = _load_model_flops_per_crop()
    if model_flops is not None:
        out[f"train_model_mfu{suffix}"] = round(
            model_flops * bs / dt / (peak_tflops * 1e12), 4)
    if flops is not None:
        out[f"train_flops_per_step{suffix}"] = flops
        out[f"train_mfu_raw{suffix}"] = round(
            flops / dt / (peak_tflops * 1e12), 4)
    if fallback:
        out[f"train_fallback{suffix}"] = fallback
    return out


def main():
    enable_compilation_cache()
    platform = jax.devices()[0].platform
    if (os.environ.get("MEDSEG_REQUIRE_TPU", "0") == "1"
            and platform != "tpu"):
        raise SystemExit(
            f"MEDSEG_REQUIRE_TPU=1 but the backend is {platform!r} — "
            "refusing to record non-TPU numbers (tunnel down?)")
    use_pallas = os.environ.get("MEDSEG_BENCH_PALLAS", "1") == "1"
    cfg = Config(model="nnFormerUNETR", vol_size=96, patch_size=2,
                 hidden_dim=48, depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                 window_size=6, output_dim=14, compute_dtype="bfloat16",
                 use_pallas_attention=use_pallas,
                 flat_optimizer=os.environ.get("MEDSEG_FLAT_OPT", "0") == "1",
                 fused_loss=os.environ.get("MEDSEG_FUSED_LOSS", "0") == "1")
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(1, *VOLUME_SHAPE, 1)).astype(np.float32))
    affine = jnp.ones((1, 3), jnp.float32)
    x_probe = (vol[:, :96, :96, :96], jnp.full((1, 3), 0.5), affine)
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_probe)

    from medicalsemseg_tpu.infer.sliding_window import sliding_window_inference

    # class-major logits path (decoders.py UnetOutBlock class_major): skips
    # the lane-padded (sw, 96^3, 14) materialization + transpose in the SW
    # blend. A/B knob for round 5; flip the default once it measures a win.
    sw_cm = os.environ.get("MEDSEG_SW_CLASSMAJOR", "0") == "1"

    def _run(variables, vol, affine, salt):
        def predictor(model_in):
            return model.apply(variables, model_in, deterministic=True,
                               class_major_logits=sw_cm)

        out = sliding_window_inference(
            vol + salt * 1e-4, affine, ROI, SW_BATCH, predictor,
            overlap=OVERLAP, mode="gaussian", n_classes=cfg.output_dim,
            class_major_probs=sw_cm)
        # scalar checksum forces completion through the host readback —
        # block_until_ready does not actually block on the axon tunnel
        return out.mean()

    run = jax.jit(_run)

    sw_fallback = None
    if os.environ.get("MEDSEG_BENCH_SW", "1") == "1":
        vol = jax.device_put(vol)  # resident once; iterations vary a scalar
        try:
            _ = float(run(variables, vol, affine, jnp.float32(0)))  # warm
        except Exception:
            # drop the round-3 absorption kernels and re-trace (see
            # ops/pallas/__init__.absorb_enabled). clear_caches: the traced
            # jaxpr (which still holds the rejected kernel — erfc failed at
            # LOWERING, after tracing) is cached on _run's identity
            os.environ["MEDSEG_ABSORB"] = "0"
            jax.clear_caches()
            run = jax.jit(_run)
            _ = float(run(variables, vol, affine, jnp.float32(0)))
            sw_fallback = "no_absorb"

        dt = _timed_min(
            lambda i: float(run(variables, vol, affine, jnp.float32(i))),
            n_iters=6)

        vols_per_sec = 1.0 / dt
    else:
        vols_per_sec = float("nan")

    from medicalsemseg_tpu.infer.sliding_window import (
        dense_patch_starts, scan_interval)
    n_windows = len(dense_patch_starts(
        VOLUME_SHAPE, ROI, scan_interval(VOLUME_SHAPE, ROI, OVERLAP)))
    cpu_vols_per_sec = 1.0 / (n_windows * _load_cpu_baseline())

    extra = {"platform": platform}
    if sw_fallback:
        extra["sw_fallback"] = sw_fallback
    def _try_bench(label, *args, **kw):
        # one failed leg must not cost the whole benchmark line
        try:
            extra.update(_train_bench(*args, **kw))
        except Exception as e:
            extra[f"{label}_error"] = type(e).__name__

    if os.environ.get("MEDSEG_BENCH_TRAIN", "1") == "1":
        extra = {**extra, **_train_bench(cfg)}
        if os.environ.get("MEDSEG_BENCH_TRAIN_BS4", "1") == "1":
            _try_bench("train_bs4", cfg, bs=4)
    if os.environ.get("MEDSEG_BENCH_TRAIN_BS8", "1") == "1":
        # independent of MEDSEG_BENCH_TRAIN so a bs8-only run is possible.
        # bs8 under remat=conv is a genuine HBM OOM (21.26G of 15.75G,
        # NOTES.md round-3 log); default "full" per the round-3/4 A/B
        # (full 873.0 ms vs mixed 890.7, tools/ab_r3e.jsonl) with "mixed"
        # as the fallback rung.
        bs8_remat = os.environ.get("MEDSEG_BS8_REMAT", "full")
        _try_bench("train_bs8", cfg.replace(remat=bs8_remat), bs=8)
        if bs8_remat != "mixed" and "train_bs8_error" in extra:
            _try_bench("train_bs8_mixed", cfg.replace(remat="mixed"), bs=8)
    if os.environ.get("MEDSEG_BENCH_TRAIN_BS16", "1") == "1":
        # Direct per-chip bs16 is a structural HBM OOM on this 15.75G chip
        # (round-4 matrix: every fallback rung failed in BOTH remat modes,
        # tools/ab_logs/bs16_*.log; byte math in
        # tools/ledger_r4_train_ceilings.md). Attempting it costs ~45 min of
        # doomed fallback compiles, so the default goes straight to the
        # accumulated form; MEDSEG_BS16_DIRECT=1 re-enables the attempt
        # (e.g. on a larger-HBM part).
        if os.environ.get("MEDSEG_BS16_DIRECT", "0") == "1":
            bs16_remat = os.environ.get("MEDSEG_BS16_REMAT", "mixed")
            _try_bench("train_bs16", cfg.replace(remat=bs16_remat), bs=16)
            if bs16_remat != "full" and "train_bs16_error" in extra:
                _try_bench("train_bs16_full", cfg.replace(remat="full"),
                           bs=16)
        if "train_steps_per_sec_bs16" not in extra:
            # direct per-chip bs16 does not fit this chip's HBM in any remat
            # mode (round-4 matrix: every rung of mixed AND full failed) —
            # effective batch 16 runs as 2 accumulated bs8 micro-steps
            # (optax.MultiSteps, --grad_accum_steps), like the reference's
            # multi-GPU global batch. Report per-micro-step timing under
            # explicit *_bs16accum keys.
            try:
                acc = _train_bench(cfg.replace(
                    remat=os.environ.get("MEDSEG_BS8_REMAT", "full"),
                    grad_accum_steps=2), bs=8)
                extra.update({
                    "train_micro_step_ms_bs16accum":
                        acc.get("train_step_ms_bs8"),
                    "train_crops_per_sec_bs16accum":
                        acc.get("train_crops_per_sec_bs8"),
                    "train_model_mfu_bs16accum":
                        acc.get("train_model_mfu_bs8"),
                    "train_remat_bs16accum": acc.get("train_remat_bs8"),
                    "train_accum_micro_bs": 8,
                })
            except Exception as e:
                extra["train_bs16accum_error"] = type(e).__name__

    def _num(x):
        # strict-JSON output: NaN (a disabled SW leg) serializes as null
        return None if x != x else x

    print(json.dumps({
        "metric": "sliding_window_volumes_per_sec_per_chip",
        "value": _num(round(vols_per_sec, 4)),
        "unit": "volumes/sec",
        "vs_baseline": _num(round(vols_per_sec / cpu_vols_per_sec, 2)),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
