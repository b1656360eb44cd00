"""Probe: can the decoder0 pad_maximum fusion's ~25% headroom be harvested?

The round-3 SW ledger (tools/ledger_r3_sw_ceilings.md) shows ONE bucket with
real headroom: pad_maximum_fusion [decoders.py:192] — lrelu tail + concat +
SAME-pad of decoder0's conv1 input, writing bf16[16,98^3,96] — at 346 GB/s
logical vs a ~460-550 GB/s mixed-padding roofline (~75%), i.e. ~4-5 ms of a
404.7 ms predictor step. This probe measures, at the EXACT decoder0 shapes
(sw_batch 16, 96^3, C=48+48 -> 48), every formulation that could remove or
speed the padded-buffer materialization:

  base        conv3(concat(lrelu(a), lrelu(b)))      [reproduces the fusion]
  split       conv3(lrelu(a), wa) + conv3(lrelu(b), wb)
              (kernel split along Cin: no C=96 concat/pad buffer, but TWO
               C=48 pads at 2.67x lane padding and two K=27*48 convs)
  prepad      explicit jnp.pad + VALID conv (is the emitter's fused pad any
              different from an explicit one?)
  padfloor    the pad write alone (lrelu+concat+pad, checksum, no conv):
              what the fusion costs if the conv is free — its roofline gap
              is (base - padfloor) vs the ledger's conv time

Prints per-case device ms (min-timing through the tunnel); --profile adds a
per-op ledger per case. Evidence for VERDICT r4 item 4's harvest-or-close.

Run: PYTHONPATH=/root/repo python tools/probe_pad_fusion.py [--profile]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _measure_roundtrip(n: int = 8) -> float:
    trivial = jax.jit(lambda x: x.sum())
    _ = float(trivial(jnp.ones(8)))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        _ = float(trivial(jnp.ones(8)))
        best = min(best, time.time() - t0)
    return best


def _timed_min(fn, n: int = 8) -> float:
    rt = _measure_roundtrip()
    best = float("inf")
    for i in range(n):
        t0 = time.time()
        fn(i)
        best = min(best, time.time() - t0)
    rt = min(rt, _measure_roundtrip())
    return best - rt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16, help="sw_batch")
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--c", type=int, default=48)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache
    enable_compilation_cache()

    b, n, c = args.b, args.n, args.c
    rng = np.random.default_rng(0)
    a_in = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    b_in = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 2 * c, c)).astype(np.float32)
                    * 0.05).astype(jnp.bfloat16)
    wa, wb = w[:, :, :, :c, :], w[:, :, :, c:, :]

    def conv(x, k, padding="SAME"):
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(x, k, (1, 1, 1), padding,
                                            dimension_numbers=dn)

    def lrelu(x):
        return jnp.where(x > 0, x, 0.01 * x)

    # inputs are jit ARGUMENTS, not closures: closed-over (16,96^3,48)
    # arrays become 2.72 GB of captured constants that the remote-compile
    # tunnel chokes on (the r5d run of this probe hung serializing them)
    cases = {
        # the decoder0 pattern: the producers' lrelu tails fuse into the
        # conv input pad (pad_maximum_fusion in the SW profile)
        "base": lambda a, bb, w_, wa_, wb_, s: conv(
            jnp.concatenate([lrelu(a + s), lrelu(bb + s)], -1), w_),
        # Cin-split: conv(concat(a,b), w) == conv(a, wa) + conv(b, wb)
        "split": lambda a, bb, w_, wa_, wb_, s: (conv(lrelu(a + s), wa_)
                                                 + conv(lrelu(bb + s), wb_)),
        # explicit pad + VALID conv (same program if the emitter's fused
        # pad is just a pad)
        "prepad": lambda a, bb, w_, wa_, wb_, s: conv(
            jnp.pad(jnp.concatenate([lrelu(a + s), lrelu(bb + s)], -1),
                    ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))),
            w_, padding="VALID"),
        # the padded-buffer write alone (conv-free floor of the fusion)
        "padfloor": lambda a, bb, w_, wa_, wb_, s: jnp.pad(
            jnp.concatenate([lrelu(a + s), lrelu(bb + s)], -1),
            ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))),
    }

    results = {}
    for name, fn in cases.items():
        f = jax.jit(lambda a, bb, w_, wa_, wb_, s, fn=fn: fn(
            a, bb, w_, wa_, wb_, s).astype(jnp.float32).mean())
        _ = float(f(a_in, b_in, w, wa, wb, jnp.bfloat16(0)))
        dt = _timed_min(lambda i, f=f: float(
            f(a_in, b_in, w, wa, wb, jnp.bfloat16(i * 1e-3))))
        results[name] = dt * 1e3
        print(f"{name:10s} {dt * 1e3:7.2f} ms", flush=True)
        if args.profile:
            outdir = f"/tmp/probe_pad_{name}"
            with jax.profiler.trace(outdir):
                for i in range(3):
                    _ = float(f(jnp.bfloat16(i * 1e-3)))
            from tools.train_profile import parse_trace
            print(f"--- {name} per-op ledger:")
            parse_trace(outdir, 3, 12)

    print(f"\nsplit vs base:        {results['split'] - results['base']:+.2f} ms")
    print(f"prepad vs base:       {results['prepad'] - results['base']:+.2f} ms")
    print(f"conv cost over pad:   {results['base'] - results['padfloor']:.2f} ms"
          " (ledger conv1 96->48 was 64.3 ms at sw_batch 16)")


if __name__ == "__main__":
    main()
