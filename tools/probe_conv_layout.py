"""Probe: are the conv-emitter layout copies structural?

The round-3 train ledger attributes ~31 ms/step (bs1) to "data formatting" —
copies re-tiling bf16[B,96,96,96,C] between the row-major layout and the conv
custom-call's blocked layout, around every convolution. The round-4 train
ceilings ledger must pin this bucket: either the copies are imposed by XLA's
TPU conv emitter ABI (structural from JAX land) or they are induced by the
ops WE put around the convs (fixable).

Distinguishing experiment, all on one 96^3 x C volume:

  a) conv -> conv            (nothing between: if copies remain, the emitter
                              itself refuses to chain conv layouts)
  b) conv -> IN+lrelu -> conv (the decoder's actual pattern)
  c) conv alone              (baseline: input + output copy only)
  d) b under value_and_grad  (the training pattern: fwd + dx + dW traffic)

Prints per-case device ms (min-timing through the tunnel) and, with
--profile, a per-op ledger for each case via tools/train_profile.parse_trace.

Run: PYTHONPATH=/root/repo python tools/probe_conv_layout.py [--profile]
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
    ap.add_argument("--c", type=int, default=48)
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache
    enable_compilation_cache()

    c, nn_ = args.c, args.n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, nn_, nn_, nn_, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, w1.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))

    def conv(a, w):
        return jax.lax.conv_general_dilated(a, w, (1, 1, 1), "SAME",
                                            dimension_numbers=dn)

    def in_lrelu(a):
        af = a.astype(jnp.float32)
        mu = af.mean(axis=(1, 2, 3), keepdims=True)
        var = af.var(axis=(1, 2, 3), keepdims=True)
        y = (af - mu) * jax.lax.rsqrt(var + 1e-5)
        return jnp.where(y > 0, y, 0.01 * y).astype(a.dtype)

    cases = {
        "conv_alone": lambda a, s: conv(a + s, w1),
        "conv_conv": lambda a, s: conv(conv(a + s, w1), w2),
        "conv_in_conv": lambda a, s: conv(in_lrelu(conv(a + s, w1)), w2),
    }

    def train_case(a, s):
        def loss(ws):
            y = conv(in_lrelu(conv(a + s, ws[0])), ws[1])
            return (y.astype(jnp.float32) ** 2).mean()
        l, g = jax.value_and_grad(loss)((w1, w2))
        return l + sum((gi.astype(jnp.float32) ** 2).sum() for gi in g)

    results = {}
    for name, fn in cases.items():
        f = jax.jit(lambda a, s, fn=fn: fn(a, s).astype(jnp.float32).mean())
        _ = float(f(x, jnp.bfloat16(0)))
        dt = _timed_min(lambda i, f=f: float(f(x, jnp.bfloat16(i * 1e-3))))
        results[name] = dt * 1e3
        print(f"{name:14s} {dt * 1e3:7.2f} ms")
        if args.profile:
            outdir = f"/tmp/probe_layout_{name}"
            with jax.profiler.trace(outdir):
                for i in range(3):
                    _ = float(f(x, jnp.bfloat16(i * 1e-3)))
            from tools.train_profile import parse_trace
            print(f"--- {name} per-op ledger:")
            parse_trace(outdir, 3, 15)

    ft = jax.jit(train_case)
    _ = float(ft(x, jnp.bfloat16(0)))
    dt = _timed_min(lambda i: float(ft(x, jnp.bfloat16(i * 1e-3))))
    results["train_conv_in_conv"] = dt * 1e3
    print(f"{'train_conv_in_conv':14s} {dt * 1e3:7.2f} ms")
    if args.profile:
        outdir = "/tmp/probe_layout_train"
        with jax.profiler.trace(outdir):
            for i in range(3):
                _ = float(ft(x, jnp.bfloat16(i * 1e-3)))
        from tools.train_profile import parse_trace
        print("--- train per-op ledger:")
        parse_trace(outdir, 3, 25)

    # derived: marginal cost of the second conv with vs without the
    # intervening IN+lrelu; if equal, the elementwise pass did NOT add
    # layout copies (they exist in both = emitter ABI)
    print("\nmarginal 2nd conv (conv_conv - conv_alone):  "
          f"{results['conv_conv'] - results['conv_alone']:.2f} ms")
    print("marginal 2nd conv behind IN+lrelu:           "
          f"{results['conv_in_conv'] - results['conv_alone']:.2f} ms")


if __name__ == "__main__":
    main()
