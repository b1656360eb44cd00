"""Microbenchmark the decoder's hot conv shapes on the TPU.

Answers, with measured TFLOP/s per formulation, where the decoder's ~6% MXU
goes and which rewrite is worth a Pallas kernel:
  * XLA conv_general_dilated at the flagship decoder shapes
  * the same conv as 27 accumulated shifted matmuls
  * a pure dot upper bound at the same M/K/N
  * conv at 128 channels (is lane fill the limiter, or XLA's 3D conv path?)
  * InstanceNorm+LeakyReLU elementwise cost at full res

Timing: in-graph scalar checksum + host readback with measured tunnel
round-trip subtracted (block_until_ready does not block through axon).
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache  # noqa: E402

DN = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                ("NDHWC", "DHWIO", "NDHWC"))


def timed(fn, *args, iters=5):
    out = fn(*args)
    _ = float(out)  # compile + warm
    trivial = jax.jit(lambda x: x.sum())
    _ = float(trivial(jnp.ones(8)))
    t0 = time.time()
    for _ in range(3):
        _ = float(trivial(jnp.ones(8)))
    rt = (time.time() - t0) / 3
    t0 = time.time()
    for _ in range(iters):
        _ = float(fn(*args))
    dt = (time.time() - t0) / iters - rt
    return max(dt, 1e-9)


def conv_flops(spatial, cin, cout, k):
    return 2 * int(np.prod(spatial)) * cin * cout * (k ** 3)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    results = {}

    def report(name, dt, flops):
        tf = flops / dt / 1e12
        results[name] = {"ms": round(dt * 1e3, 2), "tflops": round(tf, 2),
                         "mxu_pct": round(100 * tf / 197, 1)}
        print(name, results[name], flush=True)

    S = 96
    for cin, cout, k, tag in [(48, 48, 3, "conv3_48_48_96"),
                              (96, 48, 3, "conv3_96_48_96"),
                              (1, 48, 3, "conv3_1_48_96"),
                              (96, 48, 1, "conv1_96_48_96"),
                              (128, 128, 3, "conv3_128_128_96")]:
        x = jnp.asarray(rng.normal(size=(1, S, S, S, cin)).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, k, k, cin, cout)).astype(
            np.float32) * 0.05, jnp.bfloat16)

        @jax.jit
        def f(x, w):
            pad = [(k // 2, k // 2)] * 3
            y = lax.conv_general_dilated(x, w, (1, 1, 1), pad,
                                         dimension_numbers=DN)
            return y.astype(jnp.float32).mean()

        dt = timed(f, x, w)
        report(tag, dt, conv_flops((S, S, S), cin, cout, k))

    # conv as 27 shifted matmuls (same math, dot formulation)
    cin = cout = 48
    x = jnp.asarray(rng.normal(size=(S, S, S, cin)).astype(np.float32),
                    jnp.bfloat16)
    w27 = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * .05,
                      jnp.bfloat16)

    @jax.jit
    def shifted(x, w27):
        xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((S, S, S, cout), jnp.float32)
        i = 0
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    xs = lax.dynamic_slice(xp, (dz, dy, dx, 0),
                                           (S, S, S, cin))
                    acc = acc + jnp.einsum(
                        "dhwc,co->dhwo", xs, w27[i],
                        preferred_element_type=jnp.float32)
                    i += 1
        return acc.mean()

    dt = timed(shifted, x, w27)
    report("shifted27_48_48_96", dt, conv_flops((S, S, S), cin, cout, 3))

    # pure dot upper bounds
    for m, kk, n, tag in [(S ** 3, 27 * 48, 48, "dot_im2col_shape"),
                          (S ** 3, 48, 48, "dot_single_tap"),
                          (S ** 3 // 8, 27 * 48 * 8 // 8, 128, "dot_n128")]:
        a = jnp.asarray(rng.normal(size=(m, kk)).astype(np.float32),
                        jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(kk, n)).astype(np.float32),
                        jnp.bfloat16)

        @jax.jit
        def g(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32).mean()

        dt = timed(g, a, b)
        report(tag, dt, 2 * m * kk * n)

    # InstanceNorm + LeakyReLU elementwise cost at full res
    x = jnp.asarray(rng.normal(size=(1, S, S, S, 48)).astype(np.float32),
                    jnp.bfloat16)

    @jax.jit
    def in_lrelu(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=(1, 2, 3), keepdims=True)
        var = xf.var(axis=(1, 2, 3), keepdims=True)
        y = (xf - mu) * lax.rsqrt(var + 1e-5)
        return jnp.where(y > 0, y, 0.01 * y).mean()

    dt = timed(in_lrelu, x)
    gb = (np.prod(x.shape) * 2 * 3) / 1e9  # ~3 passes bf16
    results["in_lrelu_96_48"] = {"ms": round(dt * 1e3, 2),
                                 "gbps": round(gb / dt, 1)}
    print("in_lrelu_96_48", results["in_lrelu_96_48"], flush=True)

    # transposed conv 2^3 s2 (decoder upsample) 96->48ch at 48^3 -> 96^3
    x = jnp.asarray(rng.normal(size=(1, 48, 48, 48, 96)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(2, 2, 2, 96, 48)).astype(np.float32) * .05,
                    jnp.bfloat16)

    @jax.jit
    def tconv(x, w):
        y = lax.conv_transpose(x, w, (2, 2, 2), "VALID",
                               dimension_numbers=DN)
        return y.astype(jnp.float32).mean()

    dt = timed(tconv, x, w)
    report("tconv2_96_48", dt, 2 * 48 ** 3 * 96 * 48 * 8)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
