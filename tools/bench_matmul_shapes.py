"""Measure MXU throughput for matmul shapes relevant to the conv hot paths.

MEASUREMENT TRAP (found the hard way): if the scan carry consumes only
reductions or slices of the product (s += y.sum(); a2 = a + y[:, :1]*eps),
XLA's algebraic simplifier FACTORS THE DOT AWAY — sum(a@b) becomes
dot(reduce(a), reduce(b)) and y[:, :1] becomes a matvec — and the "matmul"
benchmark silently measures HBM bandwidth of reading `a`. The round-1
numbers from the earlier version of this tool (e.g. "im2col matmul at
59 TF/s") were artifacts of exactly this. The guard used here:

    s  += (y * y).sum()     # un-factorable through the dot
    a2  = a + (s * 1e-30)   # serializes iterations through s

Honest results (bf16, v5e, 197 TF/s peak):
    (4096,4096)@(4096,4096)      190.8 TF/s (97%)  — harness sanity
    (884736,1296)@(1296,48)       11.1 TF/s (6%)   — conv fwd as im2col:
        HBM-bound on the 2.3 GB cols operand; im2col cannot beat XLA's conv
    (884736,48)@(48,48)           43.2 TF/s (22%)
    (1296,884736)@(884736,48)     11.1 TF/s (6%)   — dW as im2col
    (48,884736)@(884736,48)       27.2 TF/s (14%)  — dW single tap: AT the
        (48/128)x(48/128) PE ceiling -> basis for ops/convgrad.py's 27-tap
        weight-gradient decomposition (2.7x XLA's native dW lowering)

Run: python tools/bench_matmul_shapes.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache


def bench(m, k, n, dtype=jnp.bfloat16, label=""):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)) * 0.05, dtype)
    b = jnp.asarray(rng.normal(size=(k, n)) * 0.05, dtype)
    flops = 2 * m * k * n
    length = int(min(max(0.25 / (flops / 4e13), 16), 2000))

    @jax.jit
    def run(a, b):
        def body(carry, _):
            a, s = carry
            y = jnp.dot(a, b, preferred_element_type=jnp.float32)
            s = s + (y * y).sum()                   # forces the full product
            a2 = a + (s * 1e-30).astype(a.dtype)    # serializes via s
            return (a2, s), ()
        (_, s), _ = jax.lax.scan(body, (a, jnp.float32(0)), None,
                                 length=length)
        return s

    _ = float(run(a, b))  # compile + warm

    def timed(n_calls):
        t0 = time.time()
        for _ in range(n_calls):
            s = run(a, b)  # async enqueue — pipelines on device
        _ = float(s)       # one blocking readback
        return time.time() - t0

    t1 = timed(1)
    t4 = timed(4)
    dt = (t4 - t1) / (3 * length)
    tflops = flops / dt / 1e12
    print(f"  ({m:6d},{k:6d})@({k:6d},{n:6d}) {label}: {dt * 1e3:8.3f} ms  "
          f"{tflops:7.1f} TF/s  ({tflops / 197 * 100:5.1f}% peak)  "
          f"[len {length}]", flush=True)
    return tflops


def main():
    enable_compilation_cache()
    print("sanity peak:")
    bench(4096, 4096, 4096, label="square")
    print("conv-shaped (M = 96^3 voxels, C = 48):")
    bench(884736, 1296, 48, label="fwd im2col")
    bench(884736, 48, 48, label="1x1")
    bench(1296, 884736, 48, label="dW im2col")
    bench(48, 884736, 48, label="dW tap")
    bench(96, 884736, 48, label="dW tap C=96")


if __name__ == "__main__":
    main()
