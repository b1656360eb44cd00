"""Measure MXU throughput for the matmul shapes a Pallas conv kernel would
emit, to validate the packing design before writing the kernel.

The decoder conv (96^3, C=48) as im2col is (M, K)@(K, N) with one dim = 48,
which underfills the 128-lane MXU. Phase-packing the W axis raises that dim
to 144 (3 phases x 48) at 1.67x executed FLOPs. This sweep answers: how does
achieved TFLOP/s scale with the small dimension?

Run: python tools/bench_matmul_shapes.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache

def bench(m, k, n, dtype=jnp.bfloat16):
    """Difference timing: T(4 runs) - T(1 run), each run a device-side scan of
    `length` chained matmuls with ONE readback — tunnel round-trip and
    dispatch overhead cancel in the difference."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)) * 0.05, dtype)
    b = jnp.asarray(rng.normal(size=(k, n)) * 0.05, dtype)
    flops = 2 * m * k * n
    length = int(min(max(0.25 / (flops / 4e13), 64), 4000))

    @jax.jit
    def run(a, b):
        def body(carry, _):
            a, s = carry
            y = jnp.dot(a, b, preferred_element_type=jnp.float32)
            s = s + y.sum()
            a2 = (a + y[:, :1].astype(a.dtype) * 1e-6).astype(a.dtype)
            return (a2, s), ()
        (_, s), _ = jax.lax.scan(body, (a, jnp.float32(0)), None, length=length)
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
    print(f"  ({m:6d},{k:6d})@({k:6d},{n:6d}): {dt * 1e3:8.3f} ms  "
          f"{tflops:7.1f} TF/s  ({tflops / 197 * 100:5.1f}% peak)  "
          f"[len {length}]", flush=True)
    return tflops


def main():
    enable_compilation_cache()
    print("M small (streamed rows), K mid, N large:")
    for m in (48, 96, 144, 192, 256, 384, 1024):
        bench(m, 1296, 9216)
    print("phase-packed candidate vs plain:")
    bench(48, 1296, 36864)
    bench(144, 2160, 12288)   # pconv: 1.67x executed flops of the same conv
    print("N small (lane dim), M large:")
    for n in (48, 96, 128, 144, 256):
        bench(9216, 1296, n)
    print("both big (sanity peak):")
    bench(4096, 4096, 4096)


if __name__ == "__main__":
    main()
