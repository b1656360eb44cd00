"""Microbenchmark: 3D conv formulations for the UNETR decoder hot path.

The decoder's full-resolution 96^3 C=48 3x3x3 convs sit at ~6% MXU
(NOTES.md): with channels-last NDHWC the output-channel dim (48) underfills
the 128-lane MXU, and XLA's 5D conv lowering loses more on top. This tool
times alternative formulations of the SAME convolution on the real chip to
pick the production implementation (reference workload: the res blocks of
/root/reference/models/segmentors/swin_unetr.py:73-130).

Run:  python tools/bench_conv3d.py [--dtype bfloat16] [--spatial 96] [--cin 48]

Variants (all numerically equivalent up to dtype rounding):
  ndhwc        lax 3D conv, channels-last (current production path)
  ncdhw        lax 3D conv, channels-first
  kd2d         sum over kd of (1,3,3) convs on d-shifted input
  dots27       sum over 27 taps of (N,C)@(C,C) matmuls
  kdkh_w3      sum over 9 (kd,kh) of w-im2col matmul (N,3C)@(3C,Co)
  pad128       channels zero-padded to 128 in/out, naive conv, slice
  s2d_dense    space-to-depth(2) + coarse 3^3 conv with scattered weights
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache

DN_NDHWC = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                      ("NDHWC", "DHWIO", "NDHWC"))
DN_NCDHW = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                      ("NCDHW", "OIDHW", "NCDHW"))


def conv_ndhwc(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                    dimension_numbers=DN_NDHWC)


def conv_ncdhw(x, w):
    xt = jnp.transpose(x, (0, 4, 1, 2, 3))
    wt = jnp.transpose(w, (4, 3, 0, 1, 2))
    y = lax.conv_general_dilated(xt, wt, (1, 1, 1), "SAME",
                                 dimension_numbers=DN_NCDHW)
    return jnp.transpose(y, (0, 2, 3, 4, 1))


def conv_kd2d(x, w):
    # y[d] = sum_kd conv2d(x[d+kd-1], w[kd]); shift via pad+slice on d.
    d = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    y = None
    for kd in range(3):
        xs = lax.slice_in_dim(xp, kd, kd + d, axis=1)
        yk = lax.conv_general_dilated(xs, w[kd:kd + 1], (1, 1, 1),
                                      [(0, 0), (1, 1), (1, 1)],
                                      dimension_numbers=DN_NDHWC)
        y = yk if y is None else y + yk
    return y


def conv_dots27(x, w):
    b, d, h, ww, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((b, d, h, ww, co), x.dtype)
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                xs = lax.dynamic_slice(xp, (0, kd, kh, kw, 0),
                                       (b, d, h, ww, c))
                y = y + jnp.einsum("bdhwc,cf->bdhwf", xs, w[kd, kh, kw],
                                   preferred_element_type=x.dtype)
    return y


def conv_kdkh_w3(x, w):
    # im2col along w only (3 contiguous taps in channels-last layout),
    # accumulate over the 9 (kd,kh) shifts. K = 3*C.
    b, d, h, ww, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((b, d, h, ww, co), x.dtype)
    for kd in range(3):
        for kh in range(3):
            xs = lax.dynamic_slice(xp, (0, kd, kh, 0, 0), (b, d, h, ww + 2, c))
            cols = jnp.concatenate(
                [lax.slice_in_dim(xs, kw, kw + ww, axis=3) for kw in range(3)],
                axis=-1)  # (b,d,h,w,3C)
            wk = w[kd, kh].reshape(3 * c, co)  # (3C, Co)
            y = y + jnp.einsum("bdhwk,kf->bdhwf", cols, wk,
                               preferred_element_type=x.dtype)
    return y


def conv_pad128(x, w):
    c, co = x.shape[-1], w.shape[-1]
    xpad = jnp.pad(x, ((0, 0),) * 4 + ((0, 128 - c),))
    wpad = jnp.pad(w, ((0, 0),) * 3 + ((0, 128 - c), (0, 128 - co)))
    y = conv_ndhwc(xpad, wpad)
    return y[..., :co]


def _s2d(x):
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, d // 2, h // 2, w // 2, 8 * c)


def _d2s(y, co):
    b, dc, hc, wc, _ = y.shape
    y = y.reshape(b, dc, hc, wc, 2, 2, 2, co)
    return y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        b, dc * 2, hc * 2, wc * 2, co)


def _s2d_weight(w):
    """Scatter (3,3,3,C,Co) into the coarse-domain (3,3,3,8C,8Co) kernel."""
    c, co = w.shape[3], w.shape[4]
    wc = jnp.zeros((3, 3, 3, 8 * c, 8 * co), w.dtype)
    for po in range(8):
        pd, ph, pw = po >> 2 & 1, po >> 1 & 1, po & 1
        for kd in range(3):
            for kh in range(3):
                for kw in range(3):
                    fd, fh, fw = pd + kd - 1, ph + kh - 1, pw + kw - 1
                    cd, pid = fd >> 1, fd & 1
                    ch, pih = fh >> 1, fh & 1
                    cw, piw = fw >> 1, fw & 1
                    pi = (pid << 2) | (pih << 1) | piw
                    wc = wc.at[cd + 1, ch + 1, cw + 1,
                               pi * c:(pi + 1) * c,
                               po * co:(po + 1) * co].set(w[kd, kh, kw])
    return wc


def conv_s2d_dense(x, w):
    co = w.shape[-1]
    return _d2s(conv_ndhwc(_s2d(x), _s2d_weight(w)), co)


VARIANTS = {
    "ndhwc": conv_ndhwc,
    "ncdhw": conv_ncdhw,
    "kd2d": conv_kd2d,
    "dots27": conv_dots27,
    "kdkh_w3": conv_kdkh_w3,
    "pad128": conv_pad128,
    "s2d_dense": conv_s2d_dense,
}


def _roundtrip():
    trivial = jax.jit(lambda x: x.sum())
    _ = float(trivial(jnp.ones(8)))
    t0 = time.time()
    for _ in range(5):
        _ = float(trivial(jnp.ones(8)))
    return (time.time() - t0) / 5


INNER = 20  # device-side chained iterations per host readback


def time_fn(fn, args, iters=4):
    """Chain INNER applications inside one jit: the 30-90 ms tunnel
    round-trip amortizes over INNER device iterations."""

    @jax.jit
    def run(x, w):
        def body(y, _):
            y = (fn(y, w) * 0.05 + y * 0.5).astype(y.dtype)
            return y, ()
        y, _ = jax.lax.scan(body, x, None, length=INNER)
        return y.astype(jnp.float32).mean()

    _ = float(run(*args))
    rt = _roundtrip()
    t0 = time.time()
    for _ in range(iters):
        _ = float(run(*args))
    return ((time.time() - t0) / iters - rt) / INNER


def time_grad(fn, args, iters=4):
    loss = lambda x, w: fn(x, w).astype(jnp.float32).mean()  # noqa: E731
    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def run(x, w):
        def body(carry, _):
            y, wv = carry
            dx, dw = g(y, wv)
            y = (y * 0.5 + dx.astype(y.dtype)).astype(y.dtype)
            wv = (wv + dw.astype(wv.dtype) * 1e-6).astype(wv.dtype)
            return (y, wv), ()
        (y, wv), _ = jax.lax.scan(body, (x, w), None, length=INNER)
        return y.astype(jnp.float32).mean() + wv.astype(jnp.float32).mean()

    _ = float(run(*args))
    rt = _roundtrip()
    t0 = time.time()
    for _ in range(iters):
        _ = float(run(*args))
    return ((time.time() - t0) / iters - rt) / INNER


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--spatial", type=int, default=96)
    ap.add_argument("--cin", type=int, default=48)
    ap.add_argument("--cout", type=int, default=48)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="verify numerics vs ndhwc before timing")
    args = ap.parse_args()

    enable_compilation_cache()
    dt = jnp.dtype(args.dtype)
    s, ci, co = args.spatial, args.cin, args.cout
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, s, s, s, ci)), dt)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.05, dt)

    gflops = 2 * s ** 3 * 27 * ci * co / 1e9
    peak = 197e3  # v5e bf16 GFLOP/s
    print(f"conv {s}^3 {ci}->{co} {args.dtype}: {gflops:.1f} GFLOP")

    if args.check:
        ref = np.asarray(jax.jit(conv_ndhwc)(x, w), np.float32)
        for name in args.variants:
            if name == "ndhwc":
                continue
            out = np.asarray(jax.jit(VARIANTS[name])(x, w), np.float32)
            err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print(f"  check {name}: rel-max-err {err:.2e}")

    for name in args.variants:
        fn = VARIANTS[name]
        try:
            t = time_fn(fn, (x, w), args.iters)
            mfu = gflops / t / 1e3 / peak * 1e3
            line = f"  {name:10s} fwd {t * 1e3:8.2f} ms   MFU {mfu * 100:5.1f}%"
            if args.grad:
                tg = time_grad(fn, (x, w), args.iters)
                line += f"   fwd+bwd {tg * 1e3:8.2f} ms"
            print(line, flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"  {name:10s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
