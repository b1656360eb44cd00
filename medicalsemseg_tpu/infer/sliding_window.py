"""Gaussian-blended sliding-window inference as one device program.

Re-design of the reference's forked MONAI inferer
(reference: engine/utils.py:19-159):

  * the window grid is computed host-side from **static** shapes and baked
    into the compiled program (the reference materializes Python slice lists
    per call);
  * the whole predict-and-blend loop is a `lax.scan` over window batches with
    `dynamic_slice` gathers and read-modify-write `dynamic_update_slice`
    accumulation — no host round-trips between windows;
  * the Gaussian importance map is an analytic separable product computed once
    as a constant (the reference runs a GaussianFilter over an impulse each
    call, engine/utils.py:113-115); blending is invariant to its global scale
    since the final division by the count map cancels it;
  * window-center coordinates (normalized) and the affine are passed to the
    predictor as the reference's tuple contract (engine/utils.py:126-135).

One compilation per (volume shape, roi, overlap, sw_batch) — the data layer
buckets volumes into canonical padded shapes to bound recompiles.
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Tuple3 = Tuple[int, int, int]


def bucket_pad(vol: np.ndarray, multiple: int = 32,
               cval: float = 0.0) -> Tuple[np.ndarray, Tuple3]:
    """Pad a (D, H, W, C) host volume to the next spatial multiple.

    CT volumes differ per file but XLA wants static shapes (SURVEY.md §7.4):
    bucketing to canonical grids bounds the number of sliding-window
    compilations to a few shapes per dataset. Returns (padded volume,
    original spatial shape) — callers crop the logits back after inference.
    Pad voxels are air (cval) and sit at trailing edges, so real-voxel
    blending weights are unchanged for windows that only see real data.
    """
    orig = vol.shape[:3]
    pads = [(0, (-orig[i]) % multiple) for i in range(3)] + [(0, 0)]
    if any(p != (0, 0) for p in pads):
        vol = np.pad(vol, pads, constant_values=cval)
    return vol, orig


def scan_interval(image_size: Tuple3, roi_size: Tuple3,
                  overlap: float) -> Tuple3:
    """MONAI _get_scan_interval semantics (reference: engine/utils.py:105)."""
    out = []
    for i in range(3):
        if roi_size[i] == image_size[i]:
            out.append(roi_size[i])
        else:
            out.append(max(int(roi_size[i] * (1.0 - overlap)), 1))
    return tuple(out)


def dense_patch_starts(image_size: Tuple3, roi_size: Tuple3,
                       interval: Tuple3) -> np.ndarray:
    """All window start coordinates, clamped to stay in bounds
    (MONAI dense_patch_slices; reference: engine/utils.py:108)."""
    per_dim = []
    for d in range(3):
        if interval[d] == 0:
            per_dim.append([0])
            continue
        n = int(math.ceil((image_size[d] - roi_size[d]) / interval[d])) + 1
        starts = []
        for idx in range(n):
            s = idx * interval[d]
            s -= max(s + roi_size[d] - image_size[d], 0)
            starts.append(s)
        per_dim.append(starts)
    return np.asarray(list(itertools.product(*per_dim)), dtype=np.int32)


@functools.lru_cache(maxsize=None)
def gaussian_importance_map(roi_size: Tuple3, sigma_scale: float = 0.125) -> np.ndarray:
    """Separable Gaussian blending weights over a window (fp32, max 1.0).

    Center at size//2 and sigma = sigma_scale * size per axis, following MONAI
    compute_importance_map (reference: engine/utils.py:113-115). Clamped to
    the smallest positive value like MONAI to avoid zero weights at corners.
    """
    axes = []
    for s in roi_size:
        x = np.arange(s, dtype=np.float64)
        sigma = sigma_scale * s
        axes.append(np.exp(-0.5 * ((x - s // 2) / sigma) ** 2))
    g = axes[0][:, None, None] * axes[1][None, :, None] * axes[2][None, None, :]
    g = g / g.max()
    g = np.maximum(g, max(g[g > 0].min(), 1e-3))
    return g.astype(np.float32)


def constant_importance_map(roi_size: Tuple3) -> np.ndarray:
    return np.ones(roi_size, dtype=np.float32)


def sliding_window_inference_sharded(
    inputs: jnp.ndarray,
    affine: jnp.ndarray,
    roi_size: Tuple3,
    predictor: Callable,
    mesh,
    overlap: float = 0.25,
    mode: str = "gaussian",
    sigma_scale: float = 0.125,
    cval: float = 0.0,
    n_classes: Optional[int] = None,
    axis: str = "data",
) -> jnp.ndarray:
    """Window-parallel sliding-window inference over a device mesh.

    The window grid is embarrassingly parallel until the blend reduction
    (SURVEY.md §5.7): windows are sharded across the mesh axis, each shard
    blends its windows into a local partial (output, count) accumulator, and
    one psum over ICI produces the stitched volume. Single volume (B=1).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    assert inputs.shape[0] == 1, "sharded inference stitches one volume"
    _, d0, h0, w0, c = inputs.shape
    roi = tuple(roi_size)
    n_dev = mesh.shape[axis]

    pads = []
    for i, dim in enumerate((d0, h0, w0)):
        diff = max(roi[i] - dim, 0)
        pads.append((diff // 2, diff - diff // 2))
    image_size = tuple(max((d0, h0, w0)[i], roi[i]) for i in range(3))
    x = jnp.pad(inputs[0], (*pads, (0, 0)), constant_values=cval)

    interval = scan_interval(image_size, roi, overlap)
    starts = dense_patch_starts(image_size, roi, interval)
    n_win = len(starts)
    centers = np.stack([
        (starts[:, i] + roi[i] - roi[i] // 2) / image_size[i] for i in range(3)
    ], axis=1).astype(np.float32)

    # pad the window list so every shard gets an equal count; padded windows
    # blend with zero weight
    pad_n = (-n_win) % n_dev
    starts_p = np.concatenate([starts, np.repeat(starts[-1:], pad_n, 0)], 0)
    centers_p = np.concatenate([centers, np.repeat(centers[-1:], pad_n, 0)], 0)
    valid_p = np.concatenate([np.ones(n_win, np.float32),
                              np.zeros(pad_n, np.float32)])

    imap = (gaussian_importance_map(roi, sigma_scale) if mode == "gaussian"
            else constant_importance_map(roi))
    imap = jnp.asarray(imap)[..., None]
    nc = n_classes

    def shard_fn(x_rep, starts_sh, centers_sh, valid_sh, aff_rep):
        out = jnp.zeros(image_size + (nc,), jnp.float32)
        cnt = jnp.zeros(image_size + (1,), jnp.float32)
        # the accumulators become device-varying inside the scan
        out = jax.lax.pvary(out, (axis,))
        cnt = jax.lax.pvary(cnt, (axis,))

        def body(carry, win):
            out, cnt = carry
            s, ctr, val = win
            window = jax.lax.dynamic_slice(x_rep, (s[0], s[1], s[2], 0),
                                           roi + (c,))
            prob = predictor((window[None], ctr[None], aff_rep))[0]
            wgt = imap * val
            idx = (s[0], s[1], s[2], 0)
            cur_o = jax.lax.dynamic_slice(out, idx, roi + (nc,))
            cur_c = jax.lax.dynamic_slice(cnt, idx, roi + (1,))
            out = jax.lax.dynamic_update_slice(
                out, cur_o + wgt * prob.astype(jnp.float32), idx)
            cnt = jax.lax.dynamic_update_slice(cnt, cur_c + wgt, idx)
            return (out, cnt), None

        (out, cnt), _ = jax.lax.scan(body, (out, cnt),
                                     (starts_sh, centers_sh, valid_sh))
        out = jax.lax.psum(out, axis)
        cnt = jax.lax.psum(cnt, axis)
        return out / cnt

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(axis), P(axis), P(axis), P()),
                   out_specs=P())
    result = fn(x, jnp.asarray(starts_p), jnp.asarray(centers_p),
                jnp.asarray(valid_p), affine)
    sl = tuple(slice(pads[i][0], pads[i][0] + (d0, h0, w0)[i])
               for i in range(3))
    return result[sl][None]


def jitted_sliding_window_sharded(model, mesh, axis: str = "data"):
    """Volume-level data-parallel sliding-window runner over a device mesh.

    The reference partitions validation volumes across ranks and all-reduces
    the metrics (reference: data/dataset_builder.py:460-464,
    utils/misc.py:34-45); the TPU-native mapping is one shard_map over the
    mesh's data axis where EVERY chip runs the complete single-volume
    Gaussian sliding-window program on its own volume — no collectives in the
    hot path, and each volume's logits are bit-identical to the single-device
    runner (the shard body is the same program). Drivers group same-shaped
    volumes (see grouped_padded_volumes) into (n_dev, D, H, W, C) stacks.

    Returns fn(variables, vols (N,D,H,W,C), affines (N,3), *, roi, sw_batch,
    overlap, mode, cval, n_classes, tta) -> (N, D, H, W, n_classes).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    key = (model, mesh, axis)
    if key in _JITTED_SW_CACHE:
        return _JITTED_SW_CACHE[key]

    @functools.partial(jax.jit, static_argnames=(
        "roi", "sw_batch", "overlap", "mode", "cval", "n_classes", "tta"))
    def run(variables, vols, affines, *, roi, sw_batch, overlap,
            mode="gaussian", cval=0.0, n_classes=None, tta=False):
        def shard_body(variables, vol_l, aff_l):
            def predictor(model_in):
                return model.apply(variables, model_in, deterministic=True)

            if tta:
                from medicalsemseg_tpu.infer.tta import mirror_tta

                predictor = mirror_tta(predictor)
            return sliding_window_inference(
                vol_l, aff_l, roi, sw_batch, predictor, overlap=overlap,
                mode=mode, cval=cval, n_classes=n_classes)

        # check_rep=False: the scan carry accumulators start replicated and
        # become device-varying once window probabilities blend in; the body
        # has no collectives so the replication analysis is moot
        fn = shard_map(shard_body, mesh=mesh,
                       in_specs=(P(), P(axis), P(axis)), out_specs=P(axis),
                       check_rep=False)
        return fn(variables, vols, affines)

    _JITTED_SW_CACHE[key] = run
    return run


def grouped_padded_volumes(loader, n_group: int, multiple: int, cval: float,
                           policy: str = "bucket"):
    """Group a Sample iterator into same-shaped padded stacks for volume-DP.

    Yields (vols (G, D', H', W', C) fp32, affines (G, 3) fp32, samples list,
    orig_shapes list) with G == n_group. Trailing partial groups are filled
    by repeating the last volume — callers consume only the first
    len(samples) outputs. n_group == 1 degenerates to the plain per-volume
    iteration order.

    policy="bucket" (default): only volumes whose bucket-padded shape matches
    are grouped, so each volume's sliding-window program (and logits) is
    IDENTICAL to the single-device path — but a shape-diverse fold runs
    mostly-idle groups (measured 85-88% idle slots at n_group=8 on a
    realistic 6-volume CV fold, tools/bucket_policy_sim.py).

    policy="sorted_max": materialize the loader, sort volumes by padded size,
    group ANY n_group consecutive and pad each group to the elementwise max
    of its members' buckets. Full groups by construction (idle only in the
    final group; simulated fold wall-clock 2.4-4.4x better at n_group=8).
    A volume's window grid can differ from its own-bucket grid, so logits
    are MONAI-equivalent (extra windows see cval air; masked metrics are
    unchanged in expectation) but not bit-identical to the single-device
    path — opt-in via --val_group_policy, never the default.
    """

    def make_group(items):
        samples = [s for s, _, _ in items]
        pads = [p for _, p, _ in items]
        origs = [o for _, _, o in items]
        while len(pads) < n_group:  # fill: repeated volumes are discarded
            pads.append(pads[-1])
        vols = np.stack(pads).astype(np.float32)
        affs = np.stack([
            np.diag(s.original_affine)[:3].astype(np.float32)
            for s in (samples + [samples[-1]] * (n_group - len(samples)))])
        return vols, affs, samples, origs

    if policy == "sorted_max":
        # sort on SHAPES only; the padded copies are built lazily per yielded
        # group (one pad straight to the group max), so at most one group's
        # padded volumes are live at a time rather than the whole fold's
        # (~55 MB each — multi-GB at production sweep scale; ADVICE r4).
        items = []
        for sample in loader:
            orig = sample.image.shape[:3]
            bshape = tuple(orig[d] + (-orig[d]) % multiple for d in range(3))
            items.append((sample, bshape, orig))
        items.sort(key=lambda it: (int(np.prod(it[1])), it[1]))
        for i in range(0, len(items), n_group):
            chunk = items[i:i + n_group]
            gmax = tuple(max(b[d] for _, b, _ in chunk) for d in range(3))
            chunk = [
                (s, np.pad(s.image,
                           [(0, gmax[d] - s.image.shape[d]) for d in range(3)]
                           + [(0, 0)], constant_values=cval)
                 if s.image.shape[:3] != gmax else s.image, o)
                for s, _, o in chunk]
            yield make_group(chunk)
        return
    if policy != "bucket":
        raise ValueError(f"unknown grouping policy: {policy!r}")

    pending: dict = {}
    for sample in loader:
        padded, orig = bucket_pad(sample.image, multiple, cval)
        key = padded.shape
        pending.setdefault(key, []).append((sample, padded, orig))
        if len(pending[key]) == n_group:
            yield make_group(pending.pop(key))
    for key in list(pending):
        yield make_group(pending.pop(key))


_JITTED_SW_CACHE: dict = {}


def jitted_sliding_window(model):
    """Model-closed, shape-cached jitted sliding-window runner.

    Returns fn(variables, vol, affine, *, roi, sw_batch, overlap, mode, cval,
    n_classes). Model variables are jit ARGUMENTS — never close over params
    when jitting on this platform: the weights would be serialized into the
    HLO as constants (hundreds of MB) and the axon remote-compile tunnel
    rejects the request with HTTP 413.
    """
    if model in _JITTED_SW_CACHE:
        return _JITTED_SW_CACHE[model]

    @functools.partial(jax.jit, static_argnames=(
        "roi", "sw_batch", "overlap", "mode", "cval", "n_classes", "tta"))
    def run(variables, vol, affine, *, roi, sw_batch, overlap,
            mode="gaussian", cval=0.0, n_classes=None, tta=False):
        def predictor(model_in):
            return model.apply(variables, model_in, deterministic=True)

        if tta:
            from medicalsemseg_tpu.infer.tta import mirror_tta

            predictor = mirror_tta(predictor)
        return sliding_window_inference(
            vol, affine, roi, sw_batch, predictor, overlap=overlap,
            mode=mode, cval=cval, n_classes=n_classes)

    _JITTED_SW_CACHE[model] = run
    return run


def sliding_window_inference(
    inputs: jnp.ndarray,
    affine: jnp.ndarray,
    roi_size: Tuple3,
    sw_batch_size: int,
    predictor: Callable,
    overlap: float = 0.25,
    mode: str = "constant",
    sigma_scale: float = 0.125,
    cval: float = 0.0,
    n_classes: Optional[int] = None,
    class_major_probs: bool = False,
) -> jnp.ndarray:
    """inputs (B, D, H, W, C) -> blended logits (B, D, H, W, n_classes).

    ``predictor((windows, centers, affine))`` maps (N, *roi, C) windows to
    (N, *roi, n_classes). All shapes static; jit-safe end to end.

    ``class_major_probs=True``: the predictor returns CLASS-MAJOR logits
    (n_classes, N, *roi) — e.g. a model applied with class_major_logits=True
    (models/decoders.py UnetOutBlock) — and the blend consumes them directly,
    skipping both the (N, *roi, 14) lane-padded materialization (minor dim 14
    pads to 128 lanes: 9.1x physical HBM bytes) and the class-major transpose
    copy. Identical blend arithmetic; incompatible with mirror TTA (which
    flips channels-last spatial axes).
    """
    b, d0, h0, w0, c = inputs.shape
    roi = tuple(roi_size)

    # pad input symmetrically up to roi (reference: engine/utils.py:98-103)
    pads = []
    for i, dim in enumerate((d0, h0, w0)):
        diff = max(roi[i] - dim, 0)
        pads.append((diff // 2, diff - diff // 2))
    image_size = tuple(max((d0, h0, w0)[i], roi[i]) for i in range(3))
    x = jnp.pad(inputs, ((0, 0), *pads, (0, 0)), constant_values=cval)

    interval = scan_interval(image_size, roi, overlap)
    starts = dense_patch_starts(image_size, roi, interval)  # (N, 3)
    n_win = len(starts)

    imap = (gaussian_importance_map(roi, sigma_scale) if mode == "gaussian"
            else constant_importance_map(roi))
    imap = jnp.asarray(imap)[..., None]  # (*roi, 1)

    # normalized window centers (reference: engine/utils.py:126-132)
    centers_np = np.stack([
        (starts[:, i] + roi[i] - roi[i] // 2) / image_size[i] for i in range(3)
    ], axis=1).astype(np.float32)

    sw = sw_batch_size
    n_batches = math.ceil(n_win / sw)
    pad_n = n_batches * sw - n_win
    starts_p = np.concatenate([starts, np.repeat(starts[-1:], pad_n, 0)], 0)
    centers_p = np.concatenate([centers_np, np.repeat(centers_np[-1:], pad_n, 0)], 0)
    valid_p = np.concatenate([np.ones(n_win, np.float32),
                              np.zeros(pad_n, np.float32)])

    starts_dev = jnp.asarray(starts_p.reshape(n_batches, sw, 3))
    centers_dev = jnp.asarray(centers_p.reshape(n_batches, sw, 3))
    valid_dev = jnp.asarray(valid_p.reshape(n_batches, sw))

    def gather_window(vol, s):
        # channel-1 volumes are gathered rank-3: the (..., 1) trailing dim
        # would put ONE of the TPU's 128 lanes to work on every slice pass
        if c == 1:
            return jax.lax.dynamic_slice(vol[..., 0], (s[0], s[1], s[2]),
                                         roi)[..., None]
        return jax.lax.dynamic_slice(vol, (s[0], s[1], s[2], 0), roi + (c,))

    # blending runs CLASS-MAJOR: the naive (D, H, W, n_classes) accumulator
    # tiles its minor dim at n_classes(=14) of 128 lanes, and the per-window
    # dynamic-update-slices measured 30 GB/s (115 ms/volume, profiled on the
    # headline workload). With classes leading, the minor dims are spatial
    # (tile-friendly) and the same updates run near memory speed. Identical
    # arithmetic per element -> bit-identical results.
    imap_cm = jnp.moveaxis(imap, -1, 0)  # (1, *roi)

    def run_batch_b(vol_b, aff_b, out_b, cnt_b, sbatch, cbatch, vbatch):
        """One sw-batch for one input volume (no batch dim)."""
        wins = jax.vmap(lambda s: gather_window(vol_b, s))(sbatch)  # (sw, *roi, c)
        aff_rep = jnp.broadcast_to(aff_b, (sw, 3))
        probs = predictor((wins, cbatch, aff_rep))
        if class_major_probs:  # (n_cls, sw, *roi): already blend-ready
            assert probs.shape[:2] == (n_classes, sw), probs.shape
            probs = probs.astype(jnp.float32)
        else:  # (sw, *roi, n_cls) -> class-major for the blend
            probs = probs.astype(jnp.float32).transpose(0, 4, 1, 2, 3)

        def accumulate(i, carry):
            out, cnt = carry
            s = sbatch[i]
            wgt = imap_cm * vbatch[i]
            idx = (0, s[0], s[1], s[2])
            nc = out.shape[0]
            win_probs = probs[:, i] if class_major_probs else probs[i]
            cur_o = jax.lax.dynamic_slice(out, idx, (nc,) + roi)
            cur_c = jax.lax.dynamic_slice(cnt, idx, (1,) + roi)
            out = jax.lax.dynamic_update_slice(out, cur_o + wgt * win_probs, idx)
            cnt = jax.lax.dynamic_update_slice(cnt, cur_c + wgt, idx)
            return out, cnt

        return jax.lax.fori_loop(0, sw, accumulate, (out_b, cnt_b))

    def infer_one(vol_b, aff_b):
        nc_probe = n_classes
        assert nc_probe is not None, "n_classes must be provided"
        out0 = jnp.zeros((nc_probe,) + image_size, jnp.float32)
        cnt0 = jnp.zeros((1,) + image_size, jnp.float32)

        def body(carry, batch_idx):
            out, cnt = carry
            out, cnt = run_batch_b(vol_b, aff_b, out, cnt,
                                   starts_dev[batch_idx],
                                   centers_dev[batch_idx],
                                   valid_dev[batch_idx])
            return (out, cnt), None

        (out, cnt), _ = jax.lax.scan(body, (out0, cnt0),
                                     jnp.arange(n_batches))
        return jnp.moveaxis(out / cnt, 0, -1)

    # unrolled over the (static, tiny) volume batch instead of jax.vmap:
    # the vmapped batch dim infected every predictor intermediate as a
    # near-minor layout dim ({4,0,3,2,1} on the (B,sw,96^3,C) tensors),
    # which ran the decoder's InstanceNorm reductions at ~21 GB/s — 44% of
    # the volume time (profiled; ~445 ms of convert_reduce fusions/volume)
    result = jnp.stack([infer_one(x[i], affine[i]) for i in range(b)], 0)

    # crop the roi padding back off (reference: engine/utils.py:153-159)
    sl = tuple(slice(pads[i][0], pads[i][0] + (d0, h0, w0)[i]) for i in range(3))
    return result[(slice(None),) + sl]
