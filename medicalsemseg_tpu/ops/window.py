"""3D shifted-window primitives.

TPU-first re-design of the reference's window machinery
(reference: models/backbones/swin_nnformer.py:45-64 window_partition/reverse,
:370-395 attention-mask construction):

* channels-last layout (B, D, H, W, C) so the channel dim rides the 128-lane
  axis of the VPU/MXU;
* window partition/reverse are pure reshapes+transposes that XLA fuses into
  the surrounding matmuls — no gather/scatter;
* the shifted-window attention mask depends only on static shapes, so it is
  computed **once in NumPy at trace time** and baked into the compiled program
  as a constant, instead of the reference's per-forward device-side mask build.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Tuple3 = Tuple[int, int, int]


def pad_to_multiple(x: jnp.ndarray, multiple: Tuple3) -> jnp.ndarray:
    """Zero-pad the three spatial dims of (B, D, H, W, C) up to the next multiple.

    Mirrors the trailing-edge padding of the reference
    (reference: models/backbones/swin_nnformer.py:247-252).
    """
    _, d, h, w, _ = x.shape
    pd = (-d) % multiple[0]
    ph = (-h) % multiple[1]
    pw = (-w) % multiple[2]
    if pd == ph == pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pd), (0, ph), (0, pw), (0, 0)))


def _ws3(window_size) -> Tuple3:
    return ((window_size,) * 3 if np.isscalar(window_size)
            else tuple(int(v) for v in window_size))


def window_partition(x: jnp.ndarray, window_size) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B * nW, prod(ws), C), windows ordered depth-major.

    window_size may be an int (cubic) or a (wd, wh, ww) tuple. Matches the
    ordering of reference window_partition
    (reference: models/backbones/swin_nnformer.py:45-49) so bias tables and
    masks line up index-for-index.
    """
    b, d, h, w, c = x.shape
    w0, w1, w2 = _ws3(window_size)
    x = x.reshape(b, d // w0, w0, h // w1, w1, w // w2, w2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, w0 * w1 * w2, c)


def window_reverse(windows: jnp.ndarray, window_size, dims: Tuple3) -> jnp.ndarray:
    """Inverse of :func:`window_partition`.

    (B * nW, prod(ws), C) -> (B, D, H, W, C)
    (reference: models/backbones/swin_nnformer.py:52-56).
    """
    d, h, w = dims
    w0, w1, w2 = _ws3(window_size)
    n_win = (d // w0) * (h // w1) * (w // w2)
    b = windows.shape[0] // n_win
    c = windows.shape[-1]
    x = windows.reshape(b, d // w0, h // w1, w // w2, w0, w1, w2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, c)


@functools.lru_cache(maxsize=None)
def _shift_mask_np(dims: Tuple3, window_size: int, shift_size: int) -> np.ndarray:
    """Region-id based SW-MSA mask, computed host-side.

    Reproduces the 27-region counting grid of the reference
    (reference: models/backbones/swin_nnformer.py:370-395) but as a NumPy
    constant: tokens from different pre-shift regions get -100 pairwise bias.
    Returns (nW, ws**3, ws**3) float32.
    """
    d, h, w = dims
    ws, ss = window_size, shift_size
    img = np.zeros((1, d, h, w, 1), dtype=np.float32)
    cnt = 0
    spans = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    for s0 in spans:
        for s1 in spans:
            for s2 in spans:
                img[:, s0, s1, s2, :] = cnt
                cnt += 1
    win = img.reshape(1, d // ws, ws, h // ws, ws, w // ws, ws, 1)
    win = win.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, ws * ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def shift_window_attn_mask(dims: Tuple3, window_size: int, shift_size: int) -> jnp.ndarray:
    """Static SW-MSA attention mask for a (D, H, W) token grid (see _shift_mask_np)."""
    dims = tuple(int(v) for v in dims)
    return jnp.asarray(_shift_mask_np(dims, int(window_size), int(shift_size)))


@functools.lru_cache(maxsize=None)
def relative_position_index(window_size: Tuple3) -> np.ndarray:
    """(ws³, ws³) int32 index into the (2w0-1)(2w1-1)(2w2-1) rel-pos bias table.

    Identical construction to the reference index table
    (reference: models/backbones/swin_nnformer.py:101-118).
    """
    w0, w1, w2 = window_size
    coords = np.stack(np.meshgrid(np.arange(w0), np.arange(w1), np.arange(w2),
                                  indexing="ij"))  # (3, w0, w1, w2)
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (3, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += w0 - 1
    rel[:, :, 1] += w1 - 1
    rel[:, :, 2] += w2 - 1
    rel[:, :, 0] *= (2 * w1 - 1) * (2 * w2 - 1)
    rel[:, :, 1] *= 2 * w2 - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def relative_position_index_ref_quirk(window_size: Tuple3) -> np.ndarray:
    """The reference's NON-standard index for GC-ViT / official nnFormer:
    strides (3*w1-1, 2*w1-1, 1) instead of ((2w1-1)(2w2-1), 2w2-1, 1)
    (reference: models/backbones/gc_vit_3d.py:209-210,
    models/segmentors/nnformer_official/nnformer_official.py:176-177).
    This COLLIDES distinct relative offsets onto shared table entries; it is
    reproduced verbatim behind --ref_quirk_rel_pos so reference checkpoints
    for those models can be imported bit-compatibly."""
    w0, w1, w2 = window_size
    coords = np.stack(np.meshgrid(np.arange(w0), np.arange(w1), np.arange(w2),
                                  indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += w0 - 1
    rel[:, :, 1] += w1 - 1
    rel[:, :, 2] += w2 - 1
    rel[:, :, 0] *= 3 * w1 - 1
    rel[:, :, 1] *= 2 * w1 - 1
    return rel.sum(-1).astype(np.int32)


def resolve_window(input_resolution: Sequence[int], window_size: int,
                   shift_size: int) -> Tuple[int, int]:
    """Clamp window/shift for small grids.

    When the window would cover the whole grid, attention is global within the
    (single) window and shifting is pointless
    (reference: models/backbones/swin_nnformer.py:213-216).
    """
    if min(input_resolution) <= window_size:
        return min(input_resolution), 0
    return window_size, shift_size
