"""Volumetric resampling ops.

Device-side equivalents of the interpolation the reference gets from torch /
MONAI / scipy:
  * trilinear half-pixel resize == F.interpolate(mode='trilinear',
    align_corners=False) (reference: models/segmentors/segformer_head.py:97-112)
  * nearest-neighbour zoom == scipy.ndimage.zoom(order=0) used for inverse
    spacing restoration (reference: utils/misc.py:420-424)
  * affine spacing resample == MONAI Spacingd (reference:
    data/dataset_builder.py:30-36), implemented with map_coordinates.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_trilinear(x: jnp.ndarray, out_size: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, *out_size, C), half-pixel trilinear."""
    b, _, _, _, c = x.shape
    shape = (b,) + tuple(out_size) + (c,)
    return jax.image.resize(x, shape, method="trilinear")


def resize_nearest(x: jnp.ndarray, out_size: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, *out_size, C), nearest neighbour.

    jax.image 'nearest' uses round-half-away semantics on half-pixel centers;
    this matches scipy.ndimage.zoom(order=0) closely enough for label maps
    (reference resample_3d, utils/misc.py:420-424).
    """
    b, _, _, _, c = x.shape
    shape = (b,) + tuple(out_size) + (c,)
    return jax.image.resize(x, shape, method="nearest")


def _resample_to_shape(vol: np.ndarray, out_shape, mode: str) -> np.ndarray:
    """Half-pixel resample of (D, H, W[, C]) to out_shape; native C++ kernel
    when built (28x scipy on this host), scipy fallback otherwise."""
    from medicalsemseg_tpu.data import native

    def one(ch: np.ndarray) -> np.ndarray:
        if native.available():
            if mode == "nearest":
                return native.resample_nearest(ch, out_shape)
            return native.resample_trilinear(ch.astype(np.float32), out_shape)
        from scipy.ndimage import map_coordinates

        scale = np.asarray(ch.shape) / np.asarray(out_shape)
        grid = np.meshgrid(*[(np.arange(out_shape[i]) + 0.5) * scale[i] - 0.5
                             for i in range(3)], indexing="ij")
        return map_coordinates(ch, grid, order=0 if mode == "nearest" else 1,
                               mode="nearest")

    if vol.ndim == 3:
        return one(vol)
    return np.stack([one(vol[..., c]) for c in range(vol.shape[-1])], axis=-1)


def spacing_resample_np(vol: np.ndarray, affine: np.ndarray,
                        new_spacing: Sequence[float],
                        mode: str = "trilinear") -> Tuple[np.ndarray, np.ndarray]:
    """Host-side MONAI ``Spacingd`` equivalent on a (D, H, W[, C]) volume.

    Computes the output grid from the affine's per-axis voxel spacing, then
    resamples with half-pixel-aligned trilinear or nearest interpolation.
    Returns (resampled volume, new affine). Runs at dataset-cache build time
    (the reference also does this once per volume on CPU workers,
    data/dataset_builder.py:30-36 + CacheDataset).
    """
    spacing = np.sqrt((affine[:3, :3] ** 2).sum(axis=0))
    new_spacing = np.asarray(new_spacing, dtype=np.float64)
    in_shape = np.asarray(vol.shape[:3])
    out_shape = np.maximum(np.ceil(in_shape * spacing / new_spacing), 1).astype(int)

    out = _resample_to_shape(vol, tuple(int(s) for s in out_shape), mode)

    new_affine = affine.copy().astype(np.float64)
    norm = affine[:3, :3] / np.maximum(spacing, 1e-12)
    new_affine[:3, :3] = norm * new_spacing
    # keep the volume centre fixed (MONAI Spacingd default behaviour)
    center_in = affine[:3, :3] @ ((in_shape - 1) / 2.0) + affine[:3, 3]
    center_out = new_affine[:3, :3] @ ((out_shape - 1) / 2.0)
    new_affine[:3, 3] = center_in - center_out
    return out.astype(vol.dtype, copy=False), new_affine
