"""Device-resident training data pipeline.

The reference trains from a host-RAM MONAI CacheDataset and copies every crop
batch to the device (reference: data/dataset_builder.py:467-480 +
engine/train.py:44-50). The TPU-native alternative (SURVEY.md §7.1):
preprocessed volumes live in HBM; each step ships only a handful of scalars
(crop centers, flip bits, intensity factors) and the crop extraction +
augmentation run on device under jit:

  * crop: vmapped dynamic_slice on the cached volume;
  * flips: lax.select between pre-flipped slices (traced booleans);
  * rot90 / intensity shift / scale: traced scalar ops.

Center sampling stays on the host against precomputed foreground/background
index tables (the MONAI pos/neg distribution needs data-dependent choices).
One compilation per cached-volume bucket shape (volumes are bucket-padded).

Fits when the dataset fits HBM next to the train state (BTCV: ~30 volumes x
240^3 fp32 ~ 1.6 GB). Fallback is the host loader (data/dataset.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.data.dataset import CachedVolumeDataset
from medicalsemseg_tpu.data.transforms import spatial_pad
from medicalsemseg_tpu.infer.sliding_window import bucket_pad


@functools.partial(jax.jit, static_argnames=("roi", "norm"))
def _extract_and_augment(image, label, center, flip_bits, rot_k, shift, scale,
                         mean, std, *, roi: Tuple[int, int, int],
                         norm: str = "none"):
    """Crop at center, flip/rot90/intensity-augment/normalize — all on device.

    image (D, H, W, C), label (D, H, W); center is the crop center (the crop
    start is center - roi//2, pre-clamped on host); flip_bits (3,) bool;
    rot_k scalar int (0-3, first two spatial axes); shift/scale scalars.
    norm mirrors the reference train pipeline's trailing NormalizeIntensityd
    (dataset_builder.py:188-207): 'scalar' = (x-mean)/std, 'channel' =
    per-channel nonzero-masked standardization of the augmented crop.
    """
    start = center - jnp.asarray([r // 2 for r in roi])
    img = jax.lax.dynamic_slice(image, (start[0], start[1], start[2], 0),
                                roi + (image.shape[-1],))
    lab = jax.lax.dynamic_slice(label, (start[0], start[1], start[2]), roi)

    for ax in range(3):
        img = jnp.where(flip_bits[ax], jnp.flip(img, axis=ax), img)
        lab = jnp.where(flip_bits[ax], jnp.flip(lab, axis=ax), lab)

    def rot(k, arrs):
        i, l = arrs
        return jnp.rot90(i, k, axes=(0, 1)), jnp.rot90(l, k, axes=(0, 1))

    img, lab = jax.lax.switch(rot_k, [lambda a: a] +
                              [functools.partial(rot, k) for k in (1, 2, 3)],
                              (img, lab))
    img = img * scale + shift
    if norm == "scalar":
        img = (img - mean) / std
    elif norm == "channel":
        mask = img != 0
        cnt = mask.sum((0, 1, 2))
        safe = jnp.maximum(cnt, 1)
        mu = jnp.where(mask, img, 0.0).sum((0, 1, 2)) / safe
        var = jnp.where(mask, (img - mu) ** 2, 0.0).sum((0, 1, 2)) / safe
        std_c = jnp.maximum(jnp.sqrt(var), 1e-8)
        img = jnp.where(mask & (cnt > 0), (img - mu) / std_c, img)
    return img, lab


class DeviceCachedDataset:
    """HBM-resident volumes + host-side center sampling tables."""

    def __init__(self, host_ds: CachedVolumeDataset, cfg: Config,
                 bucket: int = 32):
        self.cfg = cfg
        self.roi = cfg.vol_size3()
        self.images: List[jax.Array] = []
        self.labels: List[jax.Array] = []
        self.fg_indices: List[np.ndarray] = []
        self.bg_indices: List[np.ndarray] = []
        self.shapes: List[Tuple[int, int, int]] = []
        self.affines: List[np.ndarray] = []
        for i in range(len(host_ds)):
            s = host_ds[i]
            img = spatial_pad(s.image, self.roi)
            lab = spatial_pad(s.label, self.roi)
            img, _ = bucket_pad(img, bucket)
            lab, _ = bucket_pad(lab, bucket)
            lab2 = lab[..., 0].astype(np.int32)
            self.images.append(jax.device_put(np.ascontiguousarray(img)))
            self.labels.append(jax.device_put(lab2))
            fg = (lab2 != 0)
            valid = (img > 0).any(axis=-1)
            self.fg_indices.append(np.flatnonzero(fg))
            self.bg_indices.append(np.flatnonzero(~fg & valid))
            self.shapes.append(lab2.shape)
            self.affines.append(s.original_affine)

    def __len__(self):
        return len(self.images)

    def _sample_center(self, idx: int, rng: np.random.Generator) -> np.ndarray:
        cfg = self.cfg
        pos_ratio = cfg.t_rand_crop_pos_weight / max(
            cfg.t_rand_crop_pos_weight + cfg.t_rand_crop_neg_weight, 1e-12)
        pool = (self.fg_indices[idx]
                if (rng.random() < pos_ratio and len(self.fg_indices[idx]))
                else self.bg_indices[idx])
        if len(pool) == 0:
            pool = self.fg_indices[idx] if len(self.fg_indices[idx]) else \
                np.asarray([0])
        shape = self.shapes[idx]
        center = np.asarray(np.unravel_index(pool[rng.integers(len(pool))],
                                             shape))
        lo = np.asarray([r // 2 for r in self.roi])
        hi = np.asarray([shape[i] - self.roi[i] + self.roi[i] // 2
                         for i in range(3)])
        return np.minimum(np.maximum(center, lo), hi)

    def sample_crop(self, idx: int, rng: np.random.Generator):
        """One augmented crop; returns the batch dict entries (device arrays)."""
        cfg = self.cfg
        center = self._sample_center(idx, rng)
        flips = (rng.random(3) < cfg.t_flip_prob) if cfg.t_flip_prob > 0 else \
            np.zeros(3, bool)
        rot_k = (int(rng.integers(3)) + 1
                 if (cfg.t_rot_prob > 0 and rng.random() < cfg.t_rot_prob)
                 else 0)
        shift = (np.float32(rng.uniform(-cfg.t_intensity_shift_os,
                                        cfg.t_intensity_shift_os))
                 if (cfg.t_intensity_shift_prob > 0
                     and rng.random() < cfg.t_intensity_shift_prob)
                 else np.float32(0.0))
        scale = (np.float32(1.0 + rng.uniform(-cfg.t_intensity_scale_factors,
                                              cfg.t_intensity_scale_factors))
                 if (cfg.t_intensity_scale_prob > 0
                     and rng.random() < cfg.t_intensity_scale_prob)
                 else np.float32(1.0))
        norm = "none"
        if cfg.t_normalize:
            norm = "channel" if cfg.t_normalize_channel_wise else "scalar"
        img, lab = _extract_and_augment(
            self.images[idx], self.labels[idx], jnp.asarray(center, jnp.int32),
            jnp.asarray(flips), jnp.asarray(rot_k, jnp.int32),
            jnp.asarray(shift), jnp.asarray(scale),
            jnp.asarray(np.float32(cfg.t_norm_mean)),
            jnp.asarray(np.float32(cfg.t_norm_std)), roi=self.roi, norm=norm)
        crop_loc = (center / np.asarray(self.shapes[idx])).astype(np.float32)
        affine_xyz = np.diag(self.affines[idx])[:3].astype(np.float32)
        return {"image": img, "label": lab,
                "crop_loc": jnp.asarray(crop_loc),
                "affine": jnp.asarray(affine_xyz)}


class DeviceTrainLoader:
    """Epoch iterator over device-side crops (mirrors TrainLoader's batching)."""

    def __init__(self, ds: DeviceCachedDataset, cfg: Config, seed: int = 0):
        self.ds = ds
        self.cfg = cfg
        self.seed = seed

    def steps_per_epoch(self) -> int:
        return max(len(self.ds) // self.cfg.n_images_per_batch, 1)

    def epoch(self, epoch: int) -> Iterator[Dict[str, jax.Array]]:
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch]))
        order = rng.permutation(len(self.ds))
        nb = self.cfg.n_images_per_batch
        for b in range(self.steps_per_epoch()):
            idxs = order[b * nb:(b + 1) * nb]
            if len(idxs) < nb:
                idxs = np.concatenate([idxs, order[:nb - len(idxs)]])
            crops = []
            for i in idxs:
                for _ in range(self.cfg.t_n_patches_per_image):
                    crops.append(self.ds.sample_crop(int(i), rng))
            yield {k: jnp.stack([c[k] for c in crops]) for k in crops[0]}
