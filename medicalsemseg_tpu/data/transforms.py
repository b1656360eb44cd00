"""Host-side preprocessing transforms (MONAI-semantic, NumPy-native).

Re-derivations of the transform chain the reference composes with MONAI dict
transforms (reference: data/dataset_builder.py:19-377, data/transforms.py).
These run once per volume at dataset-cache build time on the host (exactly
where the reference runs them, via CacheDataset CPU workers); per-step random
crops/flips run on cached arrays and are cheap. Device-side work starts at the
static-shaped crop batches.

Conventions: volumes are channels-LAST (D, H, W, C) numpy arrays here (the
TPU layout), where the reference is channels-first. Randomness comes from an
explicit np.random.Generator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from medicalsemseg_tpu.config import Config, as_tuple3
from medicalsemseg_tpu.data import nifti
from medicalsemseg_tpu.ops.resize import spacing_resample_np

Tuple3 = Tuple[int, int, int]


# ---------------------------------------------------------------- intensity

def scale_intensity_range(img, a_min, a_max, b_min=0.0, b_max=1.0, clip=True):
    """MONAI ScaleIntensityRanged (reference: dataset_builder.py:48-56)."""
    img = (img.astype(np.float32) - a_min) / float(a_max - a_min)
    img = img * (b_max - b_min) + b_min
    if clip:
        img = np.clip(img, b_min, b_max)
    return img.astype(np.float32)


def scale_cubed_intensity_range(img, a_min, a_max, b_min=0.0, b_max=1.0,
                                clip=True):
    """Cube-root compression then min-max scaling
    (reference: data/transforms.py:17-72 ScaleCubedIntensityRange)."""
    ca, cb = np.cbrt(a_min), np.cbrt(a_max)
    img = np.cbrt(img.astype(np.float32))
    img = (img - ca) / (cb - ca)
    img = img * (b_max - b_min) + b_min
    if clip:
        img = np.clip(img, b_min, b_max)
    return img.astype(np.float32)


def scale_intensity_range_percentiles(img, lower=5.0, upper=95.0, b_min=0.0,
                                      b_max=1.0, clip=True):
    """MONAI ScaleIntensityRangePercentilesD(relative=False)
    (reference: dataset_builder.py:57-67)."""
    a_min = np.percentile(img, lower)
    a_max = np.percentile(img, upper)
    return scale_intensity_range(img, a_min, a_max, b_min, b_max, clip)


def normalize_intensity(img, subtrahend: Optional[float] = None,
                        divisor: Optional[float] = None,
                        nonzero: bool = False, channel_wise: bool = False):
    """MONAI NormalizeIntensityd (reference: dataset_builder.py:188-207)."""
    img = img.astype(np.float32)
    if channel_wise:
        out = img.copy()
        for c in range(img.shape[-1]):
            ch = img[..., c]
            mask = ch != 0 if nonzero else np.ones_like(ch, bool)
            if not mask.any():
                continue
            mean = ch[mask].mean()
            std = ch[mask].std()
            out[..., c][mask] = (ch[mask] - mean) / max(std, 1e-8)
        return out
    return (img - subtrahend) / divisor


def rand_shift_intensity(img, offsets: float, rng: np.random.Generator):
    return img + np.float32(rng.uniform(-offsets, offsets))


def rand_scale_intensity(img, factors: float, rng: np.random.Generator):
    return img * np.float32(1.0 + rng.uniform(-factors, factors))


# ------------------------------------------------------------------ spatial

def crop_foreground_bbox(img, k_divisible: Optional[Tuple3] = None,
                         margin: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Bounding box of img > 0 over channels (MONAI CropForegroundd,
    reference: dataset_builder.py:69-81). Returns (start, end) int arrays;
    may exceed bounds when k_divisible forces padding."""
    fg = (img > 0).any(axis=-1)
    if not fg.any():
        start = np.zeros(3, np.int64)
        end = np.asarray(fg.shape, np.int64)
    else:
        coords = np.argwhere(fg)
        start = coords.min(0) - margin
        end = coords.max(0) + 1 + margin
    if k_divisible is not None:
        k = np.asarray(k_divisible)
        size = end - start
        new_size = np.ceil(size / k).astype(int) * k
        extra = new_size - size
        start = start - extra // 2
        end = end + (extra - extra // 2)
    return start, end


def crop_with_bbox(img, start, end, constant=0.0):
    """Crop (D, H, W, C) with out-of-bounds handling via padding."""
    shape = np.asarray(img.shape[:3])
    pad_lo = np.maximum(-start, 0)
    pad_hi = np.maximum(end - shape, 0)
    s = np.maximum(start, 0)
    e = np.minimum(end, shape)
    out = img[s[0]:e[0], s[1]:e[1], s[2]:e[2]]
    if pad_lo.any() or pad_hi.any():
        pads = [(pad_lo[i], pad_hi[i]) for i in range(3)] + [(0, 0)]
        out = np.pad(out, pads, constant_values=constant)
    return out


def spatial_pad(img, target: Tuple3, constant=0.0):
    """Symmetric pad up to target (MONAI SpatialPadd,
    reference: dataset_builder.py:83-88)."""
    pads = []
    for i in range(3):
        diff = max(target[i] - img.shape[i], 0)
        pads.append((diff // 2, diff - diff // 2))
    pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        img = np.pad(img, pads, constant_values=constant)
    return img


def _correct_center(center: np.ndarray, roi: Tuple3, shape: Tuple3) -> np.ndarray:
    """Clamp a crop center so the roi fits inside the volume
    (MONAI correct_crop_centers semantics)."""
    c = np.asarray(center, np.int64)
    lo = np.asarray([r // 2 for r in roi])
    hi = np.asarray([max(shape[i] - roi[i] + roi[i] // 2, lo[i]) for i in range(3)])
    return np.minimum(np.maximum(c, lo), hi)


def crop_at_center(img, center, roi: Tuple3):
    start = np.asarray(center) - np.asarray([r // 2 for r in roi])
    return img[start[0]:start[0] + roi[0], start[1]:start[1] + roi[1],
               start[2]:start[2] + roi[2]]


def rand_crop_pos_neg_centers(label, image, roi: Tuple3, pos: float, neg: float,
                              num_samples: int, rng: np.random.Generator,
                              image_threshold: float = 0.0) -> List[np.ndarray]:
    """Center-sampling distribution of MONAI RandCropByPosNegLabeld
    (reference: dataset_builder.py:108-120; data/transforms.py:197-223):
    with probability pos/(pos+neg) pick a uniformly random foreground voxel as
    the (clamped) crop center, else a background voxel with image > threshold.
    """
    fg_mask = (label != 0).any(axis=-1)
    valid = (image > image_threshold).any(axis=-1)
    bg_mask = (~fg_mask) & valid
    fg_idx = np.flatnonzero(fg_mask)
    bg_idx = np.flatnonzero(bg_mask)
    pos_ratio = pos / max(pos + neg, 1e-12)
    if len(fg_idx) == 0 and len(bg_idx) == 0:
        raise ValueError("no valid crop centers: empty label and image")
    shape = fg_mask.shape
    centers = []
    for _ in range(num_samples):
        use_fg = rng.random() < pos_ratio
        pool = fg_idx if (use_fg and len(fg_idx)) else bg_idx
        if len(pool) == 0:
            pool = fg_idx if len(fg_idx) else bg_idx
        flat = pool[rng.integers(len(pool))]
        center = np.asarray(np.unravel_index(flat, shape))
        centers.append(_correct_center(center, roi, shape))
    return centers


def rand_crop_class_centers(label, image, roi: Tuple3, ratios: Sequence[float],
                            num_samples: int, rng: np.random.Generator,
                            image_threshold: float = 0.0) -> List[np.ndarray]:
    """MONAI RandCropByLabelClassesd center sampling
    (reference: dataset_builder.py:121-137): pick class c ~ ratios, then a
    uniform voxel of that class."""
    shape = label.shape[:3]
    lab = label[..., 0]
    valid = (image > image_threshold).any(axis=-1)
    pools = []
    for c in range(len(ratios)):
        mask = (lab == c)
        if c == 0:
            mask = mask & valid
        pools.append(np.flatnonzero(mask))
    r = np.asarray(ratios, np.float64)
    avail = np.asarray([len(p) > 0 for p in pools])
    r = np.where(avail, r, 0.0)
    if r.sum() == 0:
        raise ValueError("no valid class centers")
    r = r / r.sum()
    centers = []
    for _ in range(num_samples):
        c = rng.choice(len(pools), p=r)
        flat = pools[c][rng.integers(len(pools[c]))]
        center = np.asarray(np.unravel_index(flat, shape))
        centers.append(_correct_center(center, roi, shape))
    return centers


def dilated_center_mask(label, n_classes: int, iterations: int = 48) -> np.ndarray:
    """Binary dilation of each class by `iterations` voxels, OR-combined —
    the 'label4crop' sampling mask (reference: dataset_builder.py:89-106).

    The reference's scipy binary_dilation(iterations=48) with the default
    3x3x3 structuring element equals thresholding the Chebyshev... strictly the
    city-block (L1) distance transform at <= 48; we use the L1 distance
    transform which is orders of magnitude faster than 48 erosion passes.
    """
    from scipy.ndimage import distance_transform_cdt

    lab = label[..., 0]
    masks = []
    for c in range(n_classes):
        cls = lab == c
        if not cls.any():
            masks.append(np.zeros_like(cls))
            continue
        dist = distance_transform_cdt(~cls, metric="taxicab")
        masks.append(dist <= iterations)
    return np.stack(masks, axis=-1).astype(np.uint8)


def rand_spatial_crop(img_shape, roi: Tuple3, rng: np.random.Generator):
    """Uniform start for RandSpatialCropd(random_size=False)
    (reference: dataset_builder.py:138-140). Returns the start coords."""
    return np.asarray([
        rng.integers(0, max(img_shape[i] - roi[i], 0) + 1) for i in range(3)
    ])


def rand_flip(img, label, prob: float, rng: np.random.Generator):
    """Three independent per-axis flips (reference: dataset_builder.py:148-169)."""
    for ax in range(3):
        if rng.random() < prob:
            img = np.flip(img, axis=ax)
            if label is not None:
                label = np.flip(label, axis=ax)
    return img, label


def rand_rotate90(img, label, prob: float, rng: np.random.Generator,
                  max_k: int = 3):
    """MONAI RandRotate90d over the first two spatial axes
    (reference: dataset_builder.py:170-177)."""
    if rng.random() < prob:
        k = int(rng.integers(max_k)) + 1
        img = np.rot90(img, k, axes=(0, 1))
        if label is not None:
            label = np.rot90(label, k, axes=(0, 1))
    return img, label


def convert_labels_to_brats(label: np.ndarray) -> np.ndarray:
    """BRATS multi-channel conversion (MONAI
    ConvertToMultiChannelBasedOnBratsClassesd; reference:
    dataset_builder.py:26-27): TC = 1|4, WT = 1|2|4, ET = 4."""
    lab = label[..., 0]
    tc = np.logical_or(lab == 1, lab == 4)
    wt = np.logical_or(tc, lab == 2)
    et = lab == 4
    return np.stack([tc, wt, et], axis=-1).astype(np.float32)


# -------------------------------------------------------------- pipelines

@dataclass
class Sample:
    """One preprocessed volume resident in host memory (the cache record)."""

    image: np.ndarray            # (D, H, W, C) float32
    label: Optional[np.ndarray]  # (D, H, W, 1) int/float or None (test)
    affine: np.ndarray           # 4x4 post-transform affine
    original_affine: np.ndarray  # 4x4 on-disk affine (pre-orientation), the
    #                              MONAI meta 'original_affine' the reference
    #                              feeds to get_affine_xyz (utils/misc.py:427)
    original_shape: Tuple3       # pre-Spacingd spatial shape
    crop_mask: Optional[np.ndarray] = None  # 'label4crop' dilated mask
    name: str = ""


def load_and_preprocess(image_path: str, label_path: Optional[str],
                        cfg: Config, mode: str = "train") -> Sample:
    """LoadImaged -> channels-last -> RAS -> Spacingd -> intensity chain
    (the deterministic prefix of the train/val/test pipelines,
    reference: dataset_builder.py:19-88, :220-306, :308-377).

    mode-specific gating mirrors the three reference pipelines exactly:
      * train: crop-foreground (plain and/or k-divisible) + spatial-pad; the
        final NormalizeIntensityd runs per-crop in sample_training_crops
        (the reference applies it LAST, after crops and intensity augs);
      * val:   plain crop-foreground only (no kdiv, reference :271-276),
        spatial-pad, normalize here (no crops downstream);
      * test:  no reorientation, no crop-foreground, no spatial-pad
        (reference :308-377 includes neither), normalize here.
    """
    assert mode in ("train", "val", "test"), mode
    is_test = mode == "test"
    img_nii = nifti.load(image_path)
    img = np.asarray(img_nii.data)
    affine = img_nii.affine
    # MONAI meta original_affine = the on-disk affine BEFORE Orientationd
    original_affine = affine.copy()
    if img.ndim == 3:
        img = img[..., None]
    if not is_test:  # test pipeline skips reorientation (reference :313)
        img, affine = nifti.to_ras(img, affine)
    ras_affine = affine.copy()  # post-orientation, pre-Spacingd
    original_shape = img.shape[:3]

    label = None
    if label_path is not None:
        lab_nii = nifti.load(label_path)
        lab = np.asarray(lab_nii.data)
        if lab.ndim == 3:
            lab = lab[..., None]
        if not is_test:
            lab, _ = nifti.to_ras(lab, lab_nii.affine)
        label = lab

    if cfg.t_voxel_spacings:
        dims = as_tuple3(cfg.t_voxel_dims)
        img, affine = spacing_resample_np(img, affine, dims, mode="trilinear")
        if label is not None:
            label, _ = spacing_resample_np(label, ras_affine, dims,
                                           mode="nearest")

    if cfg.t_cubed_ct_intensity:
        img = scale_cubed_intensity_range(img, cfg.t_ct_min, cfg.t_ct_max)
    elif cfg.t_fixed_ct_intensity:
        img = scale_intensity_range(img, cfg.t_ct_min, cfg.t_ct_max)
    elif cfg.t_percentile_ct_intensity:
        img = scale_intensity_range_percentiles(img)

    if cfg.t_convert_labels_to_brats and label is not None and cfg.in_chans > 1:
        label = convert_labels_to_brats(label)

    if not is_test:
        do_kdiv = cfg.t_crop_foreground_kdiv and mode == "train"
        if cfg.t_crop_foreground_img or do_kdiv:
            kdiv = cfg.vol_size3() if do_kdiv else None
            start, end = crop_foreground_bbox(img, k_divisible=kdiv)
            img = crop_with_bbox(img, start, end)
            if label is not None:
                label = crop_with_bbox(label, start, end)

        if cfg.t_spatial_pad:
            img = spatial_pad(img, cfg.vol_size3())
            if label is not None:
                label = spatial_pad(label, cfg.vol_size3())

    if cfg.t_normalize and mode != "train":
        # train normalizes per-crop after the intensity augs (reference
        # train pipeline order, dataset_builder.py:188-207 last)
        if cfg.t_normalize_channel_wise:
            img = normalize_intensity(img, nonzero=True, channel_wise=True)
        else:
            img = normalize_intensity(img, cfg.t_norm_mean, cfg.t_norm_std)

    crop_mask = None
    if cfg.t_rand_crop_dilated_center and label is not None and mode == "train":
        crop_mask = dilated_center_mask(label, cfg.output_dim)

    return Sample(image=np.ascontiguousarray(img, np.float32),
                  label=None if label is None else np.ascontiguousarray(label),
                  affine=affine, original_affine=original_affine,
                  original_shape=original_shape, crop_mask=crop_mask,
                  name=image_path)


def sample_training_crops(sample: Sample, cfg: Config,
                          rng: np.random.Generator) -> List[Dict[str, np.ndarray]]:
    """Random crop + augment: the per-step random suffix of the train pipeline
    (reference: dataset_builder.py:89-217). Returns t_n_patches_per_image
    dicts with image/label/crop_loc/affine entries (static crop shapes)."""
    roi = cfg.vol_size3()
    img, label = sample.image, sample.label
    # guarantee the roi fits (MONAI crops pad on demand; we pad up front)
    img = spatial_pad(img, roi)
    if label is not None:
        label = spatial_pad(label, roi)

    n = cfg.t_n_patches_per_image
    shape = img.shape[:3]

    if cfg.t_rand_crop_fgbg or cfg.t_rand_crop_dilated_center:
        lab_for_crop = sample.crop_mask if cfg.t_rand_crop_dilated_center else label
        if cfg.t_rand_crop_dilated_center and lab_for_crop is not None:
            lab_for_crop = spatial_pad(lab_for_crop, roi)
        centers = rand_crop_pos_neg_centers(
            lab_for_crop, img, roi, cfg.t_rand_crop_pos_weight,
            cfg.t_rand_crop_neg_weight, n, rng)
    elif cfg.t_rand_crop_classes:
        ratios = np.full(cfg.output_dim, cfg.t_rand_crop_pos_weight)
        ratios[0] = cfg.t_rand_crop_neg_weight
        centers = rand_crop_class_centers(label, img, roi, ratios, n, rng)
    elif cfg.t_rand_spatial_crop:
        centers = []
        for _ in range(n):
            start = rand_spatial_crop(shape, roi, rng)
            centers.append(start + np.asarray([r // 2 for r in roi]))
    else:
        centers = [np.asarray([s // 2 for s in shape])] * n

    affine_xyz = np.diag(sample.original_affine)[:3].astype(np.float32)
    out = []
    for center in centers:
        ci = crop_at_center(img, center, roi)
        cl = crop_at_center(label, center, roi) if label is not None else None
        ci, cl = rand_flip(ci, cl, cfg.t_flip_prob, rng)
        ci, cl = rand_rotate90(ci, cl, cfg.t_rot_prob, rng)
        if cfg.t_intensity_shift_prob > 0 and rng.random() < cfg.t_intensity_shift_prob:
            ci = rand_shift_intensity(ci, cfg.t_intensity_shift_os, rng)
        if cfg.t_intensity_scale_prob > 0 and rng.random() < cfg.t_intensity_scale_prob:
            ci = rand_scale_intensity(ci, cfg.t_intensity_scale_factors, rng)
        if cfg.t_normalize:
            # LAST, per crop, after intensity augs (reference train order:
            # dataset_builder.py:188-207 appended after RandScaleIntensityd)
            if cfg.t_normalize_channel_wise:
                ci = normalize_intensity(ci, nonzero=True, channel_wise=True)
            else:
                ci = normalize_intensity(ci, cfg.t_norm_mean, cfg.t_norm_std)
        # rel crop location = center / orig_size (reference: utils/misc.py:434-441)
        crop_loc = (np.asarray(center, np.float32)
                    / np.asarray(shape, np.float32))
        out.append({
            "image": np.ascontiguousarray(ci, np.float32),
            "label": None if cl is None else
                     np.ascontiguousarray(cl[..., 0]).astype(np.int32),
            "crop_loc": crop_loc,
            "affine": affine_xyz,
        })
    return out
