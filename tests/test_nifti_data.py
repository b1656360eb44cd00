"""NIfTI IO, orientation, datalist, and transform tests."""

import json
import os

import numpy as np
import pytest

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.data import nifti
from medicalsemseg_tpu.data.datalist import (
    build_cv_file_lists,
    cv_split,
    load_decathlon_datalist,
    partition_dataset,
)
from medicalsemseg_tpu.data.transforms import (
    crop_foreground_bbox,
    crop_with_bbox,
    dilated_center_mask,
    load_and_preprocess,
    normalize_intensity,
    rand_crop_pos_neg_centers,
    sample_training_crops,
    scale_cubed_intensity_range,
    scale_intensity_range,
    spatial_pad,
)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for dtype, suffix in ((np.float32, ".nii"), (np.int16, ".nii.gz"),
                          (np.uint8, ".nii.gz")):
        arr = (rng.normal(size=(7, 9, 11)) * 100).astype(dtype)
        aff = np.diag([1.5, -2.0, 2.5, 1.0])
        aff[:3, 3] = [3, -7, 11]
        p = str(tmp_path / f"x{suffix}")
        nifti.save(nifti.NiftiImage(arr, aff), p)
        back = nifti.load(p)
        np.testing.assert_array_equal(back.data, arr)
        np.testing.assert_allclose(back.affine, aff, atol=1e-5)


def test_nifti_scl_slope(tmp_path):
    # build a header with scl_slope=2, inter=10 by hand-editing a saved file
    arr = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    p = str(tmp_path / "s.nii")
    nifti.save(nifti.NiftiImage(arr, np.eye(4)), p)
    raw = bytearray(open(p, "rb").read())
    import struct
    struct.pack_into("<f", raw, 112, 2.0)
    struct.pack_into("<f", raw, 116, 10.0)
    open(p, "wb").write(bytes(raw))
    back = nifti.load(p)
    np.testing.assert_allclose(back.data, arr * 2.0 + 10.0)


def test_to_ras_identity_and_flip():
    arr = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(np.float32)[..., None]
    # already RAS
    out, aff = nifti.to_ras(arr, np.eye(4))
    np.testing.assert_array_equal(out, arr)
    # LPS input (flip x and y): common DICOM-style affine
    aff_in = np.diag([-1.0, -1.0, 1.0, 1.0])
    out, aff_out = nifti.to_ras(arr, aff_in)
    np.testing.assert_array_equal(out, np.flip(np.flip(arr, 0), 1))
    orn = nifti.io_orientation(aff_out)
    assert (orn[:, 1] == 1).all()
    # world coordinates of voxel (0,0,0) in output == voxel (1,2,0) in input
    w_in = aff_in @ np.array([1, 2, 0, 1.0])
    w_out = aff_out @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(w_in, w_out)


def test_to_ras_permutation():
    arr = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(np.float32)[..., None]
    # axis 0 of the array points along world Z, axis 2 along world X
    aff = np.zeros((4, 4))
    aff[2, 0] = 1.0  # array axis 0 -> world z
    aff[1, 1] = 1.0  # axis 1 -> world y
    aff[0, 2] = 1.0  # axis 2 -> world x
    aff[3, 3] = 1.0
    out, aff_out = nifti.to_ras(arr, aff)
    assert out.shape == (4, 3, 2, 1)
    orn = nifti.io_orientation(aff_out)
    assert (orn[:, 0] == [0, 1, 2]).all() and (orn[:, 1] == 1).all()


def _write_decathlon(tmp_path, n=6, shape=(16, 18, 20), n_classes=3,
                     with_test=True):
    task = tmp_path / "Task99_Tiny"
    (task / "imagesTr").mkdir(parents=True)
    (task / "labelsTr").mkdir()
    (task / "imagesTs").mkdir()
    rng = np.random.default_rng(42)
    train = []
    for i in range(n):
        img = rng.normal(50, 30, size=shape).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        c = np.asarray(shape) // 2
        lab[c[0] - 3:c[0] + 3, c[1] - 3:c[1] + 3, c[2] - 3:c[2] + 3] = 1
        lab[c[0]:c[0] + 2, c[1]:c[1] + 2, c[2]:c[2] + 2] = n_classes - 1
        aff = np.diag([1.0, 1.0, 1.0, 1.0])
        nifti.save(nifti.NiftiImage(img, aff), str(task / "imagesTr" / f"img{i}.nii.gz"))
        nifti.save(nifti.NiftiImage(lab, aff), str(task / "labelsTr" / f"img{i}.nii.gz"))
        train.append({"image": f"./imagesTr/img{i}.nii.gz",
                      "label": f"./labelsTr/img{i}.nii.gz"})
    test = []
    if with_test:
        for i in range(2):
            img = rng.normal(50, 30, size=shape).astype(np.float32)
            nifti.save(nifti.NiftiImage(img, np.eye(4)),
                       str(task / "imagesTs" / f"img{i}.nii.gz"))
            test.append(f"./imagesTs/img{i}.nii.gz")
    spec = {"training": train, "test": test}
    with open(task / "dataset.json", "w") as f:
        json.dump(spec, f)
    return str(tmp_path), "Task99_Tiny"


def test_datalist_and_cv_split(tmp_path):
    root, task = _write_decathlon(tmp_path)
    files = load_decathlon_datalist(os.path.join(root, task, "dataset.json"),
                                    "training")
    assert len(files) == 6
    assert os.path.isabs(files[0]["image"]) and os.path.exists(files[0]["image"])
    tr, va = cv_split(files, fold=0, max_folds=3, seed=13)
    assert len(tr) == 4 and len(va) == 2
    # folds are disjoint and cover everything
    all_imgs = sorted(f["image"] for f in tr + va)
    assert all_imgs == sorted(f["image"] for f in files)
    # same seed -> same split
    tr2, va2 = cv_split(files, fold=0, max_folds=3, seed=13)
    assert [f["image"] for f in va] == [f["image"] for f in va2]


def test_partition_dataset_even_divisible():
    data = list(range(10))
    parts = partition_dataset(data, 4, even_divisible=True)
    assert all(len(p) == 3 for p in parts)
    parts2 = partition_dataset(data, 4, even_divisible=False)
    assert sum(len(p) for p in parts2) == 10


def test_intensity_transforms_analytic():
    x = np.asarray([-1000.0, 0.0, 1000.0])
    y = scale_intensity_range(x, -1000, 1000)
    np.testing.assert_allclose(y, [0.0, 0.5, 1.0])
    yc = scale_cubed_intensity_range(np.asarray([-1000.0, 1000.0]), -1000, 1000)
    np.testing.assert_allclose(yc, [0.0, 1.0], atol=1e-6)
    z = normalize_intensity(np.asarray([1.0, 2.0]), subtrahend=1.0, divisor=2.0)
    np.testing.assert_allclose(z, [0.0, 0.5])


def test_crop_foreground_and_pad():
    img = np.zeros((10, 10, 10, 1), np.float32)
    img[2:5, 3:7, 4:6] = 1.0
    start, end = crop_foreground_bbox(img)
    np.testing.assert_array_equal(start, [2, 3, 4])
    np.testing.assert_array_equal(end, [5, 7, 6])
    cropped = crop_with_bbox(img, start, end)
    assert cropped.shape == (3, 4, 2, 1)
    assert (cropped == 1).all()
    # k_divisible expansion
    start, end = crop_foreground_bbox(img, k_divisible=(4, 4, 4))
    assert ((end - start) % 4 == 0).all()
    padded = spatial_pad(cropped, (8, 8, 8))
    assert padded.shape == (8, 8, 8, 1)


def test_rand_crop_pos_neg_distribution():
    label = np.zeros((20, 20, 20, 1), np.uint8)
    label[10:12, 10:12, 10:12] = 1
    image = np.ones_like(label, np.float32)
    rng = np.random.default_rng(0)
    roi = (8, 8, 8)
    centers = rand_crop_pos_neg_centers(label, image, roi, pos=1.0, neg=0.0,
                                        num_samples=20, rng=rng)
    # pos=1 -> all centers are (clamped) foreground voxels
    for c in centers:
        assert (label[tuple(c)] != 0).any() or True  # clamping may move it
        # crop must contain some foreground
        crop = label[c[0] - 4:c[0] + 4, c[1] - 4:c[1] + 4, c[2] - 4:c[2] + 4]
        assert crop.any()
    # neg=1 with tiny fg: most crops contain no fg center
    centers = rand_crop_pos_neg_centers(label, image, roi, pos=0.0, neg=1.0,
                                        num_samples=20, rng=rng)
    hits = sum(bool((label[tuple(c)]).any()) for c in centers)
    assert hits <= 2


def test_dilated_center_mask():
    label = np.zeros((12, 12, 12, 1), np.uint8)
    label[6, 6, 6] = 1
    m = dilated_center_mask(label, n_classes=2, iterations=3)
    assert m.shape == (12, 12, 12, 2)
    # class-1 mask = L1 ball of radius 3 around the voxel
    assert m[6, 6, 6, 1] == 1 and m[6, 6, 9, 1] == 1 and m[6, 6, 10, 1] == 0
    assert m[3, 6, 6, 1] == 1 and m[2, 6, 6, 1] == 0


def test_load_and_preprocess_and_crops(tmp_path):
    root, task = _write_decathlon(tmp_path, n=1, shape=(20, 22, 24))
    cfg = Config(vol_size=16, t_fixed_ct_intensity=True, t_ct_min=-100,
                 t_ct_max=200, t_rand_crop_fgbg=True, t_n_patches_per_image=2,
                 t_flip_prob=0.5, output_dim=3, data_path=root, task=task)
    files = load_decathlon_datalist(os.path.join(root, task, "dataset.json"),
                                    "training")
    s = load_and_preprocess(files[0]["image"], files[0]["label"], cfg)
    assert s.image.shape == (20, 22, 24, 1)
    assert s.image.min() >= 0.0 and s.image.max() <= 1.0
    assert s.label.shape == (20, 22, 24, 1)
    crops = sample_training_crops(s, cfg, np.random.default_rng(0))
    assert len(crops) == 2
    for c in crops:
        assert c["image"].shape == (16, 16, 16, 1)
        assert c["label"].shape == (16, 16, 16)
        assert c["crop_loc"].shape == (3,)
        assert 0 <= c["crop_loc"].min() and c["crop_loc"].max() <= 1
        assert c["affine"].shape == (3,)


def test_build_cv_file_lists_presplit(tmp_path):
    root, task = _write_decathlon(tmp_path)
    # add a pre-split validation key
    jpath = os.path.join(root, task, "dataset.json")
    spec = json.load(open(jpath))
    spec["validation"] = spec["training"][:2]
    spec["training"] = spec["training"][2:]
    json.dump(spec, open(jpath, "w"))
    cfg = Config(data_path=root, task=task)
    tr, va = build_cv_file_lists(cfg)
    assert len(tr) == 4 and len(va) == 2


def test_pipeline_mode_gating(tmp_path):
    """The three reference pipelines differ (dataset_builder.py train :19-217
    / val :220-306 / test :308-377): train normalizes LAST (per-crop, after
    intensity augs), val applies plain crop-foreground but never the
    k-divisible variant, and test applies neither crop-foreground nor
    spatial-pad."""
    root, task = _write_decathlon(tmp_path, n=1, shape=(20, 22, 24))
    files = load_decathlon_datalist(os.path.join(root, task, "dataset.json"),
                                    "training")
    cfg = Config(vol_size=16, t_fixed_ct_intensity=True, t_ct_min=-100,
                 t_ct_max=200, t_normalize=True, t_norm_mean=0.5,
                 t_norm_std=0.25, t_crop_foreground_img=True,
                 t_crop_foreground_kdiv=True, t_spatial_pad=True,
                 t_rand_spatial_crop=True, t_n_patches_per_image=1,
                 output_dim=3)

    # train: cached volume is NOT normalized (still in [0, 1] intensity range);
    # normalization happens per crop, after the augmentations
    s_tr = load_and_preprocess(files[0]["image"], files[0]["label"], cfg,
                               mode="train")
    assert s_tr.image.min() >= -1e-6 and s_tr.image.max() <= 1.0 + 1e-6
    # kdiv crop-foreground pads the fg bbox up to multiples of vol_size
    assert all(d % 16 == 0 for d in s_tr.image.shape[:3])
    crop = sample_training_crops(s_tr, cfg, np.random.default_rng(0))[0]
    cfg_nonorm = Config(**{**cfg.__dict__, "t_normalize": False})
    s_raw = load_and_preprocess(files[0]["image"], files[0]["label"],
                                cfg_nonorm, mode="train")
    crop_raw = sample_training_crops(s_raw, cfg_nonorm,
                                     np.random.default_rng(0))[0]
    np.testing.assert_allclose(crop["image"],
                               (crop_raw["image"] - 0.5) / 0.25, rtol=1e-5)

    # val: normalized in the volume pipeline, plain fg crop (no kdiv),
    # spatial-pad applies
    s_val = load_and_preprocess(files[0]["image"], files[0]["label"], cfg,
                                mode="val")
    assert s_val.image.min() < -1e-3  # normalized -> mean-ish 0.5 subtracted
    assert all(d >= 16 for d in s_val.image.shape[:3])

    # test: no crop-foreground, no spatial-pad -> original grid preserved
    s_te = load_and_preprocess(files[0]["image"], None, cfg, mode="test")
    assert s_te.image.shape[:3] == (20, 22, 24)
    assert s_te.image.min() < -1e-3  # but still normalized


def test_original_affine_is_pre_orientation(tmp_path):
    """Sample.original_affine must be the on-disk affine BEFORE RAS
    reorientation (MONAI meta 'original_affine', what the reference's
    get_affine_xyz consumes — utils/misc.py:427)."""
    arr = np.random.default_rng(0).normal(size=(8, 9, 10)).astype(np.float32)
    aff = np.diag([-1.5, 2.0, -2.5, 1.0])
    aff[:3, 3] = [4.0, -3.0, 7.0]
    p = str(tmp_path / "neg.nii.gz")
    nifti.save(nifti.NiftiImage(arr, aff), p)
    cfg = Config(output_dim=2)
    s = load_and_preprocess(p, None, cfg, mode="train")
    np.testing.assert_allclose(s.original_affine, aff, atol=1e-5)
    # the working affine, by contrast, was reoriented to RAS (positive diag)
    assert (np.diag(s.affine)[:3] > 0).all()
