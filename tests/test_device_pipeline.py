"""Device-resident data pipeline tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.data.dataset import CachedVolumeDataset
from medicalsemseg_tpu.data.datalist import load_decathlon_datalist
from medicalsemseg_tpu.data.device_pipeline import (
    DeviceCachedDataset,
    DeviceTrainLoader,
    _extract_and_augment,
)

from tests.test_nifti_data import _write_decathlon


def test_extract_and_augment_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(24, 24, 24, 1)).astype(np.float32)
    lab = rng.integers(0, 3, (24, 24, 24)).astype(np.int32)
    roi = (8, 8, 8)
    center = np.asarray([10, 12, 9])
    start = center - 4

    # no augmentation: pure crop
    got_i, got_l = _extract_and_augment(
        jnp.asarray(img), jnp.asarray(lab), jnp.asarray(center, jnp.int32),
        jnp.zeros(3, bool), jnp.asarray(0), jnp.float32(0), jnp.float32(1),
        jnp.float32(0), jnp.float32(1), roi=roi)
    want_i = img[start[0]:start[0] + 8, start[1]:start[1] + 8,
                 start[2]:start[2] + 8]
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_array_equal(
        np.asarray(got_l), lab[start[0]:start[0] + 8, start[1]:start[1] + 8,
                               start[2]:start[2] + 8])

    # flips + rot90 + intensity
    got_i, got_l = _extract_and_augment(
        jnp.asarray(img), jnp.asarray(lab), jnp.asarray(center, jnp.int32),
        jnp.asarray([True, False, True]), jnp.asarray(2), jnp.float32(0.5),
        jnp.float32(2.0), jnp.float32(0), jnp.float32(1), roi=roi)
    want = np.flip(np.flip(want_i, 0), 2)
    want = np.rot90(want, 2, axes=(0, 1)) * 2.0 + 0.5
    np.testing.assert_allclose(np.asarray(got_i), want, rtol=1e-6)


@pytest.fixture(scope="module")
def device_ds(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("devpipe")
    root, task = _write_decathlon(tmp, n=4, shape=(18, 20, 22))
    cfg = Config(vol_size=16, t_fixed_ct_intensity=True, t_ct_min=-50,
                 t_ct_max=150, t_rand_crop_fgbg=True, t_flip_prob=0.5,
                 t_n_patches_per_image=2, n_images_per_batch=2, output_dim=3)
    files = load_decathlon_datalist(f"{root}/{task}/dataset.json", "training")
    host = CachedVolumeDataset(files, cfg)
    return DeviceCachedDataset(host, cfg), cfg


def test_device_dataset_shapes_and_residency(device_ds):
    ds, cfg = device_ds
    assert len(ds) == 4
    for img, lab in zip(ds.images, ds.labels):
        assert isinstance(img, jax.Array) and isinstance(lab, jax.Array)
        assert img.shape[:3] == lab.shape
        # bucket-padded to multiples of 32 and >= roi
        assert all(s % 32 == 0 for s in lab.shape)
    crop = ds.sample_crop(0, np.random.default_rng(0))
    assert crop["image"].shape == (16, 16, 16, 1)
    assert crop["label"].shape == (16, 16, 16)


def test_device_loader_batches(device_ds):
    ds, cfg = device_ds
    loader = DeviceTrainLoader(ds, cfg, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch() == 2
    b = batches[0]
    assert b["image"].shape == (4, 16, 16, 16, 1)  # 2 imgs x 2 crops
    assert b["label"].shape == (4, 16, 16, 16)
    assert b["crop_loc"].shape == (4, 3)
    assert float(jnp.abs(b["image"]).max()) > 0


def test_fg_sampling_hits_foreground(device_ds):
    ds, cfg = device_ds
    rng = np.random.default_rng(3)
    hits = 0
    for _ in range(10):
        crop = ds.sample_crop(0, rng)
        hits += int((np.asarray(crop["label"]) != 0).any())
    assert hits >= 8  # pos weight 1.0/1.0 -> at least the fg half must hit


def test_device_channel_norm_matches_host():
    """norm='channel' in _extract_and_augment must match the host
    NormalizeIntensityd(nonzero=True, channel_wise=True) semantics applied to
    the augmented crop (reference train order: normalize last)."""
    from medicalsemseg_tpu.data.transforms import normalize_intensity

    rng = np.random.default_rng(7)
    img = rng.normal(size=(16, 16, 16, 2)).astype(np.float32)
    img[img < -0.5] = 0.0  # ensure a real nonzero mask
    lab = rng.integers(0, 3, (16, 16, 16)).astype(np.int32)
    roi = (8, 8, 8)
    center = np.asarray([8, 8, 8])

    got_i, _ = _extract_and_augment(
        jnp.asarray(img), jnp.asarray(lab), jnp.asarray(center, jnp.int32),
        jnp.zeros(3, bool), jnp.asarray(0), jnp.float32(0.25), jnp.float32(1.5),
        jnp.float32(0), jnp.float32(1), roi=roi, norm="channel")

    crop = img[4:12, 4:12, 4:12] * 1.5 + 0.25
    want = normalize_intensity(crop, nonzero=True, channel_wise=True)
    np.testing.assert_allclose(np.asarray(got_i), want, rtol=2e-5, atol=2e-6)


def test_device_scalar_norm():
    rng = np.random.default_rng(8)
    img = rng.normal(size=(16, 16, 16, 1)).astype(np.float32)
    lab = np.zeros((16, 16, 16), np.int32)
    got_i, _ = _extract_and_augment(
        jnp.asarray(img), jnp.asarray(lab), jnp.asarray([8, 8, 8], jnp.int32),
        jnp.zeros(3, bool), jnp.asarray(0), jnp.float32(0), jnp.float32(1),
        jnp.float32(0.5), jnp.float32(0.25), roi=(8, 8, 8), norm="scalar")
    want = (img[4:12, 4:12, 4:12] - 0.5) / 0.25
    np.testing.assert_allclose(np.asarray(got_i), want, rtol=1e-6)
