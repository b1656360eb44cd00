"""Native C++ data-loader kernel tests (skipped if the library isn't built)."""

import numpy as np
import pytest

from medicalsemseg_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_trilinear_matches_scipy():
    from scipy.ndimage import map_coordinates

    rng = np.random.default_rng(0)
    vol = rng.normal(size=(20, 24, 28)).astype(np.float32)
    out_shape = (31, 17, 40)
    got = native.resample_trilinear(vol, out_shape)
    scale = np.asarray(vol.shape) / np.asarray(out_shape)
    grid = np.meshgrid(*[(np.arange(out_shape[i]) + 0.5) * scale[i] - 0.5
                         for i in range(3)], indexing="ij")
    want = map_coordinates(vol, grid, order=1, mode="nearest")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_trilinear_identity():
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(8, 9, 10)).astype(np.float32)
    got = native.resample_trilinear(vol, vol.shape)
    np.testing.assert_allclose(got, vol, rtol=1e-6, atol=1e-6)


def test_fused_window():
    rng = np.random.default_rng(2)
    vol = rng.uniform(-200, 400, size=(10, 10, 10)).astype(np.float32)
    got = native.resample_trilinear(vol, (10, 10, 10), window=(-50.0, 150.0))
    want = np.clip((vol + 50.0) / 200.0, 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nearest_identity_and_values():
    rng = np.random.default_rng(3)
    lab = rng.integers(0, 7, size=(9, 11, 13)).astype(np.int32)
    got = native.resample_nearest(lab, lab.shape)
    np.testing.assert_array_equal(got, lab)
    up = native.resample_nearest(lab, (18, 22, 26))
    # upsampled labels only contain original values
    assert set(np.unique(up)).issubset(set(np.unique(lab)))


def test_spacing_resample_uses_native():
    from medicalsemseg_tpu.ops.resize import spacing_resample_np

    rng = np.random.default_rng(4)
    vol = rng.normal(size=(16, 18, 20, 1)).astype(np.float32)
    aff = np.diag([2.0, 2.0, 2.5, 1.0])
    out, new_aff = spacing_resample_np(vol, aff, (1.0, 1.0, 1.0))
    assert out.shape == (32, 36, 50, 1)
    sp = np.sqrt((new_aff[:3, :3] ** 2).sum(0))
    np.testing.assert_allclose(sp, [1.0, 1.0, 1.0], atol=1e-9)
