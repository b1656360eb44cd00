"""Window primitive tests: round-trips, mask structure, index-table symmetry."""

import jax
import jax.numpy as jnp
import numpy as np

from medicalsemseg_tpu.ops.window import (
    pad_to_multiple,
    relative_position_index,
    resolve_window,
    shift_window_attn_mask,
    window_partition,
    window_reverse,
)


def test_partition_reverse_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 6, 5)).astype(np.float32))
    for ws in (2, 3, 6):
        w = window_partition(x, ws)
        n_win = (6 // ws) ** 3
        assert w.shape == (2 * n_win, ws ** 3, 5)
        back = window_reverse(w, ws, (6, 6, 6))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_partition_window_contents():
    # windows must contain contiguous ws-cubes in depth-major order
    d = h = w = 4
    vol = jnp.arange(d * h * w, dtype=jnp.float32).reshape(1, d, h, w, 1)
    wins = window_partition(vol, 2)
    # first window = voxels with all coords < 2
    expect = np.asarray(vol[0, :2, :2, :2, 0]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(wins[0, :, 0]), expect)
    # window ordering: second window moves along the last axis
    expect_w1 = np.asarray(vol[0, :2, :2, 2:, 0]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(wins[1, :, 0]), expect_w1)


def test_pad_to_multiple():
    x = jnp.ones((1, 5, 6, 7, 2))
    y = pad_to_multiple(x, (3, 3, 3))
    assert y.shape == (1, 6, 6, 9, 2)
    assert float(y.sum()) == float(x.sum())  # zero padding


def test_shift_mask_properties():
    ws, ss = 2, 1
    dims = (4, 4, 4)
    mask = np.asarray(shift_window_attn_mask(dims, ws, ss))
    n_win = (4 // ws) ** 3
    assert mask.shape == (n_win, ws ** 3, ws ** 3)
    # entries are exactly 0 or -100
    assert set(np.unique(mask)).issubset({0.0, -100.0})
    # diagonal is always visible
    for w in range(n_win):
        np.testing.assert_array_equal(np.diag(mask[w]), np.zeros(ws ** 3))
    # the first (interior) window has no boundary crossings
    np.testing.assert_array_equal(mask[0], np.zeros((ws ** 3, ws ** 3)))
    # some window must have masked pairs (shifted regions differ)
    assert (mask == -100.0).any()


def test_relative_position_index():
    idx = relative_position_index((2, 2, 2))
    assert idx.shape == (8, 8)
    assert idx.min() >= 0 and idx.max() < 27  # (2*2-1)**3
    # self-pairs map to the centre entry
    center = idx[0, 0]
    assert all(idx[i, i] == center for i in range(8))
    # relative index table is mirror-consistent: idx[i,j] determined by coord diff
    # check translation invariance: pairs with equal offset share the index
    assert idx[0, 1] == idx[2, 3]


def test_resolve_window_clamps():
    assert resolve_window((4, 4, 4), 6, 3) == (4, 0)
    assert resolve_window((8, 8, 8), 6, 3) == (6, 3)
