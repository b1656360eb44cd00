"""Sliding-window inference tests: grid semantics, blending math, parity with
a straightforward NumPy re-implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.infer.sliding_window import (
    dense_patch_starts,
    gaussian_importance_map,
    scan_interval,
    sliding_window_inference,
)


def test_scan_interval_semantics():
    # roi == image -> interval = roi (single window per dim)
    assert scan_interval((96, 96, 96), (96, 96, 96), 0.5) == (96, 96, 96)
    assert scan_interval((240, 240, 140), (96, 96, 96), 0.5) == (48, 48, 48)
    assert scan_interval((100, 100, 100), (96, 96, 96), 0.99) == (1, 1, 1)


def test_dense_patch_starts_cover_and_clamp():
    starts = dense_patch_starts((240, 240, 140), (96, 96, 96), (48, 48, 48))
    assert len(starts) == 4 * 4 * 2
    assert starts.min() >= 0
    assert (starts + 96 <= np.asarray([240, 240, 140])).all()
    # full coverage: union of windows covers every voxel along each dim
    for d, size in enumerate((240, 240, 140)):
        cov = np.zeros(size, bool)
        for s in np.unique(starts[:, d]):
            cov[s:s + 96] = True
        assert cov.all()


def test_gaussian_importance_map_properties():
    g = gaussian_importance_map((16, 16, 16), 0.125)
    assert g.shape == (16, 16, 16)
    assert g.max() == 1.0
    assert np.unravel_index(g.argmax(), g.shape) == (8, 8, 8)
    assert g.min() > 0  # clamped positive
    # separable symmetry around the center (away from the clamp floor)
    assert np.allclose(g[7], g[9], rtol=1e-6)


def _np_sliding_window(vol, roi, overlap, predictor_np, n_cls, mode="gaussian"):
    """Direct NumPy port of the reference algorithm (engine/utils.py:96-159)."""
    d, h, w = vol.shape[:3]
    image_size = tuple(max(vol.shape[i], roi[i]) for i in range(3))
    pads = []
    for i in range(3):
        diff = max(roi[i] - vol.shape[i], 0)
        pads.append((diff // 2, diff - diff // 2))
    x = np.pad(vol, pads + [(0, 0)])
    interval = scan_interval(image_size, roi, overlap)
    starts = dense_patch_starts(image_size, roi, interval)
    imap = (gaussian_importance_map(roi) if mode == "gaussian"
            else np.ones(roi, np.float32))[..., None]
    out = np.zeros(image_size + (n_cls,), np.float32)
    cnt = np.zeros(image_size + (1,), np.float32)
    for s in starts:
        win = x[s[0]:s[0] + roi[0], s[1]:s[1] + roi[1], s[2]:s[2] + roi[2]]
        prob = predictor_np(win)
        sl = tuple(slice(s[i], s[i] + roi[i]) for i in range(3))
        out[sl] += imap * prob
        cnt[sl] += imap
    res = out / cnt
    sl = tuple(slice(pads[i][0], pads[i][0] + vol.shape[i]) for i in range(3))
    return res[sl]


@pytest.mark.parametrize("mode", ["gaussian", "constant"])
@pytest.mark.parametrize("shape,overlap", [((20, 24, 28), 0.5),
                                           ((17, 16, 33), 0.25)])
def test_matches_numpy_reference(mode, shape, overlap):
    rng = np.random.default_rng(0)
    vol = rng.normal(size=shape + (2,)).astype(np.float32)
    roi = (16, 16, 16)
    w = rng.normal(size=(2, 3)).astype(np.float32)

    def predictor_np(win):  # linear per-voxel "model"
        return win @ w

    def predictor_jax(model_in):
        return model_in[0] @ jnp.asarray(w)

    got = sliding_window_inference(jnp.asarray(vol)[None], jnp.ones((1, 3)),
                                   roi, 3, predictor_jax, overlap=overlap,
                                   mode=mode, n_classes=3)
    want = _np_sliding_window(vol, roi, overlap, predictor_np, 3, mode)
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-4, atol=1e-5)


def test_predictor_receives_centers_and_affine():
    """The tuple contract: centers normalized per the reference
    (engine/utils.py:126-132) and affine broadcast per window. The predictor
    echoes centers+affine into its output channels; with overlap 0 each voxel
    is covered by exactly one window, so the blended output IS that window's
    metadata."""

    def predictor(model_in):
        win, centers, affine = model_in
        meta = jnp.concatenate([centers, affine], axis=-1)  # (N, 6)
        return jnp.broadcast_to(meta[:, None, None, None, :],
                                win.shape[:-1] + (6,))

    vol = jnp.zeros((1, 16, 16, 32, 1))
    aff = jnp.asarray([[1.5, 1.5, 2.0]])
    out = np.asarray(sliding_window_inference(
        vol, aff, (16, 16, 16), 2, predictor, overlap=0.0, n_classes=6))
    # first window starts at 0: center = (0 + 16 - 8)/dim
    np.testing.assert_allclose(out[0, 0, 0, 0], [0.5, 0.5, 8 / 32,
                                                 1.5, 1.5, 2.0], rtol=1e-6)
    # last window along axis 2 starts at 16: center = (16 + 16 - 8)/32
    np.testing.assert_allclose(out[0, 0, 0, 31, :3], [0.5, 0.5, 24 / 32],
                               rtol=1e-6)


def test_jit_compatible():
    def predictor(model_in):
        return jnp.repeat(model_in[0], 2, axis=-1)

    @jax.jit
    def run(vol):
        return sliding_window_inference(vol, jnp.ones((1, 3)), (8, 8, 8), 2,
                                        predictor, overlap=0.5, n_classes=2)

    out = run(jnp.ones((1, 12, 12, 12, 1)))
    assert out.shape == (1, 12, 12, 12, 2)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


def test_sharded_matches_single_device():
    """Window-sharded inference over the 8-dev mesh == single-device result."""
    from medicalsemseg_tpu.infer.sliding_window import (
        sliding_window_inference_sharded)
    from medicalsemseg_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.normal(size=(1, 20, 24, 28, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))

    def predictor(model_in):
        return model_in[0] @ w

    aff = jnp.ones((1, 3))
    want = sliding_window_inference(vol, aff, (16, 16, 16), 3, predictor,
                                    overlap=0.5, mode="gaussian", n_classes=3)
    mesh = create_mesh()
    got = sliding_window_inference_sharded(vol, aff, (16, 16, 16), predictor,
                                           mesh, overlap=0.5, mode="gaussian",
                                           n_classes=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_mirror_tta_symmetric_predictor_invariant():
    """A flip-equivariant predictor gives identical results with TTA; a
    non-equivariant one is symmetrized."""
    from medicalsemseg_tpu.infer.tta import mirror_tta

    rng = np.random.default_rng(9)
    win = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 1)).astype(np.float32))

    def equivariant(model_in):  # pointwise: trivially flip-equivariant
        x = model_in[0]
        return jnp.concatenate([x, -x], axis=-1)

    base = jax.nn.softmax(equivariant((win, None, None)), -1)
    tta = mirror_tta(equivariant)((win, None, None))
    np.testing.assert_allclose(np.asarray(tta), np.asarray(base),
                               rtol=1e-5, atol=1e-5)

    def asymmetric(model_in):  # depends on absolute position
        x = model_in[0]
        ramp = jnp.arange(x.shape[1], dtype=jnp.float32)[None, :, None, None, None]
        return jnp.concatenate([x + ramp, -x], axis=-1)

    out = np.asarray(mirror_tta(asymmetric)((win, None, None)))
    # flipping the input must flip the TTA output exactly (symmetrization)
    out_f = np.asarray(mirror_tta(asymmetric)((jnp.flip(win, 1), None, None)))
    np.testing.assert_allclose(out_f, np.flip(out, 1), rtol=1e-5, atol=1e-5)


def test_tta_stitched_output_matches_prob_domain_oracle():
    """Mirror-TTA + sliding window must equal a prob-domain NumPy oracle:
    per window, mean of softmax over the 8 flips; across windows, a
    Gaussian-weighted ARITHMETIC mean of probabilities (nn-UNet semantics,
    reference neural_network.py:511 + :349-375). A log-domain blend (the old
    behavior) is a geometric mean and fails this test near window seams."""
    from medicalsemseg_tpu.infer.tta import mirror_tta

    rng = np.random.default_rng(5)
    shape, roi = (20, 18, 24), (16, 16, 16)
    vol = rng.normal(size=shape + (1,)).astype(np.float32)
    w = rng.normal(size=(1, 3)).astype(np.float32) * 3.0

    def predictor_jax(model_in):
        return model_in[0] @ jnp.asarray(w)  # asymmetric under flips

    def _softmax_np(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    def predictor_np_tta(win):
        acc = np.zeros(win.shape[:-1] + (3,), np.float32)
        import itertools as it
        combos = []
        for r in range(4):
            combos.extend(it.combinations((0, 1, 2), r))
        for combo in combos:
            wf = np.flip(win, combo) if combo else win
            logits = wf @ w
            logits = np.flip(logits, combo) if combo else logits
            acc += _softmax_np(logits)
        return acc / len(combos)

    got = sliding_window_inference(
        jnp.asarray(vol)[None], jnp.ones((1, 3)), roi, 3,
        mirror_tta(predictor_jax, axes=(1, 2, 3)), overlap=0.5,
        mode="gaussian", n_classes=3)
    want = _np_sliding_window(vol, roi, 0.5, predictor_np_tta, 3, "gaussian")
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-4, atol=1e-5)
    # blended output is a probability field
    np.testing.assert_allclose(np.asarray(got[0]).sum(-1), 1.0, atol=1e-4)


def test_class_major_probs_matches_default():
    """class_major_probs consumes (n_cls, N, *roi) predictor output and must
    blend BIT-IDENTICALLY to the default channels-last path (same f32
    arithmetic, only the materialized layout differs)."""
    rng = np.random.default_rng(3)
    vol = rng.normal(size=(1, 24, 20, 24, 2)).astype(np.float32)
    roi = (16, 16, 16)
    w = rng.normal(size=(2, 3)).astype(np.float32)

    def predictor(model_in):
        return model_in[0] @ jnp.asarray(w)

    def predictor_cm(model_in):
        return (model_in[0] @ jnp.asarray(w)).transpose(4, 0, 1, 2, 3)

    base = sliding_window_inference(
        jnp.asarray(vol), jnp.ones((1, 3)), roi, 3, predictor,
        overlap=0.5, mode="gaussian", n_classes=3)
    cm = sliding_window_inference(
        jnp.asarray(vol), jnp.ones((1, 3)), roi, 3, predictor_cm,
        overlap=0.5, mode="gaussian", n_classes=3, class_major_probs=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cm))
