"""Tap-decomposed conv weight gradient: parity with XLA autodiff, and the
Conv3d fast path must keep the exact nn.Conv parameter tree."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from medicalsemseg_tpu.models.layers import Conv3d
from medicalsemseg_tpu.ops.convgrad import conv3x3x3_s1, _conv


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


def test_forward_matches_xla():
    x = _rand((2, 5, 6, 7, 4), seed=1)
    w = _rand((3, 3, 3, 4, 8), seed=2, scale=0.2)
    np.testing.assert_allclose(np.asarray(conv3x3x3_s1(x, w)),
                               np.asarray(_conv(x, w)), rtol=2e-5, atol=2e-5)


def test_gradients_match_autodiff():
    x = _rand((2, 4, 5, 6, 3), seed=3)
    w = _rand((3, 3, 3, 3, 5), seed=4, scale=0.2)
    cot = _rand((2, 4, 5, 6, 5), seed=5)

    def loss(fn, x, w):
        return (fn(x, w) * cot).sum()

    gx, gw = jax.grad(lambda a, b: loss(conv3x3x3_s1, a, b), (0, 1))(x, w)
    rx, rw = jax.grad(lambda a, b: loss(_conv, a, b), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)


def test_skinny_channel_dw_stacked_path_matches_autodiff(monkeypatch):
    """C=1 (stem/encoder0) takes the stacked-im2col dW dot, at any size —
    including above the tap-decomposition's voxel threshold."""
    from medicalsemseg_tpu.ops import convgrad

    monkeypatch.setattr(convgrad, "_DW27_MAX_VOXELS", 100)  # force over
    x = _rand((2, 6, 8, 10, 1), seed=11)
    w = _rand((3, 3, 3, 1, 8), seed=12, scale=0.2)
    cot = _rand((2, 6, 8, 10, 8), seed=13)

    gw = jax.grad(lambda b: (conv3x3x3_s1(x, b) * cot).sum())(w)
    rw = jax.grad(lambda b: (_conv(x, b) * cot).sum())(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)


def test_patchify_conv_matches_native_and_autodiff():
    """conv_patchify: primal == native k=s conv; the s2d-matmul train
    direction (fwd under grad, dx, dw) matches XLA autodiff."""
    from medicalsemseg_tpu.ops.convgrad import conv_patchify, _conv_ks

    patch = (2, 2, 2)
    x = _rand((2, 4, 6, 8, 3), seed=21)
    w = _rand((2, 2, 2, 3, 16), seed=22, scale=0.3)
    cot = _rand((2, 2, 3, 4, 16), seed=23)

    np.testing.assert_allclose(
        np.asarray(conv_patchify(x, w, patch)),
        np.asarray(_conv_ks(x, w, patch)), rtol=2e-5, atol=2e-5)

    def loss(fn):
        return jax.grad(lambda a, b: (fn(a, b) * cot).sum(), (0, 1))(x, w)

    (gx, gw) = loss(lambda a, b: conv_patchify(a, b, patch))
    (rx, rw) = loss(lambda a, b: _conv_ks(a, b, patch))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)

    # value under grad (the matmul forward) also matches the native conv
    y_train, _ = jax.vjp(lambda a: conv_patchify(a, w, patch), x)
    np.testing.assert_allclose(np.asarray(y_train),
                               np.asarray(_conv_ks(x, w, patch)),
                               rtol=2e-5, atol=2e-5)


def test_conv1x1_dot_path_matches_nnconv():
    """Conv3d's 1x1x1 branch: values and grads match nn.Conv, params
    identical (Conv_0/{kernel,bias})."""
    x = _rand((2, 4, 5, 6, 8), seed=31)

    fast = Conv3d(12, kernel_size=(1, 1, 1), strides=(1, 1, 1))
    ref = nn.Conv(12, kernel_size=(1, 1, 1), strides=(1, 1, 1),
                  padding="SAME")

    vf = fast.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    # Conv3d nests the params one level down under the nn.Conv auto-name, so
    # a checkpoint saved against nn.Conv loads unchanged
    fshapes = jax.tree.map(lambda a: a.shape, vf["params"]["Conv_0"])
    rshapes = jax.tree.map(lambda a: a.shape, vr["params"])
    assert fshapes == rshapes, (fshapes, rshapes)

    vshared = {"params": {"Conv_0": vr["params"]}}
    yf = fast.apply(vshared, x)
    yr = ref.apply(vr, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=2e-5, atol=2e-5)

    gf = jax.grad(lambda v: (fast.apply(v, x) ** 2).sum())(vshared)
    gr = jax.grad(lambda v: (ref.apply(v, x) ** 2).sum())(vr)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        gf["params"]["Conv_0"], gr["params"])


def test_patch_embed_param_tree_unchanged():
    """PatchEmbed3D's patchify swap keeps the nn.Conv tree (Conv_0/*)."""
    from medicalsemseg_tpu.models.embeddings import PatchEmbed3D

    m = PatchEmbed3D(patch_size=(2, 2, 2), embed_dim=16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4, 1)))
    assert set(v["params"].keys()) == {"Conv_0", "LayerNorm_0"}, v["params"].keys()
    assert v["params"]["Conv_0"]["kernel"].shape == (2, 2, 2, 1, 16)
    assert v["params"]["Conv_0"]["bias"].shape == (16,)


def test_dots27_train_formulation_matches_autodiff(monkeypatch):
    """With the dots27 train formulation forced on, forward-under-grad and
    both gradients must still match XLA autodiff through the native conv."""
    from medicalsemseg_tpu.ops import convgrad

    monkeypatch.setattr(convgrad, "_DOTS27_TRAIN", True)
    # channels >= 16 on both sides so fwd AND dx take the dots27 path
    # (the per-call channel gate keeps skinny-channel convs on the native
    # emitter); the gate itself is asserted here
    x = _rand((2, 4, 5, 6, 16), seed=13)
    w = _rand((3, 3, 3, 16, 16), seed=14, scale=0.2)
    cot = _rand((2, 4, 5, 6, 16), seed=15)
    assert convgrad._use_dots27(x)
    assert not convgrad._use_dots27(_rand((1, 4, 4, 4, 1)))

    def loss(fn, x, w):
        return (fn(x, w) * cot).sum()

    # value_and_grad exercises the dots27 fwd (the vjp fwd rule), not the
    # primal: both must agree with the native conv
    (v, (gx, gw)) = jax.value_and_grad(
        lambda a, b: loss(conv3x3x3_s1, a, b), (0, 1))(x, w)
    (rv, (rx, rw)) = jax.value_and_grad(
        lambda a, b: loss(_conv, a, b), (0, 1))(x, w)
    np.testing.assert_allclose(float(v), float(rv), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)
    # the primal (no-grad) path keeps the native conv result exactly
    np.testing.assert_allclose(np.asarray(conv3x3x3_s1(x, w)),
                               np.asarray(_conv(x, w)), rtol=2e-5, atol=2e-5)


def test_dots27_bf16_error_bounded(monkeypatch):
    """The dots27 formulation accumulates its 27-tap sum in the compute
    dtype (the measured-fastest form); at bf16 — the dtype the flag targets —
    the extra rounding must stay the same order as the native bf16 conv's."""
    from medicalsemseg_tpu.ops import convgrad

    monkeypatch.setattr(convgrad, "_DOTS27_TRAIN", True)
    x32 = _rand((1, 6, 6, 8, 32), seed=16)
    w32 = _rand((3, 3, 3, 32, 32), seed=17, scale=0.2)
    cot = _rand((1, 6, 6, 8, 32), seed=18)
    ref = np.asarray(_conv(x32, w32))
    scale = np.abs(ref).max()

    x, w = x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16)
    v, _ = jax.value_and_grad(
        lambda a: (conv3x3x3_s1(a, w).astype(jnp.float32)
                   * cot).sum())(x)
    fwd_dots = np.asarray(jax.vjp(
        lambda a: conv3x3x3_s1(a, w), x)[0].astype(jnp.float32))
    fwd_native = np.asarray(_conv(x, w).astype(jnp.float32))

    err_dots = np.abs(fwd_dots - ref).max() / scale
    err_native = np.abs(fwd_native - ref).max() / scale
    assert err_dots < 4 * max(err_native, 1e-3), (err_dots, err_native)
    assert np.isfinite(float(v))


def test_dots27_dx_gate_checks_dy_channels(monkeypatch):
    """dx's tap dots contract over dy's channels: with Cin wide but Co
    skinny, dx must keep the native emitter (gate on dy, not x) yet still
    produce correct gradients."""
    from medicalsemseg_tpu.ops import convgrad

    monkeypatch.setattr(convgrad, "_DOTS27_TRAIN", True)
    x = _rand((1, 4, 6, 8, 32), seed=19)
    w = _rand((3, 3, 3, 32, 4), seed=20, scale=0.2)  # Co=4 < 16
    cot = _rand((1, 4, 6, 8, 4), seed=21)
    gx, gw = jax.grad(lambda a, b: (conv3x3x3_s1(a, b) * cot).sum(),
                      (0, 1))(x, w)
    rx, rw = jax.grad(lambda a, b: (_conv(a, b) * cot).sum(), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)


def test_conv3d_param_tree_unchanged():
    """The fast path must produce the same params as nn.Conv (Conv_0/kernel,
    Conv_0/bias) and the same outputs given those params."""
    x = _rand((1, 4, 4, 4, 6), seed=6)
    fast = Conv3d(8, (3, 3, 3), dtype=jnp.float32)
    ref = nn.Conv(8, (3, 3, 3), strides=(1, 1, 1), padding="SAME")

    vf = fast.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    # fast path nests under Conv_0 exactly like our wrapper's nn.Conv did
    assert set(vf["params"].keys()) == {"Conv_0"}
    assert set(vf["params"]["Conv_0"].keys()) == {"kernel", "bias"}
    assert (vf["params"]["Conv_0"]["kernel"].shape
            == vr["params"]["kernel"].shape)

    # outputs equal when given identical weights
    vf2 = {"params": {"Conv_0": vr["params"]}}
    got = fast.apply(vf2, x)
    want = ref.apply(vr, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv3d_fallback_path_for_strided():
    x = _rand((1, 4, 4, 4, 6), seed=7)
    m = Conv3d(8, (3, 3, 3), strides=(2, 2, 2),
               padding=((1, 1), (1, 1), (1, 1)))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 2, 2, 2, 8)


def test_convtranspose_matmul_path_matches_nnconvtranspose():
    """_MatmulConvTranspose == nn.ConvTranspose for kernel == strides, and
    the parameter tree is unchanged (ConvTranspose_0/kernel, .../bias)."""
    from medicalsemseg_tpu.models.layers import ConvTranspose3d

    x = _rand((2, 3, 4, 5, 6), seed=8)
    ours = ConvTranspose3d(7, (2, 2, 2), (2, 2, 2))
    ref = nn.ConvTranspose(7, (2, 2, 2), strides=(2, 2, 2), padding="VALID")

    vo = ours.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    assert set(vo["params"].keys()) == {"ConvTranspose_0"}
    assert (vo["params"]["ConvTranspose_0"]["kernel"].shape
            == vr["params"]["kernel"].shape)

    vo2 = {"params": {"ConvTranspose_0": vr["params"]}}
    got = ours.apply(vo2, x)
    want = ref.apply(vr, x)
    assert got.shape == want.shape == (2, 6, 8, 10, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # inference mode routes to the native lax.conv_transpose lowering over
    # the same params — identical output
    got_det = ours.apply(vo2, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got_det), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # gradients agree too (pure autodiff through the matmul form)
    cot = _rand(got.shape, seed=9)
    g1 = jax.grad(lambda v: (ours.apply(v, x) * cot).sum())(vo2)
    g2 = jax.grad(lambda v: (ref.apply(v, x) * cot).sum())(vr)
    np.testing.assert_allclose(
        np.asarray(g1["params"]["ConvTranspose_0"]["kernel"]),
        np.asarray(g2["params"]["kernel"]), rtol=1e-4, atol=1e-5)
