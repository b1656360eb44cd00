"""Custom-VJP fused attention: gradients match jax.grad of the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import medicalsemseg_tpu.ops.pallas.window_attention as pwa
from medicalsemseg_tpu.models.swin import WindowAttention
from medicalsemseg_tpu.ops.window import (
    shift_window_attn_mask,
    window_partition,
    window_reverse,
)


def _xla_forward(x, p, ws, nh, shift):
    attn = WindowAttention(dim=x.shape[-1], window_size=(ws, ws, ws),
                           num_heads=nh, n_windows=0, qkv_bias=True)
    params = {"qkv_kernel": p["wqkv"], "qkv_bias": p["bqkv"],
              "proj_kernel": p["wproj"], "proj_bias": p["bproj"],
              "relative_position_bias_table": p["table"]}
    mask = (shift_window_attn_mask(x.shape[1:4], ws, shift)
            if shift > 0 else None)
    wins = window_partition(x, ws)
    out, _ = attn.apply({"params": params}, wins, mask=mask)
    return window_reverse(out, ws, x.shape[1:4])


@pytest.mark.parametrize("shift", [0, 1])
def test_vjp_matches_xla_grads(monkeypatch, shift):
    # force interpret mode inside both kernels (CPU)
    orig_fwd = pwa.fused_window_attention
    monkeypatch.setattr(pwa, "fused_window_attention",
                        lambda *a, **k: orig_fwd(*a[:10], interpret=True)
                        if len(a) >= 10 else orig_fwd(*a, **{**k, "interpret": True}))

    rng = np.random.default_rng(0)
    b, dims, ws, c, nh = 1, (4, 4, 4), 2, 8, 2
    x = jnp.asarray(rng.normal(size=(b, *dims, c)).astype(np.float32))
    p = {
        "wqkv": jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32) * 0.2),
        "bqkv": jnp.asarray(rng.normal(size=(3 * c,)).astype(np.float32) * 0.1),
        "wproj": jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2),
        "bproj": jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1),
        "table": jnp.asarray(
            rng.normal(size=((2 * ws - 1) ** 3, nh)).astype(np.float32) * 0.05),
    }
    cot = jnp.asarray(rng.normal(size=(b, *dims, c)).astype(np.float32))

    def loss_pallas(x, wqkv, bqkv, wproj, bproj, table):
        y = pwa.fused_window_attention_trainable(
            x, wqkv, bqkv, wproj, bproj, table, ws, nh, shift, 4, True)
        return (y * cot).sum()

    def loss_xla(x, wqkv, bqkv, wproj, bproj, table):
        y = _xla_forward(x, {"wqkv": wqkv, "bqkv": bqkv, "wproj": wproj,
                             "bproj": bproj, "table": table}, ws, nh, shift)
        return (y * cot).sum()

    args = (x, p["wqkv"], p["bqkv"], p["wproj"], p["bproj"], p["table"])
    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ("dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dtable")
    for name, a, b_ in zip(names, g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("shift,residual", [(0, True), (1, True), (0, False)])
def test_ln_vjp_matches_xla_grads(monkeypatch, shift, residual):
    """fused_window_attention_ln_trainable grads == jax.grad of
    LN -> XLA attention [-> +x]."""
    orig_fwd = pwa.fused_window_attention

    def force_interp(*a, **k):
        a = a[:10]
        k["interpret"] = True
        return orig_fwd(*a, **k)

    monkeypatch.setattr(pwa, "fused_window_attention", force_interp)

    rng = np.random.default_rng(2)
    b, dims, ws, c, nh = 1, (4, 4, 4), 2, 8, 2
    x = jnp.asarray(rng.normal(size=(b, *dims, c)).astype(np.float32))
    p = {
        "wqkv": jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32) * 0.2),
        "bqkv": jnp.asarray(rng.normal(size=(3 * c,)).astype(np.float32) * 0.1),
        "wproj": jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2),
        "bproj": jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1),
        "table": jnp.asarray(
            rng.normal(size=((2 * ws - 1) ** 3, nh)).astype(np.float32) * 0.05),
    }
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.3 + 1.0)
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.normal(size=(b, *dims, c)).astype(np.float32))

    def ln_ref(x, s, b_):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.maximum(0.0, (xf * xf).mean(-1, keepdims=True) - mu * mu)
        return (xf - mu) * (jax.lax.rsqrt(var + 1e-5) * s) + b_

    def loss_pallas(x, scale, bias, wqkv, bqkv, wproj, bproj, table):
        y = pwa.fused_window_attention_ln_trainable(
            x, scale, bias, wqkv, bqkv, wproj, bproj, table, ws, nh, shift,
            4, True, residual)
        return (y * cot).sum()

    def loss_xla(x, scale, bias, wqkv, bqkv, wproj, bproj, table):
        y = _xla_forward(ln_ref(x, scale, bias),
                         {"wqkv": wqkv, "bqkv": bqkv, "wproj": wproj,
                          "bproj": bproj, "table": table}, ws, nh, shift)
        if residual:
            y = y + x
        return (y * cot).sum()

    args = (x, scale, bias, p["wqkv"], p["bqkv"], p["wproj"], p["bproj"],
            p["table"])
    nums = tuple(range(8))
    g_pallas = jax.grad(loss_pallas, argnums=nums)(*args)
    g_xla = jax.grad(loss_xla, argnums=nums)(*args)
    names = ("dx", "dscale", "dbias_ln", "dwqkv", "dbqkv", "dwproj",
             "dbproj", "dtable")
    for name, a, b_ in zip(names, g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_encoder_pallas_train_matches_xla_grads(monkeypatch):
    """SwinEncoder3D(pallas_train=True) grads == XLA grads in train mode
    (exercises the LN-absorbed custom VJP through SwinBlock)."""
    import medicalsemseg_tpu.ops.pallas.mlp as pmlp

    monkeypatch.setattr(pmlp, "_FORCE_INTERPRET", True)
    orig_ln = pwa.fused_window_attention_ln_trainable
    orig_t = pwa.fused_window_attention_trainable

    def interp_ln(*a):
        return orig_ln(*a[:12], True, *a[13:])

    def interp_t(x, wqkv, bqkv, wproj, bproj, table, ws, nh, shift=0,
                 wpb=8, interpret=False):
        return orig_t(x, wqkv, bqkv, wproj, bproj, table, ws, nh, shift,
                      wpb, True)

    monkeypatch.setattr(pwa, "fused_window_attention_ln_trainable", interp_ln)
    monkeypatch.setattr(pwa, "fused_window_attention_trainable", interp_t)

    from medicalsemseg_tpu.models.swin import SwinEncoder3D

    kw = dict(patch_size=(2, 2, 2), embed_dim=8, depths=(1, 1),
              num_heads=(2, 2), window_sizes=(2, 2), qkv_bias=True,
              drop_path_rate=0.0)
    enc_x = SwinEncoder3D(use_pallas=False, **kw)
    enc_p = SwinEncoder3D(use_pallas=True, pallas_train=True, **kw)
    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    x_in = (vol, None, None)
    variables = jax.jit(lambda r, x: enc_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)

    def loss(module, v):
        outs = module.apply(v, x_in, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return sum((o.astype(jnp.float32) ** 2).sum() for o in outs)

    g_x = jax.grad(lambda v: loss(enc_x, v))(variables)
    g_p = jax.grad(lambda v: loss(enc_p, v))(variables)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    assert len(flat_x) == len(flat_p)
    for (kx, ax), (kp, ap) in zip(flat_x, flat_p):
        assert kx == kp
        np.testing.assert_allclose(
            np.asarray(ap), np.asarray(ax), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(kx))


def test_vjp_forward_value_matches(monkeypatch):
    rng = np.random.default_rng(1)
    b, dims, ws, c, nh = 2, (4, 4, 4), 2, 4, 1
    x = jnp.asarray(rng.normal(size=(b, *dims, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32) * 0.2)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
    bproj = jnp.zeros((c,), jnp.float32)
    table = jnp.asarray(rng.normal(size=((2 * ws - 1) ** 3, nh)).astype(np.float32) * 0.05)
    y1 = pwa.fused_window_attention_trainable(x, wqkv, bqkv, wproj, bproj,
                                              table, ws, nh, 0, 4, True)
    y2 = pwa.fused_window_attention(x, wqkv, bqkv, wproj, bproj, table, ws,
                                    nh, 0, 4, True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


@pytest.mark.parametrize("mode", ["conv", "full"])
def test_absorbed_vjps_under_remat(monkeypatch, mode):
    """The LN-absorbed attention + MLP custom VJPs compose with the
    jax.checkpoint policies the production train step uses (remat=conv is
    the Config default)."""
    import medicalsemseg_tpu.ops.pallas.mlp as pmlp

    monkeypatch.setattr(pmlp, "_FORCE_INTERPRET", True)
    orig_ln = pwa.fused_window_attention_ln_trainable
    orig_t = pwa.fused_window_attention_trainable
    monkeypatch.setattr(pwa, "fused_window_attention_ln_trainable",
                        lambda *a: orig_ln(*a[:12], True, *a[13:]))
    monkeypatch.setattr(
        pwa, "fused_window_attention_trainable",
        lambda *a, **k: orig_t(*a[:10], True))

    from medicalsemseg_tpu.models.swin import SwinEncoder3D

    kw = dict(patch_size=(2, 2, 2), embed_dim=8, depths=(1, 1),
              num_heads=(2, 2), window_sizes=(2, 2), qkv_bias=True,
              drop_path_rate=0.0)
    rng = np.random.default_rng(9)
    vol = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    x_in = (vol, None, None)

    enc_ref = SwinEncoder3D(use_pallas=False, remat="none", **kw)
    variables = jax.jit(lambda r, x: enc_ref.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)

    def loss(module, v):
        outs = module.apply(v, x_in, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return sum((o.astype(jnp.float32) ** 2).sum() for o in outs)

    g_ref = jax.grad(lambda v: loss(enc_ref, v))(variables)
    enc = SwinEncoder3D(use_pallas=True, pallas_train=True, remat=mode, **kw)
    g = jax.grad(lambda v: loss(enc, v))(variables)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_p = jax.tree_util.tree_leaves_with_path(g)
    for (kr, ar), (kp, ap) in zip(flat_r, flat_p):
        np.testing.assert_allclose(
            np.asarray(ap), np.asarray(ar), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(kr))


@pytest.mark.parametrize("shift", [0, 1])
def test_hsplit_vjp_matches_xla_grads(monkeypatch, shift):
    """Head-split backward (grid over head groups — the stage-4 VMEM path)
    == jax.grad of the XLA attention, forced via pick_head_split."""
    # interpret=True flows through the trainable's nondiff args into both
    # the forward kernel and the selected backward; only the split choice
    # needs forcing (the test shape fits the whole-head kernel)
    monkeypatch.setattr(pwa, "pick_head_split", lambda *a, **k: 2)

    rng = np.random.default_rng(3)
    b, dims, ws, c, nh = 1, (4, 4, 4), 2, 8, 4
    x = jnp.asarray(rng.normal(size=(b, *dims, c)).astype(np.float32))
    p = {
        "wqkv": jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32) * 0.2),
        "bqkv": jnp.asarray(rng.normal(size=(3 * c,)).astype(np.float32) * 0.1),
        "wproj": jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2),
        "bproj": jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1),
        "table": jnp.asarray(
            rng.normal(size=((2 * ws - 1) ** 3, nh)).astype(np.float32) * 0.05),
    }
    cot = jnp.asarray(rng.normal(size=(b, *dims, c)).astype(np.float32))

    def loss_pallas(x, wqkv, bqkv, wproj, bproj, table):
        y = pwa.fused_window_attention_trainable(
            x, wqkv, bqkv, wproj, bproj, table, ws, nh, shift, 4, True)
        return (y * cot).sum()

    def loss_xla(x, wqkv, bqkv, wproj, bproj, table):
        y = _xla_forward(x, {"wqkv": wqkv, "bqkv": bqkv, "wproj": wproj,
                             "bproj": bproj, "table": table}, ws, nh, shift)
        return (y * cot).sum()

    args = (x, p["wqkv"], p["bqkv"], p["wproj"], p["bproj"], p["table"])
    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ("dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dtable")
    for name, a, b_ in zip(names, g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("residual", [False, True])
def test_hsplit_ln_vjp_matches_whole_head(monkeypatch, residual):
    """Head-split LN-absorbed backward == the (gradient-verified) whole-head
    backward on identical inputs: same grads for x, LN, weights, bias."""
    rng = np.random.default_rng(5)
    b, dims, ws, c, nh = 1, (4, 4, 4), 2, 8, 4
    n = ws ** 3
    grid_dims = tuple(d // ws for d in dims)
    total = b * int(np.prod(grid_dims))
    x = jnp.asarray(rng.normal(size=(b, *dims, c)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(b, *dims, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(nh, n, n)).astype(np.float32) * 0.05)
    ln = (jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.3 + 1.0),
          jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1))

    from medicalsemseg_tpu.ops.window import window_partition as wpart

    wins = wpart(x, ws)
    dy_wins = wpart(dy, ws)
    kw = dict(num_heads=nh, wpb=2, shifted=False, grid_dims=grid_dims,
              ws=ws, ss=0, interpret=True, ln=ln, residual=residual)
    ref = pwa._fused_bwd_windows(wins, wqkv, bqkv, wproj, bias, dy_wins,
                                 **kw)
    got = pwa._fused_bwd_windows_hsplit(wins, wqkv, bqkv, wproj, bias,
                                        dy_wins, hg_count=2, **kw)
    names = ("dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias", "dln")
    for name, a, b_ in zip(names, got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_gcvit_pallas_train_matches_xla_grads(monkeypatch):
    """GCViT3D(pallas_train=True) grads == XLA grads in train mode — the
    round-4 extension of fused-kernel training past the Swin family
    (VERDICT r3 item 7). Local blocks route through the absorbed custom
    VJPs; global-query blocks (i % 2 == 1) keep the XLA train path by
    design (no backward kernel for the shared-pyramid dq)."""
    import medicalsemseg_tpu.ops.pallas.mlp as pmlp

    monkeypatch.setattr(pmlp, "_FORCE_INTERPRET", True)
    orig_ln = pwa.fused_window_attention_ln_trainable
    orig_t = pwa.fused_window_attention_trainable

    def interp_ln(*a):
        return orig_ln(*a[:12], True, *a[13:])

    def interp_t(x, wqkv, bqkv, wproj, bproj, table, ws, nh, shift=0,
                 wpb=8, interpret=False):
        return orig_t(x, wqkv, bqkv, wproj, bproj, table, ws, nh, shift,
                      wpb, True)

    monkeypatch.setattr(pwa, "fused_window_attention_ln_trainable", interp_ln)
    monkeypatch.setattr(pwa, "fused_window_attention_trainable", interp_t)

    from medicalsemseg_tpu.models.gcvit import GCViT3D

    kw = dict(in_chans=1, dim=8, depths=(2,), num_heads=(2,),
              window_sizes=(2,), drop_path_rate=0.0)
    enc_x = GCViT3D(use_pallas=False, **kw)
    enc_p = GCViT3D(use_pallas=True, pallas_train=True, **kw)
    rng = np.random.default_rng(5)
    vol = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    x_in = (vol, None, None)
    variables = jax.jit(lambda r, x: enc_x.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)

    def loss(module, v):
        outs = module.apply(v, x_in, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return sum((o.astype(jnp.float32) ** 2).sum() for o in outs)

    g_x = jax.grad(lambda v: loss(enc_x, v))(variables)
    g_p = jax.grad(lambda v: loss(enc_p, v))(variables)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    assert len(flat_x) == len(flat_p)
    for (kx, ax), (kp, ap) in zip(flat_x, flat_p):
        assert kx == kp
        np.testing.assert_allclose(
            np.asarray(ap), np.asarray(ax), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(kx))
