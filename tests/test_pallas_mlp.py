"""Fused Pallas token-MLP kernel vs the XLA module chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.models.layers import LayerNorm, Mlp
from medicalsemseg_tpu.ops.pallas.mlp import fused_mlp


def _params(rng, c, hdim, co):
    return {
        "w1": rng.normal(size=(c, hdim)).astype(np.float32) * 0.1,
        "b1": rng.normal(size=(hdim,)).astype(np.float32) * 0.1,
        "w2": rng.normal(size=(hdim, co)).astype(np.float32) * 0.1,
        "b2": rng.normal(size=(co,)).astype(np.float32) * 0.1,
    }


def _module_chain(x, p, scale, bias, residual):
    """LN -> Mlp (XLA path) -> +x with the same raw params."""
    mlp = Mlp(hidden_dim=p["w1"].shape[1], out_dim=p["w2"].shape[1])
    params = {"Dense_0": {"kernel": p["w1"], "bias": p["b1"]},
              "Dense_1": {"kernel": p["w2"], "bias": p["b2"]}}
    xi = jnp.asarray(x)
    if scale is not None:
        ln = LayerNorm()
        xi = ln.apply({"params": {"LayerNorm_0": {
            "scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}}, xi)
    out = mlp.apply({"params": params}, xi)
    if residual:
        out = out + x
    return np.asarray(out)


@pytest.mark.parametrize("ln,residual", [(False, False), (True, False),
                                         (True, True)])
def test_fused_mlp_matches_module(ln, residual):
    rng = np.random.default_rng(0)
    m, c, hdim = 40, 8, 32
    x = rng.normal(size=(m, c)).astype(np.float32)
    p = _params(rng, c, hdim, c)
    scale = (rng.normal(size=(c,)).astype(np.float32) * 0.3 + 1.0
             if ln else None)
    bias = rng.normal(size=(c,)).astype(np.float32) * 0.1 if ln else None

    want = _module_chain(x, p, scale, bias, residual)
    got = fused_mlp(jnp.asarray(x), jnp.asarray(p["w1"]), jnp.asarray(p["b1"]),
                    jnp.asarray(p["w2"]), jnp.asarray(p["b2"]),
                    ln_scale=None if scale is None else jnp.asarray(scale),
                    ln_bias=None if bias is None else jnp.asarray(bias),
                    residual=residual, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_fused_mlp_nonsquare_and_leading_dims():
    """Non-residual Co != C, arbitrary leading dims, row padding path."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 7, 8)).astype(np.float32)  # M=42, pads to blk
    p = _params(rng, 8, 16, 4)
    want = _module_chain(x.reshape(-1, 8), p, None, None, False)
    got = fused_mlp(jnp.asarray(x), jnp.asarray(p["w1"]), jnp.asarray(p["b1"]),
                    jnp.asarray(p["w2"]), jnp.asarray(p["b2"]),
                    interpret=True)
    assert got.shape == (2, 3, 7, 4)
    np.testing.assert_allclose(np.asarray(got).reshape(-1, 4), want,
                               rtol=2e-5, atol=2e-5)


def test_mlp_module_fused_path_matches_xla(monkeypatch):
    """Mlp(ln=..., residual=True) == LN -> Mlp() -> +x with shared params."""
    import medicalsemseg_tpu.ops.pallas.mlp as pmlp

    monkeypatch.setattr(pmlp, "_FORCE_INTERPRET", True)
    rng = np.random.default_rng(2)
    c, hdim = 8, 32
    x = jnp.asarray(rng.normal(size=(1, 40, c)).astype(np.float32))
    mlp = Mlp(hidden_dim=hdim)
    variables = mlp.init(jax.random.PRNGKey(0), x)
    lnp = {"LayerNorm_0": {"scale": jnp.ones((c,)) * 1.3,
                           "bias": jnp.ones((c,)) * 0.1}}
    ln_out = LayerNorm().apply({"params": lnp}, x)
    want = mlp.apply(variables, ln_out) + x
    got = mlp.apply(variables, x,
                    ln=(lnp["LayerNorm_0"]["scale"],
                        lnp["LayerNorm_0"]["bias"]), residual=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("residual", [True, False])
def test_fused_mlp_trainable_grads(residual):
    """fused_mlp_trainable grads == jax.grad of LN -> MLP [-> +x]."""
    from medicalsemseg_tpu.ops.pallas.mlp import fused_mlp_trainable

    rng = np.random.default_rng(3)
    m, c, hdim = 40, 8, 32
    x = jnp.asarray(rng.normal(size=(1, m, c)).astype(np.float32))
    p = _params(rng, c, hdim, c)
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.3 + 1.0)
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.normal(size=(1, m, c)).astype(np.float32))

    def ln_ref(x, s, b_):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.maximum(0.0, (xf * xf).mean(-1, keepdims=True) - mu * mu)
        return (xf - mu) * (jax.lax.rsqrt(var + 1e-5) * s) + b_

    def loss_pallas(x, scale, bias, w1, b1, w2, b2):
        y = fused_mlp_trainable(x, scale, bias, w1, b1, w2, b2, residual,
                                1e-5, True)
        return (y * cot).sum()

    def loss_xla(x, scale, bias, w1, b1, w2, b2):
        xn = ln_ref(x, scale, bias)
        h = jax.nn.gelu(xn @ w1 + b1, approximate=False)
        y = h @ w2 + b2
        if residual:
            y = y + x
        return (y * cot).sum()

    args = (x, scale, bias, jnp.asarray(p["w1"]), jnp.asarray(p["b1"]),
            jnp.asarray(p["w2"]), jnp.asarray(p["b2"]))
    nums = tuple(range(7))
    g_pallas = jax.grad(loss_pallas, argnums=nums)(*args)
    g_xla = jax.grad(loss_xla, argnums=nums)(*args)
    names = ("dx", "dscale", "dbias", "dw1", "db1", "dw2", "db2")
    for name, a, b_ in zip(names, g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
