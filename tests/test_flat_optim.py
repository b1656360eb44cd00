"""flat_adamw == optax.chain(clip_by_global_norm, adamw) numerically.

The flat-buffer optimizer (train/flat_optim.py) replaces ~700 per-leaf
fusions with one pass over raveled buffers; these tests pin its numerics to
the exact optax chain used by make_optimizer (train/state.py:62-81) over
multiple steps, with and without clipping, with the timm weight-decay mask.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from medicalsemseg_tpu.train.flat_optim import flat_adamw
from medicalsemseg_tpu.train.state import weight_decay_mask


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32)),
                  "bias": jnp.asarray(rng.normal(size=(7,)).astype(np.float32))},
        "norm": {"scale": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))},
        "conv": {"kernel": jnp.asarray(
            rng.normal(size=(3, 3, 3, 2, 4)).astype(np.float32))},
    }


def _grads(seed):
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32) * 3),
        _tree())


def _run(tx, params, n_steps):
    state = tx.init(params)
    for i in range(n_steps):
        upd, state = tx.update(_grads(100 + i), state, params)
        params = optax.apply_updates(params, upd)
    return params


def _compare(clip, wd, lr):
    sched = (lr if not callable(lr) else lr)
    params = _tree()

    chain = []
    if clip is not None:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(optax.adamw(sched, b1=0.9, b2=0.95, eps=1e-6,
                             weight_decay=wd, mask=weight_decay_mask))
    ref = _run(optax.chain(*chain), params, 4)

    got = _run(flat_adamw(sched, b1=0.9, b2=0.95, eps=1e-6, weight_decay=wd,
                          mask_fn=weight_decay_mask, clip_norm=clip),
               params, 4)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        ref, got)


def _run_fused(tx, params, n_steps):
    state = tx.init(params)
    for i in range(n_steps):
        params, state = tx.update(_grads(100 + i), state, params)
    return params, state


def test_flat_adamw_matches_optax_no_clip():
    _compare(clip=None, wd=1e-2, lr=3e-3)


def test_flat_adamw_fused_apply_matches_plain():
    """fused_apply (update returns the new params from the in-pass add, the
    round-4 rework) must walk the same trajectory as the returns-updates
    mode — and its flat master copy must stay consistent with the tree."""
    from jax.flatten_util import ravel_pytree

    params = _tree()
    kw = dict(b1=0.9, b2=0.95, eps=1e-6, weight_decay=1e-2,
              mask_fn=weight_decay_mask, clip_norm=1.0)
    plain = _run(flat_adamw(3e-3, **kw), params, 4)
    fused, st = _run_fused(flat_adamw(3e-3, fused_apply=True, **kw),
                           params, 4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        plain, fused)
    np.testing.assert_allclose(np.asarray(st.flat_p),
                               np.asarray(ravel_pytree(fused)[0]))
    # pre-clip grad norm carried for the train step's metric
    gflat, _ = ravel_pytree(_grads(103))
    np.testing.assert_allclose(float(st.grad_norm),
                               float(jnp.sqrt((gflat ** 2).sum())), rtol=1e-6)


def test_flat_adamw_matches_optax_with_clip():
    # gradients scaled *3 above ensure the clip actually engages
    _compare(clip=1.0, wd=1e-2, lr=3e-3)


def test_flat_adamw_matches_optax_schedule():
    sched = optax.linear_schedule(1e-3, 1e-4, transition_steps=3)
    _compare(clip=0.5, wd=1e-5, lr=sched)


def test_flat_adamw_wd_mask_excludes_1d():
    """With huge weight decay, 1-D leaves (bias/scale) must be untouched by
    the decay term (timm add_weight_decay semantics)."""
    params = _tree()
    tx = flat_adamw(0.0, weight_decay=10.0, mask_fn=weight_decay_mask)
    state = tx.init(params)
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(zero_g, state, params)
    # lr == 0 -> all updates must be exactly zero regardless of decay
    assert all(float(jnp.abs(u).max()) == 0.0
               for u in jax.tree_util.tree_leaves(upd))

    tx = flat_adamw(1.0, weight_decay=10.0, mask_fn=weight_decay_mask)
    upd, _ = tx.update(zero_g, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(upd["dense"]["bias"]), 0.0)
    np.testing.assert_allclose(np.asarray(upd["norm"]["scale"]), 0.0)
    # 2-D+ kernels DO decay: update = -lr * wd * p
    np.testing.assert_allclose(np.asarray(upd["dense"]["kernel"]),
                               -10.0 * np.asarray(params["dense"]["kernel"]),
                               rtol=1e-6)


def test_train_step_runs_with_flat_optimizer():
    """make_train_step end-to-end with --flat_optimizer (tiny model)."""
    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.models import build_model
    from medicalsemseg_tpu.train.state import create_train_state, make_train_step

    cfg = Config(model="nnFormerUNETR", vol_size=16, patch_size=2,
                 hidden_dim=12, depths=(1, 1), num_heads=(2, 2),
                 window_size=2, output_dim=3, compute_dtype="float32",
                 warmup_epochs=0, flat_optimizer=True)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    batch = {"image": img,
             "label": jnp.asarray(rng.integers(0, 3, (1, 16, 16, 16))
                                  .astype(np.int32)),
             "crop_loc": jnp.full((1, 3), 0.5, jnp.float32),
             "affine": jnp.ones((1, 3), jnp.float32)}
    x_in = (batch["image"], batch["crop_loc"], batch["affine"])
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0), x_in,
                                  steps_per_epoch=10)
    step = jax.jit(make_train_step(cfg))
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
