"""Deep-supervision training test: nnFormer ds heads through the train step."""

import numpy as np

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.models.nnformer import NNFormer
from medicalsemseg_tpu.train.state import (
    _deep_supervision_loss,
    create_train_state,
    make_train_step,
)
from medicalsemseg_tpu.train.losses import build_loss


def test_ds_loss_weights_and_scales():
    cfg = Config(output_dim=3)
    loss_fn = build_loss(cfg)
    labels = jnp.zeros((1, 8, 8, 8), jnp.int32)
    heads = [100.0 * jax.nn.one_hot(labels, 3),
             100.0 * jax.nn.one_hot(labels[:, ::2, ::2, ::2], 3)]
    # perfect predictions at both scales -> near-zero ds loss
    assert float(_deep_supervision_loss(loss_fn, heads, labels)) < 1e-3
    # full-res head wrong, half-res right: loss dominated by weight 2/3
    heads_bad = [-heads[0], heads[1]]
    lv = float(_deep_supervision_loss(loss_fn, heads_bad, labels))
    assert lv > 0.5


def test_nnformer_ds_train_step_decreases_loss():
    cfg = Config(model="nnFormer", vol_size=16, patch_size=2, hidden_dim=12,
                 depths=(1, 1, 1), num_heads=(2, 2, 2), window_size=2,
                 output_dim=3, compute_dtype="float32", warmup_epochs=0,
                 lr=1e-3, drop_path_rate=0.0)
    model = NNFormer(out_channels=3, embed_dim=12, depths=(1, 1, 1),
                     num_heads=(2, 2, 2), window_sizes=(2, 2, 2),
                     patch_size=(2, 2, 2), deep_supervision=True,
                     drop_path_rate=0.0, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    lab = (img[..., 0] > 0.5).astype(np.int32)
    batch = {"image": jnp.asarray(img), "label": jnp.asarray(lab),
             "crop_loc": jnp.full((1, 3), 0.5), "affine": jnp.ones((1, 3))}
    x_in = (batch["image"], batch["crop_loc"], batch["affine"])
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0), x_in, 10)
    step = jax.jit(make_train_step(cfg))
    losses = []
    for i in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_factory_threads_deep_supervision_flag():
    """--deep_supervision reaches NNFormer through build_model and the model
    returns a logits list in training mode (reference official nnFormer
    trains with ds heads, nnformer_official.py:952-978)."""
    from medicalsemseg_tpu.models import build_model

    cfg = Config(model="nnFormer", vol_size=16, patch_size=2, hidden_dim=12,
                 depths=(1, 1, 1), num_heads=(2, 2, 2), window_size=2,
                 output_dim=3, compute_dtype="float32", deep_supervision=True,
                 drop_path_rate=0.0)
    model = build_model(cfg)
    assert model.deep_supervision is True
    rng = np.random.default_rng(1)
    x_in = (jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)),
            jnp.full((1, 3), 0.5), jnp.ones((1, 3)))
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out = jax.jit(lambda v, x: model.apply(v, x, deterministic=False,
                                           rngs={"dropout": jax.random.PRNGKey(1)})
                  )(variables, x_in)
    assert isinstance(out, (list, tuple)) and len(out) >= 2
    assert out[0].shape == (1, 16, 16, 16, 3)
    # CLI flag parses
    from medicalsemseg_tpu.config import get_args
    assert get_args(["--deep_supervision"]).deep_supervision is True
    assert get_args([]).deep_supervision is False
