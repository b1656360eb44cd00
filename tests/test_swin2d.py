"""2D Swin (`--input_dim 2` backbone) parity against the vendored reference
classifier (reference: models/backbones/swin_2d.py:458-585), which is dead
upstream (never built by the factory). Weights are transplanted from the
randomly-initialized torch module; logits must match on identical inputs."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference repo not mounted", allow_module_level=True)

from tests.test_reference_parity import (  # noqa: E402
    _install_timm_stub,
    dense_params,
    ln_params,
    t2j,
)

_install_timm_stub()
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from medicalsemseg_tpu.models.swin2d import (  # noqa: E402
    SwinTransformer2D,
    relative_position_index_2d,
    shift_attn_mask_2d,
)


def _conv2d_params(conv):
    # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return {"kernel": t2j(conv.weight).transpose(2, 3, 1, 0),
            "bias": t2j(conv.bias)}


def _attn2d_params(a):
    return {
        "qkv": dense_params(a.qkv),
        "proj": dense_params(a.proj),
        "relative_position_bias_table":
            t2j(a.relative_position_bias_table),
    }


def _block_params(blk):
    return {
        "norm1": ln_params(blk.norm1),
        "attn": _attn2d_params(blk.attn),
        "norm2": ln_params(blk.norm2),
        "mlp": {"Dense_0": dense_params(blk.mlp.fc1),
                "Dense_1": dense_params(blk.mlp.fc2)},
    }


def _port(ref, ape):
    params = {
        "patch_embed": {"proj": _conv2d_params(ref.patch_embed.proj),
                        "norm": ln_params(ref.patch_embed.norm)},
        "norm": ln_params(ref.norm),
        "head": dense_params(ref.head),
    }
    if ape:
        params["absolute_pos_embed"] = t2j(ref.absolute_pos_embed)[0][None]
    for i, layer in enumerate(ref.layers):
        for j, blk in enumerate(layer.blocks):
            params[f"layers_{i}_blocks_{j}"] = _block_params(blk)
        if layer.downsample is not None:
            params[f"layers_{i}_downsample"] = {
                "norm": ln_params(layer.downsample.norm),
                "reduction": dense_params(layer.downsample.reduction),
            }
    return params


def test_rel_pos_index_2d_matches_reference():
    from models.backbones.swin_2d import WindowAttention as RefAttn

    ref = RefAttn(8, (4, 4), 2)
    np.testing.assert_array_equal(
        relative_position_index_2d((4, 4)),
        ref.relative_position_index.numpy())


def test_shift_mask_2d_matches_reference_block():
    from models.backbones.swin_2d import SwinTransformerBlock

    blk = SwinTransformerBlock(8, (8, 8), num_heads=2, window_size=4,
                               shift_size=2)
    np.testing.assert_allclose(shift_attn_mask_2d((8, 8), 4, 2),
                               blk.attn_mask.numpy())


@pytest.mark.parametrize("ape", [False, True])
def test_swin2d_full_model_parity(ape):
    from models.backbones.swin_2d import SwinTransformer as RefSwin

    torch.manual_seed(0)
    kw = dict(img_size=32, patch_size=4, in_chans=3, num_classes=5,
              embed_dim=8, depths=[2, 2], num_heads=[2, 4], window_size=4,
              drop_path_rate=0.0, ape=ape)
    ref = RefSwin(**kw).eval()

    ours = SwinTransformer2D(img_size=32, patch_size=4, in_chans=3,
                             num_classes=5, embed_dim=8, depths=(2, 2),
                             num_heads=(2, 4), window_size=4,
                             drop_path_rate=0.0, ape=ape)
    params = _port(ref, ape)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-4)

    # params we built must exactly cover the module's own init tree
    init = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def paths(tree):
        return {jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_leaves_with_path(tree)}

    assert paths(init["params"]) == paths(params)


def test_swin2d_seg_factory_and_gradients():
    """--input_dim 2 --model Swin2D builds a trainable 2D segmentation
    model with the framework's tuple forward contract."""
    import optax

    from medicalsemseg_tpu.config import get_args
    from medicalsemseg_tpu.models import build_model

    cfg = get_args(["--model", "Swin2D", "--input_dim", "2",
                    "--hidden_dim", "8", "--depths", "1", "1",
                    "--num_heads", "2", "2", "--window_size", "4",
                    "--patch_size", "4", "--output_dim", "3",
                    "--compute_dtype", "float32"])
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 32, 1)).astype(np.float32))
    x_in = (x, jnp.zeros((2, 2)), jnp.ones((2, 2)))
    variables = model.init(jax.random.PRNGKey(0), x_in, deterministic=True)
    out = model.apply(variables, x_in, deterministic=True)
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())

    y = jnp.asarray(np.random.default_rng(1).integers(0, 3, (2, 32, 32)))

    def loss_fn(params):
        logits = model.apply({"params": params}, x_in, deterministic=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    g = jax.grad(loss_fn)(variables["params"])
    norms = jax.tree_util.tree_map(lambda t: float(jnp.abs(t).sum()), g)
    total = sum(jax.tree_util.tree_leaves(norms))
    assert np.isfinite(total) and total > 0

    # a 3D model with --input_dim 2 is rejected, not silently mis-built
    with pytest.raises(ValueError, match="input_dim 2"):
        build_model(get_args(["--model", "Swin2D", "--input_dim", "3"]))


def test_swin2d_features_only_pyramid():
    ours = SwinTransformer2D(img_size=32, patch_size=4, in_chans=1,
                             num_classes=0, embed_dim=8, depths=(1, 1),
                             num_heads=(2, 2), window_size=4,
                             drop_path_rate=0.0)
    x = jnp.ones((1, 32, 32, 1))
    variables = ours.init(jax.random.PRNGKey(0), x)
    feats = ours.apply(variables, x, features_only=True)
    assert [f.shape for f in feats] == [(1, 8, 8, 8), (1, 4, 4, 16)]
    assert all(bool(jnp.isfinite(f).all()) for f in feats)
