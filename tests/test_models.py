"""Model forward-shape and factory tests on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.models import build_model

TINY = dict(vol_size=32, patch_size=2, hidden_dim=12, depths=(1, 1, 1, 1),
            num_heads=(2, 2, 2, 2), window_size=2, output_dim=3,
            compute_dtype="float32", n_images_per_batch=1)


def tiny_cfg(**kw):
    d = dict(TINY)
    d.update(kw)
    return Config(**d)


def make_inputs(cfg, batch=1, seed=0):
    rng = np.random.default_rng(seed)
    v = cfg.vol_size3()
    vol = jnp.asarray(rng.normal(size=(batch, *v, cfg.in_chans)).astype(np.float32))
    crop = jnp.asarray(rng.uniform(size=(batch, 3)).astype(np.float32))
    aff = jnp.ones((batch, 3), jnp.float32)
    return (vol, crop, aff)


def init_and_apply(model, x_in, train=False):
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    if train:
        fn = jax.jit(lambda v, x, r: model.apply(
            v, x, deterministic=False, rngs={"dropout": r},
            mutable=["batch_stats"]))
        out, _ = fn(variables, x_in, jax.random.PRNGKey(1))
        return out
    fn = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))
    return fn(variables, x_in)


@pytest.mark.parametrize("name", ["nnFormerUNETR", "SwInception", "SwinDepth"])
def test_unetr_combos_forward_shape(name):
    cfg = tiny_cfg(model=name)
    model = build_model(cfg)
    x_in = make_inputs(cfg)
    out = init_and_apply(model, x_in)
    assert out.shape == (1, 32, 32, 32, 3)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())


def test_swinsegformer_forward_shape():
    cfg = tiny_cfg(model="SwinSegFormer")
    model = build_model(cfg)
    out = init_and_apply(model, make_inputs(cfg))
    assert out.shape == (1, 32, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_encoder_options_forward():
    cfg = tiny_cfg(model="nnFormerUNETR", rel_crop_pos_emb=True,
                   rel_pos_bias_affine=True, global_token=True,
                   abs_pos_emb=True, qkv_bias=True)
    model = build_model(cfg)
    out = init_and_apply(model, make_inputs(cfg))
    assert out.shape == (1, 32, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_lcv_variants_forward():
    for kw in (dict(learned_cls_vectors=True, lcv_vector_dim=6,
                    lcv_patch_voxel_mean=True, lcv_final_layer=False,
                    hidden_dim=12),
               dict(learned_cls_vectors=True, lcv_vector_dim=6,
                    lcv_concat_vector=True),
               dict(learned_cls_vectors=True, lcv_vector_dim=6,
                    lcv_sincos_emb=True, lcv_final_layer=True),
               dict(learned_cls_vectors=True, lcv_vector_dim=6,
                    lcv_linear_comb=True, lcv_final_layer=True)):
        if kw.get("lcv_patch_voxel_mean"):
            kw["lcv_vector_dim"] = kw["hidden_dim"] = 12
        cfg = tiny_cfg(model="nnFormerUNETR", t_fixed_ct_intensity=True, **kw)
        model = build_model(cfg)
        out = init_and_apply(model, make_inputs(cfg))
        assert out.shape == (1, 32, 32, 32, 3), kw
        assert bool(jnp.isfinite(out).all()), kw


def test_train_mode_with_dropout_and_droppath():
    cfg = tiny_cfg(model="nnFormerUNETR", drop_path_rate=0.5)
    model = build_model(cfg)
    out = init_and_apply(model, make_inputs(cfg), train=True)
    assert bool(jnp.isfinite(out).all())


def test_segformer3d_forward_shape():
    cfg = tiny_cfg(model="SegFormer3D", depths=(1, 1, 1, 1),
                   num_heads=(1, 2, 4, 6))
    model = build_model(cfg)
    out = init_and_apply(model, make_inputs(cfg))
    assert out.shape == (1, 32, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_gcvit_forward_shape():
    cfg = tiny_cfg(model="GCViTUNETR", depths=(1, 2, 1, 2),
                   num_heads=(2, 2, 2, 2))
    model = build_model(cfg)
    out = init_and_apply(model, make_inputs(cfg))
    assert out.shape == (1, 32, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_focalnet_forward_shape():
    cfg = tiny_cfg(model="FocalNetUNETR", window_size=3)
    model = build_model(cfg)
    out = init_and_apply(model, make_inputs(cfg))
    assert out.shape == (1, 32, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_video_swin_unetr_forward_shape():
    cfg = tiny_cfg(model="VideoSwinUNETR")
    model = build_model(cfg)
    out = init_and_apply(model, make_inputs(cfg))
    assert out.shape == (1, 32, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        build_model(tiny_cfg(model="LRGFormer"))


def test_unetr_official_forward_shape():
    """The reference's default model name actually works here (tiny config)."""
    from medicalsemseg_tpu.models.unetr import UNETR

    model = UNETR(out_channels=3, feature_size=4, hidden_size=24, depth=4,
                  num_heads=2, patch_size=(16, 16, 16))
    cfg = tiny_cfg()
    out = init_and_apply(model, make_inputs(cfg))
    assert out.shape == (1, 32, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_vit_mae_options_forward():
    """ViT-MAE-style encoder options: cls token + layer-scale (SURVEY §2.2)."""
    from medicalsemseg_tpu.models.vit import ViT3D

    enc = ViT3D(patch_size=(8, 8, 8), hidden_size=24, depth=2, num_heads=2,
                out_indices=(1, 2), use_cls_token=True, init_values=1e-4)
    import numpy as np
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    variables = jax.jit(lambda r, x: enc.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), (vol, None, None))
    taps = enc.apply(variables, (vol, None, None), deterministic=True)
    assert len(taps) == 2
    assert taps[0].shape == (1, 2, 2, 2, 24)


def test_batch_of_two():
    cfg = tiny_cfg(model="nnFormerUNETR")
    model = build_model(cfg)
    out = init_and_apply(model, make_inputs(cfg, batch=2))
    assert out.shape == (2, 32, 32, 32, 3)


def test_nnformer_official_forward_and_deep_supervision():
    """Symmetric nnFormer (reference vendored nnformer_official, SURVEY §2.2)."""
    from medicalsemseg_tpu.models.nnformer import NNFormer

    cfg = tiny_cfg(model="nnFormer", depths=(1, 1, 1), num_heads=(2, 2, 2),
                   window_size=2, vol_size=16)
    model = build_model(cfg)
    out = init_and_apply(model, make_inputs(cfg))
    assert out.shape == (1, 16, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())

    ds_model = NNFormer(out_channels=3, embed_dim=12, depths=(1, 1, 1),
                        num_heads=(2, 2, 2), window_sizes=(2, 2, 2),
                        patch_size=(2, 2, 2), deep_supervision=True,
                        drop_path_rate=0.0)
    x_in = make_inputs(tiny_cfg(vol_size=16))
    variables = jax.jit(lambda r, x: ds_model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    # ds heads are a training-mode output (reference nnformer_official do_ds
    # toggle, nnformer_official.py:952-978); inference returns the full-res head
    heads = ds_model.apply(variables, x_in, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
    assert len(heads) == 2
    assert heads[0].shape == (1, 16, 16, 16, 3)   # full res first
    assert heads[1].shape == (1, 8, 8, 8, 3)      # 1/2 res
    out = ds_model.apply(variables, x_in, deterministic=True)
    assert out.shape == (1, 16, 16, 16, 3)


def test_lcv_only_forward():
    """--lcv_only: class vectors fully replace the conv patch embedding
    (reference: swin_nnformer.py:616-625)."""
    cfg = tiny_cfg(model="nnFormerUNETR", learned_cls_vectors=True,
                   lcv_only=True, lcv_vector_dim=6, lcv_final_layer=True,
                   t_fixed_ct_intensity=True)
    model = build_model(cfg)
    out = init_and_apply(model, make_inputs(cfg))
    assert out.shape == (1, 32, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_gcvit_anisotropic_input():
    """GCViT on a non-cubic grid (possible after bucket-padding odd shapes):
    the global-query pyramid must still produce ws^3 queries per window."""
    import jax
    import jax.numpy as jnp

    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.models import build_model

    cfg = Config(model="GCViTUNETR", vol_size=16, patch_size=2, hidden_dim=12,
                 depths=(2, 2), num_heads=(2, 2), window_size=2, output_dim=3,
                 compute_dtype="float32", drop_path_rate=0.0)
    model = build_model(cfg)
    # anisotropic: 32 x 16 x 24 (ratios 2x and 1.5x -> pooled and resized)
    x_in = (jnp.zeros((1, 32, 16, 24, 1)), jnp.zeros((1, 3)),
            jnp.ones((1, 3)))
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    out = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))(
        variables, x_in)
    assert out.shape == (1, 32, 16, 24, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_mixed_precision_fp16_parity_mode():
    """--mixed_precision = the reference's fp16 autocast as a parity mode:
    fp16 compute dtype, fp32 master params, finite train step (SURVEY §2.3;
    reference run_training.py:95 GradScaler mechanics deliberately not
    reproduced — bf16 is the production path)."""
    import jax
    import jax.numpy as jnp

    from medicalsemseg_tpu.config import Config, get_args
    from medicalsemseg_tpu.models import build_model
    from medicalsemseg_tpu.train.state import create_train_state, make_train_step

    assert get_args(["--mixed_precision"]).compute_dtype == "float16"
    assert get_args([]).compute_dtype == "bfloat16"
    assert get_args(["--mixed_precision",
                     "--compute_dtype", "float32"]).compute_dtype == "float32"

    cfg = Config(model="nnFormerUNETR", vol_size=16, patch_size=2,
                 hidden_dim=12, depths=(1, 1), num_heads=(2, 2),
                 window_size=2, output_dim=3, mixed_precision=True,
                 warmup_epochs=0, lr=1e-3, drop_path_rate=0.0)
    assert cfg.compute_dtype == "float16"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    batch = {"image": jnp.asarray(img),
             "label": jnp.asarray((img[..., 0] > 0).astype(np.int32)),
             "crop_loc": jnp.full((1, 3), 0.5), "affine": jnp.ones((1, 3))}
    x_in = (batch["image"], batch["crop_loc"], batch["affine"])
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0), x_in, 10)
    # master params stay fp32
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(state.params))
    step = jax.jit(make_train_step(cfg))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_patch_embed_variants():
    """PatchEmbedDeep/Global/Region (reference patch_embeddings.py:135-259):
    channel ramps, token grids, and the one-global-token contract."""
    from medicalsemseg_tpu.models.embeddings import (PatchEmbedDeep,
                                                     PatchEmbedGlobal,
                                                     PatchEmbedRegion)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))

    deep = PatchEmbedDeep(patch_size=(2, 2, 2), embed_dim=48)
    v = deep.init(jax.random.PRNGKey(0), x, deterministic=True)
    y = deep.apply(v, x, deterministic=True)
    assert y.shape == (2, 8, 8, 8, 48)
    # channel ramp Cin -> dim/4 -> dim/2 -> dim (two conv halves per block)
    p = v["params"]
    assert p["block1a"]["conv"]["Conv_0"]["kernel"].shape[-1] == 12
    assert p["block2a"]["conv"]["Conv_0"]["kernel"].shape[-1] == 24
    # train-mode batch norm keeps running stats
    y2, mut = deep.apply(v, x, deterministic=False, mutable=["batch_stats"])
    assert y2.shape == y.shape and "batch_stats" in mut

    glob = PatchEmbedGlobal(vol_size=(16, 16, 16), embed_dim=48)
    v = glob.init(jax.random.PRNGKey(0), x)
    g = glob.apply(v, x)
    assert g.shape == (2, 1, 1, 1, 48)

    reg = PatchEmbedRegion(region_size=(8, 8, 8), embed_dim=48)
    v = reg.init(jax.random.PRNGKey(0), x)
    r = reg.apply(v, x)
    # region grid = vol/region per axis
    assert r.shape == (2, 2, 2, 2, 48)
    # non-multiple inputs pad up in PatchEmbedDeep (reference F.pad semantics)
    x_odd = jnp.asarray(rng.normal(size=(1, 15, 16, 16, 1)).astype(np.float32))
    v = deep.init(jax.random.PRNGKey(0), x_odd, deterministic=True)
    y_odd = deep.apply(v, x_odd, deterministic=True)
    assert y_odd.shape == (1, 8, 8, 8, 48)


def test_lrgformer_unetr():
    """LRGFormerUNETR: the repaired local/region/global encoder end to end
    (forward shapes, chunked-attention equivalence, train-step smoke)."""
    from medicalsemseg_tpu.models.lrgformer import _chunked_softmax_attention
    from medicalsemseg_tpu.train.state import create_train_state, make_train_step

    # chunked attention == plain attention
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 3, 100, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 3, 100, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 3, 100, 8)).astype(np.float32))
    full = _chunked_softmax_attention(q, k, v, chunk=4096)
    chunked = _chunked_softmax_attention(q, k, v, chunk=32)  # pads 100 -> 128
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=2e-5, atol=2e-5)

    cfg = Config(model="LRGFormerUNETR", vol_size=16, patch_size=1,
                 hidden_dim=12, depths=(1, 1), num_heads=(2, 2),
                 window_size=2, output_dim=3, warmup_epochs=0, lr=1e-3,
                 drop_path_rate=0.0)
    model = build_model(cfg)
    img = rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    batch = {"image": jnp.asarray(img),
             "label": jnp.asarray((img[..., 0] > 0).astype(np.int32)),
             "crop_loc": jnp.full((1, 3), 0.5), "affine": jnp.ones((1, 3))}
    x_in = (batch["image"], batch["crop_loc"], batch["affine"])
    variables = model.init(jax.random.PRNGKey(0), x_in, deterministic=True)
    logits = model.apply(variables, x_in, deterministic=True)
    assert logits.shape == (1, 16, 16, 16, 3)
    assert logits.dtype == jnp.float32
    # per-stream projections exist (reference lrgformer.py:47-55)
    enc = variables["params"]["encoder"]
    attn = enc["layers_0_blocks_0"]["attn"]
    assert {"qkv_local", "qkv_region", "qkv_global",
            "proj_local", "proj_region", "proj_global"} <= set(attn.keys())

    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0), x_in, 10)
    step = jax.jit(make_train_step(cfg))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_mixed_remat_grads_match_none():
    """remat='mixed' (conv-saving everywhere, full remat for the decoder's
    full-resolution blocks — the bs8 HBM-OOM fix) is numerically a no-op:
    gradients match remat='none' exactly."""
    x_in = make_inputs(tiny_cfg())

    def grads(remat):
        cfg = tiny_cfg(model="nnFormerUNETR", remat=remat)
        model = build_model(cfg)
        variables = jax.jit(lambda r, x: model.init(
            r, x, deterministic=True))(jax.random.PRNGKey(0), x_in)

        def loss(v):
            out = model.apply(v, x_in, deterministic=True)
            return (out.astype(jnp.float32) ** 2).mean()

        return variables, jax.jit(jax.grad(loss))(variables)

    v_ref, g_ref = grads("none")
    v_mix, g_mix = grads("mixed")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_ref, v_mix)  # same init => same param tree
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                              jax.tree_util.tree_leaves_with_path(g_mix)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6,
                                   atol=1e-7, err_msg=jax.tree_util.keystr(k))


def test_class_major_logits_parity():
    """class_major_logits=True returns (n_cls, B, D, H, W) logits equal to
    the transposed default output (decoders.py UnetOutBlock class_major)."""
    cfg = tiny_cfg(model="nnFormerUNETR")
    model = build_model(cfg)
    x_in = make_inputs(cfg)
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_in)
    base = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))(
        variables, x_in)
    cm = jax.jit(lambda v, x: model.apply(
        v, x, deterministic=True, class_major_logits=True))(variables, x_in)
    assert cm.shape == (cfg.output_dim,) + base.shape[:-1]
    np.testing.assert_allclose(np.asarray(cm),
                               np.moveaxis(np.asarray(base), -1, 0),
                               rtol=1e-5, atol=1e-5)
