"""Multi-chip sharding tests on the simulated 8-device CPU mesh.

The reference's distributed surface is DDP gradient/metric allreduce
(SURVEY.md §2.4-2.5); here that is batch sharding under jit. These tests
check: sharded-vs-single-device numerical equivalence of the train step,
metric reductions, and the dryrun_multichip driver contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.models import build_model
from medicalsemseg_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from medicalsemseg_tpu.train.state import create_train_state, make_train_step


def _cfg():
    return Config(model="nnFormerUNETR", vol_size=16, patch_size=2,
                  hidden_dim=12, depths=(1, 1), num_heads=(2, 2),
                  window_size=2, output_dim=3, compute_dtype="float32",
                  warmup_epochs=0, lr=1e-3)


def _batch(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    v = cfg.vol_size3()
    return {
        "image": rng.normal(size=(b, *v, 1)).astype(np.float32),
        "label": rng.integers(0, cfg.output_dim, (b, *v)).astype(np.int32),
        "crop_loc": np.full((b, 3), 0.5, np.float32),
        "affine": np.ones((b, 3), np.float32),
    }


def test_mesh_creation(devices):
    assert len(devices) == 8
    mesh = create_mesh()
    assert mesh.devices.size == 8
    mesh2 = create_mesh((4, 2), ("data", "model"))
    assert mesh2.axis_names == ("data", "model")


def test_sharded_train_step_matches_single_device():
    cfg = _cfg()
    model = build_model(cfg)
    batch_host = _batch(cfg, 8)
    x_probe = (jnp.asarray(batch_host["image"][:1]),
               jnp.asarray(batch_host["crop_loc"][:1]),
               jnp.asarray(batch_host["affine"][:1]))
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0), x_probe, 10)
    step_fn = make_train_step(cfg)
    rng = jax.random.PRNGKey(42)

    # single device
    s1, m1 = jax.jit(step_fn)(state, {k: jnp.asarray(v) for k, v in batch_host.items()}, rng)

    # 8-way data parallel
    mesh = create_mesh()
    data_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    state_r = jax.device_put(state, repl)
    batch_sharded = {k: jax.device_put(v, data_sh) for k, v in batch_host.items()}
    step_sharded = jax.jit(step_fn, out_shardings=(repl, repl))
    s8, m8 = step_sharded(state_r, batch_sharded, jax.device_put(rng, repl))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # updated parameters agree (gradient allreduce == single-device grads)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_metric_psum_semantics():
    # dice_sum/dice_count reduce over the sharded batch identically
    cfg = _cfg()
    model = build_model(cfg)
    batch_host = _batch(cfg, 8, seed=3)
    x_probe = (jnp.asarray(batch_host["image"][:1]),
               jnp.asarray(batch_host["crop_loc"][:1]),
               jnp.asarray(batch_host["affine"][:1]))
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(1), x_probe, 10)
    step_fn = make_train_step(cfg)
    mesh = create_mesh()
    repl = replicated(mesh)
    data_sh = batch_sharding(mesh)
    state_r = jax.device_put(state, repl)
    bs = {k: jax.device_put(v, data_sh) for k, v in batch_host.items()}
    _, m = jax.jit(step_fn, out_shardings=(repl, repl))(
        state_r, bs, jax.device_put(jax.random.PRNGKey(7), repl))
    assert np.asarray(m["dice_count"]).shape == (cfg.output_dim,)
    assert np.asarray(m["dice_count"]).sum() > 0


def test_dryrun_multichip_contract():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_eval_forward():
    cfg = _cfg()
    model = build_model(cfg)
    mesh = create_mesh()
    data_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    batch = _batch(cfg, 8, seed=5)
    x_probe = (jnp.asarray(batch["image"][:1]), None, None)
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_probe)
    variables = jax.device_put(variables, repl)

    def fwd(v, img):
        return model.apply(v, (img, None, None), deterministic=True)

    out = jax.jit(fwd, in_shardings=(repl, data_sh), out_shardings=data_sh)(
        variables, jax.device_put(batch["image"], data_sh))
    assert out.shape == (8, 16, 16, 16, 3)
    # per-volume results equal the unsharded forward
    out1 = jax.jit(fwd)(variables, jnp.asarray(batch["image"][:1]))
    np.testing.assert_allclose(np.asarray(out[:1]), np.asarray(out1),
                               rtol=2e-4, atol=2e-5)


def _fake_val_samples(cfg, shapes, seed=0):
    """Host Samples (image+label+affines) for driver-path tests."""
    from medicalsemseg_tpu.data.transforms import Sample

    rng = np.random.default_rng(seed)
    out = []
    for i, shp in enumerate(shapes):
        img = rng.normal(size=(*shp, 1)).astype(np.float32)
        lab = rng.integers(0, cfg.output_dim, (*shp, 1)).astype(np.int32)
        out.append(Sample(image=img, label=lab, affine=np.eye(4),
                          original_affine=np.diag([1.5, 1.5, 2.0, 1.0]),
                          original_shape=shp, name=f"vol{i}.nii.gz"))
    return out


def test_grouped_padded_volumes_grouping():
    from medicalsemseg_tpu.infer.sliding_window import grouped_padded_volumes

    cfg = _cfg()
    # 3 volumes of one padded shape + 1 of another; groups of 2
    samples = _fake_val_samples(cfg, [(18, 20, 17), (19, 18, 18),
                                      (24, 28, 24), (17, 19, 18)])
    groups = list(grouped_padded_volumes(samples, 2, multiple=8, cval=0.0))
    # shapes: three pad to (24,24,24)->... wait (18,20,17)->(24,24,24),
    # (19,18,18)->(24,24,24), (24,28,24)->(24,32,24), (17,19,18)->(24,24,24)
    assert len(groups) == 3
    sizes = sorted(tuple(g[0].shape) for g in groups)
    assert sizes == [(2, 24, 24, 24, 1), (2, 24, 24, 24, 1),
                     (2, 24, 32, 24, 1)]
    n_samples = sum(len(g[2]) for g in groups)
    assert n_samples == 4
    # partial group fills by repeating the last padded volume
    partial = [g for g in groups if len(g[2]) == 1]
    assert len(partial) == 2  # the 3rd same-shape volume and the odd shape
    for vols, affs, ss, origs in partial:
        np.testing.assert_array_equal(vols[0], vols[1])


def test_grouped_padded_volumes_sorted_max():
    """Opt-in sorted_max policy: full groups, ascending size, every group
    padded to its members' elementwise-max bucket, pad voxels are cval,
    real voxels preserved (VERDICT r3 weakness #6; tools/bucket_policy_sim.py
    measures the 85-88% idle fraction this replaces)."""
    from medicalsemseg_tpu.infer.sliding_window import (
        bucket_pad, grouped_padded_volumes)

    cfg = _cfg()
    shapes = [(18, 20, 17), (25, 18, 18), (24, 28, 24), (17, 19, 18),
              (30, 26, 22)]
    samples = _fake_val_samples(cfg, shapes, seed=3)
    cval = -7.5
    groups = list(grouped_padded_volumes(samples, 2, multiple=8, cval=cval,
                                         policy="sorted_max"))
    assert [len(g[2]) for g in groups] == [2, 2, 1]  # idle only in the last
    sizes = [int(np.prod(g[0].shape[1:4])) for g in groups]
    assert sizes == sorted(sizes)  # ascending group sizes
    for vols, affs, ss, origs in groups:
        gmax = tuple(max(bucket_pad(s.image, 8, cval)[0].shape[d]
                         for s in ss) for d in range(3))
        assert vols.shape[1:4] == gmax
        for k, (s, orig) in enumerate(zip(ss, origs)):
            d, h, w = s.image.shape[:3]
            assert orig == s.image.shape[:3]
            np.testing.assert_array_equal(vols[k, :d, :h, :w], s.image)
            mask = np.ones(vols.shape[1:4], bool)
            mask[:d, :h, :w] = False
            assert (vols[k][mask] == cval).all()
    # all volumes accounted for exactly once
    names = sorted(s.name for g in groups for s in g[2])
    assert names == sorted(s.name for s in samples)


def test_run_validation_sorted_max_uniform_shapes_exact():
    """With shape-uniform volumes, sorted_max grouping pads exactly like the
    default bucket policy, so the full driver path must produce IDENTICAL
    stats — this pins the plumbing (config flag -> loop -> grouping)."""
    from medicalsemseg_tpu.train.loop import run_validation
    from medicalsemseg_tpu.train.state import create_train_state

    cfg = _cfg()
    model = build_model(cfg)
    samples = _fake_val_samples(cfg, [(24, 20, 28)] * 3, seed=17)
    x_probe = (jnp.zeros((1, *cfg.vol_size3(), 1)), jnp.zeros((1, 3)),
               jnp.ones((1, 3)))
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(3),
                                  x_probe, 10)
    mesh = create_mesh()
    stats_bucket = run_validation(state, model, list(samples), cfg, epoch=0,
                                  mesh=mesh)
    cfg_sm = cfg.replace(val_group_policy="sorted_max")
    stats_sm = run_validation(state, model, list(samples), cfg_sm, epoch=0,
                              mesh=mesh)
    assert stats_bucket.keys() == stats_sm.keys()
    for k in stats_bucket:
        assert stats_bucket[k] == stats_sm[k], (k, stats_bucket[k],
                                                stats_sm[k])


def test_sorted_max_metrics_monai_equivalent():
    """A volume evaluated on a LARGER canvas (what sorted_max grouping does
    to the smaller members of a group) yields masked val metrics close to
    its own-bucket run: the extra windows see only cval air and the metric
    mask cuts the logits back to real voxels."""
    from medicalsemseg_tpu.infer.sliding_window import (
        bucket_pad, jitted_sliding_window)
    from medicalsemseg_tpu.train.loop import make_val_metrics
    from medicalsemseg_tpu.train.losses import build_loss

    cfg = _cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(5)
    img = rng.normal(size=(20, 18, 22, 1)).astype(np.float32)
    lab = rng.integers(0, cfg.output_dim, (1, 24, 24, 24)).astype(np.int32)
    x_probe = (jnp.zeros((1, 16, 16, 16, 1)), None, None)
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_probe)
    sw_run = jitted_sliding_window(model)
    val_metrics = make_val_metrics(build_loss(cfg), cfg.output_dim)
    aff = jnp.asarray([[1.5, 1.5, 2.0]], jnp.float32)
    kw = dict(roi=cfg.vol_size3(), sw_batch=2, overlap=0.5, mode="gaussian",
              cval=0.0, n_classes=cfg.output_dim)

    own, orig = bucket_pad(img, 8, 0.0)  # (24, 24, 24, 1)
    big = np.pad(own, [(0, 8), (0, 8), (0, 8), (0, 0)])  # a (32,32,32) canvas
    res = {}
    for name, vol in (("own", own), ("big", big)):
        logits = sw_run(variables, jnp.asarray(vol)[None], aff, **kw)
        pads = [(0, logits.shape[1 + i] - lab.shape[1 + i]) for i in range(3)]
        labels = jnp.asarray(np.pad(lab, [(0, 0)] + pads))
        loss, dice, nn = val_metrics(logits, labels,
                                     jnp.asarray(orig, jnp.int32))
        res[name] = (float(loss), np.asarray(dice), np.asarray(nn))
    np.testing.assert_array_equal(res["own"][2], res["big"][2])
    # random-init logits make boundary-window blending shifts visible (a
    # trained model emits confident background over air); bound the drift
    # rather than chase exactness: ~1.5% loss delta measured, allow 3%
    assert abs(res["own"][0] - res["big"][0]) < 0.06
    np.testing.assert_allclose(res["own"][1], res["big"][1], atol=0.08)


def test_volume_sharded_sliding_window_bitwise():
    """Every volume's logits from the volume-DP shard_map runner are
    BIT-IDENTICAL to the single-device jitted runner (VERDICT r2 #2)."""
    from medicalsemseg_tpu.infer.sliding_window import (
        bucket_pad,
        jitted_sliding_window,
        jitted_sliding_window_sharded,
    )

    cfg = _cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(7)
    shapes = [(24, 20, 28)] * 8
    vols = [rng.normal(size=(*s, 1)).astype(np.float32) for s in shapes]
    padded = np.stack([bucket_pad(v, 8, 0.0)[0] for v in vols])
    affs = np.tile(np.asarray([1.5, 1.5, 2.0], np.float32), (8, 1))

    x_probe = (jnp.asarray(padded[:1, :16, :16, :16]), None, None)
    variables = jax.jit(lambda r, x: model.init(r, x, deterministic=True))(
        jax.random.PRNGKey(0), x_probe)

    mesh = create_mesh()
    kw = dict(roi=cfg.vol_size3(), sw_batch=2, overlap=0.5, mode="gaussian",
              cval=0.0, n_classes=cfg.output_dim)
    sharded = jitted_sliding_window_sharded(model, mesh)(
        variables, jnp.asarray(padded), jnp.asarray(affs), **kw)
    solo_run = jitted_sliding_window(model)
    for i in range(8):
        solo = solo_run(variables, jnp.asarray(padded[i:i + 1]),
                        jnp.asarray(affs[i:i + 1]), **kw)
        np.testing.assert_array_equal(np.asarray(sharded[i:i + 1]),
                                      np.asarray(solo))


def test_run_validation_sharded_metrics_match_single_device(tmp_path):
    """Driver-level check: run_validation over an 8-device mesh produces the
    same averaged stats as the single-device path (VERDICT r2 #2)."""
    from medicalsemseg_tpu.train.loop import run_validation
    from medicalsemseg_tpu.train.state import create_train_state

    cfg = _cfg()
    model = build_model(cfg)
    samples = _fake_val_samples(
        cfg, [(24, 20, 28), (20, 24, 24), (24, 20, 28), (18, 17, 20),
              (24, 20, 28)], seed=13)
    x_probe = (jnp.zeros((1, *cfg.vol_size3(), 1)), jnp.zeros((1, 3)),
               jnp.ones((1, 3)))
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(3),
                                  x_probe, 10)

    stats_solo = run_validation(state, model, list(samples), cfg, epoch=0)
    mesh = create_mesh()
    stats_dp = run_validation(state, model, list(samples), cfg, epoch=0,
                              mesh=mesh)
    assert stats_solo.keys() == stats_dp.keys()
    for k in stats_solo:
        assert stats_solo[k] == stats_dp[k], (k, stats_solo[k], stats_dp[k])


def test_batchnorm_stats_are_globally_reduced():
    """SyncBN falls out of SPMD: BN batch stats computed inside the sharded
    train step equal the single-device full-batch stats (the reference needs
    torch SyncBatchNorm for this, run_training.py:83)."""
    cfg = Config(model="SwInception", vol_size=16, patch_size=2,
                 hidden_dim=12, depths=(1, 1), num_heads=(2, 2),
                 window_size=2, output_dim=3, compute_dtype="float32",
                 warmup_epochs=0, lr=1e-3)
    model = build_model(cfg)
    batch_host = _batch(cfg, 8, seed=11)
    x_probe = (jnp.asarray(batch_host["image"][:1]),
               jnp.asarray(batch_host["crop_loc"][:1]),
               jnp.asarray(batch_host["affine"][:1]))
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(2), x_probe, 10)
    assert jax.tree_util.tree_leaves(state.batch_stats), "model must have BN"
    step_fn = make_train_step(cfg)
    rng = jax.random.PRNGKey(5)

    s1, _ = jax.jit(step_fn)(
        state, {k: jnp.asarray(v) for k, v in batch_host.items()}, rng)

    mesh = create_mesh()
    data_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    state_r = jax.device_put(state, repl)
    bs = {k: jax.device_put(v, data_sh) for k, v in batch_host.items()}
    s8, _ = jax.jit(step_fn, out_shardings=(repl, repl))(
        state_r, bs, jax.device_put(rng, repl))

    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
