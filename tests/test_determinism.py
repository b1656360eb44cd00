"""RNG reproducibility (SURVEY.md §7.4.7): explicit key threading gives
bit-identical training and sampling under a fixed seed."""

import numpy as np

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.data.dataset import TrainLoader, CachedVolumeDataset
from medicalsemseg_tpu.data.datalist import load_decathlon_datalist
from medicalsemseg_tpu.models import build_model
from medicalsemseg_tpu.train.state import create_train_state, make_train_step

from tests.test_nifti_data import _write_decathlon


def test_train_step_deterministic():
    cfg = Config(model="nnFormerUNETR", vol_size=16, patch_size=2,
                 hidden_dim=12, depths=(1, 1), num_heads=(2, 2), window_size=2,
                 output_dim=3, compute_dtype="float32", warmup_epochs=0,
                 drop_path_rate=0.3, lr=1e-3)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)),
             "label": jnp.asarray(rng.integers(0, 3, (1, 16, 16, 16)).astype(np.int32)),
             "crop_loc": jnp.full((1, 3), 0.5), "affine": jnp.ones((1, 3))}
    x_in = (batch["image"], batch["crop_loc"], batch["affine"])

    def run():
        state, _ = create_train_state(cfg, model, jax.random.PRNGKey(7), x_in, 10)
        step = jax.jit(make_train_step(cfg))
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(9), i))
            losses.append(float(m["loss"]))
        return losses

    a, b = run(), run()
    assert a == b, (a, b)  # bit-identical incl. drop-path randomness


def test_loader_deterministic(tmp_path):
    root, task = _write_decathlon(tmp_path, n=4, shape=(18, 20, 22))
    cfg = Config(vol_size=16, t_fixed_ct_intensity=True, t_ct_min=-50,
                 t_ct_max=150, t_rand_crop_fgbg=True, t_flip_prob=0.5,
                 t_n_patches_per_image=2, n_images_per_batch=2, output_dim=3,
                 data_path=root, task=task)
    files = load_decathlon_datalist(f"{root}/{task}/dataset.json", "training")
    ds = CachedVolumeDataset(files, cfg)

    def first_batch(seed):
        loader = TrainLoader(ds, cfg, seed=seed)
        return next(iter(loader.epoch(0)))

    b1, b2 = first_batch(5), first_batch(5)
    np.testing.assert_array_equal(b1["image"], b2["image"])
    np.testing.assert_array_equal(b1["label"], b2["label"])
    b3 = first_batch(6)
    assert not np.array_equal(b1["image"], b3["image"])  # seed changes crops


def test_loader_worker_count_invariance(tmp_path):
    """Batches must be BIT-IDENTICAL for any --n_workers_train value: worker
    parallelism is a throughput knob, never a semantics knob (each batch has
    its own (seed, epoch, batch)-seeded stream)."""
    root, task = _write_decathlon(tmp_path, n=4, shape=(18, 20, 22))

    def epoch_batches(workers):
        cfg = Config(vol_size=16, t_fixed_ct_intensity=True, t_ct_min=-50,
                     t_ct_max=150, t_rand_crop_fgbg=True, t_flip_prob=0.5,
                     t_n_patches_per_image=2, n_images_per_batch=2,
                     output_dim=3, data_path=root, task=task,
                     n_workers_train=workers)
        files = load_decathlon_datalist(f"{root}/{task}/dataset.json",
                                        "training")
        ds = CachedVolumeDataset(files, cfg)
        loader = TrainLoader(ds, cfg, seed=3)
        return list(loader.epoch(0))

    solo, pooled = epoch_batches(1), epoch_batches(4)
    assert len(solo) == len(pooled) == 2
    for b1, b2 in zip(solo, pooled):
        np.testing.assert_array_equal(b1["image"], b2["image"])
        np.testing.assert_array_equal(b1["label"], b2["label"])
