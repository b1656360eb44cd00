"""Cached datasets and batch loaders.

TPU-native replacement for the reference's MONAI CacheDataset +
ThreadDataLoader (reference: data/dataset_builder.py:467-480,
run_training.py:59-75): the deterministic transform prefix runs once per
volume into a host-RAM cache; each training step samples random crops from
the cache and collates a static-shaped channels-last batch. A background
thread prefetches the next batch so host work overlaps device compute.

Batch layout matches the reference's effective batch:
n_images_per_batch volumes x t_n_patches_per_image crops per volume
(reference: utils/arguments.py:230,200-201).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Dict, Iterator, List, Sequence

import numpy as np

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.data.transforms import (
    Sample,
    load_and_preprocess,
    sample_training_crops,
)


def _pool_size(cfg: Config, mode: str) -> int:
    """--n_workers_train / --n_workers_val (reference: utils/arguments.py:231-232,
    dataset_builder.py:467-480 CacheDataset num_workers). Threads, not
    processes: the hot loader work (zlib inflate, NumPy slicing, the native
    C++ resampler) releases the GIL."""
    n = cfg.n_workers_train if mode == "train" else cfg.n_workers_val
    return max(int(n), 1)


class CachedVolumeDataset:
    """Host-RAM cache of preprocessed volumes (CacheDataset equivalent).

    cache_rate < 1 caches only the head of the list; the rest are
    preprocessed on access (reference: dataset_builder.py:467-480). The cache
    build runs on a --n_workers_{train,val} thread pool like the reference's
    CacheDataset worker pool.
    """

    def __init__(self, files: Sequence[Dict], cfg: Config,
                 cache_rate: float = 1.0, mode: str = "train"):
        self.files = list(files)
        self.cfg = cfg
        self.mode = mode
        n_cache = int(len(self.files) * cache_rate)
        self._cache: Dict[int, Sample] = {}
        workers = min(_pool_size(cfg, mode), max(n_cache, 1))
        if workers > 1 and n_cache > 1:
            with cf.ThreadPoolExecutor(workers) as pool:
                for i, s in enumerate(pool.map(self._load, range(n_cache))):
                    self._cache[i] = s
        else:
            for i in range(n_cache):
                self._cache[i] = self._load(i)

    def _load(self, idx: int) -> Sample:
        f = self.files[idx]
        return load_and_preprocess(f["image"], f.get("label"), self.cfg,
                                   mode=self.mode)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Sample:
        if idx in self._cache:
            return self._cache[idx]
        return self._load(idx)


def _collate(crops: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out = {}
    for k in crops[0]:
        if crops[0][k] is None:
            continue
        out[k] = np.stack([c[k] for c in crops])
    return out


class TrainLoader:
    """Random-crop batch iterator with an ordered worker pool.

    One epoch = one pass over the (shuffled) cached volumes, pulling
    t_n_patches_per_image crops from each group of n_images_per_batch volumes
    (drop_last=True like the reference, run_training.py:59-66).

    Crop production runs on --n_workers_train threads (the reference's
    ThreadDataLoader worker pool, dataset_builder.py:467-480). Each batch
    draws from its own counter-based stream seeded (seed, epoch, batch), so
    the produced batches are BIT-IDENTICAL for any worker count — worker
    parallelism is a throughput knob, never a semantics knob.
    """

    def __init__(self, dataset: CachedVolumeDataset, cfg: Config, seed: int = 0,
                 prefetch: int = 2):
        self.ds = dataset
        self.cfg = cfg
        self.seed = seed
        self.prefetch = prefetch

    def steps_per_epoch(self) -> int:
        return max(len(self.ds) // self.cfg.n_images_per_batch, 1)

    def _make_batch(self, order: np.ndarray, epoch: int, b: int):
        nb = self.cfg.n_images_per_batch
        idxs = order[b * nb:(b + 1) * nb]
        if len(idxs) < nb:  # wrap for tiny datasets
            idxs = np.concatenate([idxs, order[:nb - len(idxs)]])
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, b]))
        crops = []
        for i in idxs:
            crops.extend(sample_training_crops(self.ds[int(i)], self.cfg, rng))
        return _collate(crops)

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        order = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch])).permutation(
                len(self.ds))
        n_batches = self.steps_per_epoch()
        workers = _pool_size(self.cfg, self.ds.mode)
        # ordered bounded prefetch: keep `workers + prefetch` batches in
        # flight, always yield in batch order
        with cf.ThreadPoolExecutor(workers) as pool:
            pending = [pool.submit(self._make_batch, order, epoch, b)
                       for b in range(min(workers + self.prefetch, n_batches))]
            next_submit = len(pending)
            for b in range(n_batches):
                batch = pending[b].result()
                pending[b] = None  # free the batch once consumed
                if next_submit < n_batches:
                    pending.append(pool.submit(self._make_batch, order,
                                               epoch, next_submit))
                    next_submit += 1
                yield batch


class EvalLoader:
    """Whole-volume iterator for validation/eval/test (batch size 1,
    reference: run_training.py:68-75)."""

    def __init__(self, dataset: CachedVolumeDataset):
        self.ds = dataset

    def __len__(self):
        return len(self.ds)

    def __iter__(self) -> Iterator[Sample]:
        for i in range(len(self.ds)):
            yield self.ds[i]
