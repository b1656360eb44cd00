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

import queue
import threading
from typing import Dict, Iterator, List, Sequence

import numpy as np

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.data.transforms import (
    Sample,
    load_and_preprocess,
    sample_training_crops,
)


class CachedVolumeDataset:
    """Host-RAM cache of preprocessed volumes (CacheDataset equivalent).

    cache_rate < 1 caches only the head of the list; the rest are
    preprocessed on access (reference: dataset_builder.py:467-480).
    """

    def __init__(self, files: Sequence[Dict], cfg: Config,
                 cache_rate: float = 1.0, mode: str = "train"):
        self.files = list(files)
        self.cfg = cfg
        self.mode = mode
        n_cache = int(len(self.files) * cache_rate)
        self._cache: Dict[int, Sample] = {}
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
    """Random-crop batch iterator with background prefetch.

    One epoch = one pass over the (shuffled) cached volumes, pulling
    t_n_patches_per_image crops from each group of n_images_per_batch volumes
    (drop_last=True like the reference, run_training.py:59-66).
    """

    def __init__(self, dataset: CachedVolumeDataset, cfg: Config, seed: int = 0,
                 prefetch: int = 2):
        self.ds = dataset
        self.cfg = cfg
        self.seed = seed
        self.prefetch = prefetch

    def steps_per_epoch(self) -> int:
        return max(len(self.ds) // self.cfg.n_images_per_batch, 1)

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch]))
        order = rng.permutation(len(self.ds))
        nb = self.cfg.n_images_per_batch
        n_batches = self.steps_per_epoch()

        def produce(q: queue.Queue):
            try:
                for b in range(n_batches):
                    idxs = order[b * nb:(b + 1) * nb]
                    if len(idxs) < nb:  # wrap for tiny datasets
                        idxs = np.concatenate(
                            [idxs, order[:nb - len(idxs)]])
                    crops = []
                    for i in idxs:
                        crops.extend(sample_training_crops(
                            self.ds[int(i)], self.cfg, rng))
                    q.put(_collate(crops))
                q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


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
