"""K-fold majority-vote ensembling.

Reference: majority_vote.py:23-37 — one-hot votes per class for classes
1..n-1, summed over folds, background gets +1 as tiebreak, argmax.

Host IO stays at the edges; the vote itself is a device reduction (a one-hot
sum), which under a fold-sharded mesh axis becomes a single psum over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def majority_vote(fold_labels: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """(K, *spatial) integer fold predictions -> (*spatial,) ensembled labels.

    Matches the reference exactly: foreground classes accumulate one vote per
    fold that predicted them; background counts votes too but starts at +1, so
    ties go to background (reference: majority_vote.py:23-37).
    """
    votes = jax.nn.one_hot(fold_labels, n_classes, dtype=jnp.int32).sum(0)
    votes = votes.at[..., 0].add(1)
    return jnp.argmax(votes, axis=-1).astype(jnp.int32)


def majority_vote_np(fold_labels: np.ndarray, n_classes: int) -> np.ndarray:
    """Pure-NumPy variant for the CLI script on host-resident NIfTI volumes
    (eager jax ops pay a dispatch round-trip each on this backend)."""
    votes = np.zeros((n_classes,) + fold_labels.shape[1:], np.int32)
    for c in range(n_classes):
        votes[c] = (fold_labels == c).sum(axis=0)
    votes[0] += 1
    return votes.argmax(axis=0).astype(np.int32)
