"""Test-time augmentation: mirror (flip) averaging.

Equivalent of the reference's vendored nn-UNet mirroring TTA
(models/segmentors/nnformer_official/neural_network.py:511
_internal_maybe_mirror_and_pred_3D, SURVEY.md §2.2): average the model's
softmax output over the 8 spatial flip combinations, un-flipping each
prediction. All 8 forwards stay on device inside one jitted program.

The wrapped predictor returns PROBABILITIES, so the sliding window blends
probabilities — exactly nn-UNet's accumulation of softmaxed predictions
(neural_network.py:349-375): a Gaussian-weighted arithmetic mean of probs
across windows. (Returning log-probs instead would make the stitcher compute
a geometric mean, which can flip the argmax near window seams.)
"""

from __future__ import annotations

import itertools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def mirror_tta(predictor: Callable, axes: Tuple[int, ...] = (1, 2, 3),
               apply_softmax: bool = True) -> Callable:
    """Wrap a tuple-input predictor with flip-mirrored averaging.

    `axes` are spatial axes of the (B, D, H, W, C) window batch. The wrapped
    predictor averages probabilities (softmax applied per flip when
    apply_softmax, matching the reference's softmax-before-average) and
    returns those mean probabilities for downstream prob-domain blending.
    """
    combos = []
    for r in range(len(axes) + 1):
        combos.extend(itertools.combinations(axes, r))

    def wrapped(model_in):
        win, centers, affine = model_in
        acc = None
        for combo in combos:
            w = jnp.flip(win, axis=combo) if combo else win
            out = predictor((w, centers, affine))
            out = jnp.flip(out, axis=combo) if combo else out
            p = jax.nn.softmax(out.astype(jnp.float32), -1) if apply_softmax \
                else out.astype(jnp.float32)
            acc = p if acc is None else acc + p
        return acc / len(combos)

    return wrapped
