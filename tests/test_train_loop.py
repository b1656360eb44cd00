"""train_one_epoch metric accounting tests.

The device-side windowed accumulation (metric_readback_freq) must produce
EXACTLY the global averages that per-step host readback produces (the
reference's per-step .item() accounting, engine/train.py:64-123), and the
non-finite-loss hard stop must still fire."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.config import Config
from medicalsemseg_tpu.train.loop import train_one_epoch


class FakeLoader:
    def __init__(self, n):
        self.n = n

    def steps_per_epoch(self):
        return self.n

    def epoch(self, e):
        return iter(range(self.n))


def _scripted_step(n_cls, nan_at=None):
    """Deterministic fake train step: metrics vary per iteration; some steps
    have absent classes (dice_count 0) to exercise presence masking."""

    def step(state, it, rng):
        i = int(it)
        loss = np.nan if nan_at == i else 1.0 + 0.05 * i
        counts = np.asarray([2.0, 1.0 if i % 2 else 0.0, 1.0])[:n_cls]
        sums = np.asarray([1.2 + 0.1 * i, 0.5 if i % 2 else 0.0,
                           0.25 * i])[:n_cls]
        m = {"loss": jnp.float32(loss),
             "dice_sum": jnp.asarray(sums, jnp.float32),
             "dice_count": jnp.asarray(counts, jnp.float32),
             "grad_norm": jnp.float32(1.0)}
        return state, m

    return step


def _run(freq, n_steps=7, n_cls=3):
    cfg = Config(output_dim=n_cls, metric_readback_freq=freq, lr=1e-3,
                 warmup_epochs=0, epochs=10)
    _, stats = train_one_epoch(None, _scripted_step(n_cls),
                               FakeLoader(n_steps), epoch=0, cfg=cfg,
                               base_rng=jax.random.PRNGKey(0))
    return stats


def test_windowed_accumulation_matches_per_step():
    per_step = _run(freq=1)
    for freq in (3, 5, 100):
        windowed = _run(freq=freq)
        assert set(windowed) == set(per_step)
        for k in per_step:
            np.testing.assert_allclose(windowed[k], per_step[k], rtol=1e-6,
                                       err_msg=f"{k} diverges at freq={freq}")


def test_per_step_reference_semantics():
    """freq=1 accounting equals hand-computed per-step means (the reference's
    meter semantics: per-step class means averaged over present steps)."""
    stats = _run(freq=1, n_steps=4)
    # class 0 present every step: mean of (sums[0]/2)
    want_c0 = np.mean([(1.2 + 0.1 * i) / 2.0 for i in range(4)])
    np.testing.assert_allclose(stats["train/class0Dice"], want_c0, rtol=1e-6)
    # class 1 present only on odd steps: mean of 0.5/1
    np.testing.assert_allclose(stats["train/class1Dice"], 0.5, rtol=1e-6)
    np.testing.assert_allclose(stats["train/loss"],
                               np.mean([1.0 + 0.05 * i for i in range(4)]),
                               rtol=1e-6)


def test_nonfinite_loss_exits():
    cfg = Config(output_dim=3, metric_readback_freq=4, lr=1e-3,
                 warmup_epochs=0, epochs=10)
    with pytest.raises(SystemExit):
        train_one_epoch(None, _scripted_step(3, nan_at=2), FakeLoader(7),
                        epoch=0, cfg=cfg, base_rng=jax.random.PRNGKey(0))
