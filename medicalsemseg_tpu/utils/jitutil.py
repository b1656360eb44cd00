"""JIT / compilation-cache helpers.

Everything in this framework runs under jit — including flax ``init``: eager
op-by-op dispatch pays a per-op XLA compile, which is pathological on the
single-core CPU used for tests, and wasteful on TPU. ``jit_init`` compiles the
whole initializer as one program. ``enable_compilation_cache`` turns on JAX's
persistent cache so compiles amortize across processes and pytest runs.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: Optional[str] = None) -> None:
    jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def force_cpu() -> None:
    """Pin JAX to the host CPU backend.

    The axon TPU plugin on this machine overrides ``jax_platforms`` to
    'axon,cpu' at import time, so the JAX_PLATFORMS env var alone does NOT
    select CPU — the config must be updated after importing jax (and before
    any backend initialization).
    """
    jax.config.update("jax_platforms", "cpu")


def jit_init(model, rng, *args, **kwargs):
    """flax Module.init compiled as a single XLA program."""
    fn = jax.jit(functools.partial(model.init, **kwargs))
    return fn(rng, *args)
