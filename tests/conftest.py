"""Test configuration: run everything on a simulated 8-device CPU mesh.

Must set the env vars BEFORE jax initializes its backends, so this module
performs the setup at import time (pytest imports conftest first).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

import pytest  # noqa: E402

from medicalsemseg_tpu.utils.jitutil import enable_compilation_cache  # noqa: E402

# single-core CPU: per-op eager dispatch and recompiles are expensive — use
# the persistent compilation cache so test compiles amortize across runs.
enable_compilation_cache()


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
