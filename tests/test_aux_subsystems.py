"""Aux subsystem smoke tests: profiling hooks, distributed env detection,
anomaly detection (SURVEY.md §5)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalsemseg_tpu.parallel.dist import (
    detect_env,
    get_rank,
    get_world_size,
    is_main_process,
)
from medicalsemseg_tpu.utils.profiling import (
    annotate,
    device_memory_stats,
    enable_anomaly_detection,
    trace,
)


def test_single_process_helpers():
    assert get_rank() == 0
    assert get_world_size() == 1
    assert is_main_process()


def test_detect_env_variants(monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "SLURM_PROCID", "SLURM_NTASKS",
                "OMPI_COMM_WORLD_SIZE", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert detect_env() is None
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "2")
    env = detect_env()
    assert env == {"coordinator_address": "10.0.0.1:1234",
                   "num_processes": 4, "process_id": 2}
    monkeypatch.delenv("COORDINATOR_ADDRESS")
    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "1")
    assert detect_env() is None  # single-process MPI launch


def test_trace_and_annotate(tmp_path):
    with trace(None):  # no-op path
        pass
    with trace(str(tmp_path / "prof")):
        with annotate("test-region"):
            _ = jnp.ones(8).sum().block_until_ready()
    # a profile artifact directory is produced
    assert any(tmp_path.glob("prof/**/*")), "no trace artifacts written"


def test_anomaly_detection_raises_on_nan():
    enable_anomaly_detection(True)
    try:
        with pytest.raises(FloatingPointError):
            f = jax.jit(lambda x: jnp.log(x) * 0 + jnp.sqrt(x))
            np.asarray(f(jnp.asarray([-1.0])))
    finally:
        enable_anomaly_detection(False)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    for k, v in stats.items():
        assert set(v) == {"bytes_in_use", "peak_bytes_in_use"}
