"""Multi-host runtime initialization.

The reference detects OpenMPI / torchrun / SLURM env vars and joins an NCCL
process group (reference: utils/misc.py:227-266). The JAX equivalent is
`jax.distributed.initialize`, after which every host sees the global device
set and the single mesh spans ICI (intra-slice) and DCN (inter-slice);
collectives are inserted by XLA, barriers are implicit.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from medicalsemseg_tpu.config import Config


def detect_env() -> Optional[dict]:
    """Map the reference's launcher envs to coordinator settings."""
    if "COORDINATOR_ADDRESS" in os.environ:
        return {
            "coordinator_address": os.environ["COORDINATOR_ADDRESS"],
            "num_processes": int(os.environ.get("NUM_PROCESSES", "1")),
            "process_id": int(os.environ.get("PROCESS_ID", "0")),
        }
    if "SLURM_PROCID" in os.environ and "SLURM_NTASKS" in os.environ:
        # jax can derive settings from the SLURM cluster env automatically
        return {}
    if "OMPI_COMM_WORLD_SIZE" in os.environ:
        if int(os.environ["OMPI_COMM_WORLD_SIZE"]) > 1:
            return {}
        return None
    return None


def init_distributed_mode(cfg: Config) -> None:
    """Join the multi-host JAX runtime when a launcher env is present
    (no-op for single-process runs and when already initialized)."""
    if jax.process_count() > 1:
        return  # already initialized (e.g. TPU pod runtime)
    env = detect_env()
    if env is None:
        return
    try:
        jax.distributed.initialize(**env)
        print(f"distributed: process {jax.process_index()} of "
              f"{jax.process_count()}")
    except (RuntimeError, ValueError) as e:
        print(f"distributed init skipped: {e}")


def is_main_process() -> bool:
    return jax.process_index() == 0


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()
