"""Multi-host runtime initialization.

The reference detects OpenMPI / torchrun / SLURM env vars and joins an NCCL
process group (reference: utils/misc.py:227-266). The JAX equivalent is
`jax.distributed.initialize`, after which every host sees the global device
set and the single mesh spans ICI (intra-slice) and DCN (inter-slice);
collectives are inserted by XLA, barriers are implicit.

Unlike the reference (which silently degrades to single-process on a
malformed launch, utils/misc.py:247-251), a launcher env that explicitly
declares world_size > 1 here MUST produce a multi-process runtime — anything
else raises, because silently training on 1/N of the data is the worst
failure mode a distributed job can have.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from medicalsemseg_tpu.config import Config


def detect_env() -> Optional[dict]:
    """Map the reference's launcher envs to coordinator settings.

    Returns None when no multi-process launch is declared; a (possibly empty)
    kwargs dict for jax.distributed.initialize otherwise. Empty dict means
    "auto-detect" (SLURM / Open MPI cluster envs jax knows natively).
    Raises ValueError on an inconsistent declaration.
    """
    if "COORDINATOR_ADDRESS" in os.environ:
        # torchrun-style explicit rendezvous (reference: utils/misc.py:238-242)
        missing = [k for k in ("NUM_PROCESSES", "PROCESS_ID")
                   if k not in os.environ]
        if missing:
            raise ValueError(
                f"COORDINATOR_ADDRESS set but {missing} missing; a declared "
                "multi-process launch must be fully specified")
        return {
            "coordinator_address": os.environ["COORDINATOR_ADDRESS"],
            "num_processes": int(os.environ["NUM_PROCESSES"]),
            "process_id": int(os.environ["PROCESS_ID"]),
        }
    if int(os.environ.get("SLURM_NTASKS", "1")) > 1:
        return {}  # jax derives everything from the SLURM env
    if int(os.environ.get("OMPI_COMM_WORLD_SIZE", "1")) > 1:
        return {}  # jax's Open MPI auto-detection
    return None


def declared_world_size() -> int:
    for k in ("NUM_PROCESSES", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        if k in os.environ:
            return int(os.environ[k])
    return 1


def init_distributed_mode(cfg: Config) -> None:
    """Join the multi-host JAX runtime when a launcher env is present.

    No-op for single-process runs and when already initialized. Hard-fails
    (re-raises) when the env declares world_size > 1 but initialization does
    not produce that world — the reference's silent single-process fallback
    (utils/misc.py:247-251) is deliberately NOT reproduced.
    """
    env = detect_env()
    if env is None:
        return  # single-process: never touch the backends
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # already initialized (e.g. TPU pod runtime)
    # NB: the backend must not be instantiated yet (jax.devices() /
    # process_count() would pin a single-process client), so platform
    # detection reads config/env only.
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    if platforms.split(",")[0].strip().lower() == "cpu":
        # CPU cross-process collectives need an explicit implementation
        # (used by the simulated multi-host tests; harmless elsewhere)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(**env)
    world = declared_world_size()
    if world > 1 and jax.process_count() != world:
        raise RuntimeError(
            f"launcher declared {world} processes but the runtime joined "
            f"{jax.process_count()}; refusing to continue on partial data")
    print(f"distributed: process {jax.process_index()} of "
          f"{jax.process_count()}")


def is_main_process() -> bool:
    return jax.process_index() == 0


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()
