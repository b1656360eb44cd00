"""Real 2-process jax.distributed tests (subprocess launch on CPU).

The reference's multi-process surface is torchrun/SLURM/MPI + NCCL
(reference: utils/misc.py:227-266); here two actual python processes join a
jax.distributed coordinator (gloo CPU collectives) and exercise:
  * init_distributed_mode from a declared launcher env,
  * per-host dataset partitioning (disjoint, covering),
  * MetricLogger.synchronize_between_processes (the fp64 all_reduce
    equivalent, reference utils/misc.py:34-45),
  * a cross-process collective through a jitted global-mesh program.

Plus in-process tests of the loud-failure detection paths.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

from medicalsemseg_tpu.data.datalist import partition_dataset


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


_CHILD = textwrap.dedent("""
    import json, os, sys
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["REPO_ROOT"])

    from medicalsemseg_tpu.config import Config
    from medicalsemseg_tpu.parallel.dist import (
        get_rank, get_world_size, init_distributed_mode)
    from medicalsemseg_tpu.data.datalist import partition_dataset
    from medicalsemseg_tpu.utils.logger import MetricLogger, SmoothedValue

    init_distributed_mode(Config())
    out = {"rank": get_rank(), "world": get_world_size(),
           "n_devices": jax.device_count()}

    # per-host data partition (reference: dataset_builder.py:455-464)
    files = [{"image": f"img{i}"} for i in range(10)]
    part = partition_dataset(files, get_world_size(),
                             even_divisible=True)[get_rank()]
    out["part"] = [f["image"] for f in part]

    # metric sync: rank 0 logs [1, 2], rank 1 logs [3, 5] -> global avg 2.75
    logger = MetricLogger()
    logger.add_meter("loss", SmoothedValue(10))
    for v in ([1.0, 2.0] if get_rank() == 0 else [3.0, 5.0]):
        logger.update(loss=v)
    logger.synchronize_between_processes()
    out["loss_global_avg"] = logger.meters["loss"].global_avg

    # cross-process collective through jit over the global device set
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    local = np.full((1,), float(get_rank() + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    out["psum"] = float(total)

    with open(os.environ["OUT_PATH"], "w") as f:
        json.dump(out, f)
""")


def test_two_process_distributed(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for rank in range(2):
        out_path = tmp_path / f"rank{rank}.json"
        outs.append(out_path)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # no simulated 8-device split in children
        env.update({
            "JAX_PLATFORMS": "cpu",
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(rank),
            "REPO_ROOT": os.path.dirname(os.path.dirname(__file__)),
            "OUT_PATH": str(out_path),
        })
        procs.append(subprocess.Popen([sys.executable, "-c", _CHILD],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    for p in procs:
        stdout, _ = p.communicate(timeout=240)
        assert p.returncode == 0, stdout.decode()[-3000:]

    results = [json.load(open(o)) for o in outs]
    assert {r["rank"] for r in results} == {0, 1}
    for r in results:
        assert r["world"] == 2
        assert r["n_devices"] == 2
        # (1+2+3+5)/4 across both processes
        assert abs(r["loss_global_avg"] - 2.75) < 1e-9
        # 1.0 (rank 0) + 2.0 (rank 1) reduced through the global mesh
        assert r["psum"] == 3.0
    # partitions disjoint and covering
    p0, p1 = set(results[0]["part"]), set(results[1]["part"])
    assert p0.isdisjoint(p1)
    assert len(p0 | p1) == 10


def test_detect_env_raises_on_partial_declaration(monkeypatch):
    from medicalsemseg_tpu.parallel import dist

    monkeypatch.setenv("COORDINATOR_ADDRESS", "127.0.0.1:1234")
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    monkeypatch.delenv("PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="must be fully specified"):
        dist.detect_env()


def test_detect_env_single_process_envs(monkeypatch):
    from medicalsemseg_tpu.parallel import dist

    for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
              "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        monkeypatch.delenv(k, raising=False)
    assert dist.detect_env() is None
    # single-task SLURM / MPI envs are not a multi-process launch
    monkeypatch.setenv("SLURM_NTASKS", "1")
    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "1")
    assert dist.detect_env() is None
    assert dist.declared_world_size() == 1
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert dist.detect_env() == {}
    assert dist.declared_world_size() == 4
