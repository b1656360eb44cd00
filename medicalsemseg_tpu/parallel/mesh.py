"""Device mesh and sharding helpers.

The reference scales with DDP + NCCL (reference: run_training.py:82-85,
utils/misc.py:227-266). The TPU-native equivalent is a single
`jax.sharding.Mesh` over all chips with the batch dimension sharded along a
'data' axis; gradients and metrics are reduced by XLA-inserted collectives
over ICI when the jitted train step consumes sharded inputs and produces
replicated outputs. Multi-host initialization maps to
`jax.distributed.initialize()`.

A second optional 'model' axis is kept for tensor-style sharding of the
largest weights (not required for parity — the reference is DP-only,
SURVEY.md §2.4 — but free under pjit once annotated).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(mesh_shape: Optional[Sequence[int]] = None,
                axis_names: Tuple[str, ...] = ("data",),
                devices=None) -> Mesh:
    """Build a mesh; default = all devices on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    if len(mesh_shape) != len(axis_names):
        raise ValueError("mesh_shape and axis_names must have equal length")
    arr = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a pytree of host arrays with leading-dim sharding."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
