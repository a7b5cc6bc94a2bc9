"""Device mesh construction and sharding helpers.

The canonical mesh is ("data", "model"): utterance batches shard over
"data" (the reference's JOB=1:N array jobs, SURVEY.md §2.8 P1), parameters
shard over "model" when they exceed one chip (P4).  On a multi-host pod,
jax.distributed.initialize + the same code: XLA routes collectives over
ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("mesh")


@dataclasses.dataclass
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    model: int = 1


def make_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, config.model)
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    mesh = Mesh(arr, ("data", "model"))
    log.info("mesh: data=%d model=%d (%s)", data, model, devices[0].platform)
    return mesh


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of [B, ...] arrays sharded over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_shardings(mesh: Mesh):
    """(batch_sharding, replicated_sharding) for pjit in/out specs."""
    return NamedSharding(mesh, P("data")), NamedSharding(mesh, P())
