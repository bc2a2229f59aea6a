"""Device mesh + sharding rules.

TPU-native replacement for the reference's accelerate/DDP/NCCL layer
(reference: train_edlora.py:34,70,128; SURVEY.md §2C). The reference's only
parallelism is data-parallel gradient sync; on TPU that is simply a batch
axis sharded over the mesh — XLA inserts the gradient all-reduce over ICI.
No explicit communication code exists, by design.

The mesh carries two axes ('data', 'model'): 'model' is size 1 today but the
axis is plumbed so fusion's batched least-squares and any future tensor
sharding can shard over it without API changes (SURVEY.md §2C suggestion).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % model_parallel == 0
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P('data'))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in a host batch with its leading axis split over the
    'data' mesh axis (the DDP 'scatter' — implicit in the reference's
    accelerate.prepare dataloader wrapping)."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
