"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's NCCL DDP launcher stack
(tools/dist_train.sh, apis/mmdet_train.py:76-80): a 1-D ``data`` mesh (with
room for a ``model`` axis later), batch arrays sharded on their leading axis,
parameters replicated.  The XLA SPMD partitioner inserts the gradient
all-reduces over ICI; multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` (SURVEY.md §2.5).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batch arrays."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data") -> Dict[str, Any]:
    """Device-put every batch array sharded on its leading (batch) axis."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
