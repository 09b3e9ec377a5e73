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


def maybe_init_distributed(force: bool = False) -> bool:
    """Multi-host bootstrap: ``jax.distributed.initialize`` when running on a
    pod (replaces the reference's torch.distributed launcher env handshake,
    tools/train.py:164-171).  Auto-detects coordinator env vars; on Cloud TPU
    pods ``initialize()`` discovers peers from the TPU metadata.  No-op on a
    single host unless ``force``.
    """
    import os

    if jax.process_count() > 1:
        return True
    # NOTE: do not key off TPU_WORKER_HOSTNAMES — some environments set it
    # to a warning string (observed on the axon tunnel)
    want = force or any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not want:
        return False
    try:
        jax.distributed.initialize()
        return jax.process_count() > 1
    except Exception as e:  # pragma: no cover - env-specific
        print(f"jax.distributed.initialize failed ({e}); continuing single-host")
        return False


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


def host_allreduce_sum(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Sum a dict of host-local numpy arrays across all JAX processes.

    The multi-host analogue of the reference's
    ``dist.all_reduce(evaluation_semantic)`` (apis/test.py:209): each host
    accumulates metric counters over its val-split shard, then the counters
    are summed across processes before metrics are derived.  Identity on a
    single host.  Uses ``multihost_utils.process_allgather`` (stacks a
    process axis, then sums it) so it works on any mesh layout without the
    caller wiring collectives.
    """
    if jax.process_count() == 1:
        return state
    from jax.experimental import multihost_utils

    out = {}
    for k in sorted(state):  # deterministic order across hosts
        v = np.asarray(state[k])
        if v.dtype.itemsize == 8:
            # jax canonicalizes int64/float64 to 32-bit when x64 is off —
            # a silent wrap for voxel counters past 2**31 (an SSC
            # confusion-matrix cell crosses that within ~1k frames of a
            # 2.1M-voxel grid).  Transport the raw bits as uint32 pairs
            # and reconstruct + sum at full width on the host.
            flat = np.ascontiguousarray(np.atleast_1d(v))
            bits = flat.view(np.uint32).reshape(flat.shape + (2,))
            g = np.ascontiguousarray(multihost_utils.process_allgather(bits))
            per_proc = g.view(v.dtype).reshape((g.shape[0],) + flat.shape)
            out[k] = per_proc.sum(axis=0).reshape(v.shape).astype(v.dtype)
        else:
            gathered = multihost_utils.process_allgather(v)
            out[k] = np.asarray(gathered).sum(axis=0).astype(v.dtype)
    return out
