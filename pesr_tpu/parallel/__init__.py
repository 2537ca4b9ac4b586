"""Distributed/communication layer (SURVEY.md §2.11).

The reference has no comm backend at all (at most single-process
``nn.DataParallel``); the TPU-native equivalent is XLA collectives over
ICI/DCN driven by sharding annotations.  Everything above this module is
backend-agnostic: it sees a `Mesh` and sharding helpers, never devices.
"""

from pesr_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    force_cpu_devices,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_batch,
    shard_pytree_replicated,
)

__all__ = [
    "DATA_AXIS",
    "force_cpu_devices",
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_pytree_replicated",
]
