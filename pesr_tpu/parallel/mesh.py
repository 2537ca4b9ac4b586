"""Device mesh + data-parallel shardings (SURVEY.md §2.10/§2.11, §7.6).

Strategy: pure data parallelism over a 1-D mesh — the generator is a
~43 M-param convnet that fits on one chip with room to spare, so TP/PP
would only add collective latency (SURVEY.md §2.10 "do not build").
The batch axis is sharded over ``DATA_AXIS``; params/optimizer states are
replicated.  Under ``jax.jit`` the gradient all-reduce compiles to a
``psum`` riding ICI — the NCCL-equivalent demanded by SURVEY.md §2.11 is
the XLA collective compiler, not hand-written comm calls.

The same code path runs on: one real TPU chip (mesh of 1), a full v5e
slice (mesh of N over ICI), and the 8-device virtual CPU mesh used by
tests and the driver's multi-chip dry run.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def force_cpu_devices(n: int) -> None:
    """Make ``n`` virtual CPU devices visible — the JAX
    distributed-without-a-cluster trick shared by tests/conftest.py,
    __graft_entry__.dryrun_multichip, and benchmarks/run.py config 5.

    Must run BEFORE the first backend use.  An existing
    xla_force_host_platform_device_count in XLA_FLAGS is REPLACED (a
    substring guard that skips the update leaves a stale outer-harness
    count in charge, and the caller then fails wanting n devices).  The
    jax_platforms config update (not just the env var) is required
    because this session's TPU plugin sitecustomize force-sets
    "axon,cpu" at interpreter boot."""
    opt = f"--xla_force_host_platform_device_count={n}"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in flags:
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+", opt, flags)
    else:
        flags = (flags + " " + opt).strip()
    os.environ["XLA_FLAGS"] = flags
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized by the caller; use as-is


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the 1-D data-parallel mesh.

    ``num_devices=None`` uses all local devices.  Raises if the request
    exceeds what is available — a truncated silent mesh would skew the
    global batch size.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer states, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host pytree of arrays with the batch axis sharded.

    Requires axis 0 of every leaf to be divisible by the mesh size (the
    data pipeline pads batches to the global batch size).

    Multi-host (DCN) support: when the mesh spans processes, each host
    passes its *local* shard of the global batch and the global array is
    assembled with ``jax.make_array_from_process_local_data`` — the
    SURVEY.md §2.11 "per-host data sharding" contract.  Single-host
    meshes take the plain ``device_put`` path.
    """
    sh = batch_sharding(mesh)
    multihost = jax.process_count() > 1

    def _put(x):
        if isinstance(x, jax.Array) and x.sharding == sh:
            # Already a device array in the target placement (e.g. the
            # synthetic_device renderer out-shards directly): pass
            # through — re-putting would be a no-op single-host and is
            # WRONG multi-host (make_array_from_process_local_data
            # expects host-local shards, not a global array).
            return x
        if multihost:
            return jax.make_array_from_process_local_data(sh, x)
        if x.shape[0] % mesh.size:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by mesh size "
                f"{mesh.size}")
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(_put, batch)


def initialize_distributed(required: bool = False) -> bool:
    """Multi-host bring-up: call once per process BEFORE any backend use
    on multi-host slices.  Returns True when a multi-process runtime
    came up.

    Cluster configuration, in priority order:
      1. ``PESR_COORDINATOR`` / ``PESR_NUM_PROCESSES`` /
         ``PESR_PROCESS_ID`` env vars — manual bring-up for launchers
         jax cannot auto-detect (plain ssh/mpirun-less fleets, the
         2-process CPU test in tests/test_distributed.py).  On a CPU
         backend this also selects gloo cross-process collectives,
         which jax does not enable by default.
      2. jax's own auto-detection (TPU pods, SLURM, Open MPI).

    ``required=False`` (default) is safe to call unconditionally — on
    single-host setups with no coordinator configured it is a no-op,
    and on an ALREADY-initialized runtime (a second call in the same
    process, coordinator env vars set or not) it returns True instead
    of propagating jax's "already initialized" error (round-4 advisor:
    the coord-set path used to raise through required=False).
    ``required=True`` (the ``--distributed`` flag) re-raises so a
    mis-configured cluster fails loudly instead of silently training
    single-host."""
    if jax.distributed.is_initialized():
        return True
    kwargs = {}
    coord = os.environ.get("PESR_COORDINATOR", "")
    if coord:
        # Setting PESR_COORDINATOR is explicit intent: a half-configured
        # cluster fails loudly with a readable message even under
        # required=False (silently training single-host would be worse;
        # a bare KeyError from os.environ worse still — round-3 review).
        try:
            kwargs = dict(
                coordinator_address=coord,
                num_processes=int(os.environ["PESR_NUM_PROCESSES"]),
                process_id=int(os.environ["PESR_PROCESS_ID"]))
        except (KeyError, ValueError) as e:
            raise ValueError(
                "PESR_COORDINATOR is set, so PESR_NUM_PROCESSES and "
                "PESR_PROCESS_ID must both be integers (unset "
                f"PESR_COORDINATOR for single-host runs): {e!r}") from e
        try:
            # Cross-process collectives on CPU need an explicit
            # implementation; a no-op on backends that ignore it.
            jax.config.update("jax_cpu_collectives_implementation",
                              "gloo")
        except Exception:
            pass
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except Exception:
        if required or coord:
            # PESR_COORDINATOR set = explicit intent (same contract as
            # the env-var parse above): an initialize() failure on one
            # worker must not silently train single-host against the
            # cluster's shared check_point dir — divergent training and
            # clobbered checkpoints (round-4 review).
            raise
        return False  # single-host / already initialized: fine


def shard_pytree_replicated(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
