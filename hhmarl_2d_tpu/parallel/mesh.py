"""Device-mesh scaling: shard the env batch, replicate the learner.

TPU-native replacement for the reference's Ray rollout-worker parallelism
and object-store transport (train_hetero.py:212, SURVEY.md section 2 #20-21):
instead of N worker processes with policy replicas and RPC weight
broadcast, the single-controller program shards the vectorized env batch
over a ``data`` mesh axis and replicates parameters; XLA inserts the
gradient all-reduce (psum) over ICI automatically during the backward pass
of the jitted train step.

With multi-host pods the same code runs SPMD per host (jax.distributed);
the env-batch leading axis is globally sharded and DCN is only crossed by
the gradient reduction.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_distributed(coordinator: str | None = None,
                      num_processes: int | None = None,
                      process_id: int | None = None) -> None:
    """Multi-host entry: one JAX process per host, SPMD over the pod.

    Replaces Ray's worker processes + gRPC transport (train_hetero.py:212,
    SURVEY.md section 2 #21).  On TPU pods ``jax.distributed.initialize()``
    autodetects the coordinator from the environment; the explicit arguments
    (or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) cover
    CPU/GPU fleets.  After this, ``jax.devices()`` spans the whole pod and
    ``make_mesh()`` builds a global data mesh; the driver code is unchanged
    -- env batches shard globally and gradient psums ride ICI/DCN.
    """
    kw = {}
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        kw["coordinator_address"] = coordinator
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} visible "
                "(on CPU set XLA_FLAGS=--xla_force_host_platform_device_count)")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (env batch) dimension."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(mesh: Mesh, tree, axis: str = "data"):
    """Place every leaf with its leading dim sharded over ``axis``."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate_tree(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def place_train_inputs(mesh: Mesh, ts, *batched, axis: str = "data"):
    """Standard placement for one trainer: learner state replicated, every
    env-batched pytree sharded on its leading axis.

    Returns (ts, *batched) device_put with NamedShardings so the jitted
    train step runs SPMD over the mesh without tracing changes: XLA shards
    the rollout along the env batch and inserts the gradient all-reduce.
    """
    ts = replicate_tree(mesh, ts)
    out = tuple(shard_batch_tree(mesh, b, axis) for b in batched)
    return (ts,) + out
