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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
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
