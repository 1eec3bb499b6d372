"""Mesh-sharded minibatch SGD shared by both PPO trainers.

The naive SPMD formulation — a global random permutation followed by
``batch[idx]`` — forces XLA to all-gather the entire train batch from
every device on every minibatch (measured 6.8x slower than unsharded at
equal total work on an 8-device mesh). The scalable formulation keeps the
batch sharded end-to-end: under ``shard_map`` each device permutes and
slices only its LOCAL shard of the sequence axis, computes gradients on
its local minibatch, and the only collective is one gradient ``pmean``
per minibatch (the ICI all-reduce of classic data-parallel training).
Parameters and optimizer state stay replicated: every device applies the
identical pmean'd update.

Determinism: bit-reproducible for a fixed mesh size (per-device
permutation keys are ``fold_in(key, axis_index)``); across different
device counts the minibatch composition differs (standard for
data-parallel learners — the reference's Ray workers have the same
property across worker counts).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P


def run_sgd(loss_fn: Callable, tx, params, opt_state, kl_coeff,
            batch, key, *, sgd_iters: int, num_minibatches: int,
            metric_keys: Sequence[str], mesh: Optional[Mesh] = None,
            axis: str = "data"):
    """Minibatched SGD epochs over ``batch`` (leading axis = sequences).

    loss_fn(params, minibatch, kl_coeff) -> (loss, metrics dict).
    Returns (params, opt_state, metrics) with metrics averaged over every
    minibatch of every pass (the RLlib ``update_kl`` epoch-mean estimator).

    With a multi-device ``mesh``, the batch's leading axis must be sharded
    over ``axis`` and divisible by the mesh size; each device trains on
    its local shard with per-minibatch gradient pmean.
    """
    n_dev = mesh.devices.size if mesh is not None else 1
    if n_dev > 1:
        lead = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if lead % n_dev:
            raise ValueError(
                f"batch leading (sequence) axis {lead} must be divisible by "
                f"the {n_dev}-device mesh for sharded SGD")

    def local_sgd(params, opt_state, kl_coeff, batch, key):
        if n_dev > 1:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        local_n = jax.tree_util.tree_leaves(batch)[0].shape[0]
        # clamp so tiny smoke configs never produce empty minibatches
        # (mb = 0 would make every metric a mean over an empty slice = NaN)
        n_mb = min(num_minibatches, local_n)
        mb = local_n // n_mb

        def sgd_pass(carry, k):
            # ONE permutation gather of the whole batch per pass, then the
            # scan slices contiguous minibatches densely (dynamic_slice on
            # the leading axis).  A per-minibatch ``batch[idx]`` gather --
            # the obvious formulation -- costs ~2.4x the whole SGD phase:
            # TPU row-gathers from a 300 MB buffer beat the minibatch
            # fwd+bwd itself (measured 0.807 -> 1.522 train_iter/s at the
            # production 8x32 point when this was changed).
            perm = jax.random.permutation(k, local_n)
            shuf = jax.tree_util.tree_map(lambda x: x[perm], batch)
            mbs = jax.tree_util.tree_map(
                lambda x: x[:mb * n_mb].reshape((n_mb, mb) + x.shape[1:]),
                shuf)

            def mb_step(carry, mb_batch):
                params, opt_state, msum = carry
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mb_batch, kl_coeff)
                if n_dev > 1:
                    grads = jax.lax.pmean(grads, axis)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                msum = {k2: msum[k2] + metrics[k2] for k2 in msum}
                return (params, opt_state, msum), None

            carry, _ = jax.lax.scan(mb_step, carry, mbs)
            return carry, None

        zero = {k2: jnp.asarray(0.0) for k2 in metric_keys}
        if n_dev > 1:
            # metric sums are device-varying until the final pmean; the
            # initial zeros must carry the same varying-axis type
            # (pvary is deprecated in JAX 0.9 in favour of pcast)
            if hasattr(jax.lax, "pcast"):
                zero = jax.tree_util.tree_map(
                    lambda x: jax.lax.pcast(x, axis, to="varying"), zero)
            else:  # pragma: no cover - older JAX
                zero = jax.tree_util.tree_map(
                    lambda x: jax.lax.pvary(x, axis), zero)
        (params, opt_state, msum), _ = jax.lax.scan(
            sgd_pass, (params, opt_state, zero),
            jax.random.split(key, sgd_iters))
        metrics = {k2: v / (sgd_iters * n_mb) for k2, v in msum.items()}
        if n_dev > 1:
            # one collective for the whole metric dict (grads already agree)
            metrics = jax.lax.pmean(metrics, axis)
        return params, opt_state, metrics

    if n_dev == 1:
        return local_sgd(params, opt_state, kl_coeff, batch, key)

    return jax.shard_map(
        local_sgd, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P()),
        out_specs=(P(), P(), P()))(params, opt_state, kl_coeff, batch, key)
