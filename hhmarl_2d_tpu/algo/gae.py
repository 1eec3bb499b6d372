"""Generalized Advantage Estimation over time-major rollouts.

Matches RLlib 2.4's GAE postprocessing for the reference's setup: episode
terminations and horizon truncations are both reported as dones
(env_base.py:90), so no bootstrap across a done (last_r = 0), and the
rollout tail bootstraps from V(s_T).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(rewards, values, dones, last_value, gamma=0.99, lam=0.95):
    """rewards/values/dones: [T, ...]; last_value: [...].

    Returns (advantages [T, ...], value_targets [T, ...]).
    """
    nonterminal = 1.0 - dones.astype(jnp.float32)

    def scan_fn(carry, x):
        gae, next_v = carry
        r, v, nt = x
        delta = r + gamma * next_v * nt - v
        gae = delta + gamma * lam * nt * gae
        return (gae, v), gae

    (_, _), adv_rev = jax.lax.scan(
        scan_fn,
        (jnp.zeros_like(last_value), last_value),
        (rewards[::-1], values[::-1], nonterminal[::-1]))
    adv = adv_rev[::-1]
    return adv, adv + values


def standardize(adv, axis=None, eps=1e-8):
    """RLlib standardizes advantages per train batch."""
    mean = jnp.mean(adv, axis=axis, keepdims=axis is not None)
    std = jnp.std(adv, axis=axis, keepdims=axis is not None)
    return (adv - mean) / (std + eps)
