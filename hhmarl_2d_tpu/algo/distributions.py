"""MultiDiscrete categorical action distribution utilities.

The low-level action space is MultiDiscrete([13, 9, 2, 2]) for AC1 and
[13, 9, 2] for AC2 (envs/env_hetero.py:37-43); logits are the concatenation
of the per-component categorical logits, as RLlib's MultiCategorical
expects from the models' flat output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NVEC_AC1 = (13, 9, 2, 2)
NVEC_AC2 = (13, 9, 2)


def _segments(nvec):
    out, start = [], 0
    for n in nvec:
        out.append((start, n))
        start += n
    return out


def sample(logits, nvec, key):
    """Sample each component; returns int32 [..., len(nvec)]."""
    keys = jax.random.split(key, len(nvec))
    comps = []
    for (start, n), k in zip(_segments(nvec), keys):
        comps.append(jax.random.categorical(k, logits[..., start:start + n]))
    return jnp.stack(comps, axis=-1).astype(jnp.int32)


def mode(logits, nvec):
    """Greedy per-component argmax (the reference's frozen-policy decode,
    env_base.py:373-382)."""
    comps = [jnp.argmax(logits[..., s:s + n], axis=-1)
             for s, n in _segments(nvec)]
    return jnp.stack(comps, axis=-1).astype(jnp.int32)


def log_prob(logits, nvec, actions):
    """Sum of per-component categorical log-probs.

    The selected-entry pick is a one-hot multiply-reduce, NOT
    ``take_along_axis``: a minor-axis dynamic gather compiles to a
    serialized kCustom fusion on TPU that was measured at 37% of the whole
    PPO SGD step (7 gathers x 0.2 ms on a [16384, 13] array each, vs
    ~microseconds for the vectorized select-sum).
    """
    lp = 0.0
    for i, (s, n) in enumerate(_segments(nvec)):
        logp = jax.nn.log_softmax(logits[..., s:s + n])
        onehot = actions[..., i:i + 1] == jnp.arange(n, dtype=actions.dtype)
        lp = lp + jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    return lp


def entropy(logits, nvec):
    ent = 0.0
    for s, n in _segments(nvec):
        logp = jax.nn.log_softmax(logits[..., s:s + n])
        ent = ent - jnp.sum(jnp.exp(logp) * logp, axis=-1)
    return ent


def kl(logits_p, logits_q, nvec):
    """KL(p || q) summed over components (RLlib's MultiCategorical.kl)."""
    out = 0.0
    for s, n in _segments(nvec):
        lp = jax.nn.log_softmax(logits_p[..., s:s + n])
        lq = jax.nn.log_softmax(logits_q[..., s:s + n])
        out = out + jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)
    return out


def pad_actions(actions, width=4):
    """Pad AC2's 3-component actions to the common 4-wide layout."""
    pad = width - actions.shape[-1]
    if pad <= 0:
        return actions
    return jnp.concatenate(
        [actions, jnp.zeros(actions.shape[:-1] + (pad,), actions.dtype)],
        axis=-1)
