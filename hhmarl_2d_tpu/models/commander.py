"""Hierarchical commander policy (recurrent, CTDE).

Flax re-design of ``CommanderGru``
(/root/reference/models/ac_models_hier.py:21-112): branch MLPs plus a
200-unit GRU residual over the full observation for the actor, and a
second GRU over the 3-agent joint (obs, act) embedding for the critic.
One shared policy acts for all agents (train_hier.py:202).

Inputs are [B, T, d]; hidden states [B, 200] x 2.  Rollout threads the GRU
state with T=1; training replays sequence chunks from their stored initial
states, with the carry reset to zeros at episode boundaries (``reset``
mask) -- the RLlib RecurrentNetwork sequencing equivalent.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.models.layers import SlimFC, l2_normalize

GRU_SIZE = 200


class _ResetGRUCell(nn.Module):
    """GRUCell whose carry is zeroed where the step's reset flag is set."""

    dtype: Any = None

    @nn.compact
    def __call__(self, carry, xs):
        x, r = xs
        carry = jnp.where(r[..., None], jnp.zeros_like(carry), carry)
        new_carry, y = nn.GRUCell(features=GRU_SIZE, dtype=self.dtype,
                                  name="cell")(carry, x)
        # the carry stays fp32 across time steps (and macro steps) even
        # when the cell computes in bf16 -- recurrent error does not
        # accumulate in the low-precision format
        return new_carry.astype(carry.dtype), y


class _GRUOverTime(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x_bt, h0, reset=None):
        if reset is None:
            reset = jnp.zeros(x_bt.shape[:2], dtype=bool)
        scan = nn.transforms.scan(
            _ResetGRUCell, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1)
        carry, ys = scan(dtype=self.dtype, name="scan")(h0, (x_bt, reset))
        return ys, carry


class CommanderGru(nn.Module):
    """One shared commander policy for an ``num_agents``-ship team.

    ``obs_others``/``act_others`` carry the teammates' observations and
    normalized actions stacked on axis -2 ([B, T, num_agents-1, d]); the
    reference's fixed 3-agent critic (branch names v1/v2/v3 + full branch
    v4, ac_models_hier.py:99-105) generalizes to one 100-unit branch per
    teammate plus the joint full branch.
    """

    n_opp: int = C.N_OPP_HL
    num_agents: int = 3
    dtype: Any = None   # computation dtype (params/outputs stay fp32)

    @nn.compact
    def __call__(self, obs_own, obs_others, act_own, act_others,
                 h_act, h_val, reset=None):
        """Returns (logits [B,T,n_opp+1], value [B,T], (h_act', h_val'))."""
        obs_dim = 14 + 10 * self.n_opp
        assert obs_own.shape[-1] == obs_dim
        assert obs_others.shape[-2] == self.num_agents - 1
        dt = self.dtype

        shared = SlimFC(500, dtype=dt, name="shared")

        # actor (ac_models_hier.py:90-97)
        x = jnp.concatenate(
            [SlimFC(50, dtype=dt, name="inp1")(obs_own[..., :4]),
             SlimFC(200, dtype=dt,
                    name="inp2")(obs_own[..., 4:4 + 10 * self.n_opp]),
             SlimFC(50, dtype=dt,
                    name="inp3")(obs_own[..., 4 + 10 * self.n_opp:])],
            axis=-1)
        x_full = SlimFC(200, dtype=dt, name="inp4")(obs_own)
        y, h_act_new = _GRUOverTime(dtype=dt, name="rnn_act")(
            x_full, h_act, reset)
        x_full = l2_normalize(x_full + y)
        x = shared(jnp.concatenate([x, x_full], axis=-1))
        logits = SlimFC(self.n_opp + 1, activate=False, dtype=dt,
                        name="act_out")(x).astype(jnp.float32)

        # centralized critic (ac_models_hier.py:99-105)
        pairs = [jnp.concatenate([obs_own, act_own], axis=-1)]
        for j in range(self.num_agents - 1):
            pairs.append(jnp.concatenate(
                [obs_others[..., j, :], act_others[..., j, :]], axis=-1))
        z = jnp.concatenate(
            [SlimFC(100, dtype=dt, name=f"v{j + 1}")(p)
             for j, p in enumerate(pairs)],
            axis=-1)
        if self.num_agents != 3:
            # the 500->500 shared tower expects the reference's 300-wide
            # branch bundle (3 x 100); adapt other team sizes to it
            z = SlimFC(300, dtype=dt, name="v_adapt")(z)
        z_full = SlimFC(200, dtype=dt,
                        name="v_full")(jnp.concatenate(pairs, axis=-1))
        w, h_val_new = _GRUOverTime(dtype=dt, name="rnn_val")(
            z_full, h_val, reset)
        z_full = l2_normalize(z_full + w)
        z = shared(jnp.concatenate([z, z_full], axis=-1))
        value = SlimFC(1, activate=False, dtype=dt, name="val_out")(z)
        return (logits, value[..., 0].astype(jnp.float32),
                (h_act_new, h_val_new))

    @staticmethod
    def initial_state(batch: int):
        """[zeros(200), zeros(200)] (ac_models_hier.py:69-71)."""
        return (jnp.zeros((batch, GRU_SIZE), jnp.float32),
                jnp.zeros((batch, GRU_SIZE), jnp.float32))
