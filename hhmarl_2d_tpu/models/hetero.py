"""Heterogeneous low-level actor-critic models (fight / escape).

Flax re-designs of Fight1/Fight2/Esc1/Esc2
(/root/reference/models/ac_models_hetero.py:29-404): per-aircraft-type
actors with a centralized critic that sees both team members'
observations and (normalized) actions -- CTDE.

Interface: all models run on time-major-batched inputs [B, T, d] and
return (logits [B, T, A], value [B, T]).  Rollout uses T=1; training feeds
whole episode sequences so the attention residuals attend over time
exactly like the reference's ``add_time_dimension`` path.

Deliberate deviation from the reference: its module-level ``SHARED_LAYER``
(ac_models_hetero.py:22-27) accidentally shares one 500x500 layer across
*all four model classes and both policies' optimizers*.  We keep the
intended within-model sharing (one trunk used by both actor and critic
towers) but give each model its own trunk parameters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.models.layers import SlimFC, TimeAttention, l2_normalize

# actor logits sizes: sum of MultiDiscrete nvec
ACT_LOGITS_AC1 = 13 + 9 + 2 + 2   # 26
ACT_LOGITS_AC2 = 13 + 9 + 2       # 24


def _dims(ac_type: int, mode: str):
    """(own_obs, other_obs, own_act, other_act, own_split) dims."""
    if mode == "fight":
        own = C.OBS_AC1 if ac_type == 1 else C.OBS_AC2
        other = C.OBS_AC2 if ac_type == 1 else C.OBS_AC1
        split = C.SS_AGENT_AC1 if ac_type == 1 else C.SS_AGENT_AC2
    else:
        own = C.OBS_ESC_AC1 if ac_type == 1 else C.OBS_ESC_AC2
        other = C.OBS_ESC_AC2 if ac_type == 1 else C.OBS_ESC_AC1
        split = 7 if ac_type == 1 else 6
    own_act = C.ACTION_DIM_AC1 if ac_type == 1 else C.ACTION_DIM_AC2
    other_act = C.ACTION_DIM_AC2 if ac_type == 1 else C.ACTION_DIM_AC1
    return own, other, own_act, other_act, split


class FightActorCritic(nn.Module):
    """Fight1 / Fight2 (ac_models_hetero.py:181-404).

    Actor: split-branch MLP (own-state 200 + rest 200) plus a full-obs
    100-d embedding with a time-attention residual; 500->500 shared trunk;
    logits head.  Critic: own/other (obs+act) branches (175+175) plus a
    150-d joint embedding with its own time attention; shared trunk; value.
    """

    ac_type: int = 1
    dtype: Any = None   # computation dtype (params/outputs stay fp32)

    @nn.compact
    def __call__(self, obs_own, obs_other=None, act_own=None, act_other=None,
                 seg=None, actor_only=False):
        d_own, d_other, _, _, split = _dims(self.ac_type, "fight")
        assert obs_own.shape[-1] == d_own, (obs_own.shape, d_own)
        n_logits = ACT_LOGITS_AC1 if self.ac_type == 1 else ACT_LOGITS_AC2
        dt = self.dtype

        shared = SlimFC(500, dtype=dt, name="shared")

        # actor (ac_models_hetero.py:256-274)
        x = jnp.concatenate(
            [SlimFC(200, dtype=dt, name="inp1")(obs_own[..., :split]),
             SlimFC(200, dtype=dt, name="inp2")(obs_own[..., split:])],
            axis=-1)
        x_full = SlimFC(100, dtype=dt, name="inp3")(obs_own)
        x_att = TimeAttention(100, dtype=dt, name="att_act")(x_full, seg)
        x_full = l2_normalize(x_full + x_att)
        x = shared(jnp.concatenate([x, x_full], axis=-1))
        logits = SlimFC(n_logits, activate=False, dtype=dt,
                        name="act_out")(x).astype(jnp.float32)

        # frozen-bank greedy inference only reads logits -- skip the whole
        # centralized-critic tower (half the model FLOPs); init() still
        # traces with actor_only=False so the param tree is complete
        if actor_only:
            return logits, None

        # centralized critic (ac_models_hetero.py:276-291)
        v1 = jnp.concatenate([obs_own, act_own], axis=-1)
        v2 = jnp.concatenate([obs_other, act_other], axis=-1)
        v3 = jnp.concatenate([v1, v2], axis=-1)
        y = jnp.concatenate([SlimFC(175, dtype=dt, name="v1")(v1),
                             SlimFC(175, dtype=dt, name="v2")(v2)], axis=-1)
        y_full = SlimFC(150, dtype=dt, name="v3")(v3)
        y_att = TimeAttention(150, dtype=dt, name="att_val")(y_full, seg)
        y_full = l2_normalize(y_full + y_att)
        y = shared(jnp.concatenate([y, y_full], axis=-1))
        value = SlimFC(1, activate=False, dtype=dt, name="val_out")(y)
        return logits, value[..., 0].astype(jnp.float32)


class EscActorCritic(nn.Module):
    """Esc1 / Esc2 (ac_models_hetero.py:29-179): 3-branch MLP actor
    (own 150 / opponents 250 / friendly 100) and a flat joint critic."""

    ac_type: int = 1
    dtype: Any = None   # computation dtype (params/outputs stay fp32)

    @nn.compact
    def __call__(self, obs_own, obs_other=None, act_own=None, act_other=None,
                 seg=None, actor_only=False):
        del seg  # escape models have no attention (ac_models_hetero.py:29-179)
        d_own, d_other, _, _, split = _dims(self.ac_type, "esc")
        assert obs_own.shape[-1] == d_own, (obs_own.shape, d_own)
        n_logits = ACT_LOGITS_AC1 if self.ac_type == 1 else ACT_LOGITS_AC2
        dt = self.dtype

        shared = SlimFC(500, dtype=dt, name="shared")

        x = jnp.concatenate(
            [SlimFC(150, dtype=dt, name="inp1")(obs_own[..., :split]),
             SlimFC(250, dtype=dt, name="inp2")(obs_own[..., split:split + 18]),
             SlimFC(100, dtype=dt, name="inp3")(obs_own[..., split + 18:])],
            axis=-1)
        x = shared(x)
        logits = SlimFC(n_logits, activate=False, dtype=dt,
                        name="act_out")(x).astype(jnp.float32)

        if actor_only:
            return logits, None

        v = jnp.concatenate([obs_own, act_own, obs_other, act_other], axis=-1)
        y = shared(SlimFC(500, dtype=dt, name="inp1_val")(v))
        value = SlimFC(1, activate=False, dtype=dt, name="val_out")(y)
        return logits, value[..., 0].astype(jnp.float32)


def make_lowlevel_model(mode: str, ac_type: int, dtype=None):
    if mode == "fight":
        return FightActorCritic(ac_type=ac_type, dtype=dtype)
    return EscActorCritic(ac_type=ac_type, dtype=dtype)


def obs_slices(mode: str, ac_type: int):
    """Slice a padded OBS_PAD row down to this model's true obs width."""
    own, other, own_act, other_act, _ = _dims(ac_type, mode)
    return own, other, own_act, other_act
