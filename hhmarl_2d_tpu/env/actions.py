"""Action decoding and application (pre-tick phase).

Implements ``_take_base_action`` (/root/reference/envs/env_base.py:214-238):
heading/speed commands, cannon bursts, missile launch attempts with
cooldown bookkeeping, and the escape-mode ammo-waste penalties.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.sim import engine

_MAXSPD = np.asarray(C.MAX_SPEED_KNOTS, np.float32)


def apply_actions(cfg, sim, acts, acting, opp_target, key, mode="LowLevel",
                  agent_mode=None, draws=None):
    """Apply decoded actions for every slot in ``acting``.

    acts        [n, 4] int32; AC2 ignores column 3 (missile)
    acting      [n]    bool: slots taking policy actions this step
    opp_target  [n]    int32 designated opponent slot, -1 if none
    Returns (sim, esc_penalty [n]) where esc_penalty holds the -0.1
    ammo-waste penalties of escape training (env_base.py:223-233).
    """
    n = sim.n_slots
    agent_mode = agent_mode if agent_mode is not None else cfg.agent_mode
    is_agent = jnp.arange(n) < cfg.num_agents

    # relative heading: (h + (a0-6)*15) % 360 (env_base.py:218)
    new_h = jnp.mod(sim.heading + (acts[:, 0].astype(jnp.float32) - 6.0) * 15.0,
                    360.0)
    # absolute speed: 100 + (max-100)/8 * a1 (env_base.py:219)
    # type-table select, not a gather (gathers don't fuse on TPU)
    maxspd = jnp.where(sim.ac_type == 1, _MAXSPD[0], _MAXSPD[1])
    new_s = 100.0 + ((maxspd - 100.0) / 8.0) * acts[:, 1].astype(jnp.float32)
    sim = engine.set_heading(sim, new_h, acting)
    sim = engine.set_speed(sim, new_s, acting)

    # cannon (env_base.py:221-225)
    fire_c = acting & (acts[:, 2] > 0) & (sim.cannon_remain > 0.0)
    pen = jnp.where(
        fire_c & is_agent & (sim.cannon_remain < 90.0)
        & (mode == "LowLevel") & (agent_mode == "escape"),
        -0.1, 0.0)
    sim = engine.fire_cannon(sim, fire_c)

    # missile attempt (env_base.py:227-233).  The cooldown is consumed on
    # every attempt, even when the launch envelope check fails inside
    # fire_missile.
    attempt = (acting & (sim.ac_type == 1) & (acts[:, 3] > 0)
               & (opp_target >= 0) & (sim.missile_remain > 0)
               & ~sim.m_ptr & (sim.missile_wait == 0))
    sim = engine.fire_missiles(sim, attempt, opp_target)

    lo, hi = C.MISSILE_WAIT_LL if mode == "LowLevel" else C.MISSILE_WAIT_HL
    if draws is None:
        from hhmarl_2d_tpu.env.scripted import DRAWS as draws
    wait_draw = draws.randint(key, lo, hi, (n,)).astype(jnp.int32)
    wait = jnp.where(attempt, wait_draw, sim.missile_wait)
    pen = pen + jnp.where(
        attempt & is_agent & (sim.missile_remain < 3)
        & (mode == "LowLevel") & (agent_mode == "escape"),
        -0.1, 0.0)

    # decrement while the missile pointer is clear (env_base.py:235-236);
    # a failed attempt therefore immediately ticks its own fresh cooldown.
    wait = jnp.where(acting & (wait > 0) & ~sim.m_ptr, wait - 1, wait)
    return sim.replace(missile_wait=wait), pen
