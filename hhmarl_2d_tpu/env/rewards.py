"""Reward pipeline.

Implements ``_combat_rewards`` (/root/reference/envs/env_base.py:240-310)
and the low-level summation with optional reward sharing
(envs/env_hetero.py:188-225): out-of-bounds enforcement first, then event
rewards, then escape-distance shaping, then glob_frac mixing.
"""

from __future__ import annotations

import jax.numpy as jnp

from hhmarl_2d_tpu import geo
from hhmarl_2d_tpu.env import geometry as G
from hhmarl_2d_tpu.sim import engine


def combat_rewards(cfg, sim, events, opp_stats_focus, mode="LowLevel",
                   agent_mode=None):
    """Per-agent reward components after a tick.

    ``opp_stats_focus`` [num_agents]: focus_angle(designated_opp -> agent,
    normalized), captured *before* the tick (env_hetero.py:169-170); used to
    scale cannon-kill rewards.  Entries for agents without a valid
    designation are 0.

    Returns (sim, rews [num_agents], destroyed_agents [num_agents] bool,
    kill_event bool).  ``destroyed_agents`` marks agents whose destruction
    was itself penalized (OOB, killed-by-opp, friendly-punish victim) --
    the reference's ``destroyed_ids`` used to gate reward assignment.
    """
    agent_mode = agent_mode if agent_mode is not None else cfg.agent_mode
    # Engine state is float32 by design (matches TPU); cast here so callers
    # running under jax_enable_x64 (golden tests) don't leak float64 into the
    # scatter-adds below.
    opp_stats_focus = jnp.asarray(opp_stats_focus, jnp.float32)
    n, na = cfg.n_slots, cfg.num_agents
    s = cfg.rew_scale
    slot = jnp.arange(n)
    is_agent = slot < na
    rews = jnp.zeros(na, dtype=jnp.float32)

    # --- out-of-boundary (env_base.py:251-263), applied before events
    sim, oob = engine.remove_out_of_bounds(sim, geo.make_map_limits(cfg.map_size))
    p_oob = -5.0 if mode == "LowLevel" else -2.0
    rews = rews + jnp.where(oob[:na], p_oob * s, 0.0)

    # --- event rewards (env_base.py:265-308)
    destroyed = events.destroyed
    killer = events.killer
    killer_is_agent = (killer >= 0) & (killer < na)
    killer_c = jnp.clip(killer, 0, n - 1)
    # one-hot killer maps instead of gathers/scatter-adds: [n(dest), n(slot)]
    # and its [na] credit projection -- everything fuses on TPU
    w_killer = G.onehot_slot(killer_c, n)                 # [n, n]
    credit = (killer_c[None, :] == jnp.arange(na)[:, None])  # [na, n(dest)]

    # agent killed an opponent (env_base.py:269-287)
    opp_killed_by_agent = destroyed & ~is_agent & killer_is_agent
    if mode == "LowLevel":
        if agent_mode == "fight":
            m_rem_k = G.sel(sim.missile_remain.astype(jnp.float32), w_killer)
            m_max_k = G.sel(jnp.maximum(sim.rocket_max, 1).astype(jnp.float32),
                            w_killer)
            can_rem_k = G.sel(sim.cannon_remain, w_killer)
            can_max_k = G.sel(sim.cannon_max, w_killer)
            focus_k = G.sel(jnp.pad(opp_stats_focus, (0, n - na)), w_killer)
            rocket_term = G.shifted_range(m_rem_k / m_max_k, 0.0, 1.0, 1.0, 1.5)
            cannon_term = (
                G.shifted_range(can_rem_k / can_max_k, 0.0, 1.0, 0.5, 1.0)
                + G.shifted_range(focus_k, 0.0, 1.0, 0.5, 1.0))
            kill_val = jnp.where(events.by_rocket, rocket_term, cannon_term) * s
        else:
            kill_val = jnp.zeros(n, dtype=jnp.float32)  # no escape kill reward
    else:
        kill_val = jnp.ones(n, dtype=jnp.float32)  # flat +1 (env_base.py:285)
    rews = rews + jnp.sum(
        jnp.where(credit & opp_killed_by_agent[None, :], kill_val[None, :],
                  0.0), axis=1)

    # friendly kill (env_base.py:290-296); penalties only in LowLevel
    fr_kill = destroyed & is_agent & killer_is_agent
    punish_victim = jnp.zeros(na, dtype=bool)
    if mode == "LowLevel":
        # f32 literal: jnp.sum strengthens weak python-float dtypes, which
        # would leak float64 into the reward stream under jax_enable_x64
        rews = rews + jnp.sum(
            jnp.where(credit & fr_kill[None, :], jnp.float32(-2.0 * s), 0.0),
            axis=1)
        if cfg.friendly_punish:
            rews = rews + jnp.where(fr_kill[:na], -2.0 * s, 0.0)
            punish_victim = fr_kill[:na]

    # opponent killed an agent (env_base.py:299-304)
    killer_is_opp = killer >= na
    ag_killed_by_opp = destroyed[:na] & killer_is_opp[:na]
    p_death = -2.0 if mode == "LowLevel" else -1.0
    rews = rews + jnp.where(ag_killed_by_opp, p_death * s, 0.0)

    destroyed_agents = oob[:na] | ag_killed_by_opp | punish_victim
    kill_event = jnp.any(destroyed) | jnp.any(oob)
    return sim, rews, destroyed_agents, kill_event


def esc_dist_shaping(cfg, sim):
    """Per-time-step escape shaping (env_hetero.py:198-214).

    For each alive agent, iterate alive opponents in distance order
    (1-based rank j): raw degree distance < 0.06 -> -0.02/j (doubled when
    slow); > 0.13 -> +0.02/j (doubled when fast).
    """
    n, na = cfg.n_slots, cfg.num_agents
    geom = G.pairwise(sim, cfg.map_size)
    opp_alive = (jnp.arange(n) >= na) & sim.alive
    rews = jnp.zeros(na, dtype=jnp.float32)
    for i in range(na):
        # sorting by raw distance == sorting by normalized distance, and
        # returns the sorted raw values directly (no gather)
        _, valid, d_raw = G.sort_enemies_vals(geom["dist"][i], opp_alive)
        ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
        close = valid & (d_raw < 0.06)
        far = valid & (d_raw > 0.13)
        slow = sim.speed[i] < 200.0
        fast = sim.speed[i] > 500.0
        r = (jnp.where(close, -0.02 / ranks, 0.0)
             + jnp.where(close & slow, -0.02 / ranks, 0.0)
             + jnp.where(far, 0.02 / ranks, 0.0)
             + jnp.where(far & fast, 0.02 / ranks, 0.0))
        rews = rews.at[i].set(jnp.where(sim.alive[i], jnp.sum(r), 0.0))
    return rews


def sum_lowlevel(cfg, base_rewards, rews, destroyed_agents, alive_post):
    """Final summation with reward sharing (env_hetero.py:217-223).

    ``base_rewards`` are the action-phase penalties (always paid);
    ``rews`` only count for agents still alive or in destroyed_ids.
    glob_frac sharing: the reference defines teammate = i%2+1 for its
    2-vs-2 fight training; for k > 2 agents this generalizes to the sum of
    the teammates' rewards (the rule the reference's own 3-agent
    high-level env uses, env_hier.py:216-221).
    """
    # The reference gates the *assignment*: rews only added when the agent
    # still exists or was penalized-destroyed this step.
    gate = alive_post | destroyed_agents
    own = jnp.where(gate, rews, 0.0)
    if cfg.glob_frac > 0.0 and cfg.agent_mode == "fight":
        if cfg.num_agents == 2:
            mates = rews[::-1]  # teammate of slot 0 is 1 and vice versa
        else:
            mates = jnp.sum(rews) - rews
        return base_rewards + own + jnp.where(gate, cfg.glob_frac * mates,
                                              0.0)
    return base_rewards + own
