"""Scripted opponent behaviors for curriculum levels 1-3.

Implements ``__opp_level1/2/3``, ``_escaping_opp`` and ``_hardcoded_opp``
(/root/reference/envs/env_hetero.py:118-158,227-271) as masked vectorized
policies.  Level-3's escape mode uses *shared* mutable flags across both
opponents with sequential trigger semantics (first opponent's coin flip is
visible to the second in the same step), reproduced by an unrolled
slot-order loop.

Quirk preserved: the scripted levels never decrement ``missile_wait`` (only
``_take_base_action`` does, and scripted opponents bypass it), so each
scripted opponent fires at most ONE missile per episode
(env_hetero.py:119-123 sets wait=5; env_base.py:235-236 never runs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hhmarl_2d_tpu import geo
from hhmarl_2d_tpu.env import geometry as G
from hhmarl_2d_tpu.sim import engine


class Draws:
    """Source of the env-level random draws (reference ``random.*`` sites).

    Injectable so differential parity tests can pin every draw to the same
    deterministic value in both the reference env and this one
    (tests/test_parity_reference.py).  ``randint`` is hi-INCLUSIVE, exactly
    like python's random.randint the reference calls.
    """

    def randint(self, key, lo, hi, shape=()):
        return jax.random.randint(key, shape, lo, hi + 1)

    def uniform(self, key, lo, hi, shape=()):
        # explicit f32: under jax_enable_x64 (tests) the default would be
        # f64 and poison the f32 sim state through scan carries
        return jax.random.uniform(key, shape, minval=lo, maxval=hi,
                                  dtype=jnp.float32)


DRAWS = Draws()


def _closest_agent(cfg, sim, opp_slot, geom=None):
    """Closest alive agent to this opponent ([0][0..2] of _nearby_object)."""
    geom = geom if geom is not None else G.pairwise(sim, cfg.map_size)
    agent_alive = (jnp.arange(cfg.n_slots) < cfg.num_agents) & sim.alive
    order, valid = G.sort_enemies(geom["dist_norm"][opp_slot], agent_alive)
    tgt = order[0]
    return tgt, valid[0], geom["dist_norm"][opp_slot, tgt], geom["focus"][opp_slot, tgt]


def _missile_attempt(cfg, sim, i, steps, key, geom=None, draws=DRAWS):
    """Shared missile logic of levels 1 and 2 (env_hetero.py:119-123):
    fire at the closest agent in a 3-tick window every 40 steps, coin-gated;
    sets missile_wait to 5 (never decremented -> one shot per episode)."""
    coin = draws.randint(key, 0, 1) == 1
    tgt, tgt_valid, _, _ = _closest_agent(cfg, sim, i, geom)
    window = jnp.isin(jnp.mod(steps, 40), jnp.asarray([0, 1, 2]))
    mask = jnp.zeros(cfg.n_slots, dtype=bool).at[i].set(
        sim.alive[i] & ~sim.m_ptr[i] & window & coin
        & (sim.missile_wait[i] == 0) & (sim.ac_type[i] == 1) & tgt_valid)
    sim = engine.fire_missiles(
        sim, mask, jnp.full(cfg.n_slots, tgt, dtype=jnp.int32))
    # wait set unconditionally once the outer condition held
    wait = jnp.where(mask, 5, sim.missile_wait)
    return sim.replace(missile_wait=wait)


def level1(cfg, sim, steps, key, geom=None, draws=DRAWS):
    """Stationary opponents that only fire occasional missiles."""
    for off, k in zip(range(cfg.num_opps),
                      jax.random.split(key, cfg.num_opps)):
        sim = _missile_attempt(cfg, sim, cfg.num_agents + off, steps, k, geom,
                               draws)
    return sim


def level2(cfg, sim, steps, key, geom=None, draws=DRAWS):
    """Continuous cannon + random maneuvering (env_hetero.py:125-136)."""
    n = cfg.n_slots
    is_opp = jnp.arange(n) >= cfg.num_agents
    act = is_opp & sim.alive
    sim = engine.fire_cannon(sim, act)

    for off, kk in zip(range(cfg.num_opps),
                       jax.random.split(key, cfg.num_opps)):
        i = cfg.num_agents + off
        k1, k2, k3, k4 = jax.random.split(kk, 4)
        period = draws.randint(k1, 35, 45)
        maneuver = sim.alive[i] & ((steps <= 5) | (jnp.mod(steps, period) <= 5))
        turn = jnp.where(draws.randint(k2, 0, 1) == 1, -90.0, 90.0)
        new_h = jnp.mod(sim.heading[i] + turn, 360.0)
        new_s = 100.0 + draws.randint(k3, 0, 4).astype(jnp.float32) * 75.0
        mask = jnp.zeros(n, dtype=bool).at[i].set(maneuver)
        sim = engine.set_heading(sim, jnp.full(n, new_h), mask)
        sim = engine.set_speed(sim, jnp.full(n, new_s), mask)
        sim = _missile_attempt(cfg, sim, i, steps, k4, geom, draws)
    return sim


def _escaping_heading(lat_rel, lon_rel, key, draws=DRAWS):
    """Quadrant-based diagonal escape heading (env_hetero.py:227-245).

    Reference reads ``y, x = relative_position(lat, lon)`` so y is the
    latitude fraction and x the longitude fraction; headings are
    int(uniform(lo, lo+30)).
    """
    y, x = lat_rel, lon_rel
    lo = jnp.where(y < 0.5,
                   jnp.where(x < 0.5, 30.0, 300.0),
                   jnp.where(x < 0.5, 120.0, 210.0))
    return jnp.floor(draws.uniform(key, lo, lo + 30.0))


def level3(cfg, sim, steps, escaping, esc_time, key, geom=None, draws=DRAWS):
    """Pursuit automaton with random escape phases (env_hetero.py:138-158).

    ``escaping``/``esc_time`` are the shared flags; both are carried
    per-battle in the env state and the countdown decrements once per alive
    opponent per step (reference decrements inside each opponent's branch).
    """
    n = cfg.n_slots
    for off, kk in zip(range(cfg.num_opps),
                       jax.random.split(key, cfg.num_opps)):
        i = cfg.num_agents + off
        k_flip, k_dur, k_esc_h, k_esc_s, k_esc_f, k_r, k_spd, k_spd2, k_m = (
            jax.random.split(kk, 9))
        alive_i = sim.alive[i]

        # trigger: every 60 steps, coin-flip into escape (env_hetero.py:139-142)
        trigger = alive_i & (jnp.mod(steps, 60) == 0) & ~escaping
        flip = draws.randint(k_flip, 0, 1) == 1
        duration = jnp.floor(draws.uniform(k_dur, 20.0,
                                           30.0)).astype(jnp.int32)
        esc_time = jnp.where(trigger & flip, duration, esc_time)
        escaping = escaping | (trigger & flip)

        # escape branch (env_hetero.py:144-149, 227-245)
        ml = geo.make_map_limits(cfg.map_size)
        lat_rel, lon_rel = ml.relative_position(sim.lat[i], sim.lon[i])
        esc_h = _escaping_heading(lat_rel, lon_rel, k_esc_h, draws)
        esc_s = jnp.floor(draws.uniform(k_esc_s, 300.0, 600.0))
        esc_fire = draws.randint(k_esc_f, 0, 1) == 1

        # pursuit branch (_hardcoded_opp, env_hetero.py:247-271)
        tgt, tgt_valid, d_norm, focus = _closest_agent(cfg, sim, i, geom)
        sign = G.correct_angle_sign(sim.heading[i], sim.lat[i], sim.lon[i],
                                    sim.lat[tgt], sim.lon[tgt])
        r = draws.uniform(k_r, 0.7, 1.3)
        turn_ok = tgt_valid & (d_norm > 0.008) & (focus > 4.0)
        pur_h = jnp.where(turn_ok,
                          jnp.mod(sim.heading[i] + r * sign * focus, 360.0),
                          sim.heading[i])
        spd_near = jnp.floor(draws.uniform(k_spd, 100.0, 400.0))
        spd_far = jnp.where(
            focus < 30.0,
            jnp.floor(draws.uniform(k_spd2, 500.0, 800.0)),
            jnp.floor(draws.uniform(k_spd2, 100.0, 500.0)))
        pur_s = jnp.where(tgt_valid & (d_norm > 0.05), spd_far, spd_near)
        pur_s = jnp.where(sim.ac_type[i] == 2, jnp.clip(pur_s, 0.0, 600.0),
                          pur_s)
        pur_fire = tgt_valid & (d_norm < 0.03) & (focus < 10.0)
        pur_fire_missile = tgt_valid & (d_norm < 0.09) & (focus < 5.0)

        use_esc = escaping
        new_h = jnp.where(use_esc, esc_h, pur_h)
        new_s = jnp.where(use_esc, esc_s, pur_s)
        new_s = jnp.where(sim.ac_type[i] == 2, jnp.clip(new_s, 0.0, 600.0),
                          new_s)
        fire = jnp.where(use_esc, esc_fire, pur_fire)
        fire_m = jnp.where(use_esc, False, pur_fire_missile)

        mask = jnp.zeros(n, dtype=bool).at[i].set(alive_i)
        sim = engine.set_heading(sim, jnp.full(n, new_h), mask)
        sim = engine.set_speed(sim, jnp.full(n, new_s), mask)
        sim = engine.fire_cannon(sim, mask & fire)

        m_mask = jnp.zeros(n, dtype=bool).at[i].set(
            alive_i & fire_m & ~sim.m_ptr[i] & (sim.missile_wait[i] == 0)
            & (sim.ac_type[i] == 1))
        sim = engine.fire_missiles(sim, m_mask,
                                   jnp.full(n, tgt, dtype=jnp.int32))
        sim = sim.replace(missile_wait=jnp.where(m_mask, 10,
                                                 sim.missile_wait))

        # countdown decrements inside each alive opponent's escape branch
        esc_time = jnp.where(alive_i & use_esc, esc_time - 1, esc_time)
        escaping = escaping & ~(alive_i & use_esc & (esc_time <= 0))
    return sim, escaping, esc_time


def run_scripted(cfg, sim, steps, escaping, esc_time, key, geom=None,
                 draws=DRAWS):
    """Dispatch by (static) curriculum level."""
    if cfg.level == 1:
        return level1(cfg, sim, steps, key, geom, draws), escaping, esc_time
    if cfg.level == 2:
        return level2(cfg, sim, steps, key, geom, draws), escaping, esc_time
    if cfg.level == 3:
        return level3(cfg, sim, steps, escaping, esc_time, key, geom, draws)
    raise ValueError(f"no scripted behavior for level {cfg.level}")
