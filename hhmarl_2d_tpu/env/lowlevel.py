"""Low-level (fight / escape) environment as a pure function.

Replaces ``LowLevelEnv`` (/root/reference/envs/env_hetero.py:16-271) with a
functional ``reset``/``step`` pair over the SoA sim state -- vmappable to
thousands of parallel battles and shardable over a device mesh.

Step pipeline (mirroring HHMARLBaseEnv.step + LowLevelEnv._take_action):
  1. capture pre-tick opponent stats for kill-reward scaling
  2. apply agent actions; run scripted (L1-3) or frozen-policy (L4-5)
     opponents
  3. sim tick
  4. rewards: out-of-bounds, events, escape shaping, glob_frac mixing
  5. termination + eval info
  6. auto-reset on termination, then ONE observation build on the
     selected (stepped or fresh) state -- pairwise geometry is computed
     once per phase and shared by every consumer (hot-path optimization;
     the 4x4 geometry matrices dominate the step cost).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from hhmarl_2d_tpu.env import actions as A
from hhmarl_2d_tpu.env import geometry as G
from hhmarl_2d_tpu.env import obs as O
from hhmarl_2d_tpu.env import rewards as R
from hhmarl_2d_tpu.env import scripted, spawn
from hhmarl_2d_tpu.sim import engine
from hhmarl_2d_tpu.sim.state import SimState


@struct.dataclass
class LLState:
    sim: SimState
    steps: jnp.ndarray          # i32
    opp_to_attack: jnp.ndarray  # i32[num_agents]: designation from last obs
    tmate: jnp.ndarray          # i32[num_agents]: friendly slot in the obs
                                # (-1 if none); the CTDE critic pairs with it
    escaping: jnp.ndarray       # bool: L3 shared escape flag
    esc_time: jnp.ndarray       # i32: L3 escape countdown
    opp_level: jnp.ndarray      # i32: L5 per-episode opponent level (3..5)
    key: jnp.ndarray            # PRNG for auto-reset


# Opponent actor: (cfg, sim, opp_level, key, geom) -> (acts [n,4], tgts [n])
OppActor = Callable


def _fresh_state(cfg, key):
    """New-episode state without observations."""
    k_sim, k_lvl, k_carry = jax.random.split(key, 3)
    sim = spawn.reset_scenario(cfg, k_sim, mode="LowLevel")
    if cfg.level == 5 and cfg.agent_mode == "fight":
        # per-episode opponent behavior draw (env_hetero.py:55-59)
        opp_level = jax.random.randint(k_lvl, (), 3, 6)
    elif cfg.level == 4:
        # L4 opponents replay the L3 policies (env_base.py:320-321)
        opp_level = jnp.asarray(3, dtype=jnp.int32)
    else:
        opp_level = jnp.asarray(cfg.level, dtype=jnp.int32)
    return LLState(sim=sim, steps=jnp.asarray(0, jnp.int32),
                   opp_to_attack=jnp.full((cfg.num_agents,), -1, jnp.int32),
                   tmate=jnp.full((cfg.num_agents,), -1, jnp.int32),
                   escaping=jnp.asarray(False),
                   esc_time=jnp.asarray(0, jnp.int32),
                   opp_level=opp_level.astype(jnp.int32),
                   key=k_carry)


def reset(cfg, key):
    """New episode.  Returns (LLState, obs [num_agents, OBS_PAD])."""
    state = _fresh_state(cfg, key)
    obs, opp_to_attack, _, tmate, _ = O.lowlevel_side_obs_ext(
        cfg, state.sim, _agent_obs_mode(cfg), "agent")
    return state.replace(opp_to_attack=opp_to_attack, tmate=tmate), obs


def _agent_obs_mode(cfg):
    return "fight" if cfg.agent_mode == "fight" else "esc"


def _opp_stats_focus(cfg, sim, opp_to_attack, geom):
    """focus_angle(designated_opp -> agent, norm), pre-tick
    (env_hetero.py:169-170); 0 where no valid designation."""
    na = cfg.num_agents
    w = G.onehot_slot(opp_to_attack, cfg.n_slots)         # [na, n]; -1 -> 0s
    focus_from = geom["focus"][:, :na].T                  # [na, n]
    focus_n = jnp.clip(G.sel_rows(focus_from, w) / 180.0, 0.0, 1.0)
    valid = (opp_to_attack >= 0) & G.selb(sim.alive, w) & sim.alive[:na]
    return jnp.where(valid, focus_n, 0.0)


def step(cfg, state: LLState, agent_actions, key,
         opp_actor: Optional[OppActor] = None, draws=None, tick_u=None):
    """One environment step.

    agent_actions [num_agents, 4] int32 (AC2 column 3 ignored).
    ``draws``: optional scripted.Draws override pinning the env-level
    random draws; ``tick_u``: optional dict(u_cannon=, u_steer=) pinning
    the engine's stochastic rolls -- both exist for the differential
    parity tests and default to the production PRNG stream.
    Returns (LLState, obs, rewards [num_agents], done, info dict).
    """
    if draws is None:
        from hhmarl_2d_tpu.env.scripted import DRAWS as draws
    n, na = cfg.n_slots, cfg.num_agents
    sim = state.sim
    steps = state.steps + 1
    k_act, k_opp, k_tick, _ = jax.random.split(key, 4)

    # one pre-tick geometry shared by stats, scripted logic and opp obs
    geom_pre = G.pairwise(sim, cfg.map_size)
    opp_stats = _opp_stats_focus(cfg, sim, state.opp_to_attack, geom_pre)

    # assemble the full action/target arrays
    acts = jnp.zeros((n, 4), dtype=jnp.int32)
    acts = acts.at[:na].set(agent_actions.astype(jnp.int32))
    targets = jnp.full((n,), -1, dtype=jnp.int32)
    targets = targets.at[:na].set(state.opp_to_attack)
    acting = jnp.zeros((n,), dtype=bool).at[:na].set(sim.alive[:na])

    escaping, esc_time = state.escaping, state.esc_time
    if cfg.level <= 3:
        sim, escaping, esc_time = scripted.run_scripted(
            cfg, sim, steps, escaping, esc_time, k_opp, geom_pre, draws)
    else:
        if opp_actor is None:
            raise ValueError("levels 4-5 need an opp_actor (frozen policies)")
        opp_acts, opp_targets = opp_actor(cfg, sim, state.opp_level, k_opp,
                                          geom_pre)
        acts = acts.at[na:].set(opp_acts[na:])
        targets = targets.at[na:].set(opp_targets[na:])
        acting = acting.at[na:].set(sim.alive[na:])

    sim, pen = A.apply_actions(cfg, sim, acts, acting, targets, k_act,
                               mode="LowLevel", draws=draws)

    # dynamics
    sim, events = engine.tick(sim, k_tick, na,
                              friendly_check=cfg.friendly_kill,
                              **(tick_u or {}))

    # rewards
    sim, rews, destroyed_agents, _ = R.combat_rewards(
        cfg, sim, events, opp_stats, mode="LowLevel")
    if cfg.agent_mode == "escape" and cfg.esc_dist_rew:
        rews = rews + R.esc_dist_shaping(cfg, sim)
    base = jnp.where(acting[:na], pen[:na], 0.0)
    rewards = R.sum_lowlevel(cfg, base, rews, destroyed_agents, sim.alive[:na])

    # termination (env_base.py:90)
    alive_agents = jnp.sum(sim.alive[:na])
    alive_opps = jnp.sum(sim.alive[na:])
    done = (alive_agents <= 0) | (alive_opps <= 0) | (steps >= cfg.horizon)
    info = {
        "agents_win": ((alive_opps <= 0) & (steps < cfg.horizon)).astype(jnp.int32),
        "opps_win": ((alive_agents <= 0) & (steps < cfg.horizon)).astype(jnp.int32),
        "draw": ((steps >= cfg.horizon) & (alive_agents > 0)
                 & (alive_opps > 0)).astype(jnp.int32),
    }

    # auto-reset BEFORE the obs build: select the surviving state once,
    # then encode observations for whichever state continues.
    next_state = LLState(sim=sim, steps=steps,
                         opp_to_attack=state.opp_to_attack,
                         tmate=state.tmate,
                         escaping=escaping, esc_time=esc_time,
                         opp_level=state.opp_level, key=state.key)
    reset_state = _fresh_state(cfg, state.key)
    next_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            jnp.reshape(done, (1,) * a.ndim) if a.ndim else done, b, a),
        next_state, reset_state)

    obs, opp_to_attack, _, tmate, _ = O.lowlevel_side_obs_ext(
        cfg, next_state.sim, _agent_obs_mode(cfg), "agent")
    next_state = next_state.replace(opp_to_attack=opp_to_attack, tmate=tmate)
    return next_state, obs, rewards, done, info


def make_vec_env(cfg, opp_actor: Optional[OppActor] = None):
    """Batched env: reset(key [B]) and step(state, actions [B,na,4], key [B])."""
    v_reset = jax.vmap(lambda k: reset(cfg, k))
    v_step = jax.vmap(lambda s, a, k: step(cfg, s, a, k, opp_actor))
    return v_reset, v_step
