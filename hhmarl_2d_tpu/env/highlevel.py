"""High-level (commander) environment as a pure function.

Replaces ``HighLevelEnv`` (/root/reference/envs/env_hier.py:27-250): the
commander picks, per agent, an opponent to fight (1..N_OPP_HL) or escape
(0); one env step runs a macro-action of up to 16 simulator sub-steps in
which every aircraft on BOTH teams is driven by the frozen low-level
policies, with early exit on kills or a "surrounding" situation event.

The macro-action loop is a ``lax.scan`` over 16 sub-steps with an active
flag (inactive iterations pass state through), reproducing the
data-dependent loop length (env_hier.py:125-138) without dynamic control
flow.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.env import actions as A
from hhmarl_2d_tpu.env import geometry as G
from hhmarl_2d_tpu.env import hl_obs
from hhmarl_2d_tpu.env import obs as O
from hhmarl_2d_tpu.env import rewards as R
from hhmarl_2d_tpu.env import spawn
from hhmarl_2d_tpu.models import policy as P
from hhmarl_2d_tpu.sim import engine
from hhmarl_2d_tpu.sim.state import SimState


@struct.dataclass
class HLState:
    sim: SimState
    steps: jnp.ndarray       # i32: simulator sub-steps this episode
    lists: jnp.ndarray       # i32 [n, m] designation lists from state()
    valids: jnp.ndarray      # bool [n, m]
    dists: jnp.ndarray       # f32 [n, m] stale normalized distances
    key: jnp.ndarray


def make_hl_bank(team_fight, team_esc, fight_params, esc_params,
                 fight_params_opp=None) -> Dict[str, Any]:
    """Frozen-policy bank for the embedded low-level inference
    (_get_policies "HighLevel", env_base.py:332-346)."""
    return {
        "fight": fight_params,
        "escape": esc_params,
        "fight_opp": fight_params_opp or fight_params,
        "_team_fight": team_fight,
        "_team_esc": team_esc,
    }




def _embedded_actions(cfg, bank, sim, lists, valids, dists, ca, geom=None):
    """Frozen-policy actions for every slot (env_hier.py:127-130):
    fight obs against the designated opponent with stale distance, escape
    obs over the stored list; fresh closest-friendly block; greedy decode.
    Returns (acts [n,4], targets [n])."""
    n, na = cfg.n_slots, cfg.num_agents
    slots = jnp.arange(n)
    num_valid = jnp.sum(valids, axis=1).astype(jnp.int32)
    geom = geom if geom is not None else G.pairwise(sim, cfg.map_size)

    # designated opponent: list[ca-1]; escape (ca==0) indexes [-1], i.e.
    # the last valid entry (env_hier.py:130)
    des_idx = jnp.where(ca > 0, jnp.clip(ca - 1, 0, lists.shape[1] - 1),
                        jnp.clip(num_valid - 1, 0, lists.shape[1] - 1))
    des = lists[slots, des_idx]
    des_valid = valids[slots, des_idx]
    des_dist = dists[slots, des_idx]
    targets = jnp.where(des_valid, des, -1)

    # fresh closest friendly per slot (env_hier.py:106-107)
    fri_slot, fri_valid = [], []
    for i in range(n):
        same = ((jnp.arange(n) < na) if i < na else (jnp.arange(n) >= na))
        same = same & sim.alive & (jnp.arange(n) != i)
        order, valid = G.sort_enemies(geom["dist_norm"][i], same)
        fri_slot.append(order[0])
        fri_valid.append(valid[0])
    fri_slot = jnp.stack(fri_slot)
    fri_valid = jnp.stack(fri_valid)

    # fight obs: designated opp in column 0
    fight_list = jnp.stack([des, des], axis=1)
    fight_valid = jnp.stack([des_valid, des_valid], axis=1)
    fight_dist = jnp.stack([des_dist, des_dist], axis=1)
    obs_fight, _ = O.build_lowlevel_obs(
        cfg, sim, "fight", list(range(n)), fight_list, fight_valid,
        fight_dist, fri_slot, fri_valid, geom=geom)
    # escape obs: stored list with stale distances (env_hier.py:110-111)
    obs_esc, _ = O.build_lowlevel_obs(
        cfg, sim, "esc", list(range(n)), lists[:, :2], valids[:, :2],
        dists[:, :2], fri_slot, fri_valid, geom=geom)

    # actor-only greedy decode; pinned-type slots (the first two of each
    # group, env/spawn.py) run a single type model (models/policy.py)
    team_f, team_e = bank["_team_fight"], bank["_team_esc"]
    ac1 = sim.ac_type == 1
    st_ag = P.static_slot_types([na])
    st_opp = P.static_slot_types([n - na])
    fight_acts = jnp.concatenate([
        P.greedy_actor_mixed(team_f, bank["fight"], obs_fight[:na],
                             ac1[:na], st_ag),
        P.greedy_actor_mixed(team_f, bank["fight_opp"], obs_fight[na:],
                             ac1[na:], st_opp)])
    esc_acts = P.greedy_actor_mixed(team_e, bank["escape"], obs_esc, ac1,
                                    st_ag + st_opp)
    acts = jnp.where((ca == 0)[:, None], esc_acts, fight_acts)
    return acts, targets


def _action_assess(cfg, sim, lists, valids, commander_actions, key,
                   fight_ratio=None, assess_u=None):
    """env_hier.py:142-190: clamp invalid agent choices (-0.1), shaped
    +0.1 rewards for favourable decisions, and sample the opponents'
    commander actions with hier_opp_fight_ratio.

    ``fight_ratio`` optionally overrides ``cfg.hier_opp_fight_ratio`` with
    a *traced* probability in [0, 1] so ratio sweeps reuse one compiled
    program instead of recompiling per static config value.
    ``assess_u``: optional dict(u_fight=, u_other=, u_pick=) pinning the
    opponent commander's uniform draws (differential parity tests)."""
    n, na = cfg.n_slots, cfg.num_agents
    geom = G.pairwise(sim, cfg.map_size)
    num_valid = jnp.sum(valids, axis=1).astype(jnp.int32)

    ca = jnp.zeros(n, dtype=jnp.int32)
    ca = ca.at[:na].set(commander_actions.astype(jnp.int32))

    # agents
    agent_ca = ca[:na]
    nv_a = num_valid[:na]
    invalid = (agent_ca > 0) & (agent_ca - 1 >= nv_a)
    agent_ca = jnp.where(invalid, 1, agent_ca)
    rew0 = jnp.where(invalid & sim.alive[:na], -0.1, 0.0)

    if cfg.hier_action_assess:
        ai = jnp.arange(na)
        des = lists[ai, jnp.clip(agent_ca - 1, 0, lists.shape[1] - 1)]
        fav = ((geom["dist"][ai, des] < 0.1)
               & (geom["focus"][ai, des] < 15.0)
               & (geom["focus"][des, ai] > 40.0))
        rew0 = jnp.where((agent_ca > 0) & ~invalid & sim.alive[:na],
                         jnp.where(fav, 0.1, 0.0), rew0)
        cl = lists[ai, 0]
        adv = ((geom["dist"][cl, ai] < 0.1)
               & (geom["focus"][cl, ai] < 15.0)
               & (geom["focus"][ai, cl] > 40.0))
        rew0 = jnp.where((agent_ca == 0) & adv & sim.alive[:na] & valids[ai, 0],
                         0.1, rew0)
    ca = ca.at[:na].set(jnp.where(sim.alive[:na], agent_ca, -1))

    # opponents: stochastic commander (env_hier.py:173-186)
    k_fight, k_other, k_pick = jax.random.split(key, 3)
    if assess_u is None:
        u_fight = jax.random.uniform(k_fight, (cfg.num_opps,),
                                     dtype=jnp.float32)
        u_other = jax.random.uniform(k_other, (cfg.num_opps,),
                                     dtype=jnp.float32)
        u_pick = jax.random.uniform(k_pick, (cfg.num_opps,),
                                    dtype=jnp.float32)
    else:
        bc = lambda u: jnp.broadcast_to(
            jnp.asarray(u, jnp.float32), (cfg.num_opps,))
        u_fight, u_other, u_pick = (bc(assess_u["u_fight"]),
                                    bc(assess_u["u_other"]),
                                    bc(assess_u["u_pick"]))
    nv_o = num_valid[na:]
    if fight_ratio is None:
        fight_ratio = cfg.hier_opp_fight_ratio / 100.0
    fight = u_fight < fight_ratio
    pick_other = (nv_o > 1) & (u_other < 0.75)
    # randint(2, possible) inclusive
    other_id = 2 + jnp.floor(
        u_pick * jnp.maximum(nv_o - 1, 1).astype(jnp.float32)).astype(jnp.int32)
    other_id = jnp.clip(other_id, 2, jnp.maximum(nv_o, 2))
    opp_ca = jnp.where(fight, jnp.where(pick_other, other_id, 1), 0)
    ca = ca.at[na:].set(jnp.where(sim.alive[na:], opp_ca, -1))
    return ca, rew0


def _surrounding_event(cfg, sim, geom=None):
    """env_hier.py:192-208: any alive agent/opponent pair closer than 0.1
    (raw degrees) with either focus angle under 15 degrees."""
    n, na = cfg.n_slots, cfg.num_agents
    geom = geom if geom is not None else G.pairwise(sim, cfg.map_size)
    ai = jnp.arange(na)[:, None]
    oj = jnp.arange(na, n)[None, :]
    pair = (sim.alive[:na][:, None] & sim.alive[na:][None, :]
            & (geom["dist"][ai, oj] < 0.1)
            & ((geom["focus"][ai, oj] < 15.0) | (geom["focus"][oj, ai] < 15.0)))
    return jnp.any(pair)


def reset(cfg, key):
    k_sim, k_carry = jax.random.split(key)
    sim = spawn.reset_scenario(cfg, k_sim, mode="HighLevel")
    obs, lists, valids, dists = hl_obs.commander_obs(cfg, sim)
    return HLState(sim=sim, steps=jnp.asarray(0, jnp.int32), lists=lists,
                   valids=valids, dists=dists, key=k_carry), obs


def step(cfg, state: HLState, commander_actions, bank, key,
         fight_ratio=None, draws=None, tick_u=None, assess_u=None):
    """One commander step = one macro action (env_hier.py:114-140).

    commander_actions: [num_agents] int32 in [0, N_OPP_HL].
    ``fight_ratio``: optional traced override of the opponent commander's
    fight probability (see _action_assess).
    ``draws``/``tick_u``/``assess_u``: optional pins for the env-level,
    engine-level and opponent-commander random draws -- the differential
    parity hooks, mirroring lowlevel.step.
    Returns (HLState, obs [na, OBS_HL], rewards [na], done, info).
    """
    n, na = cfg.n_slots, cfg.num_agents
    sim = state.sim
    k_assess, k_macro, k_reset = jax.random.split(key, 3)

    ca, rewards = _action_assess(cfg, sim, state.lists, state.valids,
                                 commander_actions, k_assess,
                                 fight_ratio=fight_ratio, assess_u=assess_u)

    def substep(carry, inp):
        sim, rewards, steps, stop = carry
        t, k = inp
        k_act, k_tick = jax.random.split(k)

        geom = G.pairwise(sim, cfg.map_size)
        acts, targets = _embedded_actions(cfg, bank, sim, state.lists,
                                          state.valids, state.dists, ca,
                                          geom)
        acting = sim.alive & (ca >= 0)
        sim2, _ = A.apply_actions(cfg, sim, acts, acting, targets, k_act,
                                  mode="HighLevel", draws=draws)
        sim2, events = engine.tick(sim2, k_tick, na,
                                   friendly_check=cfg.friendly_kill,
                                   **(tick_u or {}))
        sim2, rews, destroyed_agents, kill_event = R.combat_rewards(
            cfg, sim2, events, jnp.zeros(na), mode="HighLevel")

        # summation with glob_frac sharing (env_hier.py:210-224)
        gate = sim2.alive[:na] | destroyed_agents
        own = jnp.where(gate, rews, 0.0)
        if cfg.glob_frac > 0.0:
            others = jnp.sum(rews) - rews
            own = own + jnp.where(gate, cfg.glob_frac * others, 0.0)
        rewards2 = rewards + own

        # geometry for the situation check reflects the post-tick state
        situation = (t > C.HL_MIN_SUB_STEPS) & _surrounding_event(cfg, sim2)

        active = ~stop
        sim = jax.tree_util.tree_map(
            lambda a, b: jnp.where(jnp.reshape(active, (1,) * a.ndim)
                                   if a.ndim else active, b, a), sim, sim2)
        rewards = jnp.where(active, rewards2, rewards)
        steps = jnp.where(active, steps + 1, steps)
        stop = stop | (active & (kill_event | situation))
        return (sim, rewards, steps, stop), None

    ts = jnp.arange(C.HL_N_SUB_STEPS + 1)
    keys = jax.random.split(k_macro, C.HL_N_SUB_STEPS + 1)
    (sim, rewards, steps, _), _ = jax.lax.scan(
        substep, (sim, rewards, state.steps, jnp.asarray(False)), (ts, keys))

    alive_agents = jnp.sum(sim.alive[:na])
    alive_opps = jnp.sum(sim.alive[na:])
    done = (alive_agents <= 0) | (alive_opps <= 0) | (steps >= cfg.horizon)

    # eval accounting (env_base.py:91-107): counts gated on *post-macro*
    # existence, selections keyed by the (possibly clamped) actions
    a_alive = sim.alive[:na]
    o_alive = sim.alive[na:]
    af = jnp.sum(a_alive & (ca[:na] > 0))
    ae = jnp.sum(a_alive & (ca[:na] == 0))
    of = jnp.sum(o_alive & (ca[na:] > 0))
    oe = jnp.sum(o_alive & (ca[na:] == 0))
    info = {
        "agents_win": ((alive_opps <= 0) & (steps < cfg.horizon)).astype(jnp.int32),
        "opps_win": ((alive_agents <= 0) & (steps < cfg.horizon)).astype(jnp.int32),
        "draw": ((steps >= cfg.horizon) & (alive_agents > 0)
                 & (alive_opps > 0)).astype(jnp.int32),
        "agent_fight": af, "agent_escape": ae,
        "opp_fight": of, "opp_escape": oe,
        "agent_steps": af + ae, "opp_steps": of + oe,
    }
    for k in range(1, max(3, cfg.n_opp_hl) + 1):
        info[f"opp{k}"] = jnp.sum(a_alive & (ca[:na] == k))
    info = {k: v.astype(jnp.int32) for k, v in info.items()}

    obs, lists, valids, dists = hl_obs.commander_obs(cfg, sim)
    next_state = HLState(sim=sim, steps=steps, lists=lists, valids=valids,
                         dists=dists, key=state.key)

    reset_state, reset_obs = reset(cfg, state.key)
    next_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            jnp.reshape(done, (1,) * a.ndim) if a.ndim else done, b, a),
        next_state, reset_state)
    obs = jnp.where(done, reset_obs, obs)
    return next_state, obs, rewards, done, info
