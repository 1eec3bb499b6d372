"""Low-level observation encoders (fight / escape modes).

Reproduces the exact vector layouts of the reference
(/root/reference/envs/env_base.py:111-212, envs/env_hetero.py:65-103):

  fight AC1 (26) = own 12 + opponent 9 + friendly 5
  fight AC2 (24) = own 10 + opponent 9 + friendly 5
  esc   AC1 (30) = own 7 + opponents 2x9 (zero-padded) + friendly 5
  esc   AC2 (29) = own 6 + opponents 2x9 (zero-padded) + friendly 5

All rows are padded to OBS_PAD = 30; per-type layouts are assembled
separately and selected by the slot's ac_type, so heterogeneous (and, in the
commander env, per-episode random) aircraft types stay branch-free.

Dead agents and agents with no remaining opponents produce all-zero rows
(env_hetero.py:97-100), which the centralized-critic pipeline relies on.
"""

from __future__ import annotations

import jax.numpy as jnp

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu import geo
from hhmarl_2d_tpu.env import geometry as G

OBS_PAD = 30
_MAXSPD = jnp.asarray(C.MAX_SPEED_KNOTS)


def _norm_focus(focus_deg):
    """_focus_angle(..., norm=True) = clip(acos*180/pi / 180, 0, 1)."""
    return jnp.clip(focus_deg / 180.0, 0.0, 1.0)


def _xy(cfg, sim, slots):
    """(lat_rel, lon_rel) = map_limits.relative_position (env_base.py:117)."""
    ml = geo.make_map_limits(cfg.map_size)
    return ml.relative_position(sim.lat[slots], sim.lon[slots])


def _vh(sim, slots):
    """Normalized speed and heading (env_base.py:120-121)."""
    v = jnp.clip(sim.speed[slots] / _MAXSPD[sim.ac_type[slots] - 1], 0.0, 1.0)
    h = jnp.clip(jnp.mod(sim.heading[slots], 359.0) / 359.0, 0.0, 1.0)
    return v, h


def _shot(sim, slots):
    """"is shooting": cannon burst active, or (AC1) missile in flight
    (env_base.py:130-132,151-154)."""
    burst = sim.cannon_burst[slots] > 0.0
    missile = sim.m_alive[slots] & (sim.ac_type[slots] == 1)
    return (burst | missile).astype(jnp.float32)


def fri_slot_lowlevel(i: int, num_agents: int) -> int:
    """The fixed-partner rule of env_hetero.py:71-75 (2-vs-2 pairing)."""
    if i < num_agents:
        return 0 if i == 1 else 1
    return num_agents if i == num_agents + 1 else num_agents + 1


def build_lowlevel_obs(cfg, sim, mode: str, idx, opp_list, opp_list_valid,
                       opp_list_dist, fri_slot, fri_valid, geom=None):
    """Assemble padded obs rows for the agents in ``idx``.

    idx            [k]    agent slots
    opp_list       [k,m]  opponent slots in designation order (fight reads
                          column 0; escape reads up to 2 columns)
    opp_list_valid [k,m]  False for exhausted/dead designations
    opp_list_dist  [k,m]  normalized distances to embed in the obs (fresh in
                          the low-level env; stale macro-start values in the
                          commander env, see env_hier.py:109-111)
    fri_slot       [k]    friendly slot; fri_valid [k] gates the block
    geom           optional precomputed G.pairwise(sim, map_size)
    Returns (obs [k, OBS_PAD], valid [k]) where invalid rows are zeroed.
    """
    geom = geom if geom is not None else G.pairwise(sim, cfg.map_size)
    focus_n = _norm_focus(geom["focus"])
    hdiff_n = jnp.clip(geom["hdiff"] / 180.0, 0.0, 1.0)
    aspect_n = G.aspect_angle_norm(geom["focus"])

    o0 = opp_list[:, 0]
    x_a, y_a = _xy(cfg, sim, idx)
    v_a, h_a = _vh(sim, idx)
    cannon_a = jnp.clip(sim.cannon_remain[idx] / sim.cannon_max[idx], 0.0, 1.0)
    missile_a = jnp.clip(
        sim.missile_remain[idx]
        / jnp.maximum(sim.rocket_max[idx], 1).astype(jnp.float32), 0.0, 1.0)
    wait0_a = (sim.missile_wait[idx] == 0).astype(jnp.float32)
    shot_a = _shot(sim, idx)

    def opp_block(col, mode):
        """opp_ac_values (env_base.py:185-212) for designation column col."""
        o = opp_list[:, col]
        x_o, y_o = _xy(cfg, sim, o)
        v_o, h_o = _vh(sim, o)
        d = opp_list_dist[:, col]
        shot_o = _shot(sim, o)
        if mode == "fight":
            mid = [focus_n[o, idx], aspect_n[idx, o]]
        else:
            mid = [focus_n[idx, o], focus_n[o, idx]]
        block = jnp.stack(
            [x_o, y_o, v_o, h_o, hdiff_n[o, idx]] + mid + [d, shot_o], axis=-1)
        valid = opp_list_valid[:, col]
        return jnp.where(valid[:, None], block, 0.0)

    # friendly block (env_base.py:166-183)
    f = fri_slot
    x_f, y_f = _xy(cfg, sim, f)
    fri = jnp.stack([x_f, y_f, focus_n[idx, f], focus_n[f, idx],
                     geom["dist_norm"][idx, f]], axis=-1)
    fri = jnp.where((fri_valid & sim.alive[f])[:, None], fri, 0.0)

    if mode == "fight":
        own_shared = [x_a, y_a, v_a, h_a, focus_n[idx, o0],
                      aspect_n[o0, idx], hdiff_n[idx, o0],
                      opp_list_dist[:, 0], cannon_a]
        own1 = jnp.stack(own_shared + [missile_a, wait0_a, shot_a], axis=-1)
        own2 = jnp.stack(own_shared + [shot_a], axis=-1)
        opp = opp_block(0, "fight")
        row1 = jnp.concatenate([own1, opp, fri], axis=-1)          # 26
        row2 = jnp.concatenate([own2, opp, fri], axis=-1)          # 24
    else:
        own1 = jnp.stack([x_a, y_a, v_a, h_a, cannon_a, missile_a, shot_a],
                         axis=-1)
        own2 = jnp.stack([x_a, y_a, v_a, h_a, cannon_a, shot_a], axis=-1)
        opps = jnp.concatenate([opp_block(0, "esc"), opp_block(1, "esc")],
                               axis=-1)                            # 18
        row1 = jnp.concatenate([own1, opps, fri], axis=-1)         # 30
        row2 = jnp.concatenate([own2, opps, fri], axis=-1)         # 29

    k = idx.shape[0]
    pad1 = jnp.zeros((k, OBS_PAD - row1.shape[-1]), row1.dtype)
    pad2 = jnp.zeros((k, OBS_PAD - row2.shape[-1]), row2.dtype)
    obs = jnp.where((sim.ac_type[idx] == 1)[:, None],
                    jnp.concatenate([row1, pad1], axis=-1),
                    jnp.concatenate([row2, pad2], axis=-1))

    valid = sim.alive[idx] & opp_list_valid[:, 0]
    return jnp.where(valid[:, None], obs, 0.0), valid


def lowlevel_side_obs(cfg, sim, mode: str, side: str, geom=None):
    """Fresh low-level observations for one side (env_hetero.py:65-103):
    closest-opponent designation and the fixed-partner friendly rule.

    Returns (obs [k, OBS_PAD], opp_to_attack [k] (-1 if none), valid [k]).
    """
    n, na = cfg.n_slots, cfg.num_agents
    if side == "agent":
        slots = list(range(0, na))
        enemy = (jnp.arange(n) >= na)
    else:
        slots = list(range(na, n))
        enemy = (jnp.arange(n) < na)
    idx = jnp.asarray(slots)

    geom = geom if geom is not None else G.pairwise(sim, cfg.map_size)
    m = cfg.num_opps if side == "agent" else cfg.num_agents

    orders, valids = [], []
    for i in slots:
        order, valid = G.sort_enemies(geom["dist_norm"][i],
                                      enemy & sim.alive)
        orders.append(order[:m])
        valids.append(valid[:m])
    opp_list = jnp.stack(orders)
    opp_valid = jnp.stack(valids)
    opp_dist = geom["dist_norm"][idx[:, None], opp_list]

    fri = jnp.asarray([fri_slot_lowlevel(i, na) for i in slots])
    fri_valid = jnp.ones_like(fri, dtype=bool)

    # escape mode reads exactly 2 opponent columns (env_base.py:155-162)
    if opp_list.shape[1] < 2:
        pad = 2 - opp_list.shape[1]
        opp_list = jnp.pad(opp_list, ((0, 0), (0, pad)))
        opp_valid = jnp.pad(opp_valid, ((0, 0), (0, pad)))
        opp_dist = jnp.pad(opp_dist, ((0, 0), (0, pad)))

    obs, valid = build_lowlevel_obs(cfg, sim, mode, idx, opp_list, opp_valid,
                                    opp_dist, fri, fri_valid, geom=geom)
    opp_to_attack = jnp.where(opp_valid[:, 0] & sim.alive[idx],
                              opp_list[:, 0], -1)
    return obs, opp_to_attack, valid
