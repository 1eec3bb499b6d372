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

Hot-path note: all slot lookups are one-hot selects (G.sel/G.sel_rows) over
the tiny static slot axis, never jnp gathers -- gathers don't fuse on TPU
and their launch cost dominated the vmapped env step.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu import geo
from hhmarl_2d_tpu.env import geometry as G

OBS_PAD = 30


def _norm_focus(focus_deg):
    """_focus_angle(..., norm=True) = clip(acos*180/pi / 180, 0, 1)."""
    return jnp.clip(focus_deg / 180.0, 0.0, 1.0)


def _static_take(a, idx, axis=0):
    """Static-index row/col selection; contiguous ranges become slices."""
    idx = [int(i) for i in idx]
    if idx == list(range(idx[0], idx[0] + len(idx))):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(idx[0], idx[0] + len(idx))
        return a[tuple(sl)]
    return jnp.take(a, np.asarray(idx), axis=axis)


def slot_features(cfg, sim):
    """Per-slot normalized features, each [n] (env_base.py:117-132)."""
    ml = geo.make_map_limits(cfg.map_size)
    x, y = ml.relative_position(sim.lat, sim.lon)
    maxspd = jnp.where(sim.ac_type == 1, C.MAX_SPEED_KNOTS[0],
                       C.MAX_SPEED_KNOTS[1])
    v = jnp.clip(sim.speed / maxspd, 0.0, 1.0)
    h = jnp.clip(jnp.mod(sim.heading, 359.0) / 359.0, 0.0, 1.0)
    # bool(unit.actual_missile): the pointer, which lags the missile's
    # removal by one tick (see SimState.m_ptr)
    shot = ((sim.cannon_burst > 0.0)
            | (sim.m_ptr & (sim.ac_type == 1))).astype(jnp.float32)
    cannon = jnp.clip(sim.cannon_remain / sim.cannon_max, 0.0, 1.0)
    missile = jnp.clip(
        sim.missile_remain
        / jnp.maximum(sim.rocket_max, 1).astype(jnp.float32), 0.0, 1.0)
    wait0 = (sim.missile_wait == 0).astype(jnp.float32)
    return dict(x=x, y=y, v=v, h=h, shot=shot, cannon=cannon,
                missile=missile, wait0=wait0)


def fri_slot_lowlevel(i: int, num_agents: int) -> int:
    """The fixed-partner rule of env_hetero.py:71-75 (2-vs-2 pairing)."""
    if i < num_agents:
        return 0 if i == 1 else 1
    return num_agents if i == num_agents + 1 else num_agents + 1


def closest_teammates(cfg, sim, slots, geom):
    """Nearest alive same-team slot for each slot in ``slots`` -- the
    partner rule for k-vs-m teams beyond the reference's fixed 2-vs-2
    pairing (matches the high-level env's choice, env_hier.py:106-107).
    Returns (fri_slot [k], fri_valid [k])."""
    n, na = cfg.n_slots, cfg.num_agents
    e = jnp.arange(n)
    fri_slot, fri_valid = [], []
    for i in slots:
        same = (e < na) if i < na else (e >= na)
        same = same & sim.alive & (e != i)
        order, valid = G.sort_enemies(geom["dist_norm"][i], same)
        fri_slot.append(order[0])
        fri_valid.append(valid[0])
    return jnp.stack(fri_slot), jnp.stack(fri_valid)


def build_lowlevel_obs(cfg, sim, mode: str, idx, opp_list, opp_list_valid,
                       opp_list_dist, fri_slot, fri_valid, geom=None,
                       feats=None):
    """Assemble padded obs rows for the agents in ``idx``.

    idx            [k]    agent slots -- STATIC (python ints / constant array)
    opp_list       [k,m]  opponent slots in designation order (fight reads
                          column 0; escape reads up to 2 columns)
    opp_list_valid [k,m]  False for exhausted/dead designations
    opp_list_dist  [k,m]  normalized distances to embed in the obs (fresh in
                          the low-level env; stale macro-start values in the
                          commander env, see env_hier.py:109-111); entries at
                          invalid designations may be inf (always gated)
    fri_slot       [k]    friendly slot (may be traced); fri_valid [k] gates
    geom           optional precomputed G.pairwise(sim, map_size)
    feats          optional precomputed slot_features(cfg, sim)
    Returns (obs [k, OBS_PAD], valid [k]) where invalid rows are zeroed.
    """
    n = cfg.n_slots
    idx = [int(i) for i in np.asarray(idx)]
    geom = geom if geom is not None else G.pairwise(sim, cfg.map_size)
    f = feats if feats is not None else slot_features(cfg, sim)

    focus_n = _norm_focus(geom["focus"])
    aspect_n = G.aspect_angle_norm(geom["focus"])
    hdiff_n = jnp.clip(geom["hdiff"] / 180.0, 0.0, 1.0)  # symmetric

    # per-agent-row static slices of the pairwise mats: [k, n]
    focus_to = _static_take(focus_n, idx)            # focus_n[idx, :]
    focus_from = _static_take(focus_n, idx, 1).T     # focus_n[:, idx] -> [k,n]
    aspect_to = _static_take(aspect_n, idx)          # aspect_n[idx, :]
    aspect_from = _static_take(aspect_n, idx, 1).T   # aspect_n[:, idx]
    hdiff_rows = _static_take(hdiff_n, idx)
    dist_rows = _static_take(geom["dist_norm"], idx)

    w_opp = G.onehot_slot(opp_list, n)               # [k, m, n]
    w0 = w_opp[:, 0]

    x_a = _static_take(f["x"], idx)
    y_a = _static_take(f["y"], idx)
    v_a = _static_take(f["v"], idx)
    h_a = _static_take(f["h"], idx)
    cannon_a = _static_take(f["cannon"], idx)
    missile_a = _static_take(f["missile"], idx)
    wait0_a = _static_take(f["wait0"], idx)
    shot_a = _static_take(f["shot"], idx)

    def opp_block(col, mode):
        """opp_ac_values (env_base.py:185-212) for designation column col."""
        w = w_opp[:, col]
        x_o, y_o = G.sel(f["x"], w), G.sel(f["y"], w)
        v_o, h_o = G.sel(f["v"], w), G.sel(f["h"], w)
        shot_o = G.sel(f["shot"], w)
        d = opp_list_dist[:, col]
        if mode == "fight":
            mid = [G.sel_rows(focus_from, w), G.sel_rows(aspect_to, w)]
        else:
            mid = [G.sel_rows(focus_to, w), G.sel_rows(focus_from, w)]
        block = jnp.stack(
            [x_o, y_o, v_o, h_o, G.sel_rows(hdiff_rows, w)] + mid
            + [d, shot_o], axis=-1)
        valid = opp_list_valid[:, col]
        return jnp.where(valid[:, None], block, 0.0)

    # friendly block (env_base.py:166-183)
    w_f = G.onehot_slot(fri_slot.astype(jnp.int32), n)
    fri = jnp.stack([G.sel(f["x"], w_f), G.sel(f["y"], w_f),
                     G.sel_rows(focus_to, w_f), G.sel_rows(focus_from, w_f),
                     G.sel_rows(dist_rows, w_f)], axis=-1)
    fri_alive = G.selb(sim.alive, w_f)
    fri = jnp.where((fri_valid & fri_alive)[:, None], fri, 0.0)

    if mode == "fight":
        own_shared = [x_a, y_a, v_a, h_a, G.sel_rows(focus_to, w0),
                      G.sel_rows(aspect_from, w0), G.sel_rows(hdiff_rows, w0),
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

    k = len(idx)
    pad1 = jnp.zeros((k, OBS_PAD - row1.shape[-1]), row1.dtype)
    pad2 = jnp.zeros((k, OBS_PAD - row2.shape[-1]), row2.dtype)
    ac1 = _static_take(sim.ac_type, idx) == 1
    obs = jnp.where(ac1[:, None],
                    jnp.concatenate([row1, pad1], axis=-1),
                    jnp.concatenate([row2, pad2], axis=-1))

    alive_a = _static_take(sim.alive, idx)
    valid = alive_a & opp_list_valid[:, 0]
    return jnp.where(valid[:, None], obs, 0.0), valid


def lowlevel_side_obs(cfg, sim, mode: str, side: str, geom=None):
    """Fresh low-level observations for one side (env_hetero.py:65-103):
    closest-opponent designation and the fixed-partner friendly rule.

    Returns (obs [k, OBS_PAD], opp_to_attack [k] (-1 if none), valid [k]).
    """
    obs, opp_to_attack, valid, _, _ = lowlevel_side_obs_ext(
        cfg, sim, mode, side, geom)
    return obs, opp_to_attack, valid


def lowlevel_side_obs_ext(cfg, sim, mode: str, side: str, geom=None):
    """lowlevel_side_obs plus the friendly (teammate) assignment used in
    the obs rows -- the CTDE critic pairs each slot with the same teammate
    (fixed partner in 2-vs-2, closest alive teammate otherwise).

    Returns (obs, opp_to_attack, valid, fri_slot [k], fri_valid [k]).
    """
    n, na = cfg.n_slots, cfg.num_agents
    if side == "agent":
        slots = list(range(0, na))
        enemy = (jnp.arange(n) >= na)
    else:
        slots = list(range(na, n))
        enemy = (jnp.arange(n) < na)

    geom = geom if geom is not None else G.pairwise(sim, cfg.map_size)
    m = cfg.num_opps if side == "agent" else cfg.num_agents

    # vectorized distance sort over all k rows at once
    dist_rows = _static_take(geom["dist_norm"], slots)      # [k, n]
    mask = jnp.broadcast_to((enemy & sim.alive)[:, None], (n, len(slots)))
    order, ovalid, ovals = G.sort_enemies_vals(dist_rows.T, mask)
    opp_list = order.T[:, :m]                               # [k, m]
    opp_valid = ovalid.T[:, :m]
    opp_dist = ovals.T[:, :m]   # inf at invalid entries; always gated

    if na == 2 and cfg.num_opps == 2:
        # exact fixed-partner rule of the reference's 2-vs-2 setup
        fri = jnp.asarray([fri_slot_lowlevel(i, na) for i in slots])
        fri_valid = jnp.ones_like(fri, dtype=bool)
    else:
        fri, fri_valid = closest_teammates(cfg, sim, slots, geom)

    # escape mode reads exactly 2 opponent columns (env_base.py:155-162)
    if opp_list.shape[1] < 2:
        pad = 2 - opp_list.shape[1]
        opp_list = jnp.pad(opp_list, ((0, 0), (0, pad)))
        opp_valid = jnp.pad(opp_valid, ((0, 0), (0, pad)))
        opp_dist = jnp.pad(opp_dist, ((0, 0), (0, pad)))

    obs, valid = build_lowlevel_obs(cfg, sim, mode, slots, opp_list,
                                    opp_valid, opp_dist, fri, fri_valid,
                                    geom=geom)
    alive_a = _static_take(sim.alive, slots)
    opp_to_attack = jnp.where(opp_valid[:, 0] & alive_a, opp_list[:, 0], -1)
    fri_slot = jnp.where(fri_valid, fri.astype(jnp.int32), -1)
    return obs, opp_to_attack, valid, fri_slot, fri_valid
