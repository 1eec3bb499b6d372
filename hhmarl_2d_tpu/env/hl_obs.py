"""Commander (high-level) observation builder.

Implements ``HighLevelEnv.state`` (/root/reference/envs/env_hier.py:49-98):
per-agent commander obs = own [x,y,v,h] (4) + per-opponent 10-value blocks
capped at N_OPP_HL (zero-padded) + two 5-value friendly blocks, total
14 + 10*N_OPP_HL.

Also returns the per-slot designation lists the macro-action loop consumes
(``self.opp_to_attack``):
  * agent slots store only the opponents included in the obs
    (capped at N_OPP_HL -- the append/break interplay of env_hier.py:70-74)
  * opponent slots store their FULL sorted enemy list (env_hier.py:94-97)
with the *stale* normalized distances that the embedded low-level
observations keep using for the whole macro action (env_hier.py:109-111).
"""

from __future__ import annotations

import jax.numpy as jnp

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.env import geometry as G
from hhmarl_2d_tpu.env import obs as O


def commander_obs(cfg, sim):
    """Returns (obs [na, OBS_HL], lists [n, m], valid [n, m], dist [n, m]).

    ``m`` = max(num_agents, num_opps).  ``lists[i]`` is slot i's designation
    list (enemy slots sorted by distance); for agent slots entries past
    N_OPP_HL are invalidated (capped), opponent slots keep all.
    """
    n, na = cfg.n_slots, cfg.num_agents
    geom = G.pairwise(sim, cfg.map_size)
    m = max(cfg.num_opps, cfg.num_agents)

    focus_n = jnp.clip(geom["focus"] / 180.0, 0.0, 1.0)
    aspect_n = G.aspect_angle_norm(geom["focus"])
    hdiff_n = jnp.clip(geom["hdiff"] / 180.0, 0.0, 1.0)

    lists, valids, dists = [], [], []
    obs_rows = []
    for i in range(n):
        is_agent = i < na
        enemy = ((jnp.arange(n) >= na) if is_agent else (jnp.arange(n) < na))
        order, valid = G.sort_enemies(geom["dist_norm"][i], enemy & sim.alive)
        order, valid = order[:m], valid[:m]
        if is_agent:
            # cap the stored list at N_OPP_HL (env_hier.py:70-74)
            valid = valid & (jnp.arange(m) < C.N_OPP_HL)
        lists.append(order)
        valids.append(valid)
        dists.append(geom["dist_norm"][i, order])

        if not is_agent:
            continue

        x_a, y_a = O._xy(cfg, sim, jnp.asarray([i]))
        v_a, h_a = O._vh(sim, jnp.asarray([i]))
        own = jnp.stack([x_a[0], y_a[0], v_a[0], h_a[0]])

        opp_blocks = []
        for col in range(C.N_OPP_HL):
            o = order[col]
            x_o, y_o = O._xy(cfg, sim, jnp.asarray([o]))
            v_o, h_o = O._vh(sim, jnp.asarray([o]))
            block = jnp.stack([
                x_o[0], y_o[0], v_o[0], h_o[0], hdiff_n[o, i],
                focus_n[i, o], focus_n[o, i],
                aspect_n[i, o], aspect_n[o, i],
                geom["dist_norm"][i, o]])
            opp_blocks.append(jnp.where(valid[col], block, 0.0))
        opps = jnp.concatenate(opp_blocks)

        # two closest-friendly 5-blocks (env_hier.py:77-84)
        friendly = ((jnp.arange(n) < na) if is_agent else (jnp.arange(n) >= na))
        friendly = friendly & sim.alive & (jnp.arange(n) != i)
        forder, fvalid = G.sort_enemies(geom["dist_norm"][i], friendly)
        fri_blocks = []
        for col in range(2):
            f = forder[col]
            x_f, y_f = O._xy(cfg, sim, jnp.asarray([f]))
            block = jnp.stack([x_f[0], y_f[0], focus_n[i, f], focus_n[f, i],
                               geom["dist_norm"][i, f]])
            fri_blocks.append(jnp.where(fvalid[col], block, 0.0))
        fris = jnp.concatenate(fri_blocks)

        row = jnp.concatenate([own, opps, fris])
        # zero row when dead or no opponents left (env_hier.py:88-91)
        row_valid = sim.alive[i] & valid[0]
        obs_rows.append(jnp.where(row_valid, row, 0.0))

    return (jnp.stack(obs_rows), jnp.stack(lists), jnp.stack(valids),
            jnp.stack(dists))
