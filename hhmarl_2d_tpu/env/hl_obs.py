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
Distance entries at invalid designations are inf (every consumer gates on
the valid flags, as the reference does by truncating its lists).

Like obs.py, every slot lookup is a one-hot select / static slice --
no gathers on the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.env import geometry as G
from hhmarl_2d_tpu.env import obs as O


def _side_sorted(cfg, sim, geom, side: str, m: int):
    """Sorted enemy designations for one side's slots.

    Returns (order [k, m], valid [k, m], vals [k, m]) with k slots of the
    side in slot order; vals are sorted normalized distances (inf invalid).
    """
    n, na = cfg.n_slots, cfg.num_agents
    slots = list(range(0, na)) if side == "agent" else list(range(na, n))
    enemy = (jnp.arange(n) >= na) if side == "agent" else (jnp.arange(n) < na)
    dist_rows = O._static_take(geom["dist_norm"], slots)        # [k, n]
    mask = jnp.broadcast_to((enemy & sim.alive)[:, None], (n, len(slots)))
    order, valid, vals = G.sort_enemies_vals(dist_rows.T, mask)
    return order.T[:, :m], valid.T[:, :m], vals.T[:, :m]


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
    f = O.slot_features(cfg, sim)

    a_order, a_valid, a_vals = _side_sorted(cfg, sim, geom, "agent", m)
    o_order, o_valid, o_vals = _side_sorted(cfg, sim, geom, "opp", m)
    # cap the stored agent lists at n_opp_hl (env_hier.py:70-74)
    a_valid = a_valid & (jnp.arange(m) < cfg.n_opp_hl)
    lists = jnp.concatenate([a_order, o_order])
    # dead observers keep empty lists (env_hier.py:57,94-97 only fill for
    # existing units); consumers all mask dead slots, this keeps the
    # stored lists differentially identical to the reference
    valids = jnp.concatenate([a_valid, o_valid]) & sim.alive[:, None]
    dists = jnp.concatenate([a_vals, o_vals])

    # --- agent obs rows, vectorized over the na agent slots ----------------
    agents = list(range(na))
    focus_to = O._static_take(focus_n, agents)          # focus_n[i, :]
    focus_from = O._static_take(focus_n, agents, 1).T   # focus_n[:, i]
    aspect_to = O._static_take(aspect_n, agents)
    aspect_from = O._static_take(aspect_n, agents, 1).T
    hdiff_rows = O._static_take(hdiff_n, agents)
    dist_rows = O._static_take(geom["dist_norm"], agents)

    own = jnp.stack([O._static_take(f[k], agents) for k in "xyvh"], axis=-1)

    blocks = [own]
    pad_cols = max(cfg.n_opp_hl - m, 0)  # fewer real opponents than listed
    for col in range(min(cfg.n_opp_hl, m)):
        w = G.onehot_slot(a_order[:, col], n)           # [na, n]
        block = jnp.stack([
            G.sel(f["x"], w), G.sel(f["y"], w),
            G.sel(f["v"], w), G.sel(f["h"], w),
            G.sel_rows(hdiff_rows, w),
            G.sel_rows(focus_to, w), G.sel_rows(focus_from, w),
            G.sel_rows(aspect_to, w), G.sel_rows(aspect_from, w),
            G.sel_rows(dist_rows, w)], axis=-1)
        blocks.append(jnp.where(a_valid[:, col][:, None], block, 0.0))

    if pad_cols:
        blocks.append(jnp.zeros((na, 10 * pad_cols)))

    # two closest-friendly 5-blocks (env_hier.py:77-84)
    e = jnp.arange(n)
    fr_mask = ((e < na)[:, None] & sim.alive[:, None]
               & (e[:, None] != jnp.asarray(agents)[None, :]))   # [n, na]
    forder, fvalid, _ = G.sort_enemies_vals(dist_rows.T, fr_mask)
    for col in range(2):
        w = G.onehot_slot(forder[col], n)               # [na, n]
        block = jnp.stack([
            G.sel(f["x"], w), G.sel(f["y"], w),
            G.sel_rows(focus_to, w), G.sel_rows(focus_from, w),
            G.sel_rows(dist_rows, w)], axis=-1)
        blocks.append(jnp.where(fvalid[col][:, None], block, 0.0))

    rows = jnp.concatenate(blocks, axis=-1)
    # zero row when dead or no opponents left (env_hier.py:88-91)
    row_valid = sim.alive[:na] & a_valid[:, 0]
    return (jnp.where(row_valid[:, None], rows, 0.0), lists, valids, dists)
