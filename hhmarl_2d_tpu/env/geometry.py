"""Observation-space geometry, vectorized over slot pairs.

Implements the degree-space geometry helpers of the reference env
(/root/reference/envs/env_base.py:400-487): these work on raw lat/lon
*differences* (not geodesic distances), so anchor-offset coordinates drop in
directly.  All return normalized values in [0, 1] unless noted.
"""

from __future__ import annotations

import jax.numpy as jnp

_DEG = jnp.pi / 180.0
_EPS = 1e-10


def heading_vec(heading_deg):
    """Unit vector [x(east-ish math convention), y] for a compass heading.

    env_base.py:428 uses [cos((90-h)%360), sin((90-h)%360)] in (lon, lat)
    axes, i.e. the standard math-angle form of a compass bearing.
    """
    a = jnp.mod(90.0 - heading_deg, 360.0) * _DEG
    return jnp.cos(a), jnp.sin(a)


def focus_angle_deg(heading_a_deg, lat_a, lon_a, lat_b, lon_b):
    """ATA angle in degrees: angle between a's heading vector and the
    displacement vector a->b (env_base.py:424-432)."""
    hx, hy = heading_vec(heading_a_deg)
    dx = lon_b - lon_a
    dy = lat_b - lat_a
    num = hx * dx + hy * dy
    den = jnp.sqrt(hx * hx + hy * hy) * jnp.sqrt(dx * dx + dy * dy) + _EPS
    x = jnp.clip(num / den, -1.0, 1.0)
    return jnp.arccos(x) / _DEG


def heading_diff_deg(heading_a_deg, heading_b_deg):
    """Angle between two heading vectors in degrees (env_base.py:448-456)."""
    ax, ay = heading_vec(heading_a_deg)
    bx, by = heading_vec(heading_b_deg)
    num = ax * bx + ay * by
    den = jnp.sqrt(ax * ax + ay * ay) * jnp.sqrt(bx * bx + by * by) + _EPS
    x = jnp.clip(num / den, -1.0, 1.0)
    return jnp.arccos(x) / _DEG


def distance_deg(lat_a, lon_a, lat_b, lon_b):
    """Euclidean distance in degree space (env_base.py:434-439, hypot)."""
    return jnp.hypot(lon_b - lon_a, lat_b - lat_a)


def norm_distance(d_deg, map_size):
    """shifted_range(d, 0, sqrt(2*map_size^2), 0, 1) (env_base.py:439)."""
    return d_deg / jnp.sqrt(2.0 * map_size * map_size)


def aspect_angle_norm(focus_deg):
    """clip((180 - focus)/180, 0, 1) (env_base.py:441-446)."""
    return jnp.clip((180.0 - focus_deg) / 180.0, 0.0, 1.0)


def shifted_range(x, a, b, c, d):
    """Affine map from [a, b] to [c, d] (env_base.py:458-462)."""
    return c + ((d - c) / (b - a)) * (x - a)


def correct_angle_sign(heading_a_deg, lat_a, lon_a, lat_c, lon_c):
    """Turn-direction sign via a line-side test (env_base.py:464-487).

    Returns +1 if point c is to the right of a's heading line, else -1
    (reference: ``val < 0 -> 1 else -1``).
    """
    x1 = jnp.sin(jnp.mod(heading_a_deg, 360.0) * _DEG)
    y1 = jnp.cos(jnp.mod(heading_a_deg, 360.0) * _DEG)
    val = x1 * (lat_c - lat_a) - (lon_c - lon_a) * y1
    return jnp.where(val < 0.0, 1.0, -1.0)


def pairwise(sim, map_size):
    """All-pairs geometry for one battle.

    Returns dict of [n, n] arrays: dist (raw degrees), dist_norm,
    focus (focus_angle from i to j, degrees), hdiff (degrees).
    """
    lat, lon, hdg = sim.lat, sim.lon, sim.heading
    la, lb = lat[:, None], lat[None, :]
    oa, ob = lon[:, None], lon[None, :]
    dist = distance_deg(la, oa, lb, ob)
    focus = focus_angle_deg(hdg[:, None], la, oa, lb, ob)
    hdiff = heading_diff_deg(hdg[:, None], hdg[None, :])
    return {
        "dist": dist,
        "dist_norm": norm_distance(dist, map_size),
        "focus": focus,
        "hdiff": hdiff,
    }


# Optimal comparator networks (Knuth TAOCP vol. 3 / Bose-Nelson) for the
# tiny slot counts we sort.  A static network of where-selects fuses into
# the surrounding elementwise code; XLA's variadic sort for the same shapes
# lowers to a comparator loop that dominated the whole env step (~50% of
# step time at 4096 vmapped envs before this change).
_SORT_NETWORKS = {
    1: (),
    2: ((0, 1),),
    3: ((0, 1), (1, 2), (0, 1)),
    4: ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)),
    5: ((0, 1), (3, 4), (2, 4), (2, 3), (1, 4), (0, 3), (0, 2), (1, 3),
        (1, 2)),
    6: ((1, 2), (4, 5), (0, 2), (3, 5), (0, 1), (3, 4), (2, 5), (0, 3),
        (1, 4), (2, 4), (1, 3), (2, 3)),
    7: ((1, 2), (3, 4), (5, 6), (0, 2), (3, 5), (4, 6), (0, 1), (4, 5),
        (2, 6), (0, 4), (1, 5), (0, 3), (2, 5), (1, 3), (2, 4), (2, 3)),
    8: ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6), (1, 4), (3, 6),
        (2, 4), (3, 5), (3, 4)),
}


def _batcher_network(n):
    """Batcher's merge-exchange sorting network (Knuth 5.2.2 Algorithm M)
    for arbitrary n -- used beyond the hand-optimal tables above so
    n-vs-m scenarios of any size (5v5 = 10 slots, 8v8 = 16, ...) sort with
    the same fused where-select formulation."""
    net = []
    t = 1
    while (1 << t) < n:
        t += 1
    p = 1 << (t - 1)
    while p > 0:
        q = 1 << (t - 1)
        r = 0
        d = p
        while True:
            for i in range(n - d):
                if (i & p) == r:
                    net.append((i, i + d))
            if q == p:
                break
            d = q - p
            q >>= 1
            r = p
        p >>= 1
    return tuple(net)


def sort_network(n):
    """Comparator network for n slots: optimal tables to n=8, Batcher
    merge-exchange beyond."""
    net = _SORT_NETWORKS.get(n)
    if net is None:
        net = _SORT_NETWORKS[n] = _batcher_network(n)
    return net


def sort_enemies(dist_norm_row, enemy_mask):
    """Alive enemies of one slot ordered by distance (_nearby_object,
    env_base.py:400-422).

    Returns (order, valid): ``order[k]`` is the slot index of the k-th
    closest alive enemy; ``valid[k]`` False past the last one.  Entries past
    the last valid one carry arbitrary slot ids -- every consumer gates on
    ``valid`` (matching the reference, which simply returns a shorter list).

    Inputs may carry trailing batch dims ([n, ...]); outputs match.
    """
    order, valid, _ = sort_enemies_vals(dist_norm_row, enemy_mask)
    return order, valid


def sort_enemies_vals(dist_norm_row, enemy_mask):
    """sort_enemies, also returning the sorted masked distances [n, ...]
    (inf past the last valid entry) so callers don't re-gather them."""
    n = dist_norm_row.shape[0]
    net = sort_network(n)
    v = [jnp.where(enemy_mask[i], dist_norm_row[i], jnp.inf) for i in range(n)]
    o = [jnp.full(dist_norm_row.shape[1:], i, jnp.int32) for i in range(n)]
    m = [enemy_mask[i] for i in range(n)]
    for i, j in net:
        swap = v[i] > v[j]
        v[i], v[j] = (jnp.where(swap, v[j], v[i]),
                      jnp.where(swap, v[i], v[j]))
        o[i], o[j] = (jnp.where(swap, o[j], o[i]),
                      jnp.where(swap, o[i], o[j]))
        m[i], m[j] = (jnp.where(swap, m[j], m[i]),
                      jnp.where(swap, m[i], m[j]))
    return jnp.stack(o), jnp.stack(m), jnp.stack(v)


# --- gather-free slot selection ----------------------------------------------
# On TPU, gathers/scatters over the tiny slot axis (n <= 8) lower to
# unfusible gather kernels whose launch cost dominates at thousands of
# vmapped envs.  One-hot selects compile to pure elementwise select+reduce
# and fuse into the surrounding code.

def onehot_slot(idx, n):
    """bool [..., n] mask for integer slot ids [...] (out-of-range -> all
    False)."""
    return idx[..., None] == jnp.arange(n, dtype=jnp.int32)


def sel(vec, w):
    """vec [n] numeric, w bool [..., n] -> [...]: vec[idx] as a select."""
    return jnp.sum(jnp.where(w, vec, 0), axis=-1)


def selb(vec, w):
    """vec [n] bool, w bool [..., n] -> [...] bool."""
    return jnp.any(w & vec, axis=-1)


def sel_rows(rows, w):
    """rows [k, n], w bool [k, n] -> [k]: rows[j, idx[j]] per row j."""
    return jnp.sum(jnp.where(w, rows, 0), axis=-1)
