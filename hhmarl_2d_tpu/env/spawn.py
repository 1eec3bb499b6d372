"""Curriculum scenario spawning.

Implements ``_sample_state`` and ``_reset_scenario``
(/root/reference/envs/env_base.py:489-585, envs/env_hier.py:226-250):
per-level spawn boxes with a per-episode side flip, alternating aircraft
types, spawn speeds, and the per-level ammo handicaps.

Coordinates are converted to anchor offsets (x - 7 -> lon, y - 5 -> lat).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.sim.state import blank_state


def _u(key, lo, hi):
    return jax.random.uniform(key, (), minval=lo, maxval=hi)


def _ri(key, lo, hi):
    """random.randint is inclusive on both ends."""
    return jax.random.randint(key, (), lo, hi + 1).astype(jnp.float32)


def _sample_lowlevel(level, group, i, r, key):
    """env_base.py:489-549; returns (lon_off, lat_off, heading)."""
    kx, ky, ka = jax.random.split(key, 3)
    if group == "agent":
        if level == 1:
            x1, x2 = _u(kx, 0.12, 0.14), _u(kx, 0.16, 0.17)
            a1, a2 = _ri(ka, 30, 150), _ri(ka, 200, 330)
            y1 = y2 = _u(ky, 0.1 + i * 0.1, 0.11 + i * 0.1)
        elif level == 2:
            x1, x2 = _u(kx, 0.08, 0.13), _u(kx, 0.18, 0.23)
            a1, a2 = _ri(ka, 0, 180), _ri(ka, 180, 359)
            y1 = y2 = _u(ky, 0.08 + i * 0.1, 0.13 + i * 0.1)
        else:
            x1, x2 = _u(kx, 0.07, 0.12), _u(kx, 0.18, 0.23)
            a1, a2 = _ri(ka, 0, 270), _ri(ka, 90, 359)
            y1 = y2 = _u(ky, 0.09 + i * 0.1, 0.12 + i * 0.1)
    else:
        if level == 1:
            x1, x2 = _u(kx, 0.16, 0.17), _u(kx, 0.12, 0.14)
            a1 = a2 = jnp.float32(0.0)
            y1 = y2 = _u(ky, 0.1 + i * 0.1, 0.11 + i * 0.1)
        elif level == 2:
            x1, x2 = _u(kx, 0.18, 0.23), _u(kx, 0.08, 0.13)
            a1 = a2 = _ri(ka, 0, 359)
            y1 = y2 = _u(ky, 0.08 + i * 0.1, 0.13 + i * 0.1)
        else:
            x1, x2 = _u(kx, 0.18, 0.23), _u(kx, 0.07, 0.12)
            a1 = a2 = _ri(ka, 0, 359)
            y1 = y2 = _u(ky, 0.09 + i * 0.1, 0.12 + i * 0.1)
    pick = r == 1
    return (jnp.where(pick, x1, x2), jnp.where(pick, y1, y2),
            jnp.where(pick, a1, a2))


def _sample_highlevel(cfg, group, i, r, key):
    """env_hier.py:226-250."""
    kx, ky, ka = jax.random.split(key, 3)
    count = cfg.num_agents if group == "agent" else cfg.num_opps
    span = 0.4 / count
    y = _u(ky, 0.07 + i * span, 0.12 + i * span)
    a = _ri(ka, 0, 359)
    near, far = _u(kx, 0.07, 0.22), _u(kx, 0.28, 0.43)
    if group == "agent":
        x = jnp.where(r == 1, near, far)
    else:
        x = jnp.where(r == 1, far, near)
    return x, y, a


def reset_scenario(cfg, key, mode="LowLevel"):
    """Fresh SimState for a new episode (_reset_scenario,
    env_base.py:551-585)."""
    n = cfg.n_slots
    sim = blank_state(n)
    k_side, key = jax.random.split(key)
    r = jax.random.randint(k_side, (), 1, 3)  # choose sides (env_base.py:555)

    lats, lons, heads, speeds, types = [], [], [], [], []
    cannon, rockets = [], []
    slot_keys = jax.random.split(key, n)
    for slot in range(n):
        group = "agent" if slot < cfg.num_agents else "opp"
        i = slot if group == "agent" else slot - cfg.num_agents
        k_pos, k_ac = jax.random.split(slot_keys[slot])
        if mode == "LowLevel":
            x, y, a = _sample_lowlevel(cfg.level, group, i, r, k_pos)
        else:
            x, y, a = _sample_highlevel(cfg, group, i, r, k_pos)

        # at least one aircraft of each type per group (env_base.py:560)
        if i <= 1:
            ac = jnp.int32(i + 1)
        else:
            ac = jax.random.randint(k_ac, (), 1, 3)

        if mode == "LowLevel" and cfg.level <= 2 and group == "opp":
            speed = jnp.float32(0.0)
        else:
            speed = jnp.float32(100.0)

        # ammo handicaps (env_base.py:566-578)
        if mode == "LowLevel":
            if cfg.level <= 4:
                can = 400.0 if group == "opp" else C.CANNON_MAX_SECS[0]
                rock = jnp.where(ac == 1, 8 if group == "opp" else 5, 0)
            else:  # level 5: both sides
                can = 300.0
                rock = jnp.where(ac == 1, 6, 0)
        else:
            can = 300.0
            rock = jnp.where(ac == 1, 8, 0)

        lats.append(y)
        lons.append(x)
        heads.append(a)
        speeds.append(speed)
        types.append(ac)
        cannon.append(jnp.float32(can))
        rockets.append(rock.astype(jnp.int32))

    f = lambda xs: jnp.stack(xs).astype(jnp.float32)
    return sim.replace(
        lat=f(lats), lon=f(lons), heading=f(heads), tgt_heading=f(heads),
        speed=f(speeds), tgt_speed=f(speeds),
        ac_type=jnp.stack(types).astype(jnp.int32),
        alive=jnp.ones(n, dtype=bool),
        cannon_remain=f(cannon), cannon_max=f(cannon),
        missile_remain=jnp.stack(rockets), rocket_max=jnp.stack(rockets),
    )
