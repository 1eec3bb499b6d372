"""Pure-functional battle tick.

Replaces ``CmanoSimulator.do_tick`` and the per-unit ``update`` methods
(/root/reference/warsim/simulator/cmano_simulator.py:138-157, ac1.py:81-133,
ac2.py:68-107, rocket_unit.py:37-73) with one fused, masked JAX program.

Order-equivalence with the reference is preserved exactly:

* ``do_tick`` iterates a *snapshot* of the unit registry
  (``list(self.active_units.values())``, cmano_simulator.py:142), so a unit
  killed mid-tick still executes its own update that tick -- it can still
  cannon-kill and still steers its in-flight missile.  We therefore gate a
  unit's *actions* on ``alive_start`` (the tick-start mask) and its
  *vulnerability* on the running ``alive`` mask.
* Aircraft update in slot order (ids ascend in spawn order,
  cmano_simulator.py:104-108), so unit ``i``'s cannon scan sees post-move
  positions of units ``j < i`` and pre-move positions of ``j > i``.  The
  statically unrolled per-slot loop reproduces this.
* All missiles have ids above all aircraft, so they update after every
  aircraft: proximity checks use the target's post-move position and the
  missile's pre-move position (rocket_unit.py:37-42).

RNG: the reference mixes a per-sim ``random.Random`` and the global
``random`` module; we use explicit JAX PRNG keys and match *distributions*
(one uniform per potential cannon victim per tick, one steering-noise
uniform per in-flight missile per tick).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu import geo
from hhmarl_2d_tpu.sim.state import SimState, TickEvents, blank_events

# numpy (not jnp) so importing this module never initializes a JAX
# backend -- the CLI drivers must be able to pick the platform first
_TURN = np.asarray(C.TURN_RATE_DEG_S, np.float32)
_ACCEL = np.asarray(C.ACCEL_KNOTS_S, np.float32)
_CAN_RANGE = np.asarray(C.CANNON_RANGE_KM, np.float32)
_CAN_WIDTH = np.asarray(C.CANNON_WIDTH_DEG, np.float32)
_CAN_BURST = np.asarray(C.CANNON_BURST_SECS, np.float32)
_CAN_PROB = np.asarray(C.CANNON_HIT_PROB, np.float32)
_ROCKET_SPEED = np.asarray(C.ROCKET_SPEED_TABLE, np.float32)


def _type_param(table, ac_type):
    """Two-entry type table as a select (a gather would not fuse)."""
    return jnp.where(ac_type == 1, table[0], table[1])


def _rate_limited_heading(heading, target, max_deg):
    """ac1.py:82-90: converge toward target at <= max_deg/s, wrap to 360."""
    delta = geo.signed_heading_diff(heading, target)
    step = jnp.where(delta >= 0.0, max_deg, -max_deg)
    turned = jnp.mod(heading + step, 360.0)
    return jnp.where(jnp.abs(delta) <= max_deg, target, turned)


def _rate_limited_speed(speed, target, max_delta):
    """ac1.py:92-99."""
    delta = target - speed
    step = jnp.where(delta >= 0.0, max_delta, -max_delta)
    return jnp.where(jnp.abs(delta) <= max_delta, target, speed + step)


def _move(lat, lon, heading, speed_knots, do_move):
    """Unit.update dead-reckoning (cmano_simulator.py:65-72); 1 s tick.

    ``lat``/``lon`` are offsets from the map anchor (see geo.py precision
    strategy); radii are evaluated at the absolute latitude.
    """
    dlat, dlon = geo.geodetic_delta(C.MAP_BOTTOM_LAT + lat, heading,
                                    speed_knots * C.KNOTS_TO_MS)
    return (jnp.where(do_move, lat + dlat, lat),
            jnp.where(do_move, lon + dlon, lon))


def _inv(lat_a, lon_a, lat_b, lon_b):
    """(distance_km, bearing_deg) between anchor-offset positions."""
    return geo.inverse_deg(lat_b - lat_a, lon_b - lon_a,
                           C.MAP_BOTTOM_LAT + 0.5 * (lat_a + lat_b))


def tick(state: SimState, key: jax.Array, num_agents: int,
         friendly_check: bool = True, u_cannon=None,
         u_steer=None) -> tuple[SimState, TickEvents]:
    """Advance the battle by one second.

    ``num_agents`` is static (team boundary slot).  ``friendly_check``
    mirrors args.friendly_kill: when True, cannon and missiles can also hit
    teammates (ac1.py:109, rocket_unit.py:44-52).

    ``u_cannon`` [n, n] / ``u_steer`` [n] optionally inject the tick's
    uniform draws (cannon-hit rolls in [0,1); missile steering-noise
    multipliers, nominally in [0.95, 1.05]) -- used by the differential
    parity harness to feed both this engine and the reference simulator the
    same random stream.  Default: drawn from ``key``.
    """
    n = state.n_slots
    ev = blank_events(n)
    alive_start = state.alive          # tick-start snapshot
    m_alive_start = state.m_alive

    k_cannon, k_steer = jax.random.split(key)
    if u_cannon is None:
        u_cannon = jax.random.uniform(k_cannon, (n, n), dtype=jnp.float32)
    if u_steer is None:
        u_steer = jax.random.uniform(k_steer, (n,), dtype=jnp.float32,
                                     minval=0.95, maxval=1.05)

    team = jnp.arange(n) < num_agents  # True = agent side
    slot = jnp.arange(n)

    # --- aircraft phase, vectorized ---------------------------------------
    # Although the reference updates units sequentially, the aircraft phase
    # is order-equivalent to a batch formulation: shooters are unaffected
    # by their own death within the tick (snapshot iteration), kinematics
    # are per-slot independent, and the only cross-slot coupling -- the
    # cannon scan seeing post-move positions of lower slots and pre-move of
    # higher slots -- is a static triangular mixture.  Kill attribution is
    # first-shooter-wins (lowest slot index), exactly the sequential result.
    turn = _type_param(_TURN, state.ac_type)
    accel = _type_param(_ACCEL, state.ac_type)
    new_heading = jnp.where(
        alive_start,
        _rate_limited_heading(state.heading, state.tgt_heading, turn),
        state.heading)
    new_speed = jnp.where(
        alive_start,
        _rate_limited_speed(state.speed, state.tgt_speed, accel),
        state.speed)

    burst_on = alive_start & (state.cannon_burst > 0.0)
    cannon_burst = jnp.where(burst_on,
                             jnp.maximum(state.cannon_burst - 1.0, 0.0),
                             state.cannon_burst)
    cannon_remain = jnp.where(burst_on,
                              jnp.maximum(state.cannon_remain - 1.0, 0.0),
                              state.cannon_remain)

    # position update (last in each unit's update, ac1.py:130-131)
    lat, lon = _move(state.lat, state.lon, new_heading, new_speed,
                     alive_start & (new_speed > 0.0))

    # cannon scan: shooter i at its pre-move position with its updated
    # heading; target j at post-move position iff j < i (already updated)
    lower = slot[None, :] < slot[:, None]          # [i, j]: j before i
    lat_seen = jnp.where(lower, lat[None, :], state.lat[None, :])
    lon_seen = jnp.where(lower, lon[None, :], state.lon[None, :])
    dist, bearing = _inv(state.lat[:, None], state.lon[:, None],
                         lat_seen, lon_seen)
    delta = jnp.abs(geo.signed_heading_diff(new_heading[:, None], bearing))
    in_range = ((dist < _type_param(_CAN_RANGE, state.ac_type)[:, None])
                & (delta <= _type_param(_CAN_WIDTH, state.ac_type)[:, None]
                   / 2.0))
    gate = friendly_check | (team[None, :] != team[:, None])
    p_hit = (_type_param(_CAN_PROB, state.ac_type)
             / _type_param(_CAN_BURST, state.ac_type))[:, None]
    cand = (burst_on[:, None] & alive_start[None, :] & gate & in_range
            & (u_cannon < p_hit) & (slot[:, None] != slot[None, :]))
    first_shooter = jnp.min(jnp.where(cand, slot[:, None], n), axis=0)
    destroyed = first_shooter < n
    killer = jnp.where(destroyed, first_shooter, -1)
    by_rocket = jnp.zeros(n, dtype=bool)
    alive = alive_start & ~destroyed
    heading, speed = new_heading, new_speed

    # the shooter's stale actual_missile pointer clears during its own
    # update (ac1.py:118-120): pointer set but missile gone at tick start
    m_ptr = jnp.where(alive_start & state.m_ptr & ~m_alive_start, False,
                      state.m_ptr)

    # missile steering by the (snapshot-alive) shooter (ac1.py:118-128)
    steer = alive_start & m_alive_start
    m_tgt_heading = jnp.where(
        steer, jnp.clip(state.m_heading * u_steer, 0.0, 359.0),
        state.m_tgt_heading)

    # --- missiles, after all aircraft (rocket_unit.py:37-73) ---------------
    # Geometry/kinematics vectorize (aircraft no longer move this tick);
    # only the hit resolution stays a tiny unrolled loop to preserve the
    # reference's per-missile [target check, friendly check] interleaving.
    # All slot access in the loop is one-hot select / masked where -- no
    # gathers or scatters, so the whole phase fuses.
    tgt = state.m_target
    w_tgt = tgt[:, None] == slot[None, :]            # [missile, slot]
    lat_tgt = jnp.sum(jnp.where(w_tgt, lat[None, :], 0.0), axis=-1)
    lon_tgt = jnp.sum(jnp.where(w_tgt, lon[None, :], 0.0), axis=-1)
    d_t, _ = _inv(state.m_lat, state.m_lon, lat_tgt, lon_tgt)
    # hardcoded slot-1/2 "friendly" check (rocket_unit.py:44-52)
    lat_fr = jnp.where(slot == 1, lat[0], lat[1])
    lon_fr = jnp.where(slot == 1, lon[0], lon[1])
    d_f, _ = _inv(state.m_lat, state.m_lon, lat_fr, lon_fr)
    life = state.time - state.m_fire_time
    near_t = d_t < C.ROCKET_PROXIMITY_KM
    near_f = d_f < C.ROCKET_PROXIMITY_KM
    past_eol = life > C.ROCKET_EOL_SECS

    m_alive = state.m_alive
    for i in range(n):
        wt = w_tgt[i]                                # [n] bool, slot == tgt[i]
        act = m_alive_start[i] & m_alive[i]
        hit_t = act & jnp.any(wt & alive) & near_t[i]
        fr = 0 if i == 1 else 1
        hit_f = act & ~hit_t & friendly_check & alive[fr] & near_f[i]
        gone = hit_t | hit_f | (act & ~hit_t & ~hit_f & past_eol[i])
        wf = slot == fr
        kill = (wt & hit_t) | (wf & hit_f)
        alive = alive & ~kill
        destroyed = destroyed | kill
        killer = jnp.where(kill, i, killer)
        by_rocket = by_rocket | kill
        m_alive = jnp.where(slot == i, m_alive & ~gone, m_alive)

    flying = m_alive_start & m_alive
    # heading convergence at 10 deg/s (rocket_unit.py:60-67; no wrap in the
    # reference, but headings stay within one turn of [0,360) so a wrap is
    # value-equivalent for all downstream trig)
    m_heading = jnp.where(
        flying,
        _rate_limited_heading(state.m_heading, m_tgt_heading,
                              C.ROCKET_TURN_RATE_DEG_S),
        state.m_heading)
    # speed profile at integer life time (rocket_unit.py:70); one-hot
    # select over the 11-entry table instead of a gather so it fuses
    life_i = jnp.clip(life, 0, C.ROCKET_EOL_SECS)
    w_life = life_i[:, None] == np.arange(C.ROCKET_EOL_SECS + 1)
    m_speed = jnp.sum(jnp.where(w_life, _ROCKET_SPEED, 0.0), axis=-1)
    m_lat, m_lon = _move(state.m_lat, state.m_lon, m_heading, m_speed, flying)

    new_state = state.replace(
        lat=lat, lon=lon, heading=heading, speed=speed,
        alive=alive, cannon_burst=cannon_burst, cannon_remain=cannon_remain,
        m_alive=m_alive, m_ptr=m_ptr, m_lat=m_lat, m_lon=m_lon,
        m_heading=m_heading, m_tgt_heading=m_tgt_heading,
        time=state.time + 1,
    )
    return new_state, TickEvents(destroyed=destroyed, killer=killer,
                                 by_rocket=by_rocket)


# --- action-phase helpers (called before tick) ------------------------------

def set_heading(state: SimState, new_heading, mask) -> SimState:
    """Command heading in [0, 360) (ac1.py:58-61)."""
    return state.replace(tgt_heading=jnp.where(mask, new_heading,
                                               state.tgt_heading))


def set_speed(state: SimState, new_speed, mask) -> SimState:
    return state.replace(tgt_speed=jnp.where(mask, new_speed, state.tgt_speed))


def fire_cannon(state: SimState, mask) -> SimState:
    """Refresh burst to min(ammo, burst_time) (ac1.py:69-70)."""
    burst = jnp.minimum(state.cannon_remain,
                        _type_param(_CAN_BURST, state.ac_type))
    return state.replace(cannon_burst=jnp.where(mask, burst,
                                                state.cannon_burst))


def fire_missiles(state: SimState, want: jnp.ndarray,
                  target: jnp.ndarray) -> SimState:
    """Attempt missile launch for every slot at once.

    ``want`` must already encode the launcher-side conditions checked by the
    env (_take_base_action, env_base.py:227-233): AC1, action bit set,
    target designated, ammo left, no missile in flight, cooldown zero.
    This applies the in-envelope checks from ac1.py:72-79: range <= 111 km
    and the (one-sided) radar cone test from ac1.py:144-146
    ``int(|signed_diff(heading+60, bearing)|) <= 60``.
    """
    tgt = jnp.clip(target, 0, state.n_slots - 1)
    w_tgt = tgt[:, None] == jnp.arange(state.n_slots)[None, :]
    lat_t = jnp.sum(jnp.where(w_tgt, state.lat[None, :], 0.0), axis=-1)
    lon_t = jnp.sum(jnp.where(w_tgt, state.lon[None, :], 0.0), axis=-1)
    dist, bearing = _inv(state.lat, state.lon, lat_t, lon_t)
    delta = jnp.abs(geo.signed_heading_diff(
        geo.sum_angles(state.heading, C.MISSILE_WIDTH_DEG / 2.0), bearing))
    ok = want & (dist <= C.MISSILE_RANGE_KM) & \
        (jnp.floor(delta).astype(jnp.int32) <= int(C.MISSILE_WIDTH_DEG / 2.0))

    return state.replace(
        m_alive=jnp.where(ok, True, state.m_alive),
        m_ptr=jnp.where(ok, True, state.m_ptr),
        m_lat=jnp.where(ok, state.lat, state.m_lat),
        m_lon=jnp.where(ok, state.lon, state.m_lon),
        m_heading=jnp.where(ok, state.heading, state.m_heading),
        m_tgt_heading=jnp.where(ok, state.heading, state.m_tgt_heading),
        m_target=jnp.where(ok, tgt, state.m_target),
        m_fire_time=jnp.where(ok, state.time, state.m_fire_time),
        missile_remain=jnp.where(ok, jnp.maximum(state.missile_remain - 1, 0),
                                 state.missile_remain),
    )


def remove_out_of_bounds(state: SimState, map_limits) -> tuple[SimState, jnp.ndarray]:
    """Boundary enforcement done in _combat_rewards (env_base.py:251-263)."""
    oob = state.alive & ~map_limits.in_boundary(state.lat, state.lon)
    return state.replace(alive=state.alive & ~oob), oob
