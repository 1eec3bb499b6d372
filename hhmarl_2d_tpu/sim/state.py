"""Struct-of-arrays simulation state.

Replaces the reference's id-keyed ``Dict[int, Unit]`` object registry
(/root/reference/warsim/simulator/cmano_simulator.py:79-163) with fixed-size
arrays plus alive masks, so a whole battle steps as one fused XLA program and
thousands of battles step in lockstep under ``vmap``.

Slot convention (mirrors the reference's id-range team encoding,
cmano_simulator.py:104-108, env_base.py:251-307):
  - slots ``0 .. num_agents-1``        -> agent aircraft
  - slots ``num_agents .. total-1``    -> opponent aircraft
  - missile slot ``i``                 -> the single in-flight missile of
    aircraft ``i`` (an aircraft can have at most one active missile,
    ac1.py:72-79 ``actual_missile``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from hhmarl_2d_tpu import constants as C


@struct.dataclass
class SimState:
    """One battle. All per-aircraft arrays have shape [n_slots]."""

    # kinematics; positions are degree OFFSETS from the map anchor
    # (absolute lat 5, lon 7; see geo.py precision strategy)
    lat: jnp.ndarray
    lon: jnp.ndarray
    heading: jnp.ndarray      # [0, 360)
    speed: jnp.ndarray        # knots
    tgt_heading: jnp.ndarray  # commanded heading (ac1.py:58-61 new_heading)
    tgt_speed: jnp.ndarray    # commanded speed

    # identity
    alive: jnp.ndarray        # bool
    ac_type: jnp.ndarray      # int32, 1 or 2

    # cannon
    cannon_remain: jnp.ndarray  # seconds of ammo left
    cannon_burst: jnp.ndarray   # seconds of current burst left
    cannon_max: jnp.ndarray     # per-episode ammo capacity (reset handicaps)

    # missiles (launcher state)
    missile_remain: jnp.ndarray  # int32
    rocket_max: jnp.ndarray      # int32 per-episode capacity
    missile_wait: jnp.ndarray    # int32 cooldown ticks (env_base.py:230)

    # in-flight missile per aircraft slot
    m_alive: jnp.ndarray
    # the shooter's ``actual_missile`` pointer (ac1.py:73,118-120): set on
    # launch, cleared only during the shooter's NEXT update after the
    # missile is removed -- so it lags m_alive by one tick.  Re-fire
    # gating, cooldown decrement and the obs "shot" flag read this, not
    # m_alive (env_base.py:227-236, fight_state_values :145).
    m_ptr: jnp.ndarray
    m_lat: jnp.ndarray
    m_lon: jnp.ndarray
    m_heading: jnp.ndarray
    m_tgt_heading: jnp.ndarray
    m_target: jnp.ndarray     # int32 target slot
    m_fire_time: jnp.ndarray  # int32 sim-time of launch

    # clock (seconds since episode start; tick = 1 s, cmano_simulator.py:80)
    time: jnp.ndarray         # int32 scalar

    @property
    def n_slots(self) -> int:
        return self.lat.shape[0]


def blank_state(n_slots: int) -> SimState:
    """An empty battle with every slot dead; fill via env reset."""
    f = lambda v=0.0: jnp.full((n_slots,), v, dtype=jnp.float32)
    i = lambda v=0: jnp.full((n_slots,), v, dtype=jnp.int32)
    b = lambda: jnp.zeros((n_slots,), dtype=bool)
    return SimState(
        lat=f(), lon=f(), heading=f(), speed=f(), tgt_heading=f(), tgt_speed=f(),
        alive=b(), ac_type=i(1),
        cannon_remain=f(), cannon_burst=f(), cannon_max=f(C.CANNON_MAX_SECS[0]),
        missile_remain=i(), rocket_max=i(), missile_wait=i(),
        m_alive=b(), m_ptr=b(), m_lat=f(), m_lon=f(), m_heading=f(),
        m_tgt_heading=f(),
        m_target=i(), m_fire_time=i(),
        time=jnp.asarray(0, dtype=jnp.int32),
    )


@struct.dataclass
class TickEvents:
    """Per-tick UnitDestroyedEvent equivalent (cmano_simulator.py:44-52).

    ``destroyed[j]``  -> aircraft slot j was destroyed this tick
    ``killer[j]``     -> slot of the killing aircraft (missile kills credit
                         the source aircraft, rocket_unit.py:42), -1 if none
    ``by_rocket[j]``  -> origin was a missile (env_base.py:275 checks
                         ``ev.origin.id >= total_num+1``)
    """

    destroyed: jnp.ndarray
    killer: jnp.ndarray
    by_rocket: jnp.ndarray


def blank_events(n_slots: int) -> TickEvents:
    return TickEvents(
        destroyed=jnp.zeros((n_slots,), dtype=bool),
        killer=jnp.full((n_slots,), -1, dtype=jnp.int32),
        by_rocket=jnp.zeros((n_slots,), dtype=bool),
    )
