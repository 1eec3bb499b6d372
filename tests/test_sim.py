"""Simulator engine tests: golden kinematics, kill semantics, missiles.

Golden values are derived analytically from the reference unit models
(ac1.py, ac2.py, rocket_unit.py) rather than by running the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu import geo
from hhmarl_2d_tpu.sim import engine
from hhmarl_2d_tpu.sim.state import blank_state

KEY = jax.random.PRNGKey(0)


def make_state(n=4, lat=None, lon=None, heading=None, speed=None, ac_type=None,
               alive=None, **kw):
    s = blank_state(n)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    if lat is not None:
        s = s.replace(lat=f32(lat))
    if lon is not None:
        s = s.replace(lon=f32(lon))
    if heading is not None:
        s = s.replace(heading=f32(heading), tgt_heading=f32(heading))
    if speed is not None:
        s = s.replace(speed=f32(speed), tgt_speed=f32(speed))
    if ac_type is not None:
        s = s.replace(ac_type=jnp.asarray(ac_type, dtype=jnp.int32))
    s = s.replace(alive=jnp.ones(n, dtype=bool) if alive is None
                  else jnp.asarray(alive, dtype=bool))
    s = s.replace(cannon_remain=jnp.full(n, 200.0, jnp.float32),
                  cannon_max=jnp.full(n, 200.0, jnp.float32))
    for k, v in kw.items():
        s = s.replace(**{k: v})
    return s


class TestKinematics:
    def test_heading_rate_limit_ac1(self):
        """AC1 turns at 5 deg/s toward the commanded heading (ac1.py:82-90)."""
        s = make_state(heading=[0.0] * 4, speed=[0.0] * 4,
                       ac_type=[1, 1, 1, 1],
                       lat=[0.0, 0.1, 0.2, 0.3], lon=[0.0] * 4)
        s = engine.set_heading(s, jnp.full(4, 90.0), jnp.ones(4, bool))
        for step in range(1, 20):
            s, _ = engine.tick(s, jax.random.PRNGKey(step), num_agents=2)
            assert np.allclose(np.asarray(s.heading), min(5.0 * step, 90.0),
                               atol=1e-4)

    def test_heading_shortest_path_wraps(self):
        """350 -> 10 turns through north, not the long way."""
        s = make_state(heading=[350.0] * 4, speed=[0.0] * 4)
        s = engine.set_heading(s, jnp.full(4, 10.0), jnp.ones(4, bool))
        s, _ = engine.tick(s, KEY, num_agents=2)
        assert np.allclose(np.asarray(s.heading), 355.0, atol=1e-4)
        s, _ = engine.tick(s, KEY, num_agents=2)
        assert np.allclose(np.asarray(s.heading), 0.0, atol=1e-4)
        s, _ = engine.tick(s, KEY, num_agents=2)
        assert np.allclose(np.asarray(s.heading), 5.0, atol=1e-4)

    def test_heading_rate_ac2_slower(self):
        s = make_state(heading=[0.0] * 4, speed=[0.0] * 4, ac_type=[2] * 4)
        s = engine.set_heading(s, jnp.full(4, 90.0), jnp.ones(4, bool))
        s, _ = engine.tick(s, KEY, num_agents=2)
        assert np.allclose(np.asarray(s.heading), 3.5, atol=1e-4)

    def test_speed_rate_limit(self):
        """35 kt/s for AC1, 28 kt/s for AC2 (ac1.py:27, ac2.py:26)."""
        s = make_state(speed=[100.0] * 4, ac_type=[1, 2, 1, 2],
                       lat=[0.0, 0.1, 0.2, 0.3], lon=[0.0] * 4,
                       heading=[0.0] * 4)
        s = engine.set_speed(s, jnp.full(4, 500.0), jnp.ones(4, bool))
        s, _ = engine.tick(s, KEY, num_agents=2)
        assert np.allclose(np.asarray(s.speed), [135.0, 128.0, 135.0, 128.0])

    def test_straight_flight_distance(self):
        """10 ticks north at 900 kt covers 4630 m of ground."""
        s = make_state(lat=[0.1] * 4, lon=[0.1, 0.2, 0.3, 0.4],
                       heading=[0.0] * 4, speed=[900.0] * 4)
        lat0 = np.asarray(s.lat).copy()
        for i in range(10):
            s, _ = engine.tick(s, jax.random.PRNGKey(i), num_agents=2)
        moved_km = np.asarray(geo.geodetic_distance_km(
            C.MAP_BOTTOM_LAT + lat0[0], 0.0,
            C.MAP_BOTTOM_LAT + float(s.lat[0]), 0.0))
        expect_km = 900 * C.KNOTS_TO_MS * 10 / 1000
        assert abs(moved_km - expect_km) / expect_km < 1e-4
        # longitudes unchanged flying due north
        assert np.allclose(np.asarray(s.lon), [0.1, 0.2, 0.3, 0.4], atol=1e-7)

    def test_dead_units_do_not_move(self):
        s = make_state(lat=[0.1] * 4, lon=[0.1, 0.2, 0.3, 0.4],
                       heading=[0.0] * 4, speed=[500.0] * 4,
                       alive=[True, False, True, False])
        s, _ = engine.tick(s, KEY, num_agents=2)
        lat = np.asarray(s.lat)
        assert lat[0] > 0.1 and lat[2] > 0.1
        assert lat[1] == pytest.approx(0.1) and lat[3] == pytest.approx(0.1)


class TestCannon:
    def _facing_pair(self, dist_km=1.0, t0=1, t1=1):
        """Two aircraft facing each other dist_km apart, slots 0 (agent) and
        2 (opp); slots 1,3 parked far away."""
        dlat = dist_km * 1000 / 110574.0  # ~degrees per km latitude
        s = make_state(lat=[0.1, 0.4, 0.1 + dlat, 0.45],
                       lon=[0.1, 0.4, 0.1, 0.45],
                       heading=[0.0, 0.0, 180.0, 0.0],
                       speed=[0.0] * 4, ac_type=[t0, 1, t1, 1])
        return s

    def test_hit_probability(self):
        """Per-tick hit prob = hit_prob / burst_secs = 0.15 for AC1
        (ac1.py:112-113)."""
        s = self._facing_pair()
        s = engine.fire_cannon(s, jnp.array([True, False, False, False]))
        n_trials = 3000
        ticks = jax.vmap(lambda k: engine.tick(s, k, 2)[1].destroyed[2])(
            jax.random.split(KEY, n_trials))
        rate = float(jnp.mean(ticks.astype(jnp.float32)))
        assert abs(rate - 0.15) < 0.02

    def test_hit_probability_ac2(self):
        """0.9 / 3 = 0.3 for AC2, within its 4.5 km range."""
        s = self._facing_pair(dist_km=4.0, t0=2, t1=1)
        s = engine.fire_cannon(s, jnp.array([True, False, False, False]))
        ticks = jax.vmap(lambda k: engine.tick(s, k, 2)[1].destroyed[2])(
            jax.random.split(KEY, 3000))
        rate = float(jnp.mean(ticks.astype(jnp.float32)))
        assert abs(rate - 0.3) < 0.03

    def test_out_of_range_no_hit(self):
        s = self._facing_pair(dist_km=2.5)  # beyond AC1's 2 km
        s = engine.fire_cannon(s, jnp.array([True, False, False, False]))
        ticks = jax.vmap(lambda k: engine.tick(s, k, 2)[1].destroyed[2])(
            jax.random.split(KEY, 500))
        assert not bool(jnp.any(ticks))

    def test_outside_cone_no_hit(self):
        """Target behind the shooter is never hit."""
        s = self._facing_pair(dist_km=1.0)
        s = s.replace(heading=s.heading.at[0].set(180.0),
                      tgt_heading=s.tgt_heading.at[0].set(180.0))
        s = engine.fire_cannon(s, jnp.array([True, False, False, False]))
        ticks = jax.vmap(lambda k: engine.tick(s, k, 2)[1].destroyed[2])(
            jax.random.split(KEY, 500))
        assert not bool(jnp.any(ticks))

    def test_burst_and_ammo_decrement(self):
        s = self._facing_pair(dist_km=20.0)
        s = engine.fire_cannon(s, jnp.array([True, False, False, False]))
        assert float(s.cannon_burst[0]) == 5.0  # AC1 burst
        for i in range(3):
            s, _ = engine.tick(s, jax.random.PRNGKey(i), 2)
        assert float(s.cannon_burst[0]) == 2.0
        assert float(s.cannon_remain[0]) == 197.0
        # burst refresh caps at remaining ammo (ac1.py:70)
        s = s.replace(cannon_remain=s.cannon_remain.at[0].set(2.0))
        s = engine.fire_cannon(s, jnp.array([True, False, False, False]))
        assert float(s.cannon_burst[0]) == 2.0

    def test_mutual_kill_snapshot_semantics(self):
        """do_tick iterates a snapshot (cmano_simulator.py:142): a unit killed
        mid-tick still shoots that tick, so mutual kills occur at ~p^2."""
        s = self._facing_pair()
        s = engine.fire_cannon(s, jnp.array([True, False, True, False]))
        both = jax.vmap(
            lambda k: jnp.all(engine.tick(s, k, 2)[1].destroyed[jnp.array([0, 2])]))(
            jax.random.split(KEY, 4000))
        rate = float(jnp.mean(both.astype(jnp.float32)))
        assert abs(rate - 0.15 * 0.15) < 0.012  # would be 0 without snapshot

    def test_friendly_fire_gating(self):
        """friendly_check=False -> teammates can never be cannon-killed."""
        dlat = 1.0 * 1000 / 110574.0
        s = make_state(lat=[0.1, 0.1 + dlat, 0.4, 0.45],
                       lon=[0.1, 0.1, 0.4, 0.45],
                       heading=[0.0, 180.0, 0.0, 0.0], speed=[0.0] * 4)
        s = engine.fire_cannon(s, jnp.array([True, False, False, False]))
        hit_mate = jax.vmap(lambda k: engine.tick(
            s, k, 2, friendly_check=False)[1].destroyed[1])(
            jax.random.split(KEY, 500))
        assert not bool(jnp.any(hit_mate))
        hit_mate = jax.vmap(lambda k: engine.tick(
            s, k, 2, friendly_check=True)[1].destroyed[1])(
            jax.random.split(KEY, 500))
        assert bool(jnp.any(hit_mate))  # possible with friendly_check


class TestMissile:
    def _launch_setup(self, dist_km=50.0):
        dlat = dist_km * 1000 / 110574.0
        s = make_state(lat=[0.01, 0.3, 0.01 + dlat, 0.35],
                       lon=[0.1, 0.4, 0.1, 0.45],
                       heading=[0.0, 0.0, 180.0, 0.0],
                       speed=[300.0, 0.0, 300.0, 0.0],
                       ac_type=[1, 2, 1, 2])
        s = s.replace(missile_remain=jnp.array([5, 0, 5, 0], jnp.int32),
                      rocket_max=jnp.array([5, 0, 5, 0], jnp.int32))
        return s

    def test_launch_and_flight(self):
        s = self._launch_setup()
        want = jnp.array([True, False, False, False])
        s = engine.fire_missiles(s, want, jnp.array([2, 0, 0, 0]))
        assert bool(s.m_alive[0])
        assert int(s.missile_remain[0]) == 4
        assert float(s.m_lat[0]) == pytest.approx(float(s.lat[0]))
        # speed profile: tick at life 0 moves at 500 kt (rocket_unit.py:24)
        lat_before = float(s.m_lat[0])
        s, _ = engine.tick(s, KEY, 2)
        d_km = float(geo.geodetic_distance_km(
            C.MAP_BOTTOM_LAT + lat_before, 0.0,
            C.MAP_BOTTOM_LAT + float(s.m_lat[0]), 0.0))
        assert d_km == pytest.approx(500 * C.KNOTS_TO_MS / 1000, rel=1e-3)

    def test_out_of_range_no_launch(self):
        s = self._launch_setup(dist_km=120.0)  # beyond 111 km
        s = engine.fire_missiles(s, jnp.array([True, False, False, False]),
                                 jnp.array([2, 0, 0, 0]))
        assert not bool(s.m_alive[0])
        assert int(s.missile_remain[0]) == 5

    def test_radar_cone_is_one_sided(self):
        """The reference cone check (ac1.py:144-146) accepts bearings in
        [heading, heading+120], NOT +-60: a target 10 deg to the LEFT of the
        nose is rejected, 100 deg to the right accepted."""
        s = self._launch_setup(dist_km=50.0)
        # target at bearing 0 from shooter; shooter heading 10 -> bearing is
        # 10 deg left of nose -> signed_diff(h+60, 0) = -70 -> |.| = 70 > 60
        s1 = s.replace(heading=s.heading.at[0].set(10.0))
        s1 = engine.fire_missiles(s1, jnp.array([True, False, False, False]),
                                  jnp.array([2, 0, 0, 0]))
        assert not bool(s1.m_alive[0])
        # shooter heading 260 -> bearing 0 is 100 deg right of nose ->
        # signed_diff(320, 0) = 40 <= 60 -> accepted
        s2 = s.replace(heading=s.heading.at[0].set(260.0))
        s2 = engine.fire_missiles(s2, jnp.array([True, False, False, False]),
                                  jnp.array([2, 0, 0, 0]))
        assert bool(s2.m_alive[0])

    def test_proximity_kill(self):
        """Missile within 1 km of its target destroys it (rocket_unit.py:39)."""
        s = self._launch_setup(dist_km=3.0)
        s = engine.fire_missiles(s, jnp.array([True, False, False, False]),
                                 jnp.array([2, 0, 0, 0]))
        s = s.replace(speed=jnp.zeros(4, jnp.float32))  # freeze aircraft
        killed = False
        for i in range(8):
            s, ev = engine.tick(s, jax.random.PRNGKey(i), 2)
            if bool(ev.destroyed[2]):
                killed = True
                assert int(ev.killer[2]) == 0
                assert bool(ev.by_rocket[2])
                assert not bool(s.m_alive[0])
                break
        assert killed
        assert not bool(s.alive[2])

    def test_end_of_life(self):
        """Missile disappears once life exceeds 10 s (rocket_unit.py:54-58)."""
        s = self._launch_setup(dist_km=100.0)
        s = engine.fire_missiles(s, jnp.array([True, False, False, False]),
                                 jnp.array([2, 0, 0, 0]))
        for i in range(11):
            s, _ = engine.tick(s, jax.random.PRNGKey(i), 2)
            assert bool(s.m_alive[0]), f"died early at tick {i}"
        s, _ = engine.tick(s, jax.random.PRNGKey(99), 2)
        assert not bool(s.m_alive[0])

    def test_friendly_proximity_quirk(self):
        """rocket_unit.py:44-52: any missile whose source is not slot 1
        proximity-kills slot 1 (2nd agent) when friendly_check is on --
        including opponent missiles."""
        dlat = 0.5 * 1000 / 110574.0
        # opp slot 2 fires at agent slot 0 (far), but agent slot 1 sits
        # 0.5 km from the launch point
        s = make_state(lat=[0.25, 0.01 + dlat, 0.01, 0.3],
                       lon=[0.1, 0.1, 0.1, 0.4],
                       heading=[0.0, 0.0, 0.0, 0.0],
                       speed=[0.0] * 4, ac_type=[1, 2, 1, 2])
        s = s.replace(missile_remain=jnp.array([5, 0, 5, 0], jnp.int32),
                      rocket_max=jnp.array([5, 0, 5, 0], jnp.int32))
        s = engine.fire_missiles(s, jnp.array([False, False, True, False]),
                                 jnp.array([0, 0, 0, 0]))
        assert bool(s.m_alive[2])
        s, ev = engine.tick(s, KEY, 2)
        assert bool(ev.destroyed[1])       # slot 1 dies to the quirk
        assert int(ev.killer[1]) == 2
        assert bool(ev.by_rocket[1])
        assert not bool(s.m_alive[2])


class TestBounds:
    def test_out_of_bounds_removal(self):
        ml = geo.make_map_limits(0.3)
        s = make_state(lat=[0.1, -0.01, 0.2, 0.31],
                       lon=[0.1, 0.1, 0.32, 0.2])
        s, oob = engine.remove_out_of_bounds(s, ml)
        assert list(np.asarray(oob)) == [False, True, True, True]
        assert list(np.asarray(s.alive)) == [True, False, False, False]


class TestVmap:
    def test_batched_tick(self):
        """The whole tick vmaps over an env batch."""
        s = make_state(lat=[0.1, 0.12, 0.2, 0.22],
                       lon=[0.1, 0.12, 0.2, 0.22],
                       heading=[0.0, 90.0, 180.0, 270.0],
                       speed=[300.0] * 4)
        batch = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (64,) + x.shape), s)
        keys = jax.random.split(KEY, 64)
        out, ev = jax.jit(jax.vmap(lambda st, k: engine.tick(st, k, 2)))(
            batch, keys)
        assert out.lat.shape == (64, 4)
        assert ev.destroyed.shape == (64, 4)
