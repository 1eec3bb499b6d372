"""Environment semantics tests: obs layouts, actions, rewards, episodes."""

import jax
import jax.numpy as jnp
import numpy as np

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.env import config as ECfg
from hhmarl_2d_tpu.env import lowlevel, obs as O
from hhmarl_2d_tpu.env import actions as A
from hhmarl_2d_tpu.sim import engine
from tests.test_sim import make_state

KEY = jax.random.PRNGKey(0)


def _cfg(level=1, **kw):
    return ECfg.make_lowlevel_config(level=level, **kw)


class TestObsLayout:
    def test_fight_obs_dims_and_padding(self):
        """AC1 uses 26 slots, AC2 24; tails of the 30-wide rows are zero."""
        cfg = _cfg()
        st, obs = lowlevel.reset(cfg, KEY)
        assert obs.shape == (2, O.OBS_PAD)
        assert np.allclose(np.asarray(obs[0][C.OBS_AC1:]), 0.0)
        assert np.allclose(np.asarray(obs[1][C.OBS_AC2:]), 0.0)
        assert np.all(np.asarray(obs) >= 0.0) and np.all(np.asarray(obs) <= 1.0)

    def test_fight_obs_own_block_values(self):
        """Spot-check own-block entries against direct computation."""
        cfg = _cfg(level=3)
        st, obs = lowlevel.reset(cfg, KEY)
        sim = st.sim
        # x = lat_rel, y = lon_rel (env_base.py:117-119)
        assert abs(float(obs[0][0])
                   - np.clip(float(sim.lat[0]) / 0.3, 0, 1)) < 1e-6
        assert abs(float(obs[0][1])
                   - np.clip(float(sim.lon[0]) / 0.3, 0, 1)) < 1e-6
        # v/vmax; all L3 spawns at speed 100 (env_base.py:562)
        assert abs(float(obs[0][2]) - 100.0 / 900.0) < 1e-6
        assert abs(float(obs[1][2]) - 100.0 / 600.0) < 1e-6
        # cannon full at spawn
        assert float(obs[0][8]) == 1.0
        # AC1 missile state: full ammo, ready, not shooting
        assert float(obs[0][9]) == 1.0
        assert float(obs[0][10]) == 1.0
        assert float(obs[0][11]) == 0.0

    def test_escape_obs_dims(self):
        cfg = _cfg(level=3, agent_mode="escape")
        st, obs = lowlevel.reset(cfg, KEY)
        assert np.allclose(np.asarray(obs[0][C.OBS_ESC_AC1:]), 0.0)
        assert np.allclose(np.asarray(obs[1][C.OBS_ESC_AC2:]), 0.0)
        # own blocks: 7 values for AC1 (incl missile frac), 6 for AC2
        assert float(obs[0][5]) == 1.0   # missile fraction
        assert float(obs[0][6]) == 0.0   # shot flag
        assert float(obs[1][5]) == 0.0   # AC2 shot flag directly after cannon

    def test_dead_agent_zero_obs(self):
        """Destroyed agents produce all-zero rows (env_hetero.py:97-100)."""
        cfg = _cfg()
        st, obs = lowlevel.reset(cfg, KEY)
        sim = st.sim.replace(alive=st.sim.alive.at[0].set(False))
        o, tgt, valid = O.lowlevel_side_obs(cfg, sim, "fight", "agent")
        assert not bool(valid[0]) and bool(valid[1])
        assert np.allclose(np.asarray(o[0]), 0.0)
        assert int(tgt[0]) == -1

    def test_opp_side_obs(self):
        cfg = _cfg()
        st, _ = lowlevel.reset(cfg, KEY)
        o, tgt, valid = O.lowlevel_side_obs(cfg, st.sim, "fight", "opp")
        assert o.shape == (2, O.OBS_PAD)
        assert bool(valid[0]) and bool(valid[1])
        assert int(tgt[0]) in (0, 1)


class TestActions:
    def test_heading_speed_decode(self):
        """heading += (a0-6)*15 (relative); speed = 100+(max-100)/8*a1."""
        s = make_state(heading=[100.0] * 4, speed=[300.0] * 4,
                       ac_type=[1, 2, 1, 2],
                       lat=[0.1, 0.2, 0.3, 0.4], lon=[0.1] * 4)
        cfg = _cfg()
        acts = jnp.array([[0, 0, 0, 0], [12, 8, 0, 0],
                          [6, 4, 0, 0], [6, 0, 0, 0]], jnp.int32)
        acting = jnp.ones(4, bool)
        s2, _ = A.apply_actions(cfg, s, acts, acting,
                                jnp.full(4, -1, jnp.int32), KEY)
        np.testing.assert_allclose(
            np.asarray(s2.tgt_heading), [10.0, 190.0, 100.0, 100.0])
        np.testing.assert_allclose(
            np.asarray(s2.tgt_speed),
            [100.0, 600.0, 100.0 + (900 - 100) / 8 * 4, 100.0])

    def test_missile_cooldown_consumed_on_failed_attempt(self):
        """env_base.py:227-236: wait set then immediately decremented when
        the launch envelope fails."""
        cfg = _cfg()
        # target far out of range -> envelope fails
        s = make_state(lat=[0.01, 0.25, 2.0, 0.3], lon=[0.1, 0.4, 2.0, 0.45],
                       heading=[0.0] * 4, speed=[300.0] * 4,
                       ac_type=[1, 2, 1, 2])
        s = s.replace(missile_remain=jnp.array([5, 0, 5, 0], jnp.int32),
                      rocket_max=jnp.array([5, 0, 5, 0], jnp.int32))
        acts = jnp.zeros((4, 4), jnp.int32).at[0, 3].set(1)
        s2, _ = A.apply_actions(cfg, s, acts, jnp.ones(4, bool),
                                jnp.array([2, -1, -1, -1], jnp.int32), KEY)
        assert not bool(s2.m_alive[0])
        w = int(s2.missile_wait[0])
        assert 6 <= w <= 16  # randint(7,17) minus the immediate decrement
        assert int(s2.missile_remain[0]) == 5

    def test_missile_fired_no_decrement(self):
        cfg = _cfg()
        dlat = 50 * 1000 / 110574.0
        s = make_state(lat=[0.01, 0.25, 0.01 + dlat, 0.3],
                       lon=[0.1, 0.4, 0.1, 0.45],
                       heading=[0.0] * 4, speed=[300.0] * 4,
                       ac_type=[1, 2, 1, 2])
        s = s.replace(missile_remain=jnp.array([5, 0, 5, 0], jnp.int32),
                      rocket_max=jnp.array([5, 0, 5, 0], jnp.int32))
        acts = jnp.zeros((4, 4), jnp.int32).at[0, 3].set(1)
        s2, _ = A.apply_actions(cfg, s, acts, jnp.ones(4, bool),
                                jnp.array([2, -1, -1, -1], jnp.int32), KEY)
        assert bool(s2.m_alive[0])
        assert int(s2.missile_remain[0]) == 4
        w = int(s2.missile_wait[0])
        assert 7 <= w <= 17  # no decrement while missile in flight


class TestSpawn:
    def test_level1_spawn_boxes(self):
        cfg = _cfg(level=1)
        for seed in range(5):
            st, _ = lowlevel.reset(cfg, jax.random.PRNGKey(seed))
            sim = st.sim
            lon = np.asarray(sim.lon)
            lat = np.asarray(sim.lat)
            # agents on one side, opps on the other (boxes from
            # env_base.py:493-529, offsets)
            assert np.all((lon >= 0.11) & (lon <= 0.18))
            assert np.all((lat >= 0.09) & (lat <= 0.22))
            # opps stationary at L1
            np.testing.assert_allclose(np.asarray(sim.speed)[2:], 0.0)
            np.testing.assert_allclose(np.asarray(sim.heading)[2:], 0.0)
            # types alternate 1,2 per side
            assert list(np.asarray(sim.ac_type)) == [1, 2, 1, 2]

    def test_opp_ammo_handicaps(self):
        cfg = _cfg(level=3)
        st, _ = lowlevel.reset(cfg, KEY)
        sim = st.sim
        assert float(sim.cannon_max[2]) == 400.0  # opp handicap L<=4
        assert float(sim.cannon_max[0]) == 200.0  # agent default
        assert int(sim.rocket_max[2]) == 8
        assert int(sim.rocket_max[0]) == 5

        cfg5 = _cfg(level=5)
        st5, _ = lowlevel.reset(cfg5, KEY)
        assert float(st5.sim.cannon_max[0]) == 300.0  # L5: both sides
        assert int(st5.sim.rocket_max[0]) == 6


class TestEpisode:
    def test_horizon_truncation_and_autoreset(self):
        cfg = _cfg(level=1)
        st, obs = lowlevel.reset(cfg, KEY)
        step_j = jax.jit(lambda s, a, k: lowlevel.step(cfg, s, a, k))
        # no-op actions: heading/speed hold, no fire
        acts = jnp.tile(jnp.array([6, 0, 0, 0], jnp.int32), (2, 1))
        done_at = None
        for i in range(cfg.horizon + 5):
            st, obs, rew, done, info = step_j(st, acts, jax.random.PRNGKey(i))
            if bool(done):
                done_at = i
                assert int(info["draw"]) == 1
                break
        assert done_at is not None and done_at <= cfg.horizon
        # auto-reset: fresh episode state
        assert int(st.steps) == 0
        assert np.all(np.asarray(st.sim.alive))

    def test_oob_punishment(self):
        """Flying out of the map kills the agent and pays -5."""
        cfg = _cfg(level=1)
        st, obs = lowlevel.reset(cfg, KEY)
        # drive agent 0 due west (heading 270) at max speed
        sim = st.sim.replace(
            lon=st.sim.lon.at[0].set(0.001),
            heading=st.sim.heading.at[0].set(270.0),
            tgt_heading=st.sim.tgt_heading.at[0].set(270.0),
            speed=st.sim.speed.at[0].set(900.0),
            tgt_speed=st.sim.tgt_speed.at[0].set(900.0))
        st = st.replace(sim=sim)
        acts = jnp.tile(jnp.array([6, 8, 0, 0], jnp.int32), (2, 1))
        got = None
        for i in range(40):
            st, obs, rew, done, info = lowlevel.step(
                cfg, st, acts, jax.random.PRNGKey(i))
            if float(rew[0]) <= -5.0:
                got = float(rew[0])
                break
        assert got is not None and abs(got + 5.0) < 1e-5
