"""Differential parity: the JAX engine vs the ACTUAL reference simulator.

Runs /root/reference/warsim/simulator/* (imported through the shims of
refshim.py -- Vincenty-backed geographiclib, no rendering) side by side
with hhmarl_2d_tpu.sim.engine on identical scripted scenarios, feeding
both the same random stream via the engine's ``u_cannon``/``u_steer``
injection hooks and a patched reference RNG.  Any drift in kinematics,
kill ordering, missile lifecycle, out-of-bounds handling, observation
encoding or reward math fails these tests.

Position tolerance: the framework's local-ellipsoid geodesics agree with
the reference's WGS84 geodesics to < 2e-7 deg per tick (tests/test_geo.py);
the engine state is float32; both accumulate to a few 1e-6 deg over the
150-400 tick horizons -- the asserts use 5e-5 deg (~5 m), far below every
gameplay threshold (cannon 2 km, proximity 1 km, map 33 km).
"""

import numpy as np
import pytest

import refshim

refshim.install()

# the reference's own internal module names (its files sys.path-hack
# /root/reference/warsim, see cmano_simulator.py:16)
from simulator.cmano_simulator import CmanoSimulator, Position  # noqa: E402
from simulator.ac1 import Rafale  # noqa: E402
from simulator.ac2 import RafaleLong  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hhmarl_2d_tpu import constants as C  # noqa: E402
from hhmarl_2d_tpu.sim import engine  # noqa: E402
from hhmarl_2d_tpu.sim.state import blank_state  # noqa: E402

ALT = 10668.0
ANCH_LAT, ANCH_LON = C.MAP_BOTTOM_LAT, C.MAP_LEFT_LON

POS_ATOL = 5e-5       # degrees, ~5 m
HDG_ATOL = 5e-3       # degrees
SPD_ATOL = 5e-3       # knots


class FixedRnd:
    """Stand-in for sim.rnd_gen: every cannon-hit roll returns ``v``."""

    def __init__(self, v):
        self.v = v

    def random(self):
        return self.v


@pytest.fixture
def no_steer_noise(monkeypatch):
    """Pin the reference's global-random missile steering noise to 1.0
    (ac1.py:127 random.uniform(0.95, 1.05))."""
    import random as _random
    monkeypatch.setattr(_random, "uniform", lambda a, b: 1.0)


def build_pair(specs, num_agents, friendly_check=True, u_hit=1.0):
    """One battle in both simulators.

    specs: list of dicts with type (1|2), lat/lon (absolute), heading,
    speed.  Slot i <-> reference unit id i+1.
    Returns (ref_sim, jax_state).
    """
    n = len(specs)
    sim = CmanoSimulator(num_units=num_agents, num_opp_units=n - num_agents)
    sim.rnd_gen = FixedRnd(u_hit)
    for i, sp in enumerate(specs):
        cls = Rafale if sp["type"] == 1 else RafaleLong
        group = "agent" if i < num_agents else "opp"
        sim.add_unit(cls(Position(sp["lat"], sp["lon"], ALT), sp["heading"],
                         sp["speed"], group, friendly_check))

    st = blank_state(n)
    f32 = lambda k: jnp.asarray([sp[k] for sp in specs], jnp.float32)
    types = jnp.asarray([sp["type"] for sp in specs], jnp.int32)
    st = st.replace(
        lat=f32("lat") - ANCH_LAT, lon=f32("lon") - ANCH_LON,
        heading=f32("heading"), speed=f32("speed"),
        tgt_heading=f32("heading"), tgt_speed=f32("speed"),
        alive=jnp.ones(n, bool), ac_type=types,
        cannon_remain=jnp.full(n, 200.0), cannon_max=jnp.full(n, 200.0),
        missile_remain=jnp.where(types == 1, 5, 0).astype(jnp.int32),
        rocket_max=jnp.where(types == 1, 5, 0).astype(jnp.int32))
    return sim, st


def ref_tick(sim, n):
    """One reference tick -> (destroyed [n], killer [n], by_rocket [n])."""
    destroyed = np.zeros(n, bool)
    killer = np.full(n, -1, np.int32)
    by_rocket = np.zeros(n, bool)
    for ev in sim.do_tick():
        if not hasattr(ev, "unit_destroyed"):
            continue
        d = ev.unit_destroyed.id - 1
        if d < n:
            destroyed[d] = True
            killer[d] = ev.unit_killer.id - 1
            by_rocket[d] = ev.origin.id > n
    return destroyed, killer, by_rocket


def jax_tick(st, num_agents, friendly_check=True, u_hit=1.0, u_steer=1.0):
    n = st.n_slots
    return engine.tick(
        st, jax.random.PRNGKey(0), num_agents, friendly_check,
        u_cannon=jnp.full((n, n), u_hit, jnp.float32),
        u_steer=jnp.full((n,), u_steer, jnp.float32))


def assert_aircraft_match(sim, st, tick_i):
    n = st.n_slots
    for i in range(n):
        exists = sim.unit_exists(i + 1)
        assert exists == bool(st.alive[i]), \
            f"tick {tick_i} slot {i}: alive {bool(st.alive[i])} != {exists}"
        if not exists:
            continue
        u = sim.get_unit(i + 1)
        assert abs(u.position.lat - (ANCH_LAT + float(st.lat[i]))) < POS_ATOL, \
            f"tick {tick_i} slot {i} lat"
        assert abs(u.position.lon - (ANCH_LON + float(st.lon[i]))) < POS_ATOL, \
            f"tick {tick_i} slot {i} lon"
        dh = abs(u.heading - float(st.heading[i])) % 360.0
        assert min(dh, 360.0 - dh) < HDG_ATOL, f"tick {tick_i} slot {i} hdg"
        assert abs(u.speed - float(st.speed[i])) < SPD_ATOL, \
            f"tick {tick_i} slot {i} speed"
        assert abs(u.cannon_remain_secs - float(st.cannon_remain[i])) < 1e-4
        assert abs(u.cannon_current_burst_secs
                   - float(st.cannon_burst[i])) < 1e-4
        assert u.missile_remain == int(st.missile_remain[i])
        assert bool(u.actual_missile) == bool(st.m_ptr[i]), \
            f"tick {tick_i} slot {i} missile pointer"


def assert_missiles_match(sim, st, tick_i):
    """Compare every shooter's in-flight missile.

    Rockets are found by their ``source`` id rather than through the
    owner's ``actual_missile`` pointer: a reference rocket keeps flying
    (and killing) after its owner aircraft is destroyed
    (rocket_unit.py:37-73 never checks the source), and the stale-pointer
    semantics (pointer kept one tick after removal) fall out the same way
    because removed rockets leave ``active_units``."""
    for i in range(st.n_slots):
        m = None
        for u in list(sim.active_units.values()):
            if type(u).__name__ == "Rocket" and u.source.id == i + 1:
                m = u
                break
        assert (m is not None) == bool(st.m_alive[i]), \
            f"tick {tick_i} slot {i}: missile alive mismatch"
        if m is None:
            continue
        assert abs(m.position.lat - (ANCH_LAT + float(st.m_lat[i]))) < POS_ATOL
        assert abs(m.position.lon - (ANCH_LON + float(st.m_lon[i]))) < POS_ATOL
        dh = abs(m.heading - float(st.m_heading[i])) % 360.0
        assert min(dh, 360.0 - dh) < HDG_ATOL, f"tick {tick_i} slot {i} m_hdg"


def command_both(sim, st, cmds):
    """Apply heading/speed/cannon/missile commands to both sims.

    cmds: dict slot -> dict(heading=?, speed=?, cannon=bool, missile=slot).
    """
    n = st.n_slots
    h = st.tgt_heading
    s = st.tgt_speed
    h_mask = np.zeros(n, bool)
    s_mask = np.zeros(n, bool)
    c_mask = np.zeros(n, bool)
    m_want = np.zeros(n, bool)
    m_tgt = np.zeros(n, np.int32)
    for slot, cmd in cmds.items():
        if not sim.unit_exists(slot + 1):
            continue
        u = sim.get_unit(slot + 1)
        if "heading" in cmd:
            u.set_heading(cmd["heading"])
            h = h.at[slot].set(cmd["heading"])
            h_mask[slot] = True
        if "speed" in cmd:
            u.set_speed(cmd["speed"])
            s = s.at[slot].set(cmd["speed"])
            s_mask[slot] = True
        if cmd.get("cannon"):
            u.fire_cannon()
            c_mask[slot] = True
        if "missile" in cmd:
            tgt = cmd["missile"]
            # env-level gate (_take_base_action, env_base.py:227-233)
            if (u.ac_type == 1 and u.missile_remain > 0
                    and not u.actual_missile and sim.unit_exists(tgt + 1)):
                u.fire_missile(u, sim.get_unit(tgt + 1), sim)
            if u.ac_type == 1:
                m_want[slot] = True
                m_tgt[slot] = tgt
    st = engine.set_heading(st, h, jnp.asarray(h_mask))
    st = engine.set_speed(st, s, jnp.asarray(s_mask))
    st = engine.fire_cannon(st, jnp.asarray(c_mask))
    want = (jnp.asarray(m_want) & (st.ac_type == 1) & (st.missile_remain > 0)
            & ~st.m_ptr & st.alive)
    st = engine.fire_missiles(st, want, jnp.asarray(m_tgt))
    return st


# ---------------------------------------------------------------------------


class TestKinematicsParity:
    def test_random_maneuvers_150_ticks(self):
        """4 heterogeneous aircraft fly 150 ticks of random rate-limited
        maneuvers; positions/headings/speeds track the reference."""
        rng = np.random.default_rng(42)
        specs = [
            dict(type=1, lat=5.10, lon=7.10, heading=30.0, speed=400.0),
            dict(type=2, lat=5.12, lon=7.14, heading=200.0, speed=250.0),
            dict(type=1, lat=5.20, lon=7.20, heading=300.0, speed=600.0),
            dict(type=2, lat=5.16, lon=7.22, heading=90.0, speed=100.0),
        ]
        sim, st = build_pair(specs, num_agents=2)
        for t in range(150):
            if t % 10 == 0:
                cmds = {}
                for i in range(4):
                    maxspd = 900.0 if specs[i]["type"] == 1 else 600.0
                    cmds[i] = dict(heading=float(rng.uniform(0, 359.9)),
                                   speed=float(rng.uniform(50, maxspd)))
                st = command_both(sim, st, cmds)
            ref_tick(sim, 4)
            st, _ = jax_tick(st, 2)
            assert_aircraft_match(sim, st, t)

    def test_rate_limits_converge_exactly(self):
        """Heading/speed converge tick-by-tick at the per-type rates."""
        specs = [dict(type=1, lat=5.1, lon=7.1, heading=0.0, speed=200.0),
                 dict(type=2, lat=5.2, lon=7.2, heading=0.0, speed=200.0)]
        sim, st = build_pair(specs, num_agents=1)
        st = command_both(sim, st, {0: dict(heading=77.0, speed=890.0),
                                    1: dict(heading=283.0, speed=599.0)})
        for t in range(60):
            ref_tick(sim, 2)
            st, _ = jax_tick(st, 1)
            assert_aircraft_match(sim, st, t)
        assert abs(float(st.heading[0]) - 77.0) < 1e-3
        assert abs(float(st.heading[1]) - 283.0) < 1e-3


class TestCannonParity:
    def _chase(self, ac_type):
        """Shooter of ``ac_type`` directly behind a slow target, in range."""
        rng_km = 1.5 if ac_type == 1 else 3.5
        dlat = rng_km / 111.0
        specs = [dict(type=ac_type, lat=5.15, lon=7.15, heading=0.0,
                      speed=300.0),
                 dict(type=1, lat=5.15 + dlat, lon=7.15, heading=0.0,
                      speed=300.0)]
        return specs

    @pytest.mark.parametrize("ac_type", [1, 2])
    def test_kill_when_always_hit(self, ac_type):
        specs = self._chase(ac_type)
        sim, st = build_pair(specs, num_agents=1, u_hit=0.0)
        st = command_both(sim, st, {0: dict(cannon=True)})
        d_ref, k_ref, r_ref = ref_tick(sim, 2)
        st, ev = jax_tick(st, 1, u_hit=0.0)
        assert d_ref[1] and bool(ev.destroyed[1])
        assert k_ref[1] == 0 == int(ev.killer[1])
        assert not r_ref[1] and not bool(ev.by_rocket[1])
        assert_aircraft_match(sim, st, 0)
        # ammo accounting after the burst tick
        assert sim.get_unit(1).cannon_remain_secs == float(st.cannon_remain[0])

    @pytest.mark.parametrize("ac_type", [1, 2])
    def test_no_kill_when_never_hit(self, ac_type):
        specs = self._chase(ac_type)
        sim, st = build_pair(specs, num_agents=1, u_hit=1.0)
        st = command_both(sim, st, {0: dict(cannon=True)})
        for t in range(3):
            d_ref, _, _ = ref_tick(sim, 2)
            st, ev = jax_tick(st, 1, u_hit=1.0)
            assert not d_ref.any() and not bool(ev.destroyed.any())
            assert_aircraft_match(sim, st, t)

    def test_out_of_cone_no_kill(self):
        """Target inside range but outside the half-width cone."""
        specs = [dict(type=1, lat=5.15, lon=7.15, heading=0.0, speed=0.0),
                 dict(type=1, lat=5.15, lon=7.162, heading=0.0, speed=0.0)]
        sim, st = build_pair(specs, num_agents=1, u_hit=0.0)
        st = command_both(sim, st, {0: dict(cannon=True)})
        d_ref, _, _ = ref_tick(sim, 2)
        st, ev = jax_tick(st, 1, u_hit=0.0)
        assert not d_ref.any() and not bool(ev.destroyed.any())

    def test_mutual_mid_tick_kill_ordering(self):
        """Two head-on shooters in mutual range: the snapshot-iteration
        semantics kill BOTH (the lower id shoots first, the dead higher id
        still executes its own update and shoots back)."""
        specs = [dict(type=1, lat=5.150, lon=7.15, heading=0.0, speed=100.0),
                 dict(type=1, lat=5.159, lon=7.15, heading=180.0,
                      speed=100.0)]
        sim, st = build_pair(specs, num_agents=1, u_hit=0.0)
        st = command_both(sim, st, {0: dict(cannon=True),
                                    1: dict(cannon=True)})
        d_ref, k_ref, _ = ref_tick(sim, 2)
        st, ev = jax_tick(st, 1, u_hit=0.0)
        assert list(d_ref) == [True, True]
        assert list(np.asarray(ev.destroyed)) == [True, True]
        assert k_ref[1] == 0 == int(ev.killer[1])
        assert k_ref[0] == 1 == int(ev.killer[0])

    def test_friendly_check_gates_cannon(self):
        """friendly_check=False must not cannon-kill a teammate; True must."""
        specs = [dict(type=1, lat=5.15, lon=7.15, heading=0.0, speed=100.0),
                 dict(type=1, lat=5.159, lon=7.15, heading=0.0, speed=100.0)]
        for fc in (True, False):
            sim, st = build_pair(specs, num_agents=2, friendly_check=fc,
                                 u_hit=0.0)
            st = command_both(sim, st, {0: dict(cannon=True)})
            d_ref, _, _ = ref_tick(sim, 2)
            st, ev = jax_tick(st, 2, friendly_check=fc, u_hit=0.0)
            assert d_ref[1] == fc
            assert bool(ev.destroyed[1]) == fc


class TestMissileParity:
    def test_lifecycle_hit(self, no_steer_noise):
        """Launch -> quadratic speed profile -> proximity kill, with the
        missile tracked position-for-position against the Rocket unit."""
        specs = [dict(type=1, lat=5.10, lon=7.15, heading=0.0, speed=300.0),
                 dict(type=1, lat=5.145, lon=7.15, heading=0.0, speed=200.0)]
        sim, st = build_pair(specs, num_agents=1, u_hit=1.0)
        st = command_both(sim, st, {0: dict(missile=1)})
        assert sim.get_unit(1).actual_missile is not None
        assert bool(st.m_alive[0])
        assert sim.get_unit(1).missile_remain == 4 == int(st.missile_remain[0])
        hit_tick = None
        for t in range(12):
            d_ref, k_ref, r_ref = ref_tick(sim, 2)
            st, ev = jax_tick(st, 1, u_hit=1.0)
            assert_missiles_match(sim, st, t)
            assert_aircraft_match(sim, st, t)
            assert list(d_ref) == list(np.asarray(ev.destroyed))
            if d_ref[1]:
                assert k_ref[1] == 0 == int(ev.killer[1])
                assert r_ref[1] and bool(ev.by_rocket[1])
                hit_tick = t
                break
        assert hit_tick is not None, "missile never hit in either sim"

    def test_lifecycle_eol(self, no_steer_noise):
        """Target far away: the missile dies at life > 10 s in both sims,
        and the stale shooter pointer clears one tick later."""
        specs = [dict(type=1, lat=5.05, lon=7.15, heading=0.0, speed=300.0),
                 dict(type=1, lat=5.75, lon=7.15, heading=0.0, speed=500.0)]
        sim, st = build_pair(specs, num_agents=1, u_hit=1.0)
        st = command_both(sim, st, {0: dict(missile=1)})
        assert bool(st.m_alive[0])
        for t in range(14):
            ref_tick(sim, 2)
            st, _ = jax_tick(st, 1, u_hit=1.0)
            assert_missiles_match(sim, st, t)
            assert_aircraft_match(sim, st, t)  # includes the m_ptr compare
        assert not bool(st.m_alive[0])
        assert not bool(st.m_ptr[0])

    def test_friendly_proximity_quirk(self, no_steer_noise):
        """rocket_unit.py:44-52 hardcodes ids 1/2 as the friendly pair:
        slot 0's missile passing within 1 km of slot 1 kills slot 1."""
        specs = [dict(type=1, lat=5.10, lon=7.15, heading=0.0, speed=200.0),
                 dict(type=1, lat=5.13, lon=7.15, heading=90.0, speed=0.0),
                 dict(type=1, lat=5.40, lon=7.15, heading=0.0, speed=400.0),
                 dict(type=2, lat=5.42, lon=7.17, heading=0.0, speed=300.0)]
        sim, st = build_pair(specs, num_agents=2, u_hit=1.0)
        st = command_both(sim, st, {0: dict(missile=2)})
        killed = None
        for t in range(12):
            d_ref, k_ref, r_ref = ref_tick(sim, 4)
            st, ev = jax_tick(st, 2, u_hit=1.0)
            assert list(d_ref) == list(np.asarray(ev.destroyed)), f"tick {t}"
            if d_ref.any():
                killed = int(np.flatnonzero(d_ref)[0])
                assert k_ref[killed] == 0 == int(ev.killer[killed])
                break
            assert_missiles_match(sim, st, t)
        assert killed == 1, "the friendly (slot 1) should die to the quirk"

    def test_envelope_gating(self):
        """Out-of-range and out-of-radar-cone launches fail identically."""
        # 120 km ahead: out of the 111 km range
        far = [dict(type=1, lat=5.0, lon=7.0, heading=0.0, speed=300.0),
               dict(type=1, lat=6.08, lon=7.0, heading=0.0, speed=300.0)]
        sim, st = build_pair(far, num_agents=1)
        st = command_both(sim, st, {0: dict(missile=1)})
        assert sim.get_unit(1).actual_missile is None
        assert not bool(st.m_alive[0])
        # behind the one-sided radar cone (ac1.py:144-146: bearing must lie
        # in [heading, heading+120])
        behind = [dict(type=1, lat=5.5, lon=7.2, heading=0.0, speed=300.0),
                  dict(type=1, lat=5.4, lon=7.2, heading=0.0, speed=300.0)]
        sim, st = build_pair(behind, num_agents=1)
        st = command_both(sim, st, {0: dict(missile=1)})
        assert sim.get_unit(1).actual_missile is None
        assert not bool(st.m_alive[0])
        # inside the cone on the one-sided edge: bearing 90 deg off heading
        side = [dict(type=1, lat=5.3, lon=7.2, heading=0.0, speed=300.0),
                dict(type=1, lat=5.3, lon=7.29, heading=0.0, speed=300.0)]
        sim, st = build_pair(side, num_agents=1)
        st = command_both(sim, st, {0: dict(missile=1)})
        assert sim.get_unit(1).actual_missile is not None
        assert bool(st.m_alive[0])


# --- observation & reward parity against the reference env math -------------

from types import SimpleNamespace  # noqa: E402

from envs.env_base import HHMARLBaseEnv  # noqa: E402
from envs.env_hetero import LowLevelEnv  # noqa: E402

from hhmarl_2d_tpu.env import config as ECfg  # noqa: E402
from hhmarl_2d_tpu.env import obs as O  # noqa: E402
from hhmarl_2d_tpu.env import rewards as R  # noqa: E402
from hhmarl_2d_tpu.env import geometry as G  # noqa: E402

# heavy suite: excluded from the default fast gate (pyproject addopts)
pytestmark = pytest.mark.slow


def make_ref_env(agent_mode="fight", level=1, **kw):
    """A real LowLevelEnv (plotting stubbed) around an existing sim."""
    args = SimpleNamespace(
        agent_mode=agent_mode, num_agents=2, num_opps=2, total_num=4,
        map_size=0.3, level=level, rew_scale=kw.get("rew_scale", 1.0),
        friendly_punish=kw.get("friendly_punish", False),
        glob_frac=kw.get("glob_frac", 0.0),
        esc_dist_rew=kw.get("esc_dist_rew", False), eval_info=False,
        horizon=kw.get("horizon", 150))
    env = LowLevelEnv({"args": args})
    env.missile_wait = {i: 0 for i in range(1, 5)}
    env.opp_to_attack = {i: None for i in range(1, 5)}
    env.alive_agents = 2
    env.alive_opps = 2
    return env


def interesting_battle():
    """2-vs-2 with a live missile, a burst, spent ammo and a cooldown --
    exercises every obs field."""
    specs = [dict(type=1, lat=5.10, lon=7.12, heading=20.0, speed=400.0),
             dict(type=2, lat=5.08, lon=7.16, heading=350.0, speed=250.0),
             dict(type=1, lat=5.19, lon=7.13, heading=185.0, speed=550.0),
             dict(type=2, lat=5.17, lon=7.20, heading=200.0, speed=300.0)]
    sim, st = build_pair(specs, num_agents=2, u_hit=1.0)
    # slot 0 fires a missile at slot 2; slot 2 opens a cannon burst
    st = command_both(sim, st, {0: dict(missile=2), 2: dict(cannon=True)})
    for t in range(3):
        ref_tick(sim, 4)
        st, _ = jax_tick(st, 2, u_hit=1.0)
    # cooldown bookkeeping lives in the env dicts / SimState field
    return sim, st


def _check_side_obs(env, st, cfg, mode, side):
    obs_ours, opp_att, valid = O.lowlevel_side_obs(cfg, st, mode, side)
    obs_ours = np.asarray(obs_ours)
    ids = (1, 2) if side == "agent" else (3, 4)
    for k, i in enumerate(ids):
        ref_d = env.lowlevel_state(mode, agent_id=i)
        ref_row = np.asarray(ref_d[i], np.float64)
        ours = obs_ours[k]
        np.testing.assert_allclose(
            ours[:len(ref_row)], ref_row, atol=5e-4,
            err_msg=f"{mode}/{side} obs row for reference id {i}")
        assert np.all(ours[len(ref_row):] == 0.0)
        ref_att = env.opp_to_attack[i]
        ours_att = int(opp_att[k])
        assert (ref_att - 1 if ref_att else -1) == ours_att


class TestObsParity:
    def test_fight_and_escape_layouts(self):
        sim, st = interesting_battle()
        cfg = ECfg.make_lowlevel_config(level=1)
        for mode in ("fight", "esc"):
            env = make_ref_env("fight" if mode == "fight" else "escape")
            env.sim = sim
            # mirror the cooldowns into the env dict
            for i in range(4):
                env.missile_wait[i + 1] = int(st.missile_wait[i])
            ref_mode = "fight" if mode == "fight" else "esc"
            for side in ("agent", "opp"):
                _check_side_obs(env, st, cfg, ref_mode, side)

    def test_obs_after_death_zero_rows_and_resort(self):
        """Kill one opponent; the survivor's designation list re-sorts and
        dead slots produce zero rows in both implementations."""
        specs = [dict(type=1, lat=5.15, lon=7.15, heading=0.0, speed=300.0),
                 dict(type=2, lat=5.10, lon=7.10, heading=90.0, speed=300.0),
                 dict(type=1, lat=5.164, lon=7.15, heading=0.0, speed=300.0),
                 dict(type=2, lat=5.05, lon=7.28, heading=180.0, speed=300.0)]
        sim, st = build_pair(specs, num_agents=2, u_hit=0.0)
        st = command_both(sim, st, {0: dict(cannon=True)})
        d_ref, _, _ = ref_tick(sim, 4)
        st, ev = jax_tick(st, 2, u_hit=0.0)
        assert d_ref[2] and bool(ev.destroyed[2])
        cfg = ECfg.make_lowlevel_config(level=1)
        env = make_ref_env("fight")
        env.sim = sim
        for side in ("agent", "opp"):
            _check_side_obs(env, st, cfg, "fight", side)
            _check_side_obs(env, st, cfg, "esc", side)


def _ref_combat_rewards(env, events_ours, st_pre, opp_stats_focus,
                        mode="LowLevel"):
    """Run the reference _combat_rewards with fake events mirroring ours."""
    evs = []
    killer = np.asarray(events_ours.killer)
    for j in np.flatnonzero(np.asarray(events_ours.destroyed)):
        k = int(killer[j])
        ku = env.sim.get_unit(k + 1) if env.sim.unit_exists(k + 1) else \
            SimpleNamespace(id=k + 1)
        du = SimpleNamespace(id=int(j) + 1)
        origin_id = 99 if bool(events_ours.by_rocket[j]) else k + 1
        evs.append(SimpleNamespace(unit_killer=ku, unit_destroyed=du,
                                   origin=SimpleNamespace(id=origin_id)))
    opp_stats = {i + 1: [float(opp_stats_focus[i]), 0.0] for i in range(2)}
    return HHMARLBaseEnv._combat_rewards(env, evs, opp_stats, mode)


class TestRewardParity:
    def _kill_scenario(self, by_rocket=False):
        if by_rocket:
            specs = [dict(type=1, lat=5.10, lon=7.15, heading=0.0,
                          speed=300.0),
                     dict(type=2, lat=5.05, lon=7.05, heading=0.0,
                          speed=200.0),
                     dict(type=1, lat=5.145, lon=7.15, heading=0.0,
                          speed=200.0),
                     dict(type=2, lat=5.28, lon=7.28, heading=180.0,
                          speed=300.0)]
            cmds = {0: dict(missile=2)}
            u_hit = 1.0
        else:
            specs = [dict(type=1, lat=5.15, lon=7.15, heading=0.0,
                          speed=300.0),
                     dict(type=2, lat=5.05, lon=7.05, heading=0.0,
                          speed=200.0),
                     dict(type=1, lat=5.164, lon=7.15, heading=0.0,
                          speed=250.0),
                     dict(type=2, lat=5.28, lon=7.28, heading=180.0,
                          speed=300.0)]
            cmds = {0: dict(cannon=True)}
            u_hit = 0.0
        sim, st = build_pair(specs, num_agents=2, u_hit=u_hit)
        st = command_both(sim, st, cmds)
        return sim, st, u_hit

    @pytest.mark.parametrize("by_rocket", [False, True])
    def test_agent_kill_reward(self, by_rocket, no_steer_noise):
        sim, st, u_hit = self._kill_scenario(by_rocket)
        cfg = ECfg.make_lowlevel_config(level=1)
        env = make_ref_env("fight")
        env.sim = sim
        # opp_stats focus captured pre-tick (env_hetero.py:169-170)
        geom = G.pairwise(st, cfg.map_size)
        focus_pre = np.zeros(2, np.float32)
        for i, tgt in ((0, 2), (1, 2)):
            focus_pre[i] = float(
                np.clip(np.asarray(geom["focus"])[tgt, i] / 180.0, 0, 1))
        killed = False
        for t in range(12):
            d_ref, _, _ = ref_tick(sim, 4)
            st, ev = jax_tick(st, 2, u_hit=u_hit)
            assert list(d_ref) == list(np.asarray(ev.destroyed))
            if d_ref.any():
                env.alive_opps = 1
                rews_ref, destroyed_ids, kill_ev = _ref_combat_rewards(
                    env, ev, st, focus_pre)
                st2, rews_ours, destroyed_agents, kill_ours = \
                    R.combat_rewards(cfg, st, ev, jnp.asarray(focus_pre))
                for i in (0, 1):
                    np.testing.assert_allclose(
                        float(rews_ours[i]), sum(rews_ref[i + 1]), atol=2e-3,
                        err_msg=f"reward agent {i} (rocket={by_rocket})")
                assert bool(kill_ours) == kill_ev
                assert destroyed_ids == [
                    i + 1 for i in np.flatnonzero(np.asarray(destroyed_agents))]
                killed = True
                break
        assert killed

    def test_agent_death_and_friendly_punish(self):
        """Opponent kills an agent; friendly kill with punish on."""
        # opp slot 2 behind agent slot 0
        specs = [dict(type=1, lat=5.164, lon=7.15, heading=0.0, speed=250.0),
                 dict(type=2, lat=5.05, lon=7.05, heading=0.0, speed=200.0),
                 dict(type=1, lat=5.15, lon=7.15, heading=0.0, speed=300.0),
                 dict(type=2, lat=5.28, lon=7.28, heading=180.0, speed=300.0)]
        sim, st = build_pair(specs, num_agents=2, u_hit=0.0)
        st = command_both(sim, st, {2: dict(cannon=True)})
        d_ref, _, _ = ref_tick(sim, 4)
        st, ev = jax_tick(st, 2, u_hit=0.0)
        assert d_ref[0]
        cfg = ECfg.make_lowlevel_config(level=1)
        env = make_ref_env("fight")
        env.sim = sim
        env.alive_agents = 1
        rews_ref, destroyed_ids, _ = _ref_combat_rewards(
            env, ev, st, np.zeros(2))
        _, rews_ours, destroyed_agents, _ = R.combat_rewards(
            cfg, st, ev, jnp.zeros(2))
        assert sum(rews_ref[1]) == -2.0 == float(rews_ours[0])
        assert destroyed_ids == [1] and bool(destroyed_agents[0])

        # friendly kill: agent 0 cannon-kills agent 1, friendly_punish on
        specs2 = [dict(type=1, lat=5.15, lon=7.15, heading=0.0, speed=300.0),
                  dict(type=2, lat=5.164, lon=7.15, heading=0.0, speed=250.0),
                  dict(type=1, lat=5.05, lon=7.05, heading=0.0, speed=200.0),
                  dict(type=2, lat=5.28, lon=7.28, heading=180.0, speed=300.0)]
        sim2, st2 = build_pair(specs2, num_agents=2, u_hit=0.0)
        st2 = command_both(sim2, st2, {0: dict(cannon=True)})
        d_ref2, _, _ = ref_tick(sim2, 4)
        st2, ev2 = jax_tick(st2, 2, u_hit=0.0)
        assert d_ref2[1]
        cfg_p = ECfg.make_lowlevel_config(level=1, friendly_punish=True)
        env2 = make_ref_env("fight", friendly_punish=True)
        env2.sim = sim2
        env2.alive_agents = 1
        rews_ref2, d_ids2, _ = _ref_combat_rewards(env2, ev2, st2,
                                                   np.zeros(2))
        _, rews_ours2, destroyed2, _ = R.combat_rewards(
            cfg_p, st2, ev2, jnp.zeros(2))
        assert sum(rews_ref2[1]) == -2.0 == float(rews_ours2[0])
        assert sum(rews_ref2[2]) == -2.0 == float(rews_ours2[1])
        assert d_ids2 == [2] and bool(destroyed2[1])

    def test_oob_removal_and_penalty(self):
        """An agent leaving the 0.3-degree map is removed with -5 in both
        pipelines (and a HighLevel -2)."""
        specs = [dict(type=1, lat=5.299, lon=7.15, heading=0.0, speed=900.0),
                 dict(type=2, lat=5.05, lon=7.05, heading=0.0, speed=200.0),
                 dict(type=1, lat=5.15, lon=7.25, heading=0.0, speed=300.0),
                 dict(type=2, lat=5.28, lon=7.28, heading=90.0, speed=300.0)]
        sim, st = build_pair(specs, num_agents=2, u_hit=1.0)
        for t in range(2):
            ref_tick(sim, 4)
            st, ev = jax_tick(st, 2, u_hit=1.0)
        assert sim.get_unit(1).position.lat > 5.3
        for mode, pen in (("LowLevel", -5.0), ("HighLevel", -2.0)):
            env = make_ref_env("fight")
            env.sim = sim
            env.alive_agents = 2
            rews_ref, d_ids, kill_ev = HHMARLBaseEnv._combat_rewards(
                env, [], {1: [0.0, 0.0], 2: [0.0, 0.0]}, mode)
            # reference mutated its sim: re-add for the next mode iteration
            assert sum(rews_ref[1]) == pen
            assert d_ids == [1] and kill_ev
            assert not sim.unit_exists(1)
            cfg = ECfg.make_lowlevel_config(level=1)
            st_mode, rews_ours, destroyed_agents, kill_ours = \
                R.combat_rewards(cfg, st, blank_ev(4), jnp.zeros(2),
                                 mode=mode)
            assert float(rews_ours[0]) == pen
            assert bool(destroyed_agents[0]) and bool(kill_ours)
            assert not bool(st_mode.alive[0])
            # restore the removed reference unit for the second pass
            sim.active_units[1] = Rafale(
                Position(5.301, 7.15, ALT), 0.0, 900.0, "agent")
            sim.active_units[1].id = 1

    def test_esc_dist_shaping(self):
        """Per-step escape-distance shaping (env_hetero.py:198-214)."""
        specs = [dict(type=1, lat=5.15, lon=7.15, heading=0.0, speed=150.0),
                 dict(type=2, lat=5.10, lon=7.10, heading=90.0, speed=550.0),
                 dict(type=1, lat=5.19, lon=7.15, heading=180.0, speed=300.0),
                 dict(type=2, lat=5.29, lon=7.29, heading=180.0, speed=300.0)]
        sim, st = build_pair(specs, num_agents=2, u_hit=1.0)
        env = make_ref_env("escape", esc_dist_rew=True)
        env.sim = sim
        ref = {1: [], 2: []}
        for i in (1, 2):
            u = sim.get_unit(i)
            opps = env._nearby_object(i)
            for j, o in enumerate(opps, start=1):
                if o[2] < 0.06:
                    ref[i].append(-0.02 / j)
                    if u.speed < 200:
                        ref[i].append(-0.02 / j)
                elif o[2] > 0.13:
                    ref[i].append(0.02 / j)
                    if u.speed > 500:
                        ref[i].append(0.02 / j)
        cfg = ECfg.make_lowlevel_config(level=3, agent_mode="escape",
                                        esc_dist_rew=True)
        ours = R.esc_dist_shaping(cfg, st)
        for i in (0, 1):
            np.testing.assert_allclose(float(ours[i]), sum(ref[i + 1]),
                                       atol=1e-6)


def blank_ev(n):
    from hhmarl_2d_tpu.sim.state import blank_events
    return blank_events(n)
