"""Differential parity vs the real HighLevelEnv (commander environment).

Runs the ACTUAL reference high-level env (/root/reference/envs/env_hier.py)
side-by-side with ``hhmarl_2d_tpu.env.highlevel``:

 * ``state()`` commander observation rows + designation lists vs
   ``hl_obs.commander_obs`` (env_hier.py:49-98), incl. dead-unit zeroing;
 * ``_action_assess`` shaped rewards, invalid-choice clamping and the
   opponent commander's sampled actions (env_hier.py:142-190) with every
   random draw pinned identically in both stacks;
 * the macro-action loop (env_hier.py:114-140): frozen-policy inference
   stubbed to FIXED low-level actions on both sides so the sub-step
   mechanics -- sub-step counting, early exit on kill / surrounding
   events, reward accumulation, missile_wait bookkeeping, termination
   accounting -- are compared in isolation over multiple commander steps.

The reference's torch policy loading is bypassed (`_get_policies` no-op,
`_policy_actions` stubbed), exactly because what is under test here is the
ENV's semantics, not the policies.
"""

import numpy as np
import pytest

import refshim

refshim.install()

import random as pyrandom  # noqa: E402
from types import SimpleNamespace  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_parity_reference import (  # noqa: E402
    build_pair, assert_aircraft_match, assert_missiles_match)
from test_parity_episode import PinnedDraws  # noqa: E402

from envs.env_base import HHMARLBaseEnv  # noqa: E402
from envs.env_hier import HighLevelEnv  # noqa: E402

from hhmarl_2d_tpu.env import config as ECfg  # noqa: E402
from hhmarl_2d_tpu.env import highlevel, hl_obs  # noqa: E402
from hhmarl_2d_tpu.models import policy as P  # noqa: E402

# heavy suite: excluded from the default fast gate (pyproject addopts)
pytestmark = pytest.mark.slow

# pinned opponent-commander draws: fight whenever the ratio allows
# (u_fight=0.5), never "pick another agent" (u_other=0.9 vs p=0.75)
ASSESS_U = dict(u_fight=0.5, u_other=0.9, u_pick=0.5)


def fake_choices(options, weights=None, k=1):
    """random.choices pinned to the same policy as ASSESS_U: draw 1 iff
    u < P(1) with u = 0.9 for the pick-another call (weights [1, 3]) and
    u = 0.5 for the fight/escape call."""
    u = 0.9 if list(weights) == [1, 3] else 0.5
    p1 = weights[1] / (weights[0] + weights[1])
    return [1 if u < p1 else 0]


@pytest.fixture
def pinned_ref_random(monkeypatch):
    monkeypatch.setattr(pyrandom, "choices", fake_choices)
    monkeypatch.setattr(
        pyrandom, "randint",
        lambda a, b: 1 if (a, b) == (0, 1) else (a + b) // 2)
    monkeypatch.setattr(pyrandom, "uniform", lambda a, b: (a + b) / 2.0)


def make_ref_hl_env(monkeypatch, ratio=100, horizon=500, assess=True):
    """A real HighLevelEnv with policy loading bypassed."""
    monkeypatch.setattr(HHMARLBaseEnv, "_get_policies",
                        lambda self, mode: None)
    args = SimpleNamespace(
        num_agents=3, num_opps=3, total_num=6, map_size=0.3,
        horizon=horizon, glob_frac=0.0, rew_scale=1.0,
        friendly_punish=False, eval_info=False,
        hier_action_assess=assess, hier_opp_fight_ratio=ratio, eval_hl=True)
    env = HighLevelEnv({"args": args})
    env.missile_wait = {i: 0 for i in range(1, 7)}
    env.opp_to_attack = {i: None for i in range(1, 7)}
    env.alive_agents = 3
    env.alive_opps = 3
    return env


def hl_cfg(**kw):
    kw.setdefault("map_size", 0.3)
    return ECfg.make_highlevel_config(**kw)


def battle_specs():
    """3v3 mixed types engineered so that:
      * agent 1 (slot 0) sits close behind its closest opponent (slot 3):
        fight choice is 'favourable' (+0.1);
      * opponent slot 5 sits close behind agent 3 (slot 2): escape choice
        by agent 3 is 'advantageous' (+0.1);
      * agent 2 (slot 1) is far from everyone (no shaping)."""
    return [
        dict(type=1, lat=5.095, lon=7.10, heading=0.0, speed=300.0),  # ag 1
        dict(type=2, lat=5.22, lon=7.25, heading=90.0, speed=200.0),  # ag 2
        dict(type=1, lat=5.05, lon=7.20, heading=0.0, speed=300.0),   # ag 3
        dict(type=2, lat=5.105, lon=7.10, heading=0.0, speed=300.0),  # op 1
        dict(type=1, lat=5.28, lon=7.05, heading=180.0, speed=250.0), # op 2
        dict(type=2, lat=5.042, lon=7.20, heading=0.0, speed=300.0),  # op 3
    ]


def _assert_hl_obs(env, st, cfg, t=0):
    obs_ref = env.state()
    obs_ours, lists, valids, dists = hl_obs.commander_obs(cfg, st)
    for i in (1, 2, 3):
        ref_row = np.asarray(obs_ref[i], np.float64)
        np.testing.assert_allclose(
            np.asarray(obs_ours[i - 1]), ref_row, atol=7e-4,
            err_msg=f"macro {t} commander obs row agent {i}")
    # designation lists: ids and stale normalized distances
    for slot in range(6):
        ref_list = env.opp_to_attack[slot + 1] or []
        ids = [e[0] - 1 for e in ref_list]
        nvalid = int(np.sum(np.asarray(valids[slot])))
        assert ids == list(np.asarray(lists[slot])[:nvalid]), \
            f"macro {t} designation list slot {slot}"
        np.testing.assert_allclose(
            np.asarray(dists[slot])[:nvalid], [e[1] for e in ref_list],
            atol=7e-4, err_msg=f"macro {t} designation dists slot {slot}")
    return obs_ref, lists, valids, dists


class TestCommanderObsParity:
    def test_obs_rows_and_lists(self, monkeypatch):
        env = make_ref_hl_env(monkeypatch)
        sim, st = build_pair(battle_specs(), num_agents=3, u_hit=1.0)
        env.sim = sim
        _assert_hl_obs(env, st, hl_cfg())

    def test_obs_rows_with_dead_units(self, monkeypatch):
        """Killing an opponent shifts the sorted designation lists and
        zero-blocks; killing an agent zeroes its row."""
        env = make_ref_hl_env(monkeypatch)
        sim, st = build_pair(battle_specs(), num_agents=3, u_hit=1.0)
        sim.remove_unit(4)   # closest opp of agent 1
        sim.remove_unit(2)   # agent 2
        alive = np.array([True] * 6)
        alive[[3, 1]] = False
        st = st.replace(alive=jnp.asarray(alive))
        env.sim = sim
        obs_ref, _, _, _ = _assert_hl_obs(env, st, hl_cfg())
        assert not np.any(np.asarray(obs_ref[2]))   # dead agent: zero row


class TestActionAssessParity:
    def test_rewards_and_sampled_actions(self, monkeypatch,
                                         pinned_ref_random):
        """Favourable fight +0.1, advantageous escape +0.1, neutral 0, and
        the pinned opponent-commander sampling, vs the real
        _action_assess."""
        env = make_ref_hl_env(monkeypatch, ratio=100)
        sim, st = build_pair(battle_specs(), num_agents=3, u_hit=1.0)
        env.sim = sim
        env.state()
        cfg = hl_cfg(hier_opp_fight_ratio=100)
        _, lists, valids, dists = hl_obs.commander_obs(cfg, st)

        for acts in ([1, 1, 0], [2, 2, 1], [0, 0, 2]):
            env.commander_actions = {i + 1: acts[i] for i in range(3)}
            rewards = env._action_assess({})
            ca, rew0 = highlevel._action_assess(
                cfg, st, lists, valids, jnp.asarray(acts),
                jax.random.PRNGKey(0), fight_ratio=1.0, assess_u=ASSESS_U)
            for i in (1, 2, 3):
                np.testing.assert_allclose(
                    float(rew0[i - 1]), rewards[i], atol=1e-6,
                    err_msg=f"assess reward agent {i} actions {acts}")
            # mutated commander actions: agents (clamped) + sampled opps
            for i in range(1, 7):
                ref_a = env.commander_actions[i]
                ours_a = int(ca[i - 1])
                assert (ref_a if ref_a is not None else -1) == ours_a, \
                    f"commander action slot {i} for {acts}"

    def test_invalid_choice_clamp(self, monkeypatch, pinned_ref_random):
        """Choosing a dead opponent: -0.1 and clamp to closest
        (env_hier.py:157-165)."""
        env = make_ref_hl_env(monkeypatch, ratio=0)   # opponents escape
        sim, st = build_pair(battle_specs(), num_agents=3, u_hit=1.0)
        sim.remove_unit(5)
        sim.remove_unit(6)
        alive = np.array([True] * 6)
        alive[[4, 5]] = False
        st = st.replace(alive=jnp.asarray(alive))
        env.sim = sim
        env.state()
        cfg = hl_cfg(hier_opp_fight_ratio=0)
        _, lists, valids, dists = hl_obs.commander_obs(cfg, st)

        env.commander_actions = {1: 2, 2: 2, 3: 2}   # only 1 opp left
        rewards = env._action_assess({})
        ca, rew0 = highlevel._action_assess(
            cfg, st, lists, valids, jnp.asarray([2, 2, 2]),
            jax.random.PRNGKey(0), fight_ratio=0.0, assess_u=ASSESS_U)
        for i in (1, 2, 3):
            np.testing.assert_allclose(float(rew0[i - 1]), rewards[i],
                                       atol=1e-6)
            assert env.commander_actions[i] == int(ca[i - 1]) == 1
        for i in (4, 5, 6):   # escape (ratio 0); dead slots -1/None
            ref_a = env.commander_actions[i]
            assert (ref_a if ref_a is not None else -1) == int(ca[i - 1])


FIXED_NOFIRE = [6, 4, 0, 0]     # straight, mid speed, no weapons
FIXED_CANNON = [6, 8, 1, 0]     # straight, full speed, cannon on


def stub_policies(monkeypatch, fixed):
    """Pin BOTH stacks' embedded low-level inference to `fixed` actions."""
    monkeypatch.setattr(
        HighLevelEnv, "_policy_actions",
        lambda self, policy_type, agent_id, unit:
            {agent_id: np.asarray(fixed[:4 if unit.ac_type == 1 else 3])})
    real = highlevel._embedded_actions

    def stub(cfg, bank, sim, lists, valids, dists, ca, geom=None):
        _, tgts = real(cfg, bank, sim, lists, valids, dists, ca, geom)
        return jnp.tile(jnp.asarray(fixed, jnp.int32), (cfg.n_slots, 1)), tgts

    monkeypatch.setattr(highlevel, "_embedded_actions", stub)


def run_macro_pair(monkeypatch, fixed, u_hit, n_macro=4,
                   actions=(1, 1, 1), specs=None):
    """Step both envs through n_macro commander steps with stubbed
    low-level policies; assert sub-step counts, sim state, rewards, obs
    and termination accounting each macro step."""
    stub_policies(monkeypatch, fixed)
    env = make_ref_hl_env(monkeypatch, ratio=100)
    sim, st = build_pair(specs or battle_specs(), num_agents=3, u_hit=u_hit)
    env.sim = sim
    cfg = hl_cfg(hier_opp_fight_ratio=100)

    team_f = P.LowLevelTeam("fight")
    team_e = P.LowLevelTeam("escape")
    bank = highlevel.make_hl_bank(
        team_f, team_e, team_f.init(jax.random.PRNGKey(1)),
        team_e.init(jax.random.PRNGKey(2)))

    obs_ref = env.state()
    _, lists, valids, dists = hl_obs.commander_obs(cfg, st)
    state = highlevel.HLState(sim=st, steps=jnp.asarray(0, jnp.int32),
                              lists=lists, valids=valids, dists=dists,
                              key=jax.random.PRNGKey(9))
    pinned = PinnedDraws()
    tick_u = dict(u_cannon=jnp.full((6, 6), u_hit, jnp.float32),
                  u_steer=jnp.ones((6,), jnp.float32))
    step_fn = lambda s, a: highlevel.step(
        cfg, s, a, bank, jax.random.PRNGKey(0), fight_ratio=1.0,
        draws=pinned, tick_u=tick_u, assess_u=ASSESS_U)

    outcomes = []
    for t in range(1, n_macro + 1):
        ref_acts = {i + 1: actions[i] for i in range(3)}
        obs_ref, rew_ref, term_ref, _, _ = env.step(ref_acts)
        state, obs_ours, rew_ours, done, info = step_fn(
            state, jnp.asarray(actions))

        for i in (1, 2, 3):
            np.testing.assert_allclose(
                float(rew_ours[i - 1]), float(rew_ref.get(i, 0.0)),
                atol=2e-3, err_msg=f"macro {t} reward agent {i}")
        assert bool(done) == bool(term_ref["__all__"]), f"macro {t} done"
        if bool(done):
            # ours has auto-reset; compare only the outcome accounting
            a_alive = sum(env.sim.unit_exists(i) for i in (1, 2, 3))
            o_alive = sum(env.sim.unit_exists(i) for i in (4, 5, 6))
            assert int(info["agents_win"]) == int(
                o_alive == 0 and env.steps < env.args.horizon)
            assert int(info["opps_win"]) == int(
                a_alive == 0 and env.steps < env.args.horizon)
            outcomes.append("terminal")
            return outcomes
        assert env.steps == int(state.steps), \
            f"macro {t}: sub-steps {int(state.steps)} != ref {env.steps}"
        assert_aircraft_match(env.sim, state.sim, t)
        assert_missiles_match(env.sim, state.sim, t)
        for i in range(6):
            assert env.missile_wait[i + 1] == int(state.sim.missile_wait[i])
        _assert_hl_obs(env, state.sim, cfg, t)
        outcomes.append(env.steps)
    return outcomes


class TestMacroLoopParity:
    def test_macro_no_fire(self, monkeypatch, pinned_ref_random):
        """No weapons: sub-step counts driven purely by the 16-step cap
        and surrounding events; head-on spawns trigger the situation exit
        in both stacks at the same sub-step."""
        outcomes = run_macro_pair(monkeypatch, FIXED_NOFIRE, u_hit=1.0,
                                  n_macro=4)
        assert len(outcomes) == 4

    def test_macro_with_surrounding_event(self, monkeypatch,
                                          pinned_ref_random):
        """Close head-on pair: the macro action must cut short after
        min_sub_steps in BOTH stacks (env_hier.py:133-137)."""
        specs = battle_specs()
        specs[0].update(lat=5.15, lon=7.15, heading=0.0)
        specs[3].update(lat=5.175, lon=7.15, heading=180.0)
        outcomes = run_macro_pair(monkeypatch, FIXED_NOFIRE, u_hit=1.0,
                                  n_macro=1, specs=specs)
        assert outcomes and outcomes[0] <= 13, outcomes

    def test_macro_cannon_kills(self, monkeypatch, pinned_ref_random):
        """Cannon on with u_hit=0: kills end macro actions early and the
        kill/death rewards accumulate identically."""
        outcomes = run_macro_pair(monkeypatch, FIXED_CANNON, u_hit=0.0,
                                  n_macro=6)
        assert outcomes, outcomes
