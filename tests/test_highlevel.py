"""Commander environment tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.env import config as ECfg
from hhmarl_2d_tpu.env import highlevel, hl_obs
from hhmarl_2d_tpu.models import policy as P

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def setup():
    cfg = ECfg.make_highlevel_config()
    team_f = P.LowLevelTeam("fight")
    team_e = P.LowLevelTeam("escape")
    bank = highlevel.make_hl_bank(
        team_f, team_e, team_f.init(jax.random.PRNGKey(0)),
        team_e.init(jax.random.PRNGKey(1)))
    return cfg, bank


class TestCommanderObs:
    def test_dims(self, setup):
        cfg, _ = setup
        st, obs = highlevel.reset(cfg, KEY)
        assert obs.shape == (3, C.OBS_HL)
        assert np.all(np.asarray(obs) >= 0) and np.all(np.asarray(obs) <= 1)

    def test_designation_lists(self, setup):
        cfg, _ = setup
        st, _ = highlevel.reset(cfg, KEY)
        lists, valids = np.asarray(st.lists), np.asarray(st.valids)
        # agent lists capped at N_OPP_HL (env_hier.py:70-74)
        assert valids[:3].sum(axis=1).max() <= C.N_OPP_HL
        # opponent lists keep all three agents (env_hier.py:94-97)
        assert valids[3:].sum(axis=1).max() == 3
        # agents designate opponents (slots 3..5), opponents designate agents
        assert np.all(lists[:3][valids[:3]] >= 3)
        assert np.all(lists[3:][valids[3:]] < 3)

    def test_spawn_types(self, setup):
        cfg, _ = setup
        types = set()
        for s in range(8):
            st, _ = highlevel.reset(cfg, jax.random.PRNGKey(s))
            t = list(np.asarray(st.sim.ac_type))
            assert t[0] == 1 and t[1] == 2 and t[3] == 1 and t[4] == 2
            types.add((t[2], t[5]))
        assert len(types) > 1  # third slot type varies per episode

    def test_ammo(self, setup):
        cfg, _ = setup
        st, _ = highlevel.reset(cfg, KEY)
        # HighLevel reset: cannon 300 everywhere, 8 rockets for AC1
        np.testing.assert_allclose(np.asarray(st.sim.cannon_max), 300.0)
        rm = np.asarray(st.sim.rocket_max)
        tp = np.asarray(st.sim.ac_type)
        assert np.all(rm[tp == 1] == 8) and np.all(rm[tp == 2] == 0)


class TestMacroStep:
    def test_macro_advances_multiple_ticks(self, setup):
        cfg, bank = setup
        st, obs = highlevel.reset(cfg, KEY)
        a = jnp.array([1, 1, 1], jnp.int32)
        st2, _, rew, done, info = highlevel.step(cfg, st, a, bank,
                                                 jax.random.PRNGKey(1))
        # one commander step = 10-16 sim ticks (env_hier.py:33-34,125-138)
        assert 1 <= int(st2.steps) <= C.HL_N_SUB_STEPS + 1
        assert int(st2.steps) >= 1

    def test_invalid_choice_penalty(self, setup):
        """Choosing a non-existing opponent pays -0.1 and falls back to the
        closest (env_hier.py:155-162)."""
        cfg, bank = setup
        st, obs = highlevel.reset(cfg, KEY)
        # only one opponent alive -> action 2 is invalid
        sim = st.sim.replace(alive=st.sim.alive.at[4].set(False).at[5].set(False))
        st = st.replace(sim=sim)
        # rebuild designation lists for the modified sim
        _, lists, valids, dists = hl_obs.commander_obs(cfg, sim)
        st = st.replace(lists=lists, valids=valids, dists=dists)
        a = jnp.array([2, 2, 2], jnp.int32)
        ca, rew0 = highlevel._action_assess(cfg, sim, lists, valids, a,
                                            jax.random.PRNGKey(3))
        assert np.all(np.asarray(ca[:3]) == 1)
        np.testing.assert_allclose(np.asarray(rew0), -0.1)

    def test_episode_runs_to_termination(self, setup):
        cfg, bank = setup
        st, obs = highlevel.reset(cfg, KEY)
        step_j = jax.jit(lambda s, a, k: highlevel.step(cfg, s, a, bank, k))
        for i in range(64):
            a = jax.random.randint(jax.random.PRNGKey(50 + i), (3,), 0, 3)
            st, obs, rew, done, info = step_j(st, a, jax.random.PRNGKey(i))
            if bool(done):
                break
        assert bool(done)
        assert int(info["agents_win"]) + int(info["opps_win"]) \
            + int(info["draw"]) == 1
        # auto-reset happened
        assert int(st.steps) == 0
