"""n-vs-m generality: team sizes beyond the reference's 2v2/3v3.

Covers BASELINE.json configs 4-5: commander training with N_OPPS_HL=3 and
a 5-vs-5 evaluation sweep, plus the comparator-network generalization that
makes arbitrary slot counts sortable without gathers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhmarl_2d_tpu.env import config as ECfg
from hhmarl_2d_tpu.env import geometry as G
from hhmarl_2d_tpu.env import lowlevel
from hhmarl_2d_tpu.env import highlevel
from hhmarl_2d_tpu.env import rewards as R
from hhmarl_2d_tpu.models import policy as P

# heavy suite: excluded from the default fast gate (pyproject addopts)
pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


class TestSortNetworks:
    @pytest.mark.parametrize("n", [9, 10, 12, 16])
    def test_batcher_networks_sort(self, n):
        """0-1 principle spot check + random permutations."""
        net = G.sort_network(n)
        rng = np.random.default_rng(n)
        for _ in range(50):
            v = rng.uniform(0, 1, n)
            out = list(v)
            for i, j in net:
                if out[i] > out[j]:
                    out[i], out[j] = out[j], out[i]
            assert out == sorted(v)

    @pytest.mark.parametrize("n", [10, 12])
    def test_sort_enemies_vals_large(self, n):
        rng = np.random.default_rng(n)
        d = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        mask = jnp.asarray(rng.uniform(0, 1, n) < 0.7)
        order, valid, vals = G.sort_enemies_vals(d, mask)
        k = int(mask.sum())
        assert bool(valid[:k].all()) and not bool(valid[k:].any())
        got = [int(order[i]) for i in range(k)]
        want = sorted(np.flatnonzero(np.asarray(mask)),
                      key=lambda i: float(d[i]))
        assert got == list(want)
        np.testing.assert_allclose(np.asarray(vals[:k]),
                                   sorted(np.asarray(d)[np.asarray(mask)]),
                                   rtol=1e-6)


class TestLowLevel3v3:
    def test_env_runs_and_learns_shapes(self):
        """3-vs-3 low-level env: vmapped reset/step, closest-teammate
        partner rule, k-agent glob_frac sharing."""
        cfg = ECfg.make_lowlevel_config(level=2, num_agents=3, num_opps=3,
                                        glob_frac=0.3)
        B = 4
        keys = jax.random.split(KEY, B)
        st, obs = jax.vmap(lambda k: lowlevel.reset(cfg, k))(keys)
        assert obs.shape == (B, 3, 30)

        @jax.jit
        def roll(st, obs, key):
            def step_fn(carry, k):
                st, obs = carry
                acts = jax.random.randint(k, (B, 3, 4), 0,
                                          jnp.asarray([13, 9, 2, 2]))
                st, obs, rew, done, info = jax.vmap(
                    lambda s, a, kk: lowlevel.step(cfg, s, a, kk))(
                    st, acts, jax.random.split(k, B))
                return (st, obs), (rew, done)
            (st, obs), (rews, dones) = jax.lax.scan(
                step_fn, (st, obs), jax.random.split(key, 30))
            return st, obs, rews, dones

        st, obs, rews, dones = roll(st, obs, jax.random.PRNGKey(1))
        assert rews.shape == (30, B, 3)
        assert bool(jnp.isfinite(rews).all())
        assert obs.shape == (B, 3, 30)

    def test_glob_frac_k_agents(self):
        cfg = ECfg.make_lowlevel_config(level=1, num_agents=3, num_opps=3,
                                        glob_frac=0.5)
        base = jnp.zeros(3)
        rews = jnp.asarray([1.0, 2.0, 4.0])
        gate_all = jnp.ones(3, bool)
        out = R.sum_lowlevel(cfg, base, rews, jnp.zeros(3, bool), gate_all)
        np.testing.assert_allclose(np.asarray(out),
                                   [1 + 0.5 * 6, 2 + 0.5 * 5, 4 + 0.5 * 3])


@pytest.fixture(scope="module")
def untrained_bank():
    team_f = P.LowLevelTeam("fight")
    team_e = P.LowLevelTeam("escape")
    f = team_f.init(jax.random.PRNGKey(1))
    e = team_e.init(jax.random.PRNGKey(2))
    return highlevel.make_hl_bank(team_f, team_e, f, e)


class TestCommanderNOpp3:
    def test_train_iter_3v3_nopp3(self, untrained_bank):
        """BASELINE config 4: commander training with N_OPPS_HL=3."""
        from hhmarl_2d_tpu.algo.ppo_hier import CommanderPPO, HierPPOConfig
        cfg = ECfg.make_highlevel_config(n_opp_hl=3)
        assert cfg.obs_hl == 44 and cfg.act_dim_hl == 4
        ppo = HierPPOConfig(num_envs=2, rollout_len=4, seq_len=2,
                            sgd_iters=1, num_minibatches=1)
        tr = CommanderPPO(cfg, ppo, untrained_bank)
        ts, env_state, obs, h = tr.init(jax.random.PRNGKey(3))
        assert obs.shape == (2, 3, 44)
        ts2, _, _, _, m = tr.train_iter(ts, env_state, obs, h,
                                        jax.random.PRNGKey(4))
        assert int(ts2.update_i) == 1
        for v in m.values():
            assert bool(jnp.isfinite(v))


class TestEval5v5:
    def test_eval_sweep_5v5(self, untrained_bank):
        """BASELINE config 5: a 5-vs-5 eval with the commander obs capped
        at n_opp_hl targets; the metrics schema gains opp4/opp5 counters."""
        from hhmarl_2d_tpu.eval import harness
        cfg = ECfg.make_highlevel_config(num_agents=5, num_opps=5,
                                         n_opp_hl=5, horizon=80)
        stats = harness.evaluate_highlevel(
            cfg, None, None, untrained_bank, 2, jax.random.PRNGKey(5),
            eval_hl=False)
        assert stats["agents_win"] + stats["opps_win"] + stats["draw"] \
            + (2 - stats["finished"]) >= 2 - stats["finished"]
        ev = harness.postprocess_eval(stats, 2)
        assert "opp5" in ev and "opp1" in ev
        assert 0.0 <= ev["win"] <= 100.0

    def test_5v5_obs_and_lists(self):
        from hhmarl_2d_tpu.env import hl_obs
        cfg = ECfg.make_highlevel_config(num_agents=5, num_opps=5,
                                         n_opp_hl=3)
        st, obs = highlevel.reset(cfg, jax.random.PRNGKey(6))
        assert obs.shape == (5, cfg.obs_hl) == (5, 44)
        # agent designation lists capped at n_opp_hl, opponents keep all
        assert int(st.valids[:5].sum(axis=1).max()) <= 3
        assert int(st.valids[5:].sum(axis=1).max()) == 5


class TestLowLevelTrainerNvM:
    """VERDICT r2 item 5: the low-level trainer's team acting generalized
    beyond the fixed slot0=AC1/slot1=AC2 mapping (train_hetero.py:240)."""

    def test_act_k_matches_fixed_2v2(self):
        """For the reference's fixed-type 2v2 team, the generalized
        mixed-type path must reproduce the hardwired path exactly."""
        team = P.LowLevelTeam("fight", num_agents=2)
        params = team.init(jax.random.PRNGKey(0))
        cfg = ECfg.make_lowlevel_config(level=2)
        B = 3
        _, obs = jax.vmap(lambda k: lowlevel.reset(cfg, k))(
            jax.random.split(KEY, B))
        ac1 = jnp.tile(jnp.asarray([True, False]), (B, 1))
        moh = P.mate_onehot(jnp.tile(jnp.asarray([1, 0]), (B, 1)), 2)

        a0, lp0, v0, lg0 = team.act(params, obs, KEY, greedy=True)
        a1, lp1, v1, lg1 = team.act_k(params, obs, ac1, moh, KEY, greedy=True)
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(lp0), np.asarray(lp1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lg0), np.asarray(lg1),
                                   rtol=1e-5, atol=1e-6)

    def test_train_iter_3v3_scripted(self):
        """A 3v3 LowLevelPPO train_iter through the real team-acting path:
        finite metrics, updated params."""
        from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
        cfg = ECfg.make_lowlevel_config(level=3, num_agents=3, num_opps=3)
        ppo = PPOConfig(num_envs=8, rollout_len=32, seq_len=8, sgd_iters=2,
                        num_minibatches=2)
        tr = LowLevelPPO(cfg, ppo)
        assert tr.gen
        ts, env_state, obs, = tr.init(jax.random.PRNGKey(1))
        assert obs.shape == (8, 3, 30)
        ts2, _, _, m = tr.train_iter(ts, env_state, obs, jax.random.PRNGKey(2))
        for k, v in m.items():
            assert bool(jnp.isfinite(v)), k
        changed = jax.tree_util.tree_map(
            lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
            ts.params, ts2.params)
        assert any(jax.tree_util.tree_leaves(changed))

    def test_frozen_opp_actor_3v3_level5(self):
        """Levels 4-5 with 3 opponents: the frozen bank drives every opp
        slot, selecting the type model per slot's (random) ac_type."""
        from hhmarl_2d_tpu.utils import checkpoint as CKPT
        team_f = P.LowLevelTeam("fight")
        team_e = P.LowLevelTeam("escape")
        f = team_f.init(jax.random.PRNGKey(1))
        e = team_e.init(jax.random.PRNGKey(2))
        bank = {"fight": CKPT.stack_fight_bank([f, f, f]), "escape": e}
        actor = P.make_frozen_opp_actor(team_f, team_e, bank)

        cfg = ECfg.make_lowlevel_config(level=5, num_agents=3, num_opps=3)
        st, obs = lowlevel.reset(cfg, jax.random.PRNGKey(3))
        acts, tgts = actor(cfg, st.sim, st.opp_level, jax.random.PRNGKey(4))
        assert acts.shape == (6, 4) and tgts.shape == (6,)
        assert bool((acts[:3] == 0).all())          # agent slots untouched
        st2, obs2, rew, done, _ = lowlevel.step(
            cfg, st, jnp.zeros((3, 4), jnp.int32), jax.random.PRNGKey(5),
            actor)
        assert bool(jnp.isfinite(obs2).all()) and bool(jnp.isfinite(rew).all())

    def test_l1_3v3_learning_smoke(self):
        """Reward rises within a few L1 iterations of 3v3 training."""
        from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
        cfg = ECfg.make_lowlevel_config(level=1, num_agents=3, num_opps=3)
        ppo = PPOConfig(num_envs=32, rollout_len=64, seq_len=16,
                        sgd_iters=2, num_minibatches=4)
        tr = LowLevelPPO(cfg, ppo)
        ts, env_state, obs = tr.init(jax.random.PRNGKey(5))
        key = jax.random.PRNGKey(6)
        rews = []
        for _ in range(30):
            key, k = jax.random.split(key)
            ts, env_state, obs, m = tr.train_iter(ts, env_state, obs, k)
            rews.append(float(m["reward_mean"]))
        assert np.mean(rews[-5:]) > np.mean(rews[:5]) + 0.2, rews
