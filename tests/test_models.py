"""Model architecture tests: shapes, parameter counts, distributions."""

import jax
import jax.numpy as jnp
import numpy as np

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.algo import distributions as D
from hhmarl_2d_tpu.models import hetero
from hhmarl_2d_tpu.models import policy as P
from hhmarl_2d_tpu.models.commander import CommanderGru, GRU_SIZE

KEY = jax.random.PRNGKey(0)


class TestFightModels:
    def test_shapes_ac1(self):
        m = hetero.FightActorCritic(ac_type=1)
        obs = jnp.zeros((4, 8, C.OBS_AC1))
        other = jnp.zeros((4, 8, C.OBS_AC2))
        a1 = jnp.zeros((4, 8, 4))
        a2 = jnp.zeros((4, 8, 3))
        params = m.init(KEY, obs, other, a1, a2)
        logits, value = m.apply(params, obs, other, a1, a2)
        assert logits.shape == (4, 8, hetero.ACT_LOGITS_AC1)
        assert value.shape == (4, 8)

    def test_shapes_ac2(self):
        m = hetero.FightActorCritic(ac_type=2)
        obs = jnp.zeros((2, 3, C.OBS_AC2))
        other = jnp.zeros((2, 3, C.OBS_AC1))
        params = m.init(KEY, obs, other, jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3, 4)))
        logits, value = m.apply(params, obs, other, jnp.zeros((2, 3, 3)),
                                jnp.zeros((2, 3, 4)))
        assert logits.shape == (2, 3, hetero.ACT_LOGITS_AC2)

    def test_esc_shapes(self):
        m = hetero.EscActorCritic(ac_type=1)
        obs = jnp.zeros((2, 1, C.OBS_ESC_AC1))
        other = jnp.zeros((2, 1, C.OBS_ESC_AC2))
        params = m.init(KEY, obs, other, jnp.zeros((2, 1, 4)),
                        jnp.zeros((2, 1, 3)))
        logits, value = m.apply(params, obs, other, jnp.zeros((2, 1, 4)),
                                jnp.zeros((2, 1, 3)))
        assert logits.shape == (2, 1, 26)
        assert value.shape == (2, 1)

    def test_attention_is_per_segment(self):
        """Changing steps of another segment must not affect this one."""
        m = hetero.FightActorCritic(ac_type=1)
        obs = jax.random.uniform(KEY, (1, 8, C.OBS_AC1))
        other = jnp.zeros((1, 8, C.OBS_AC2))
        a1 = jnp.zeros((1, 8, 4))
        a2 = jnp.zeros((1, 8, 3))
        seg = jnp.asarray([[0, 0, 0, 0, 1, 1, 1, 1]])
        params = m.init(KEY, obs, other, a1, a2, seg)
        out1, _ = m.apply(params, obs, other, a1, a2, seg)
        obs2 = obs.at[0, 6].set(0.77)  # perturb segment 1
        out2, _ = m.apply(params, obs2, other, a1, a2, seg)
        np.testing.assert_allclose(np.asarray(out1[0, :4]),
                                   np.asarray(out2[0, :4]), atol=1e-6)
        assert not np.allclose(np.asarray(out1[0, 6]), np.asarray(out2[0, 6]))

    def test_zero_rows_finite_grads(self):
        """Regression: zero obs rows (dead agents) must not produce NaN
        gradients through the residual normalize."""
        m = hetero.FightActorCritic(ac_type=1)
        obs = jnp.zeros((2, 4, C.OBS_AC1))
        other = jnp.zeros((2, 4, C.OBS_AC2))
        a1 = jnp.zeros((2, 4, 4))
        a2 = jnp.zeros((2, 4, 3))
        params = m.init(KEY, obs, other, a1, a2)

        def loss(p):
            lg, v = m.apply(p, obs, other, a1, a2)
            return jnp.sum(lg) + jnp.sum(v)

        g = jax.grad(loss)(params)
        assert all(bool(jnp.isfinite(x).all())
                   for x in jax.tree_util.tree_leaves(g))


def _cmdr_io(B, T, d, na=3):
    obs = jnp.zeros((B, T, d))
    obs_o = jnp.zeros((B, T, na - 1, d))
    za = jnp.zeros((B, T, 1))
    zao = jnp.zeros((B, T, na - 1, 1))
    return obs, obs_o, za, zao


class TestCommander:
    def test_shapes_and_state(self):
        m = CommanderGru()
        obs, obs_o, za, zao = _cmdr_io(2, 5, C.OBS_HL)
        h = jnp.zeros((2, GRU_SIZE))
        params = m.init(KEY, obs, obs_o, za, zao, h, h)
        logits, value, (ha, hv) = m.apply(params, obs, obs_o, za, zao, h, h)
        assert logits.shape == (2, 5, C.ACT_DIM_HL)
        assert value.shape == (2, 5)
        assert ha.shape == (2, GRU_SIZE) and hv.shape == (2, GRU_SIZE)

    def test_configurable_team_and_targets(self):
        """n_opp_hl=3 widens obs/action; 5-agent critic gets 5 branches."""
        m = CommanderGru(n_opp=3, num_agents=5)
        d = 14 + 10 * 3
        obs, obs_o, za, zao = _cmdr_io(2, 4, d, na=5)
        h = jnp.zeros((2, GRU_SIZE))
        params = m.init(KEY, obs, obs_o, za, zao, h, h)
        logits, value, _ = m.apply(params, obs, obs_o, za, zao, h, h)
        assert logits.shape == (2, 4, 4)
        assert value.shape == (2, 4)
        assert "v5" in params["params"]

    def test_state_carries_information(self):
        """Same input with different hidden states -> different logits."""
        m = CommanderGru()
        obs, obs_o, za, zao = _cmdr_io(1, 1, C.OBS_HL)
        obs = jax.random.uniform(KEY, obs.shape)
        h0 = jnp.zeros((1, GRU_SIZE))
        params = m.init(KEY, obs, obs_o, za, zao, h0, h0)
        lg1, _, _ = m.apply(params, obs, obs_o, za, zao, h0, h0)
        h1 = jnp.ones((1, GRU_SIZE)) * 0.5
        lg2, _, _ = m.apply(params, obs, obs_o, za, zao, h1, h0)
        assert not np.allclose(np.asarray(lg1), np.asarray(lg2))

    def test_reset_mask_restarts_sequence(self):
        """With reset at t, output at t matches a fresh-state evaluation."""
        m = CommanderGru()
        obs, obs_o, za, zao = _cmdr_io(1, 4, C.OBS_HL)
        obs = jax.random.uniform(KEY, obs.shape)
        h0 = jax.random.normal(jax.random.PRNGKey(3), (1, GRU_SIZE))
        params = m.init(KEY, obs, obs_o, za, zao, h0, h0)
        reset = jnp.asarray([[True, False, False, False]])
        lg_reset, _, _ = m.apply(params, obs, obs_o, za, zao, h0, h0, reset)
        z = jnp.zeros((1, GRU_SIZE))
        lg_fresh, _, _ = m.apply(params, obs, obs_o, za, zao, z, z)
        np.testing.assert_allclose(np.asarray(lg_reset), np.asarray(lg_fresh),
                                   atol=1e-6)


class TestDistributions:
    def test_log_prob_sums_components(self):
        logits = jax.random.normal(KEY, (5, 26))
        a = D.sample(logits, D.NVEC_AC1, jax.random.PRNGKey(1))
        lp = D.log_prob(logits, D.NVEC_AC1, a)
        assert lp.shape == (5,)
        assert bool(jnp.all(lp < 0))

    def test_mode_is_argmax(self):
        logits = jnp.zeros((1, 26)).at[0, 3].set(5.0).at[0, 13 + 2].set(5.0)
        a = D.mode(logits, D.NVEC_AC1)
        assert int(a[0, 0]) == 3 and int(a[0, 1]) == 2

    def test_kl_zero_for_same(self):
        logits = jax.random.normal(KEY, (4, 26))
        kl = D.kl(logits, logits, D.NVEC_AC1)
        np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)

    def test_entropy_uniform(self):
        logits = jnp.zeros((1, 26))
        ent = D.entropy(logits, D.NVEC_AC1)
        expect = sum(np.log(n) for n in D.NVEC_AC1)
        np.testing.assert_allclose(float(ent[0]), expect, rtol=1e-5)


class TestTeam:
    def test_act_shapes(self):
        team = P.LowLevelTeam("fight")
        params = team.init(KEY)
        obs = jnp.zeros((6, 2, 30))
        a, lp, v, logits = team.act(params, obs, jax.random.PRNGKey(1))
        assert a.shape == (6, 2, 4)
        assert lp.shape == (6, 2)
        assert v.shape == (6, 2)
        assert logits.shape == (6, 2, 26)
        # AC2 (slot 1) actions have zero 4th component
        assert bool(jnp.all(a[:, 1, 3] == 0))

    def test_param_count_reasonable(self):
        """Reference models are ~1M params."""
        team = P.LowLevelTeam("fight")
        params = team.init(KEY)
        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        assert 5e5 < n < 5e6
