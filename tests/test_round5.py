"""Round-5 fixes: fused greedy inference, log_prob select-sum, bf16
plumbing, flattened-adam checkpoint fallback, commander fold fast gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.algo import distributions as D
from hhmarl_2d_tpu.models import hetero
from hhmarl_2d_tpu.models import policy as P

KEY = jax.random.PRNGKey(0)


class TestGreedyActorMixed:
    """greedy_actor_mixed must match the evaluate-both-types-everywhere
    reference formulation bit-exactly (the actor tower is unchanged; only
    the critic tower is skipped and pinned-type slots run one model)."""

    @pytest.mark.parametrize("mode", ["fight", "escape"])
    def test_matches_both_types_path(self, mode):
        team = P.LowLevelTeam(mode)
        params = team.init(KEY)
        m = 6
        rows = jax.random.uniform(jax.random.PRNGKey(1), (m, C.OBS_ESC_AC1))
        ac1 = jnp.asarray([True, False, True, True, False, False])

        old = {}
        for t in (1, 2):
            d_own, d_other, a_own, a_other = hetero.obs_slices(mode, t)
            logits, _ = team.models[t].apply(
                params[f"ac{t}"], rows[:, None, :d_own],
                jnp.zeros((m, 1, d_other)), jnp.zeros((m, 1, a_own)),
                jnp.zeros((m, 1, a_other)))
            nv = D.NVEC_AC1 if t == 1 else D.NVEC_AC2
            old[t] = D.pad_actions(D.mode(logits[:, 0], nv))

        st = P.static_slot_types([3, 3])
        assert st == (1, 2, 0, 1, 2, 0)
        use1 = np.where(np.array(st) == 0, np.array(ac1), np.array(st) == 1)
        want = jnp.where(jnp.asarray(use1)[:, None], old[1], old[2])
        got = P.greedy_actor_mixed(team, params, rows, ac1, st)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_actor_only_matches_full_logits(self):
        model = hetero.FightActorCritic(ac_type=1)
        obs = jax.random.uniform(KEY, (3, 1, C.OBS_AC1))
        z = jnp.zeros((3, 1, C.OBS_AC2)), jnp.zeros((3, 1, 4)), \
            jnp.zeros((3, 1, 3))
        params = model.init(KEY, obs, *z)
        full, _ = model.apply(params, obs, *z)
        actor, v = model.apply(params, obs, actor_only=True)
        assert v is None
        np.testing.assert_array_equal(np.asarray(full), np.asarray(actor))


class TestLogProbSelectSum:
    def test_matches_take_along_axis(self):
        """The one-hot select-sum log_prob (TPU gather fix) must equal the
        take_along_axis formulation exactly."""
        for nvec in (D.NVEC_AC1, D.NVEC_AC2):
            logits = jax.random.normal(KEY, (64, sum(nvec)))
            a = D.sample(logits, nvec, jax.random.PRNGKey(1))
            got = D.log_prob(logits, nvec, a)
            want = 0.0
            start = 0
            for i, n in enumerate(nvec):
                lp = jax.nn.log_softmax(logits[..., start:start + n])
                want = want + jnp.take_along_axis(
                    lp, a[..., i:i + 1], axis=-1)[..., 0]
                start += n
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-6)


class TestBF16Plumbing:
    def test_bf16_params_stay_fp32_and_logits_close(self):
        team32 = P.LowLevelTeam("fight")
        team16 = P.LowLevelTeam("fight", dtype=jnp.bfloat16)
        params = team32.init(KEY)
        p16 = team16.init(KEY)
        assert all(x.dtype == jnp.float32
                   for x in jax.tree_util.tree_leaves(p16))
        # same structure: frozen fp32 stores load into bf16 teams
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p16))
        obs = jax.random.uniform(KEY, (4, 1, 2, 30))
        lg32, v32 = team32.forward(params, obs)
        lg16, v16 = team16.forward(params, obs)
        assert lg16.dtype == jnp.float32 and v16.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(lg32), np.asarray(lg16),
                                   atol=0.05)

    def test_commander_bf16_carry_stays_fp32(self):
        from hhmarl_2d_tpu.models.commander import CommanderGru, GRU_SIZE
        m = CommanderGru(n_opp=2, num_agents=3, dtype=jnp.bfloat16)
        d = 14 + 10 * 2
        f32 = jnp.float32
        z = (jnp.zeros((2, 3, d), f32), jnp.zeros((2, 3, 2, d), f32),
             jnp.zeros((2, 3, 1), f32), jnp.zeros((2, 3, 2, 1), f32))
        h = jnp.zeros((2, GRU_SIZE), f32)
        params = m.init(KEY, *z, h, h)
        lg, v, (ha, hv) = m.apply(params, *z, h, h)
        assert ha.dtype == jnp.float32 and hv.dtype == jnp.float32
        assert lg.dtype == jnp.float32 and v.dtype == jnp.float32


class TestFlattenedAdamRestore:
    def test_old_format_checkpoint_restores_params_only(self, tmp_path):
        """A TrainState saved with per-leaf adam state must restore into
        the flattened-adam template: params grafted, optimizer fresh."""
        import optax
        from hhmarl_2d_tpu.algo.ppo import TrainState
        from hhmarl_2d_tpu.utils import checkpoint as CKPT

        params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                  "b": jnp.ones((3,))}
        old_tx = optax.adam(1e-4)
        old = TrainState(params=params, opt_state=old_tx.init(params),
                         kl_coeff=jnp.asarray([0.4, 0.1]),
                         update_i=jnp.asarray(7, jnp.int32))
        path = str(tmp_path / "ck")
        CKPT.save_train_state(path, 7, old)

        new_tx = optax.flatten(optax.adam(1e-4))
        tmpl = TrainState(params=jax.tree_util.tree_map(jnp.zeros_like,
                                                        params),
                          opt_state=new_tx.init(params),
                          kl_coeff=jnp.zeros(2),
                          update_i=jnp.asarray(0, jnp.int32))
        got = CKPT.restore_train_state(path, tmpl)
        np.testing.assert_array_equal(np.asarray(got.params["w"]),
                                      np.asarray(params["w"]))
        assert int(got.update_i) == 7
        assert float(got.kl_coeff[0]) == pytest.approx(0.4)
        # fresh (flattened) optimizer state, same structure as template
        assert (jax.tree_util.tree_structure(got.opt_state)
                == jax.tree_util.tree_structure(tmpl.opt_state))


class TestCommanderAgentFoldFast:
    """Fast-gate variant of the slow TestCommanderAgentFold (the fold is
    core training-path logic; the default gate must exercise it): tiny
    shapes, random params, no HL bank."""

    def test_forward_matches_loop(self):
        from hhmarl_2d_tpu.algo.ppo_hier import CommanderPPO, HierPPOConfig, \
            _others
        from hhmarl_2d_tpu.env import config as ECfg

        cfg = ECfg.make_highlevel_config(n_opp_hl=2)
        # _forward_agents never touches the frozen bank -- skip building
        # it (4 model inits) so this stays cheap enough for the fast gate
        tr = CommanderPPO(cfg, HierPPOConfig(num_envs=2, rollout_len=4,
                                             seq_len=2), bank=None)
        d = cfg.obs_hl
        na = tr.na
        params = tr.model.init(
            KEY, jnp.zeros((1, 1, d)), jnp.zeros((1, 1, na - 1, d)),
            jnp.zeros((1, 1, 1)), jnp.zeros((1, 1, na - 1, 1)),
            jnp.zeros((1, 200)), jnp.zeros((1, 200)))

        B, T = 2, 2
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
        obs = jax.random.normal(k1, (B, T, na, d))
        act = jax.random.uniform(k2, (B, T, na, 1))
        h = jax.random.normal(k3, (B, na, 2, 200)) * 0.1
        reset = jnp.zeros((B, T), bool).at[:, 1].set(True)

        got = tr._forward_agents(params, obs, act, h, reset)

        logits, values, h_new = [], [], []
        for i in range(na):
            others = _others(i, na)
            obs_o = jnp.stack([obs[:, :, j] for j in others], axis=2)
            act_o = jnp.stack([act[:, :, j] for j in others], axis=2)
            lg, v, (ha, hv) = tr.model.apply(
                params, obs[:, :, i], obs_o, act[:, :, i], act_o,
                h[:, i, 0], h[:, i, 1], reset)
            logits.append(lg)
            values.append(v)
            h_new.append(jnp.stack([ha, hv], axis=1))
        want = (jnp.stack(logits, axis=2), jnp.stack(values, axis=2),
                jnp.stack(h_new, axis=1))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-5, atol=2e-6)
