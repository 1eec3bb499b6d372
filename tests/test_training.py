"""Training-stack tests: GAE, PPO iteration, sharded dry run, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhmarl_2d_tpu.algo.gae import compute_gae
from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
from hhmarl_2d_tpu.env import config as ECfg

# heavy suite: excluded from the default fast gate (pyproject addopts)
pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


class TestGAE:
    def test_single_step_terminal(self):
        """done -> no bootstrap: adv = r - V."""
        r = jnp.asarray([[1.0]])
        v = jnp.asarray([[0.3]])
        d = jnp.asarray([[1.0]])
        adv, tgt = compute_gae(r, v, d, jnp.asarray([9.9]), 0.99, 0.95)
        np.testing.assert_allclose(float(adv[0, 0]), 1.0 - 0.3, rtol=1e-6)

    def test_bootstrap_tail(self):
        r = jnp.asarray([[0.0]])
        v = jnp.asarray([[0.5]])
        d = jnp.asarray([[0.0]])
        adv, _ = compute_gae(r, v, d, jnp.asarray([1.0]), 0.99, 0.95)
        np.testing.assert_allclose(float(adv[0, 0]), 0.99 * 1.0 - 0.5,
                                   rtol=1e-5)

    def test_no_leak_across_done(self):
        """Rewards after a done must not flow into earlier advantages."""
        r = jnp.asarray([[0.0], [100.0]])
        v = jnp.asarray([[0.0], [0.0]])
        d = jnp.asarray([[1.0], [1.0]])
        adv, _ = compute_gae(r, v, d, jnp.asarray([0.0]), 0.99, 0.95)
        np.testing.assert_allclose(float(adv[0, 0]), 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = ECfg.make_lowlevel_config(level=1)
    ppo = PPOConfig(num_envs=8, rollout_len=16, seq_len=8, sgd_iters=1,
                    num_minibatches=2)
    tr = LowLevelPPO(cfg, ppo)
    ts, env_state, obs = tr.init(KEY)
    return tr, ts, env_state, obs


class TestPPO:
    def test_iteration_updates_params(self, tiny_trainer):
        tr, ts, env_state, obs = tiny_trainer
        ts2, env_state2, obs2, m = tr.train_iter(ts, env_state, obs,
                                                 jax.random.PRNGKey(1))
        assert int(ts2.update_i) == int(ts.update_i) + 1
        # finite metrics and changed params
        for v in m.values():
            assert bool(jnp.isfinite(v))
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), ts.params, ts2.params)
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    def test_deterministic_given_key(self, tiny_trainer):
        tr, ts, env_state, obs = tiny_trainer
        out1 = tr.train_iter(ts, env_state, obs, jax.random.PRNGKey(2))
        out2 = tr.train_iter(ts, env_state, obs, jax.random.PRNGKey(2))
        np.testing.assert_allclose(
            float(out1[3]["reward_mean"]), float(out2[3]["reward_mean"]))


class TestSharding:
    def test_dryrun_multichip_8(self):
        """The driver's multi-chip validation on the virtual CPU mesh."""
        import __graft_entry__ as g
        g.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out[0].shape == (8, 16, 2, 26)

    def test_mesh_metrics_match_single_device(self):
        """The sharded SGD phase (device-local shards + gradient pmean,
        algo/sgd.py) computes the same training math as the unsharded run
        when the minibatch is the full batch (local permutations are then
        irrelevant, so the update is analytically identical)."""
        from hhmarl_2d_tpu.parallel import mesh as M
        cfg = ECfg.make_lowlevel_config(level=1)
        ppo = PPOConfig(num_envs=8, rollout_len=16, seq_len=8, sgd_iters=2,
                        num_minibatches=1)
        key = jax.random.PRNGKey(11)
        outs = {}
        for n_dev in (1, 8):
            mesh = M.make_mesh(n_dev)
            tr = LowLevelPPO(cfg, ppo, mesh=mesh)
            ts, env_state, obs = tr.init(KEY)
            with mesh:
                ts_p, es_p, obs_p = M.place_train_inputs(
                    mesh, ts, env_state, obs)
                ts2, _, _, m = tr.train_iter(ts_p, es_p, obs_p, key)
                outs[n_dev] = (jax.device_get(m),
                               jax.device_get(ts2.kl_coeff),
                               jax.device_get(
                                   jax.tree_util.tree_leaves(ts2.params)[0]))
        m1, m8 = outs[1][0], outs[8][0]
        for k in m1:
            np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m8[k]),
                                       rtol=2e-4, atol=1e-6, err_msg=k)
        np.testing.assert_allclose(outs[1][1], outs[8][1])
        np.testing.assert_allclose(outs[1][2], outs[8][2],
                                   rtol=1e-3, atol=1e-6)

    def test_mesh_minibatched_sgd_runs_and_learns_shape(self):
        """Device-local minibatching on the mesh: finite metrics, params
        move, kl_coeff stays positive."""
        from hhmarl_2d_tpu.parallel import mesh as M
        cfg = ECfg.make_lowlevel_config(level=1)
        ppo = PPOConfig(num_envs=8, rollout_len=16, seq_len=4, sgd_iters=2,
                        num_minibatches=2)
        mesh = M.make_mesh(8)
        tr = LowLevelPPO(cfg, ppo, mesh=mesh)
        ts, env_state, obs = tr.init(KEY)
        with mesh:
            ts_p, es_p, obs_p = M.place_train_inputs(mesh, ts, env_state, obs)
            ts2, _, _, m = tr.train_iter(ts_p, es_p, obs_p,
                                         jax.random.PRNGKey(3))
        m = jax.device_get(m)
        assert all(np.isfinite(v) for v in m.values())
        p0 = jax.tree_util.tree_leaves(ts.params)[0]
        p1 = jax.device_get(jax.tree_util.tree_leaves(ts2.params)[0])
        assert not np.allclose(np.asarray(p0), p1)

    def test_train_low_cli_on_mesh(self, tmp_path):
        """The real driver reaches the mesh path: --num_devices 8."""
        from hhmarl_2d_tpu.cli import train_low
        train_low.main([
            "--level", "1", "--epochs", "1", "--num_envs", "8",
            "--rollout_len", "8", "--seq_len", "4", "--sgd_iters", "1",
            "--num_minibatches", "1", "--num_devices", "8", "--no-eval",
            "--log_base", str(tmp_path)])
        assert os.path.exists(
            os.path.join(str(tmp_path), "L1_fight_2-vs-2", "metrics.jsonl"))


class TestCheckpoint:
    def test_roundtrip(self, tiny_trainer, tmp_path):
        from hhmarl_2d_tpu.utils import checkpoint as CKPT
        tr, ts, env_state, obs = tiny_trainer
        path = os.path.join(str(tmp_path), "ckpt")
        CKPT.save_train_state(path, 1, ts)
        ts2 = CKPT.restore_train_state(path, ts)
        a = jax.tree_util.tree_leaves(ts.params)
        b = jax.tree_util.tree_leaves(ts2.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_policy_store_roundtrip(self, tiny_trainer, tmp_path):
        from hhmarl_2d_tpu.utils import checkpoint as CKPT
        tr, ts, _, _ = tiny_trainer
        root = str(tmp_path)
        CKPT.export_policy(root, 3, "fight", ts.params)
        loaded = CKPT.load_policy(root, 3, "fight", ts.params)
        for x, y in zip(jax.tree_util.tree_leaves(ts.params),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestAdaptiveKL:
    def test_reported_kl_is_epoch_mean(self):
        """The KL steering update_kl must be the mean over ALL minibatches
        of ALL sgd passes (RLlib update_kl semantics), not the last
        minibatch.  Replays the exact in-graph SGD loop by hand."""
        import optax
        from flax import struct  # noqa: F401
        cfg = ECfg.make_lowlevel_config(level=1)
        ppo = PPOConfig(num_envs=4, rollout_len=16, seq_len=8, sgd_iters=2,
                        num_minibatches=2)
        tr = LowLevelPPO(cfg, ppo)
        ts, env_state, obs = tr.init(jax.random.PRNGKey(3))
        key = jax.random.PRNGKey(7)

        _, _, _, metrics = tr.train_iter(ts, env_state, obs, key)

        # hand replay: same key split, same rollout, same permutations
        k_roll, k_shuf = jax.random.split(key)
        env_last, obs_last, traj = tr._rollout(ts, env_state, obs, k_roll)
        batch = tr._make_batch(ts, traj, env_last, obs_last)
        n_seqs = batch.obs.shape[0]
        n_mb = min(ppo.num_minibatches, n_seqs)
        mb = n_seqs // n_mb
        params, opt_state = ts.params, ts.opt_state
        kls = {1: [], 2: []}
        for k in jax.random.split(k_shuf, ppo.sgd_iters):
            perm = jax.random.permutation(k, n_seqs)
            for idx in np.asarray(perm[:mb * n_mb].reshape(n_mb, mb)):
                mbb = jax.tree_util.tree_map(lambda x: x[idx], batch)
                (_, m), grads = jax.value_and_grad(
                    tr._loss, has_aux=True)(params, mbb, ts.kl_coeff)
                updates, opt_state = tr.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                kls[1].append(float(m["kl_1"]))
                kls[2].append(float(m["kl_2"]))

        for t in (1, 2):
            assert len(kls[t]) == ppo.sgd_iters * n_mb == 4
            np.testing.assert_allclose(float(metrics[f"kl_{t}"]),
                                       np.mean(kls[t]), rtol=2e-4, atol=1e-7)


def test_restored_run_checkpoints_do_not_collide(tmp_path):
    """A restored run's loop epochs restart at 0; checkpoint numbering
    must come from the persistent TrainState.update_i or orbax silently
    skips the save (the round-3 continuation bug)."""
    from hhmarl_2d_tpu.utils import checkpoint as CKPT
    cfg = ECfg.make_lowlevel_config(level=1)
    ppo = PPOConfig(num_envs=2, rollout_len=8, seq_len=4, sgd_iters=1,
                    num_minibatches=1)
    tr = LowLevelPPO(cfg, ppo)
    ts, env_state, obs = tr.init(jax.random.PRNGKey(0))
    ts, env_state, obs, _ = tr.train_iter(ts, env_state, obs,
                                          jax.random.PRNGKey(1))
    path = str(tmp_path / "ck")
    CKPT.save_train_state(path, int(ts.update_i), ts)          # step 1

    ts2 = CKPT.restore_train_state(path, ts)
    assert int(ts2.update_i) == 1
    ts2, env_state, obs, _ = tr.train_iter(ts2, env_state, obs,
                                           jax.random.PRNGKey(2))
    CKPT.save_train_state(path, int(ts2.update_i), ts2)        # step 2
    ts3 = CKPT.restore_train_state(path, ts)                   # latest
    assert int(ts3.update_i) == 2
    l2 = jax.tree_util.tree_leaves(ts2.params)[0]
    l3 = jax.tree_util.tree_leaves(ts3.params)[0]
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(l3))
