"""Recurrent PPO for the high-level commander.

Replaces train_hier.py's RLlib setup (train_hier.py:180-207): one shared
CommanderGru policy acts for all agents; the centralized critic sees all
three agents' observations plus their normalized actions (act / N_OPP_HL,
the callback of train_hier.py:117-132); GRU states are threaded through
the rollout per agent, zeroed on episode reset, and training replays
sequence chunks from their stored initial states.

Hyperparameters follow train_hier.py:186 (kl_target 0.05, no lambda
override -> RLlib default GAE lambda 1.0).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.algo import distributions as D
from hhmarl_2d_tpu.algo.gae import compute_gae
from hhmarl_2d_tpu.algo.sgd import run_sgd
from hhmarl_2d_tpu.env import highlevel
from hhmarl_2d_tpu.models.commander import CommanderGru, GRU_SIZE



@dataclasses.dataclass(frozen=True)
class HierPPOConfig:
    num_envs: int = 128
    rollout_len: int = 64        # commander macro steps per env
    seq_len: int = 8
    gamma: float = 0.99
    lam: float = 1.0             # no lambda override in train_hier.py:186
    clip: float = 0.25
    lr: float = 1e-4
    kl_target: float = 0.05
    kl_coeff_init: float = 0.2
    vf_clip: float = 10.0
    vf_coeff: float = 1.0
    entropy_coeff: float = 0.01  # resists the fight-closest collapse
    sgd_iters: int = 8
    num_minibatches: int = 32    # see cli/args.py on update intensity
    compute_dtype: str = "fp32"  # "bf16" = MXU fast path (algo/ppo.py)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    kl_coeff: jnp.ndarray
    update_i: jnp.ndarray


def _others(i, na):
    """Other agents in ascending order (train_hier.py:123-129)."""
    return [j for j in range(na) if j != i]


class CommanderPPO:
    """``mesh``: optional data mesh — the SGD phase then runs under
    shard_map with device-local minibatching + gradient pmean (algo/sgd.py)."""

    def __init__(self, cfg_env, ppo: HierPPOConfig, bank, mesh=None):
        self.cfg = cfg_env
        self.ppo = ppo
        self.bank = bank
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) \
            else None
        from hhmarl_2d_tpu.algo.ppo import compute_dtype
        self.na = cfg_env.num_agents
        self.model = CommanderGru(n_opp=cfg_env.n_opp_hl,
                                  num_agents=self.na,
                                  dtype=compute_dtype(ppo.compute_dtype))
        self.nvec = (cfg_env.act_dim_hl,)
        # per-leaf adam here, UNLIKE algo/ppo.py's optax.flatten: the
        # commander's params are few large leaves (500-wide trunk, GRU
        # kernels), so flatten's ravel/unravel copies per minibatch update
        # measured a 34% whole-iteration regression (5.11 -> 3.39
        # train_iter/s at the production point) where the low-level
        # learner's ~50 small leaves gained 13%.  Bonus: the optimizer
        # state structure keeps matching the committed deploy/ commander
        # checkpoints.
        self.tx = optax.adam(ppo.lr)
        assert ppo.rollout_len % ppo.seq_len == 0

    def init(self, key):
        k_model, k_env = jax.random.split(key)
        d = self.cfg.obs_hl
        z = jnp.zeros((1, 1, d))
        zo = jnp.zeros((1, 1, self.na - 1, d))
        za = jnp.zeros((1, 1, 1))
        zao = jnp.zeros((1, 1, self.na - 1, 1))
        h = jnp.zeros((1, GRU_SIZE))
        params = self.model.init(k_model, z, zo, za, zao, h, h)
        opt_state = self.tx.init(params)
        env_keys = jax.random.split(k_env, self.ppo.num_envs)
        env_state, obs = jax.vmap(lambda k: highlevel.reset(self.cfg, k))(env_keys)
        h0 = jnp.zeros((self.ppo.num_envs, self.na, 2, GRU_SIZE))
        ts = TrainState(params=params, opt_state=opt_state,
                        kl_coeff=jnp.asarray(self.ppo.kl_coeff_init),
                        update_i=jnp.asarray(0, jnp.int32))
        return ts, env_state, obs, h0

    # --- acting ------------------------------------------------------------

    def _forward_agents(self, params, obs, act_norm, h, reset=None):
        """Evaluate the shared policy for every agent slot.

        obs [B, T, na, d]; act_norm [B, T, na, 1] or None; h [B, na, 2, G].
        Returns (logits [B,T,na,3], values [B,T,na], h' [B,na,2,G]).

        The agent axis is folded into the batch (one model application on
        [B*na, T, ...] rows -- the models/policy.py forward_k pattern)
        instead of ``na`` separate applies: same shared params, ~na x less
        program size and dispatch in rollout and in every SGD minibatch.
        """
        B, T, na = obs.shape[0], obs.shape[1], self.na
        if act_norm is None:
            act_norm = jnp.zeros((B, T, self.na, 1))
        # per-agent teammate indices, ascending (train_hier.py:123-129)
        others = jnp.asarray([_others(i, na) for i in range(na)])  # [na,na-1]

        def fold_own(x):  # [B, T, na, d] -> [B*na, T, d]
            return jnp.moveaxis(x, 2, 1).reshape((B * na, T) + x.shape[3:])

        def fold_others(x):  # [B, T, na, d] -> [B*na, T, na-1, d]
            xo = x[:, :, others]  # [B, T, na, na-1, d]
            return jnp.moveaxis(xo, 2, 1).reshape(
                (B * na, T, na - 1) + x.shape[3:])

        h_f = h.reshape((B * na,) + h.shape[2:])  # [B*na, 2, G]
        reset_f = None
        if reset is not None:
            reset_f = jnp.broadcast_to(
                reset[:, None], (B, na) + reset.shape[1:])
            reset_f = reset_f.reshape((B * na,) + reset.shape[1:])

        lg, v, (ha, hv) = self.model.apply(
            params, fold_own(obs), fold_others(obs), fold_own(act_norm),
            fold_others(act_norm), h_f[:, 0], h_f[:, 1], reset_f)

        def unfold(x):  # [B*na, T, ...] -> [B, T, na, ...]
            return jnp.moveaxis(x.reshape((B, na) + x.shape[1:]), 1, 2)

        h_new = jnp.stack([ha, hv], axis=1).reshape(B, na, 2, ha.shape[-1])
        return unfold(lg), unfold(v), h_new

    def act(self, params, obs, h, key, greedy=False):
        """obs [B, na, d], h [B, na, 2, G] -> actions [B, na], logp, values,
        logits, h'."""
        logits, values, h_new = self._forward_agents(
            params, obs[:, None], None, h)
        logits, values = logits[:, 0], values[:, 0]
        if greedy:
            a = D.mode(logits, self.nvec)[..., 0]
        else:
            a = D.sample(logits, self.nvec, key)[..., 0]
        lp = D.log_prob(logits, self.nvec, a[..., None])
        return a.astype(jnp.int32), lp, values, logits, h_new

    # --- rollout + batch ---------------------------------------------------

    def _rollout(self, ts, env_state, obs, h, key):
        def step_fn(carry, k):
            env_state, obs, h = carry
            k_act, k_env = jax.random.split(k)
            actions, logp, values, logits, h_new = self.act(
                ts.params, obs, h, k_act)
            env_keys = jax.random.split(k_env, self.ppo.num_envs)
            env_state, next_obs, rew, done, info = jax.vmap(
                lambda s, a, kk: highlevel.step(self.cfg, s, a, self.bank, kk))(
                env_state, actions, env_keys)
            # zero GRU state on episode reset
            h_next = jnp.where(done[:, None, None, None], 0.0, h_new)
            out = dict(obs=obs, actions=actions, logp=logp, values=values,
                       logits=logits, rew=rew, done=done, info=info, h=h)
            return (env_state, next_obs, h_next), out

        keys = jax.random.split(key, self.ppo.rollout_len)
        (env_state, obs_last, h_last), traj = jax.lax.scan(
            step_fn, (env_state, obs, h), keys)
        return env_state, obs_last, h_last, traj

    def _make_batch(self, ts, traj, obs_last, h_last):
        _, _, last_values, _, _ = self.act(
            ts.params, obs_last, h_last, jax.random.PRNGKey(0), greedy=True)
        adv, targets = compute_gae(
            traj["rew"], traj["values"],
            traj["done"][..., None].astype(jnp.float32),
            last_values, self.ppo.gamma, self.ppo.lam)
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        B = traj["rew"].shape[1]
        T, L = self.ppo.rollout_len, self.ppo.seq_len
        n_seqs = B * (T // L)

        def to_seqs(x):
            x = jnp.swapaxes(x, 0, 1)
            return x.reshape((n_seqs, L) + x.shape[2:])

        done_bt = jnp.swapaxes(traj["done"], 0, 1)
        reset = jnp.pad(done_bt[:, :-1], ((0, 0), (1, 0)))  # reset at t if done at t-1
        h0 = jnp.swapaxes(traj["h"], 0, 1)[:, ::L]  # [B, T//L, na, 2, G]
        h0 = h0.reshape((n_seqs,) + h0.shape[2:])
        return dict(obs=to_seqs(traj["obs"]), actions=to_seqs(traj["actions"]),
                    logp=to_seqs(traj["logp"]), logits=to_seqs(traj["logits"]),
                    adv=to_seqs(adv), targets=to_seqs(targets),
                    reset=reset.reshape(n_seqs, L), h0=h0)

    # --- loss --------------------------------------------------------------

    def _loss(self, params, batch, kl_coeff):
        act_norm = (batch["actions"].astype(jnp.float32)
                    / self.cfg.n_opp_hl)[..., None]
        logits, values, _ = self._forward_agents(
            params, batch["obs"], act_norm, batch["h0"], batch["reset"])
        lp = D.log_prob(logits, self.nvec, batch["actions"][..., None])
        ratio = jnp.exp(lp - batch["logp"])
        adv = batch["adv"]
        surr = jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - self.ppo.clip, 1 + self.ppo.clip) * adv)
        kl = jnp.mean(D.kl(batch["logits"], logits, self.nvec))
        vf = jnp.clip((values - batch["targets"]) ** 2, 0.0, self.ppo.vf_clip)
        ent = D.entropy(logits, self.nvec)
        loss = (-jnp.mean(surr) + kl_coeff * kl
                + self.ppo.vf_coeff * jnp.mean(vf)
                - self.ppo.entropy_coeff * jnp.mean(ent))
        return loss, {"kl": kl, "pol_loss": -jnp.mean(surr),
                      "vf_loss": jnp.mean(vf), "entropy": jnp.mean(ent)}

    # --- train iteration ---------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def train_iter(self, ts, env_state, obs, h, key):
        k_roll, k_shuf = jax.random.split(key)
        env_state, obs_last, h_last, traj = self._rollout(
            ts, env_state, obs, h, k_roll)
        batch = self._make_batch(ts, traj, obs_last, h_last)
        # epoch means over every minibatch of every pass (rllib update_kl
        # uses the whole-train-batch mean KL, not the last minibatch)
        params, opt_state, metrics = run_sgd(
            self._loss, self.tx, ts.params, ts.opt_state, ts.kl_coeff,
            batch, k_shuf, sgd_iters=self.ppo.sgd_iters,
            num_minibatches=self.ppo.num_minibatches,
            metric_keys=("kl", "pol_loss", "vf_loss", "entropy"),
            mesh=self.mesh)

        kl_coeff = jnp.where(
            metrics["kl"] > 2.0 * self.ppo.kl_target, ts.kl_coeff * 1.5,
            jnp.where(metrics["kl"] < 0.5 * self.ppo.kl_target,
                      ts.kl_coeff * 0.5, ts.kl_coeff))

        ts = TrainState(params=params, opt_state=opt_state, kl_coeff=kl_coeff,
                        update_i=ts.update_i + 1)
        out = dict(metrics)
        out["reward_mean"] = jnp.mean(jnp.sum(traj["rew"], axis=0))
        out["episodes"] = jnp.sum(traj["done"])
        for k in ("agents_win", "opps_win", "draw"):
            out[k] = jnp.sum(traj["info"][k])
        return ts, env_state, obs_last, h_last, out
