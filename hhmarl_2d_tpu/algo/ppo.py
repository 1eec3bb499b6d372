"""On-device PPO learner for the low-level heterogeneous stage.

Replaces Ray RLlib 2.4 PPO (train_hetero.py:210-245) with a single fused
JAX program: vectorized rollout (lax.scan over vmapped envs), GAE, and
minibatched clipped-surrogate SGD with RLlib's adaptive KL penalty --
trained jointly for the two policies (ac1/ac2) whose parameters are
disjoint, which is equivalent to RLlib's per-policy optimizers.

Loss matches RLlib 2.4 torch PPO:
  L = -E[min(ratio * A, clip(ratio, 1-eps, 1+eps) * A)]
      + kl_coeff * KL(old || new)          (analytic, from stored logits)
      + vf_coeff * clamp((V - V_target)^2, 0, vf_clip)
      - entropy_coeff * H
with kl_coeff adapted per train iteration: *1.5 if kl > 2*target,
*0.5 if kl < 0.5*target (rllib update_kl).

Sequence handling: the rollout [B, T] is sliced into [n_seqs, seq_len]
chunks; attention masks on episode-segment ids keep chunks from attending
across auto-reset boundaries (RLlib's max_seq_len sequencing analog).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from hhmarl_2d_tpu.algo import distributions as D
from hhmarl_2d_tpu.algo.gae import compute_gae
from hhmarl_2d_tpu.algo.sgd import run_sgd
from hhmarl_2d_tpu.env import lowlevel
from hhmarl_2d_tpu.models import policy as P

_ACT_NORM = np.asarray([12.0, 8.0, 1.0, 1.0], np.float32)


def compute_dtype(name: str):
    """"fp32" -> None (flax default), "bf16" -> jnp.bfloat16."""
    return {"fp32": None, "bf16": jnp.bfloat16}[name]


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Hyperparameters (reference values: train_hetero.py:216, config.py)."""

    num_envs: int = 256
    rollout_len: int = 128       # steps per env per iteration
    seq_len: int = 16            # training-sequence chunk for attention
    gamma: float = 0.99
    lam: float = 0.95
    clip: float = 0.25
    lr: float = 1e-4
    kl_target: float = 0.025
    kl_coeff_init: float = 0.2
    vf_clip: float = 10.0
    vf_coeff: float = 1.0
    entropy_coeff: float = 0.0
    sgd_iters: int = 8           # passes over the batch per iteration
    num_minibatches: int = 32    # minibatches per pass (see cli/args.py)
    # k-team advantage standardization: "slot" (per slot column -- the
    # empirical default, see _make_batch) or "type" (per aircraft type,
    # RLlib per-policy semantics)
    adv_std: str = "slot"
    # k-team only: exclude dead agents' zero-padded rows from advantage
    # standardization and the loss (the reference trains on those rows --
    # RLlib receives the zero-padded dict entries -- so the parity-exact
    # 2-vs-2 path never masks).  MEASURED worse on the 3v3 stage (A/B at
    # 400 iters, 256 envs: masked 23 wins/iter vs unmasked 92-105, with
    # destabilized KL ~0.03 vs ~0.01); the padded rows evidently act as
    # stabilizing sample mass.  Kept selectable (--mask_dead).
    mask_dead: bool = False
    # model computation dtype: "fp32" or "bf16" (params/optimizer/loss
    # stay fp32 -- see models/layers.py).  The CLI trainers default to
    # bf16 (the v5e MXU's native path); the config default stays fp32 so
    # parity tests and CPU test runs are exact.
    compute_dtype: str = "fp32"


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    kl_coeff: jnp.ndarray        # [2] per policy (ac1, ac2)
    update_i: jnp.ndarray


@struct.dataclass
class Batch:
    obs: jnp.ndarray       # [N, L, k, OBS_PAD]
    actions: jnp.ndarray   # [N, L, k, 4]
    logp: jnp.ndarray      # [N, L, k]
    logits: jnp.ndarray    # [N, L, k, 26]
    adv: jnp.ndarray       # [N, L, k]
    targets: jnp.ndarray   # [N, L, k]
    seg: jnp.ndarray       # [N, L] episode segment ids
    ac1: jnp.ndarray       # [N, L, k] bool: slot type == AC1 (k-team path)
    mate: jnp.ndarray      # [N, L, k] i32: CTDE teammate slot (-1 = none)
    alive: jnp.ndarray     # [N, L, k] bool: agent alive at obs time


class LowLevelPPO:
    """Trainer for one curriculum level of the low-level stage.

    ``mesh``: optional data mesh; the SGD phase then runs under shard_map
    with device-local minibatching and per-minibatch gradient pmean (see
    algo/sgd.py). The env batch (num_envs, and hence the derived sequence
    axis) must be divisible by the mesh size.
    """

    def __init__(self, cfg_env, ppo: PPOConfig,
                 team: Optional[P.LowLevelTeam] = None, opp_actor=None,
                 mesh=None):
        self.cfg = cfg_env
        self.ppo = ppo
        self.team = team or P.LowLevelTeam(
            cfg_env.agent_mode, cfg_env.num_agents,
            dtype=compute_dtype(ppo.compute_dtype))
        self.opp_actor = opp_actor
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) \
            else None
        # flatten: adam runs on ONE concatenated vector instead of ~50
        # small per-leaf fusions per minibatch update -- measured +13%
        # whole-train_iter at the production 8x32 SGD intensity (the
        # optimizer executes 256x per iteration).  Old-format checkpoints
        # (per-leaf adam state) restore params-only (utils/checkpoint.py).
        self.tx = optax.flatten(optax.adam(ppo.lr))
        assert ppo.rollout_len % ppo.seq_len == 0
        # k != 2 teams use the generalized mixed-type paths (forward_k);
        # the reference's fixed slot0=AC1/slot1=AC2 mapping keeps the
        # cheaper hardwired path
        self.gen = cfg_env.num_agents != 2

    # --- initialization ----------------------------------------------------

    def init(self, key):
        k_model, k_env = jax.random.split(key)
        params = self.team.init(k_model)
        opt_state = self.tx.init(params)
        env_keys = jax.random.split(k_env, self.ppo.num_envs)
        env_state, obs = jax.vmap(lambda k: lowlevel.reset(self.cfg, k))(env_keys)
        ts = TrainState(params=params, opt_state=opt_state,
                        kl_coeff=jnp.full((2,), self.ppo.kl_coeff_init),
                        update_i=jnp.asarray(0, jnp.int32))
        return ts, env_state, obs

    # --- rollout -----------------------------------------------------------

    def _team_act(self, params, env_state, obs, key, greedy=False):
        if not self.gen:
            return self.team.act(params, obs, key, greedy=greedy)
        na = self.cfg.num_agents
        ac1 = env_state.sim.ac_type[:, :na] == 1
        moh = P.mate_onehot(env_state.tmate, na)
        return self.team.act_k(params, obs, ac1, moh, key, greedy=greedy)

    def _rollout(self, ts: TrainState, env_state, obs0, key):
        na = self.cfg.num_agents

        def step_fn(carry, k):
            env_state, obs = carry
            k_act, k_env = jax.random.split(k)
            actions, logp, values, logits = self._team_act(
                ts.params, env_state, obs, k_act)
            out = dict(obs=obs, actions=actions, logp=logp, values=values,
                       logits=logits,
                       ac1=env_state.sim.ac_type[:, :na] == 1,
                       mate=env_state.tmate,
                       alive=env_state.sim.alive[:, :na])
            env_keys = jax.random.split(k_env, self.ppo.num_envs)
            env_state, next_obs, rew, done, info = jax.vmap(
                lambda s, a, kk: lowlevel.step(self.cfg, s, a, kk,
                                               self.opp_actor))(
                env_state, actions, env_keys)
            out.update(rew=rew, done=done, info=info)
            return (env_state, next_obs), out

        keys = jax.random.split(key, self.ppo.rollout_len)
        (env_state, obs_last), traj = jax.lax.scan(
            step_fn, (env_state, obs0), keys)
        return env_state, obs_last, traj

    def _make_batch(self, ts, traj, env_state, obs_last):
        """GAE, per-policy advantage standardization, sequence slicing."""
        _, _, last_values, _ = self._team_act(
            ts.params, env_state, obs_last, jax.random.PRNGKey(0),
            greedy=True)
        adv, targets = compute_gae(
            traj["rew"], traj["values"],
            traj["done"][..., None].astype(jnp.float32),
            last_values, self.ppo.gamma, self.ppo.lam)
        if self.gen and self.ppo.adv_std == "type":
            # per-aircraft-type standardization (RLlib's per-policy
            # semantics: slots >= 2 hold a per-episode random AC1/AC2
            # mix, so slot columns are not policies).  MEASURED to train
            # markedly worse on the 3v3 stage than the per-slot default
            # -- A/B at 400 iters, 256 envs: per-type 19% win, per-slot
            # 50% win, per-(slot,type) groups 7% (passive-draw collapse).
            # Removing each SLOT's mean is a positional baseline the
            # learner evidently needs; kept selectable for semantics
            # comparisons.
            ac1 = traj["ac1"]

            def masked_standardize(a, m):
                n = jnp.maximum(m.sum(), 1.0)
                mu = (a * m).sum() / n
                var = (((a - mu) ** 2) * m).sum() / n
                return (a - mu) / (jnp.sqrt(var) + 1e-8)

            m1 = ac1.astype(jnp.float32)
            m2 = 1.0 - m1
            if self.ppo.mask_dead:
                # --mask_dead composes with type-mode standardization too:
                # dead agents' zero-padded rows are excluded from the
                # per-type statistics exactly as the help text promises
                alive = traj["alive"].astype(jnp.float32)
                m1, m2 = m1 * alive, m2 * alive
            adv = jnp.where(ac1, masked_standardize(adv, m1),
                            masked_standardize(adv, m2))
        elif self.gen and self.ppo.mask_dead:
            # per slot column over ALIVE rows only: dead agents' rows are
            # zero-obs/zero-reward padding that otherwise shifts the slot
            # statistics
            m = traj["alive"].astype(jnp.float32)
            n = jnp.maximum(m.sum(axis=(0, 1)), 1.0)
            mu = (adv * m).sum(axis=(0, 1)) / n
            var = (((adv - mu) ** 2) * m).sum(axis=(0, 1)) / n
            adv = (adv - mu) / (jnp.sqrt(var) + 1e-8)
        else:
            # per slot column; in the fixed slot0=AC1/slot1=AC2 2-vs-2
            # mapping this IS per-policy (train_hetero.py:240)
            adv = (adv - adv.mean(axis=(0, 1))) / (adv.std(axis=(0, 1)) + 1e-8)

        B = traj["rew"].shape[1]
        T = self.ppo.rollout_len
        L = self.ppo.seq_len
        n_seqs = B * (T // L)

        def to_seqs(x):  # [T, B, ...] -> [n_seqs, L, ...]
            x = jnp.swapaxes(x, 0, 1)
            return x.reshape((n_seqs, L) + x.shape[2:])

        done_bt = jnp.swapaxes(traj["done"], 0, 1)
        seg = jnp.cumsum(jnp.pad(done_bt[:, :-1], ((0, 0), (1, 0))), axis=1)
        return Batch(obs=to_seqs(traj["obs"]), actions=to_seqs(traj["actions"]),
                     logp=to_seqs(traj["logp"]), logits=to_seqs(traj["logits"]),
                     adv=to_seqs(adv), targets=to_seqs(targets),
                     seg=seg.reshape(n_seqs, L),
                     ac1=to_seqs(traj["ac1"]), mate=to_seqs(traj["mate"]),
                     alive=to_seqs(traj["alive"]))

    # --- loss --------------------------------------------------------------

    def _loss(self, params, batch: Batch, kl_coeff):
        if self.gen:
            return self._loss_k(params, batch, kl_coeff)
        logits, values = self.team.forward(
            params, batch.obs,
            act_norm=batch.actions.astype(jnp.float32) / _ACT_NORM,
            seg=batch.seg)
        total = 0.0
        metrics = {}
        for slot, t in enumerate((1, 2)):
            nv = D.NVEC_AC1 if t == 1 else D.NVEC_AC2
            w = sum(nv)
            lg = logits[..., slot, :w]
            a = batch.actions[..., slot, :len(nv)]
            lp = D.log_prob(lg, nv, a)
            ratio = jnp.exp(lp - batch.logp[..., slot])
            adv = batch.adv[..., slot]
            surr = jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - self.ppo.clip, 1 + self.ppo.clip) * adv)
            ent = D.entropy(lg, nv)
            kl = jnp.mean(D.kl(batch.logits[..., slot, :w], lg, nv))
            vf = jnp.clip((values[..., slot] - batch.targets[..., slot]) ** 2,
                          0.0, self.ppo.vf_clip)
            pol_loss = -jnp.mean(surr)
            vf_loss = jnp.mean(vf)
            total = total + (pol_loss + kl_coeff[slot] * kl
                             + self.ppo.vf_coeff * vf_loss
                             - self.ppo.entropy_coeff * jnp.mean(ent))
            metrics[f"kl_{t}"] = kl
            metrics[f"pol_loss_{t}"] = pol_loss
            metrics[f"vf_loss_{t}"] = vf_loss
            metrics[f"entropy_{t}"] = jnp.mean(ent)
        return total, metrics

    def _loss_k(self, params, batch: Batch, kl_coeff):
        """Mixed-type k-slot loss: per-element stats from both type heads
        selected by the slot's type; per-policy terms are masked means
        over that policy's slots (each policy optimizes the mean loss of
        its own samples, like RLlib's per-policy optimizers)."""
        act_norm = batch.actions.astype(jnp.float32) / _ACT_NORM
        moh = P.mate_onehot(batch.mate, self.cfg.num_agents)
        logits, values = self.team.forward_k(
            params, batch.obs, batch.ac1, moh, act_norm=act_norm,
            seg=batch.seg)
        w1, w2 = sum(D.NVEC_AC1), sum(D.NVEC_AC2)
        lg1, lg2 = logits[..., :w1], logits[..., :w2]
        old1, old2 = batch.logits[..., :w1], batch.logits[..., :w2]
        a1, a2 = batch.actions[..., :len(D.NVEC_AC1)], \
            batch.actions[..., :len(D.NVEC_AC2)]
        sel = lambda x1, x2: jnp.where(batch.ac1, x1, x2)
        lp = sel(D.log_prob(lg1, D.NVEC_AC1, a1),
                 D.log_prob(lg2, D.NVEC_AC2, a2))
        ent = sel(D.entropy(lg1, D.NVEC_AC1), D.entropy(lg2, D.NVEC_AC2))
        kl = sel(D.kl(old1, lg1, D.NVEC_AC1), D.kl(old2, lg2, D.NVEC_AC2))

        ratio = jnp.exp(lp - batch.logp)
        surr = jnp.minimum(
            ratio * batch.adv,
            jnp.clip(ratio, 1 - self.ppo.clip, 1 + self.ppo.clip) * batch.adv)
        vf = jnp.clip((values - batch.targets) ** 2, 0.0, self.ppo.vf_clip)

        def masked_mean(x, m):
            return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)

        total = 0.0
        metrics = {}
        masks = {1: batch.ac1.astype(jnp.float32),
                 2: (~batch.ac1).astype(jnp.float32)}
        if self.ppo.mask_dead:
            # dead agents' zero-padded rows carry no learnable signal
            alive = batch.alive.astype(jnp.float32)
            masks = {t: m * alive for t, m in masks.items()}
        for t in (1, 2):
            m = masks[t]
            pol_loss = -masked_mean(surr, m)
            vf_loss = masked_mean(vf, m)
            kl_t = masked_mean(kl, m)
            ent_t = masked_mean(ent, m)
            total = total + (pol_loss + kl_coeff[t - 1] * kl_t
                             + self.ppo.vf_coeff * vf_loss
                             - self.ppo.entropy_coeff * ent_t)
            metrics[f"kl_{t}"] = kl_t
            metrics[f"pol_loss_{t}"] = pol_loss
            metrics[f"vf_loss_{t}"] = vf_loss
            metrics[f"entropy_{t}"] = ent_t
        return total, metrics

    def _metric_keys(self):
        return [f"{name}_{t}" for t in (1, 2)
                for name in ("kl", "pol_loss", "vf_loss", "entropy")]

    # --- one training iteration -------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def train_iter(self, ts: TrainState, env_state, obs, key):
        k_roll, k_shuf = jax.random.split(key)
        env_state, obs_last, traj = self._rollout(ts, env_state, obs, k_roll)
        batch = self._make_batch(ts, traj, env_state, obs_last)
        # epoch means over every minibatch of every pass: RLlib's update_kl
        # feeds on the mean KL of the whole train batch, not the last
        # minibatch (rllib PPO kl stat -> update_kl)
        params, opt_state, metrics = run_sgd(
            self._loss, self.tx, ts.params, ts.opt_state, ts.kl_coeff,
            batch, k_shuf, sgd_iters=self.ppo.sgd_iters,
            num_minibatches=self.ppo.num_minibatches,
            metric_keys=self._metric_keys(), mesh=self.mesh)

        # adaptive KL coefficient (rllib update_kl)
        kls = jnp.stack([metrics["kl_1"], metrics["kl_2"]])
        kl_coeff = jnp.where(
            kls > 2.0 * self.ppo.kl_target, ts.kl_coeff * 1.5,
            jnp.where(kls < 0.5 * self.ppo.kl_target, ts.kl_coeff * 0.5,
                      ts.kl_coeff))

        ts = TrainState(params=params, opt_state=opt_state, kl_coeff=kl_coeff,
                        update_i=ts.update_i + 1)
        metrics = dict(metrics)
        metrics["reward_mean"] = jnp.mean(jnp.sum(traj["rew"], axis=0))
        metrics["episodes"] = jnp.sum(traj["done"])
        for k in ("agents_win", "opps_win", "draw"):
            metrics[k] = jnp.sum(traj["info"][k])
        return ts, env_state, obs_last, metrics
