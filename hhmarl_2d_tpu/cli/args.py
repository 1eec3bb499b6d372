"""Command-line configuration.

Mirrors the reference's ``Config`` argparse surface
(/root/reference/config.py:5-111) -- mode 0 = low-level training, 1 =
commander training, 2 = evaluation -- with proper boolean flags (the
reference's ``type=bool`` flags treat any string as True; not replicated)
plus the TPU-specific scale knobs (num_envs, rollout_len, ...).

Curriculum auto-chaining (config.py:65-92) is preserved: level-N fight
restores from level N-1, escape restores from L3, and escape training
auto-promotes its level to 5 once an L3 escape run exists.
"""

from __future__ import annotations

import argparse
import os

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.env import config as ECfg


def build_parser(mode: int) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="HHMARL 2D TPU training config")
    bool_flag = argparse.BooleanOptionalAction

    p.add_argument("--level", type=int, default=1, help="Training level")
    p.add_argument("--agent_mode", type=str, default="fight",
                   choices=("fight", "escape"))
    p.add_argument("--num_agents", type=int, default=2 if mode == 0 else 3)
    p.add_argument("--num_opps", type=int, default=2 if mode == 0 else 3)
    p.add_argument("--hier_opp_fight_ratio", type=int, default=75)
    p.add_argument("--n_opp_hl", type=int, default=C.N_OPP_HL,
                   help="Opponents in the commander obs/action space "
                        "(reference bakes 2, envs/env_hier.py:20)")

    p.add_argument("--eval", action=bool_flag, default=True)
    p.add_argument("--render", action=bool_flag, default=False)
    p.add_argument("--render_video", action=bool_flag, default=False,
                   help="Also render evaluation episodes as animated GIFs "
                        "(per-tick frame sequence; the offline equivalent "
                        "of the reference's live current.png video, "
                        "README.md:68-69)")
    p.add_argument("--restore", action=bool_flag, default=False)
    p.add_argument("--restore_path", type=str, default=None)
    p.add_argument("--restore_step", type=int, default=None,
                   help="Pin the checkpoint step to restore (default: "
                        "latest).  Evaluation headlines must cite this so "
                        "committed numbers are regenerable from the repo.")
    p.add_argument("--policy_dir", type=str, default=None,
                   help="Frozen-policy store root (default <repo>/policies; "
                        "committed evaluations use deploy/policies)")
    p.add_argument("--opp_policy_dir", type=str, default=None,
                   help="Load the OPPONENTS' frozen fight/escape policies "
                        "from a different store (default: --policy_dir). "
                        "Enables cross-bank evaluation (bank A agents vs "
                        "bank B opponents) and self-play iterations that "
                        "train/export into a new store while facing the "
                        "previous frozen bank")
    p.add_argument("--init_from_policies", type=int, default=0,
                   help="Low-level training only: warm-start the team's "
                        "params from the frozen store's "
                        "L{N}_{agent_mode} policies instead of random "
                        "init (self-play iteration: continue from an "
                        "exported bank when no TrainState checkpoint "
                        "exists, e.g. the committed deploy/policies)")
    p.add_argument("--log_name", type=str, default=None)
    p.add_argument("--log_base", type=str, default=None,
                   help="Results root (default <repo>/results)")

    p.add_argument("--epochs", type=int, default=10000,
                   help="Training iterations")
    p.add_argument("--batch_size", type=int,
                   default=2000 if mode == 0 else 1000,
                   help="(reference parity knob; informational)")
    p.add_argument("--map_size", type=float,
                   default=C.DEFAULT_MAP_SIZE_LL if mode == 0
                   else C.DEFAULT_MAP_SIZE_HL)

    # rewards
    p.add_argument("--glob_frac", type=float, default=0.0)
    p.add_argument("--rew_scale", type=float, default=1.0)
    p.add_argument("--esc_dist_rew", action=bool_flag, default=False)
    p.add_argument("--hier_action_assess", action=bool_flag, default=True)
    p.add_argument("--friendly_kill", action=bool_flag, default=True)
    p.add_argument("--friendly_punish", action=bool_flag, default=False)

    # eval
    p.add_argument("--eval_info", action=bool_flag, default=(mode == 2))
    p.add_argument("--eval_hl", action=bool_flag, default=True)
    p.add_argument("--eval_level_ag", type=int, default=5)
    p.add_argument("--eval_level_opp", type=int, default=4)
    p.add_argument("--n_evals", type=int, default=1000)
    p.add_argument("--eval_chunk", type=int, default=256,
                   help="Episodes per vmapped eval chunk (memory bound)")
    p.add_argument("--sweep_fight_ratio", action=bool_flag, default=False,
                   help="Evaluate across hier_opp_fight_ratio in "
                        "{0,25,50,75,100} and write a sweep table")
    p.add_argument("--eval_tag", type=str, default="",
                   help="Suffix appended to the EVAL config name so "
                        "baseline variants and render runs write their own "
                        "Metrics_* files instead of clobbering the main "
                        "eval's (the round-4 5-vs-5 headline artifact was "
                        "overwritten by a 2-episode render run this way)")

    # TPU scale knobs (replace --num_workers/--gpu)
    p.add_argument("--num_devices", type=int, default=0,
                   help="Devices in the data mesh (0 = all visible); the env "
                        "batch shards over them, the learner replicates")
    p.add_argument("--distributed", action=bool_flag, default=False,
                   help="Multi-host: jax.distributed.initialize() first "
                        "(one process per host; see parallel.mesh)")
    p.add_argument("--tensorboard", action=bool_flag, default=False,
                   help="Serve the run's event files with a background "
                        "TensorBoard server, scanning from port 6006 "
                        "(train_hetero.py:262-272); events are written "
                        "whenever the tensorboard writer is importable")
    p.add_argument("--profile", action=bool_flag, default=False,
                   help="Capture a jax.profiler trace of steps 10-12 into "
                        "the log dir")
    p.add_argument("--num_envs", type=int, default=512 if mode == 0 else 128)
    # PPO knobs the reference sets via PPOConfig().training()
    # (train_hetero.py:216-236, train_hier.py:182-189)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--gae_lambda", type=float,
                   default=0.95 if mode == 0 else 1.0)
    p.add_argument("--clip", type=float, default=0.25)
    p.add_argument("--kl_target", type=float,
                   default=0.025 if mode == 0 else 0.05)
    p.add_argument("--kl_coeff", type=float, default=0.2)
    p.add_argument("--vf_clip", type=float, default=10.0)
    p.add_argument("--vf_coeff", type=float, default=1.0)
    # The commander needs an entropy bonus: with the reference's 0.0 the
    # shared policy collapses to "always fight the closest opponent"
    # (measured: entropy 0.034, kl ~7e-5 after 300 iters) and the adaptive
    # KL penalty then has nothing to push against.
    p.add_argument("--entropy_coeff", type=float,
                   default=0.0 if mode == 0 else 0.01)
    p.add_argument("--rollout_len", type=int, default=128 if mode == 0 else 64)
    p.add_argument("--seq_len", type=int, default=16 if mode == 0 else 8)
    # The reference leaves RLlib's num_sgd_iter at its default 30 with
    # minibatch 256 over a 2000-step batch (~240 updates per iteration).
    # Our per-iteration batches are 30x larger, so matching its *per-sample*
    # update intensity needs many more minibatch updates per batch than the
    # round-2 defaults (4x8) delivered.
    p.add_argument("--adv_std", type=str, default="slot",
                   choices=("slot", "type"),
                   help="k-team advantage standardization: per slot "
                        "column (empirical default) or per aircraft type "
                        "(RLlib per-policy semantics; measured weaker -- "
                        "see algo/ppo.py)")
    p.add_argument("--mask_dead", action=bool_flag, default=False,
                   help="k-team only: exclude dead agents' zero-padded "
                        "rows from advantage standardization and the loss "
                        "(the 2-vs-2 parity path never masks)")
    p.add_argument("--compute_dtype", type=str,
                   default="bf16" if mode in (0, 1) else "fp32",
                   choices=("fp32", "bf16"),
                   help="Model computation dtype (params/optimizer/loss "
                        "always fp32).  bf16 is the TPU MXU's native path "
                        "(training default; A/B-validated, see "
                        "artifacts/BF16_AB.md); evaluation defaults to "
                        "fp32 so committed metrics are exactly "
                        "reproducible")
    p.add_argument("--sgd_iters", type=int, default=8)
    p.add_argument("--num_minibatches", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--checkpoint_every", type=int, default=50)
    p.add_argument("--render_every", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    return p


def finalize(args, mode: int):
    """set_metrics equivalent (config.py:59-107)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    args.log_base = args.log_base or os.path.join(repo_root, "results")
    args.policy_dir = args.policy_dir or os.path.join(repo_root, "policies")

    if mode == 0:
        # escape auto-promotion (config.py:86-92)
        if args.agent_mode == "escape":
            if os.path.exists(os.path.join(
                    args.log_base, "L3_escape_2-vs-2")):
                args.level = 5
            else:
                args.level = 3
        args.log_name = args.log_name or (
            f"L{args.level}_{args.agent_mode}_"
            f"{args.num_agents}-vs-{args.num_opps}")
        args.horizon = C.HORIZON_LEVEL[args.level]
    else:
        args.log_name = args.log_name or (
            f"Commander_{args.num_agents}_vs_{args.num_opps}")
        args.horizon = C.HORIZON_HL

    args.log_path = os.path.join(args.log_base, args.log_name)

    # restore chaining (config.py:65-84)
    if mode == 0 and not args.restore:
        if args.agent_mode == "fight":
            prev = os.path.join(
                args.log_base,
                f"L{args.level - 1}_fight_{args.num_agents}-vs-{args.num_opps}")
            if os.path.exists(prev):
                args.restore = True
                args.restore_path = args.restore_path or os.path.join(
                    prev, "checkpoint")
        else:
            prev = os.path.join(
                args.log_base,
                f"L3_escape_{args.num_agents}-vs-{args.num_opps}")
            if args.level == 5 and os.path.exists(prev):
                args.restore = True
                args.restore_path = args.restore_path or os.path.join(
                    prev, "checkpoint")

    if mode == 2 and args.eval_hl:
        args.eval_level_ag = args.eval_level_opp = 5

    return args


def ppo_kwargs(args) -> dict:
    """PPOConfig/HierPPOConfig fields shared by both trainers."""
    return dict(num_envs=args.num_envs, rollout_len=args.rollout_len,
                seq_len=args.seq_len, sgd_iters=args.sgd_iters,
                num_minibatches=args.num_minibatches, lr=args.lr,
                gamma=args.gamma, lam=args.gae_lambda, clip=args.clip,
                kl_target=args.kl_target, kl_coeff_init=args.kl_coeff,
                vf_clip=args.vf_clip, vf_coeff=args.vf_coeff,
                entropy_coeff=args.entropy_coeff,
                compute_dtype=args.compute_dtype)


def to_env_config(args, mode: int) -> ECfg.EnvConfig:
    return ECfg.EnvConfig(
        num_agents=args.num_agents, num_opps=args.num_opps,
        map_size=args.map_size, level=args.level,
        agent_mode=args.agent_mode, horizon=args.horizon,
        glob_frac=args.glob_frac, rew_scale=args.rew_scale,
        esc_dist_rew=args.esc_dist_rew, friendly_kill=args.friendly_kill,
        friendly_punish=args.friendly_punish,
        hier_opp_fight_ratio=args.hier_opp_fight_ratio,
        hier_action_assess=args.hier_action_assess,
        n_opp_hl=args.n_opp_hl)


def parse(mode: int, argv=None):
    args = build_parser(mode).parse_args(argv)
    return finalize(args, mode)
