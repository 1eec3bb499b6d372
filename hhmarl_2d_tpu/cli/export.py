"""Frozen-policy exporter.

Replaces /root/reference/policy_export.py: loads a training checkpoint and
writes the per-type frozen policy params to the policy store as
``L{level}_AC{i}_{mode}`` entries, the interchange format consumed by the
self-play bank and the commander env.

Usage: python -m hhmarl_2d_tpu.cli.export --level 3 --agent_mode fight
"""

from __future__ import annotations

import os

import jax

from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
from hhmarl_2d_tpu.cli import args as ARGS
from hhmarl_2d_tpu.models import policy as P
from hhmarl_2d_tpu.utils import checkpoint as CKPT


def main(argv=None):
    from hhmarl_2d_tpu.utils.platform import ensure_platform
    ensure_platform()
    args = ARGS.parse(0, argv)
    cfg = ARGS.to_env_config(args, 0)
    team = P.LowLevelTeam(args.agent_mode)
    trainer = LowLevelPPO(cfg, PPOConfig(num_envs=1, rollout_len=16,
                                         seq_len=16), team=team)
    ts, _, _ = trainer.init(jax.random.PRNGKey(0))
    check = args.restore_path or os.path.join(args.log_path, "checkpoint")
    ts = CKPT.restore_train_state(check, ts)
    CKPT.export_policy(args.policy_dir, args.level, args.agent_mode,
                       ts.params)
    print(f"exported L{args.level}_AC{{1,2}}_{args.agent_mode} "
          f"-> {args.policy_dir}")


if __name__ == "__main__":
    main()
