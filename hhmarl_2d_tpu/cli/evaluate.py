"""Batch evaluation driver.

Replaces /root/reference/evaluation.py: runs N commander episodes (or the
no-commander closest-opponent baseline with --no-eval_hl) and writes
``Metrics_{config}.json`` with win/lose/draw %, fight/escape usage % and
opponent-selection %.

Usage: python -m hhmarl_2d_tpu.cli.evaluate [--n_evals 1000 ...]
"""

from __future__ import annotations

import os
import time

import jax

from hhmarl_2d_tpu.algo.ppo_hier import CommanderPPO, HierPPOConfig
from hhmarl_2d_tpu.cli import args as ARGS
from hhmarl_2d_tpu.cli.train_high import build_hl_bank
from hhmarl_2d_tpu.eval import harness
from hhmarl_2d_tpu.models.commander import CommanderGru
from hhmarl_2d_tpu.utils import checkpoint as CKPT

MODEL_NAME = "Commander_3_vs_3"


def main(argv=None):
    from hhmarl_2d_tpu.utils.platform import ensure_platform
    ensure_platform()
    t1 = time.time()
    args = ARGS.parse(2, argv)
    cfg = ARGS.to_env_config(args, 2)
    bank = build_hl_bank(args)

    config = ("Commander_" if args.eval_hl else "Low-Level_") + \
        f"{args.num_agents}-vs-{args.num_opps}"
    eval_log = os.path.join(args.log_base, "EVAL_" + config)
    os.makedirs(eval_log, exist_ok=True)
    eval_file = os.path.join(eval_log, f"Metrics_{config}.json")

    model = CommanderGru()
    params = None
    if args.eval_hl:
        trainer = CommanderPPO(cfg, HierPPOConfig(num_envs=1), bank)
        ts, _, _, _ = trainer.init(jax.random.PRNGKey(0))
        check = os.path.join(args.log_base, args.log_name or MODEL_NAME,
                             "checkpoint")
        ts = CKPT.restore_train_state(check, ts)
        params = ts.params

    stats = harness.evaluate_highlevel(
        cfg, model, params, bank, args.n_evals,
        jax.random.PRNGKey(args.seed), eval_hl=args.eval_hl)
    print("------RESULTS:")
    evals = harness.postprocess_eval(stats, args.n_evals, eval_file)
    for k, v in evals.items():
        print(f"{k}: {round(v, 2)}")
    print(f"episodes finished within MAX_MACRO: {stats['finished']}"
          f"/{args.n_evals}")
    print(f"------TIME: {round(time.time() - t1, 3)} sec.")


if __name__ == "__main__":
    main()
