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

from hhmarl_2d_tpu import constants as C
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
    if cfg.n_opp_hl != C.N_OPP_HL:
        # keep non-default commander obs/action spaces (e.g. the 3-target
        # N_OPPS_HL=3 setup of /root/reference/README.md:76-77) from
        # overwriting the default config's metrics files
        config += f"_{cfg.n_opp_hl}opp"
    if args.eval_tag:
        config += f"_{args.eval_tag}"
    eval_log = os.path.join(args.log_base, "EVAL_" + config)
    os.makedirs(eval_log, exist_ok=True)
    eval_file = os.path.join(eval_log, f"Metrics_{config}.json")

    model = CommanderGru(n_opp=cfg.n_opp_hl, num_agents=cfg.num_agents)
    params = None
    check = step = None
    if args.eval_hl:
        trainer = CommanderPPO(cfg, HierPPOConfig(num_envs=1), bank)
        ts, _, _, _ = trainer.init(jax.random.PRNGKey(0))
        check = args.restore_path or os.path.join(
            args.log_base, args.log_name or MODEL_NAME, "checkpoint")
        step = args.restore_step
        if step is None:
            step = CKPT.latest_step(check)
        ts = CKPT.restore_train_state(check, ts, step=step)
        print(f"commander restored from {check} @ step {step}", flush=True)
        params = ts.params

    # provenance sidecar: everything needed to regenerate this file from
    # the repo (the Metrics_* schema itself stays reference-exact,
    # evaluation.py:66-82)
    provenance = {
        "n_evals": args.n_evals, "seed": args.seed,
        "hier_opp_fight_ratio": args.hier_opp_fight_ratio,
        "eval_hl": args.eval_hl, "num_agents": args.num_agents,
        "num_opps": args.num_opps, "n_opp_hl": cfg.n_opp_hl,
        "eval_level_ag": args.eval_level_ag,
        "eval_level_opp": args.eval_level_opp,
        "policy_dir": args.policy_dir,
        "commander_checkpoint": check, "commander_step": step,
        "bank": bank.get("_meta", {}),
    }

    def write_provenance(suffix=""):
        import json
        p = os.path.join(eval_log, f"Metrics_{config}{suffix}_provenance.json")
        with open(p, "w") as f:
            json.dump(provenance, f, indent=3)

    if args.sweep_fight_ratio:
        table = harness.sweep_fight_ratio(
            cfg, model, params, bank, args.n_evals,
            jax.random.PRNGKey(args.seed), eval_hl=args.eval_hl,
            chunk_size=args.eval_chunk)
        sweep_file = os.path.join(eval_log, f"Metrics_{config}_sweep.json")
        with open(sweep_file, "w") as f:
            import json
            json.dump(table, f, indent=3)
        write_provenance("_sweep")
        print("------FIGHT-RATIO SWEEP:")
        for r, ev in table.items():
            print(f"ratio {r}: win {ev['win']:.1f} lose {ev['lose']:.1f} "
                  f"draw {ev['draw']:.1f}")
        print(f"-> {sweep_file}")
        print(f"------TIME: {round(time.time() - t1, 3)} sec.")
        return

    stats = harness.evaluate_highlevel(
        cfg, model, params, bank, args.n_evals,
        jax.random.PRNGKey(args.seed), eval_hl=args.eval_hl,
        chunk_size=args.eval_chunk)
    print("------RESULTS:")
    evals = harness.postprocess_eval(stats, args.n_evals, eval_file)
    write_provenance()
    for k, v in evals.items():
        print(f"{k}: {round(v, 2)}")
    print(f"episodes finished within the macro-step bound: "
          f"{stats['finished']}/{args.n_evals}")

    if args.render and args.render_every:
        # rendered episodes every N (evaluation.py:61-62): re-run those
        # episodes greedily and drop PNG frames into the eval dir
        from hhmarl_2d_tpu.eval.episodes import run_episode_highlevel
        from hhmarl_2d_tpu.render.plotter import plot_episode
        for ep in range(0, args.n_evals, args.render_every):
            k_ep = jax.random.fold_in(jax.random.PRNGKey(args.seed), ep)
            rew, steps, _, trace = run_episode_highlevel(
                cfg, model, params, bank, k_ep,
                fixed_action=None if args.eval_hl else 1,
                max_macro=harness.max_macro_steps(cfg))
            png = os.path.join(eval_log, f"Ep_{ep}_Rew_{round(rew, 2)}.png")
            plot_episode(trace, png, status=f"eval episode {ep}")
            if args.render_video:
                from hhmarl_2d_tpu.render.plotter import render_video
                render_video(trace, png[:-4] + ".gif",
                             status=f"eval episode {ep}",
                             live_file=os.path.join(eval_log, "current.png"))
            print(f"rendered {png}")
    print(f"------TIME: {round(time.time() - t1, 3)} sec.")


if __name__ == "__main__":
    main()
