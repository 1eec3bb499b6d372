"""Commander (high-level) training driver.

Replaces /root/reference/train_hier.py: trains the shared CommanderGru
policy on the 3-vs-3 hierarchical env with the frozen low-level policies
embedded in the env step.

Usage: python -m hhmarl_2d_tpu.cli.train_high [--epochs N ...]
"""

from __future__ import annotations

import os
import time

import jax

from hhmarl_2d_tpu.algo.ppo_hier import CommanderPPO, HierPPOConfig
from hhmarl_2d_tpu.cli import args as ARGS
from hhmarl_2d_tpu.env import highlevel
from hhmarl_2d_tpu.eval.episodes import run_episode_highlevel
from hhmarl_2d_tpu.models import policy as P
from hhmarl_2d_tpu.parallel import mesh as M
from hhmarl_2d_tpu.render.plotter import plot_episode
from hhmarl_2d_tpu.utils import checkpoint as CKPT
from hhmarl_2d_tpu.utils.metrics import MetricsLogger, Profiler
from hhmarl_2d_tpu.utils.resilience import with_retries


def build_hl_bank(args, dtype=None):
    """_get_policies("HighLevel") (env_base.py:332-346): agents use
    L{eval_level_ag} fight and L5 (or L3) escape policies.

    ``dtype``: embedded-inference computation dtype.  Commander TRAINING
    passes the --compute_dtype (bf16 default: the frozen bank dominates
    the macro-step's FLOPs); evaluation keeps the fp32 default so
    committed metrics are exactly reproducible."""
    team_f = P.LowLevelTeam("fight", dtype=dtype)
    team_e = P.LowLevelTeam("escape", dtype=dtype)
    f_tmpl = team_f.init(jax.random.PRNGKey(0))
    e_tmpl = team_e.init(jax.random.PRNGKey(0))
    root = args.policy_dir

    fight = CKPT.load_policy(root, args.eval_level_ag, "fight", f_tmpl)
    # a *missing* L5 escape store falls back to L3 (the reference trains
    # escape at L3 first, config.py:86-92); any other failure -- e.g. a
    # corrupted store -- must fail loudly, not silently swap in the much
    # weaker L3 escape policy and shift every commander number
    try:
        esc = CKPT.load_policy(root, 5, "escape", e_tmpl)
        esc_level = 5
    except FileNotFoundError:
        esc = CKPT.load_policy(root, 3, "escape", e_tmpl)
        esc_level = 3

    # --opp_policy_dir: cross-bank evaluation — opponents' fight policies
    # come from a different frozen store (e.g. iteration-2 agents vs the
    # committed deploy/policies bank).  Escape stays shared: in the macro
    # env both sides decode escape from the same bank entry.
    opp_root = getattr(args, "opp_policy_dir", None) or root
    fight_opp_level = args.eval_level_ag
    fight_opp = fight
    if not args.eval_hl or opp_root != root:
        fight_opp_level = (args.eval_level_opp if not args.eval_hl
                           else args.eval_level_ag)
        fight_opp = CKPT.load_policy(opp_root, fight_opp_level, "fight",
                                     f_tmpl)
    print(f"frozen bank [{root}]: agents fight L{args.eval_level_ag} / "
          f"escape L{esc_level}, opponents fight L{fight_opp_level} "
          f"[{opp_root}]", flush=True)
    bank = highlevel.make_hl_bank(team_f, team_e, fight, esc, fight_opp)
    bank["_meta"] = {"policy_dir": root,
                     "fight_level": args.eval_level_ag,
                     "escape_level": esc_level,
                     "fight_level_opp": fight_opp_level,
                     "opp_policy_dir": opp_root}
    return bank


def main(argv=None):
    from hhmarl_2d_tpu.utils.platform import ensure_platform
    ensure_platform()
    args = ARGS.parse(1, argv)
    if args.distributed:
        M.setup_distributed()
    from hhmarl_2d_tpu.algo.ppo import compute_dtype
    cfg = ARGS.to_env_config(args, 1)
    bank = build_hl_bank(args, dtype=compute_dtype(args.compute_dtype))
    ppo = HierPPOConfig(**ARGS.ppo_kwargs(args))
    mesh = M.make_mesh(args.num_devices or None)
    n_dev = mesh.devices.size
    if ppo.num_envs % n_dev:
        raise SystemExit(f"--num_envs {ppo.num_envs} must be divisible by "
                         f"the {n_dev}-device mesh")
    trainer = CommanderPPO(cfg, ppo, bank, mesh=mesh)
    ts, env_state, obs, h = trainer.init(jax.random.PRNGKey(args.seed))

    ckpt_dir = os.path.join(args.log_path, "checkpoint")
    if args.restore:
        path = args.restore_path or ckpt_dir
        ts = CKPT.restore_train_state(path, ts)
        print(f"restored from {path}", flush=True)

    # env batch, obs and GRU carries shard over the mesh; learner replicates
    ts, env_state, obs, h = M.place_train_inputs(mesh, ts, env_state, obs, h)

    logger = MetricsLogger(args.log_path)
    tb_proc = None
    if args.tensorboard:
        import atexit
        from hhmarl_2d_tpu.utils.metrics import launch_tensorboard
        tb_proc, _ = launch_tensorboard(args.log_path)
        # terminate on ANY exit, not just the clean path (cli/train_low.py)
        atexit.register(tb_proc.terminate)
    profiler = Profiler(args.log_path) if args.profile else None
    print(f"--- training {args.log_name}: {ppo.num_envs} envs x "
          f"{ppo.rollout_len} macro-steps per iter on {n_dev} device(s) ---",
          flush=True)

    key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs + 1):
        key, k = jax.random.split(key)
        if profiler:
            profiler.maybe_start(epoch)
        ts, env_state, obs, h, metrics = with_retries(
            trainer.train_iter, ts, env_state, obs, h, k,
            on_retry=lambda a, e: print(f"transient backend error, retry {a}",
                                        flush=True))
        if profiler:
            jax.block_until_ready(metrics["reward_mean"])
            profiler.maybe_stop(epoch)
        if epoch % 10 == 0:
            m = {k2: float(v) for k2, v in metrics.items()}
            print(f"{epoch}) reward={m['reward_mean']:.3f} "
                  f"wins={int(m['agents_win'])} losses={int(m['opps_win'])} "
                  f"draws={int(m['draw'])} kl={m['kl']:.4f}", flush=True)
            logger.log(epoch, m)

        if epoch and epoch % args.checkpoint_every == 0:
            # persistent update_i, not the restarting loop epoch (orbax
            # silently skips saves to an already-existing step)
            CKPT.save_train_state(ckpt_dir, int(ts.update_i), ts)
            if args.eval and epoch % args.render_every == 0:
                rew, steps, info, trace = run_episode_highlevel(
                    cfg, trainer.model, ts.params, bank,
                    jax.random.fold_in(key, epoch))
                # persistent update counter, not the restarting loop epoch
                up = int(ts.update_i)
                png = os.path.join(args.log_path,
                                   f"Ep_{up}_It_{steps}_Rew_{round(rew, 3)}.png")
                plot_episode(trace, png, status=f"update {up} rew {rew:.2f}")
                if args.render_video:
                    from hhmarl_2d_tpu.render.plotter import render_video
                    render_video(trace, png[:-4] + ".gif",
                                 status=f"update {up}")
                print(f"  eval episode: rew={rew:.2f} macro-steps={steps}",
                      flush=True)
    logger.close()
    if tb_proc is not None:
        tb_proc.terminate()


if __name__ == "__main__":
    main()
