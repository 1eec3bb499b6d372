"""Low-level heterogeneous training driver.

Replaces /root/reference/train_hetero.py: curriculum levels 1-5 with
cross-level restore chaining, periodic checkpoints, frozen policy export
(from level 3 on) for fictitious self-play, and rendered evaluation
episodes.

Usage: python -m hhmarl_2d_tpu.cli.train_low --level 1 [--epochs N ...]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
from hhmarl_2d_tpu.cli import args as ARGS
from hhmarl_2d_tpu.eval.episodes import run_episode_lowlevel
from hhmarl_2d_tpu.models import policy as P
from hhmarl_2d_tpu.parallel import mesh as M
from hhmarl_2d_tpu.render.plotter import plot_episode
from hhmarl_2d_tpu.utils import checkpoint as CKPT
from hhmarl_2d_tpu.utils.metrics import MetricsLogger, Profiler
from hhmarl_2d_tpu.utils.resilience import with_retries


def build_opp_actor(args, team_fight_tmpl, team_esc_tmpl):
    """Assemble the frozen-policy bank for levels 4-5
    (_get_policies LowLevel, env_base.py:318-331)."""
    if args.level < 4:
        return None
    # --opp_policy_dir: face a DIFFERENT frozen store than the one this
    # run exports into (self-play iteration: opponents stay pinned to the
    # previous bank while checkpoints refresh the new store's L5 entry)
    root = args.opp_policy_dir or args.policy_dir
    f_tmpl = team_fight_tmpl.init(jax.random.PRNGKey(0))
    e_tmpl = team_esc_tmpl.init(jax.random.PRNGKey(0))

    def load_fight(level, fallback):
        # a level not yet trained is normal curriculum chaining; any other
        # failure (corrupted store) must fail loudly
        try:
            return CKPT.load_policy(root, level, "fight", f_tmpl)
        except FileNotFoundError:
            return fallback

    l3 = load_fight(3, None)
    if l3 is None:
        raise FileNotFoundError(
            f"level {args.level} needs exported L3 fight policies in {root}")
    l4 = load_fight(4, l3)
    l5 = load_fight(5, l4)
    if args.agent_mode == "escape":
        # escape-vs-L5-fight (env_base.py:329-331)
        fight_bank = CKPT.stack_fight_bank([l5, l5, l5])
    else:
        fight_bank = CKPT.stack_fight_bank([l3, l4, l5])
    try:
        esc = CKPT.load_policy(root, 3, "escape", e_tmpl)
    except FileNotFoundError:
        esc = e_tmpl  # L5-fight only; untrained escape fallback
    bank = {"fight": fight_bank, "escape": esc}
    return P.make_frozen_opp_actor(team_fight_tmpl, team_esc_tmpl, bank)


def main(argv=None):
    from hhmarl_2d_tpu.utils.platform import ensure_platform
    ensure_platform()
    args = ARGS.parse(0, argv)
    if args.distributed:
        M.setup_distributed()
    cfg = ARGS.to_env_config(args, 0)
    ppo = PPOConfig(adv_std=args.adv_std, mask_dead=args.mask_dead,
                    **ARGS.ppo_kwargs(args))

    # rollout data-parallelism (SURVEY.md section 2 #20-21): env batch
    # sharded over the data mesh, learner replicated, gradient psum by XLA
    mesh = M.make_mesh(args.num_devices or None)
    n_dev = mesh.devices.size
    if ppo.num_envs % n_dev:
        raise SystemExit(f"--num_envs {ppo.num_envs} must be divisible by "
                         f"the {n_dev}-device mesh")

    from hhmarl_2d_tpu.algo.ppo import compute_dtype
    dt = compute_dtype(args.compute_dtype)
    team = P.LowLevelTeam(args.agent_mode, args.num_agents, dtype=dt)
    team_fight = team if args.agent_mode == "fight" \
        else P.LowLevelTeam("fight", dtype=dt)
    team_esc = team if args.agent_mode == "escape" \
        else P.LowLevelTeam("escape", dtype=dt)
    opp_actor = build_opp_actor(args, team_fight, team_esc)

    trainer = LowLevelPPO(cfg, ppo, team=team, opp_actor=opp_actor, mesh=mesh)
    ts, env_state, obs = trainer.init(jax.random.PRNGKey(args.seed))

    ckpt_dir = os.path.join(args.log_path, "checkpoint")
    if args.restore:
        path = args.restore_path or ckpt_dir
        ts = CKPT.restore_train_state(path, ts)
        print(f"restored from {path}", flush=True)
    elif args.init_from_policies:
        # warm-start from an exported frozen bank (fresh optimizer/KL):
        # the self-play-iteration path when only policy params survive,
        # e.g. continuing from the committed deploy/policies store
        ts = ts.replace(params=CKPT.load_policy(
            args.policy_dir, args.init_from_policies, args.agent_mode,
            ts.params))
        print(f"params warm-started from {args.policy_dir} "
              f"L{args.init_from_policies}_{args.agent_mode}", flush=True)

    # place AFTER restore so restored arrays get the mesh shardings too
    ts, env_state, obs = M.place_train_inputs(mesh, ts, env_state, obs)

    logger = MetricsLogger(args.log_path)
    tb_proc = None
    if args.tensorboard:
        import atexit
        from hhmarl_2d_tpu.utils.metrics import launch_tensorboard
        tb_proc, _ = launch_tensorboard(args.log_path)
        # terminate on ANY exit (incl. raised training errors / exhausted
        # retries), not just the clean path -- an orphaned server would
        # keep serving a dead run
        atexit.register(tb_proc.terminate)
    profiler = Profiler(args.log_path) if args.profile else None
    print(f"--- training {args.log_name}: level {args.level} "
          f"{args.agent_mode}, {ppo.num_envs} envs x {ppo.rollout_len} steps "
          f"per iter on {n_dev} device(s) ---", flush=True)

    key = jax.random.PRNGKey(args.seed + 1)
    t_acc = 0.0
    for epoch in range(args.epochs + 1):
        key, k = jax.random.split(key)
        t0 = time.time()
        if profiler:
            profiler.maybe_start(epoch)
        ts, env_state, obs, metrics = with_retries(
            trainer.train_iter, ts, env_state, obs, k,
            on_retry=lambda a, e: print(f"transient backend error, retry {a}",
                                        flush=True))
        if epoch == 0 or profiler:
            jax.block_until_ready(metrics["reward_mean"])
        if profiler:
            profiler.maybe_stop(epoch)
        t_acc += time.time() - t0

        if epoch % 10 == 0:
            m = {k2: float(v) for k2, v in metrics.items()}
            sps = ppo.num_envs * ppo.rollout_len * (epoch + 1) / max(t_acc, 1e-9)
            print(f"{epoch}) reward={m['reward_mean']:.3f} "
                  f"wins={int(m['agents_win'])} losses={int(m['opps_win'])} "
                  f"draws={int(m['draw'])} kl={m['kl_1']:.4f} "
                  f"| {sps:,.0f} steps/s", flush=True)
            logger.log(epoch, m)

        if epoch and epoch % args.checkpoint_every == 0:
            # number checkpoints by the TrainState's persistent update
            # counter, not the loop epoch: a restored run's epochs restart
            # at 0 and orbax silently skips saves to an existing step
            CKPT.save_train_state(ckpt_dir, int(ts.update_i), ts)
            if args.level >= 3 and args.num_agents == 2:
                # the L{level}_AC{i}_{mode} policy store feeds the 2-vs-2
                # self-play chain and the commander bank; an n-vs-m run
                # exporting under the same names would silently replace
                # the curriculum's frozen opponents
                CKPT.export_policy(args.policy_dir, args.level,
                                   args.agent_mode, ts.params)
            if args.eval and epoch % args.render_every == 0:
                rew, steps, info, trace = run_episode_lowlevel(
                    cfg, team, ts.params, jax.random.fold_in(key, epoch),
                    opp_actor)
                # name renders by the persistent update counter (like the
                # checkpoints): a restored run's loop epochs restart at 0
                # and would overwrite the earlier run's renders
                up = int(ts.update_i)
                png = os.path.join(
                    args.log_path,
                    f"Ep_{up}_It_{steps}_Lv{args.level}_Rew_{round(rew, 3)}.png")
                plot_episode(trace, png, status=f"update {up} rew {rew:.2f}")
                if args.render_video:
                    from hhmarl_2d_tpu.render.plotter import render_video
                    render_video(trace, png[:-4] + ".gif",
                                 status=f"epoch {epoch}")
                print(f"  eval episode: rew={rew:.2f} steps={steps} -> {png}",
                      flush=True)
    logger.close()
    if tb_proc is not None:
        tb_proc.terminate()


if __name__ == "__main__":
    main()
