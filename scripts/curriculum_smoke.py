"""Miniature end-to-end curriculum run (SURVEY.md section 7 full chain).

Trains every stage briefly at real batch sizes to validate the complete
pipeline on hardware: L1-L3 scripted curriculum -> policy export -> escape
training -> self-play levels 4-5 (frozen opponents in-graph) -> commander
training on top -> batched evaluation metrics.

Usage: python scripts/curriculum_smoke.py [--iters 60] [--out DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
from hhmarl_2d_tpu.algo.ppo_hier import CommanderPPO, HierPPOConfig
from hhmarl_2d_tpu.env import config as ECfg
from hhmarl_2d_tpu.env import highlevel
from hhmarl_2d_tpu.eval import harness
from hhmarl_2d_tpu.models import policy as P
from hhmarl_2d_tpu.utils import checkpoint as CKPT


from hhmarl_2d_tpu.utils.resilience import with_retries


def _retry(fn, *a, **kw):
    return with_retries(
        fn, *a, on_retry=lambda att, e: print(
            f"[retry] transient backend error (attempt {att}): "
            f"{str(e)[:120]}", flush=True), **kw)


def train_low_stage(name, cfg, ppo, team, opp_actor, iters, seed, restore_params=None):
    tr = LowLevelPPO(cfg, ppo, team=team, opp_actor=opp_actor)
    ts, env_state, obs = tr.init(jax.random.PRNGKey(seed))
    if restore_params is not None:
        ts = ts.replace(params=restore_params)
    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for i in range(iters):
        key, k = jax.random.split(key)
        ts, env_state, obs, m = _retry(tr.train_iter, ts, env_state, obs, k)
        if i == 0:
            jax.block_until_ready(m["reward_mean"])
            print(f"[{name}] compiled in {time.time()-t0:.0f}s", flush=True)
        if i % 20 == 0 or i == iters - 1:
            print(f"[{name}] {i}: rew={float(m['reward_mean']):.3f} "
                  f"w={int(m['agents_win'])} l={int(m['opps_win'])} "
                  f"d={int(m['draw'])}", flush=True)
    print(f"[{name}] done in {time.time()-t0:.0f}s", flush=True)
    return ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--num_envs", type=int, default=512)
    ap.add_argument("--rollout_len", type=int, default=128)
    ap.add_argument("--out", type=str, default="/tmp/hhmarl/curriculum")
    ap.add_argument("--n_evals", type=int, default=256)
    ap.add_argument("--start", type=str, default="L1",
                    choices=("L1", "esc", "L4", "L5", "HL"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    pol_dir = os.path.join(args.out, "policies")

    ppo = PPOConfig(num_envs=args.num_envs, rollout_len=args.rollout_len,
                    seq_len=16, sgd_iters=4, num_minibatches=8)
    team_f = P.LowLevelTeam("fight")
    team_e = P.LowLevelTeam("escape")

    stages = ("L1", "esc", "L4", "L5", "HL")
    stage_i = stages.index(args.start)

    # --- L1 -> L2 -> L3 with restore chaining --------------------------------
    params = None
    if stage_i <= 0:
        for level in (1, 2, 3):
            cfg = ECfg.make_lowlevel_config(level=level)
            ts = train_low_stage(f"L{level}", cfg, ppo, team_f, None,
                                 args.iters, seed=level, restore_params=params)
            params = ts.params
        CKPT.export_policy(pol_dir, 3, "fight", params)
        print("[export] L3 fight", flush=True)

    # --- escape (L3 schedule: vs scripted L3 opponents) ----------------------
    if stage_i <= 1:
        cfg_esc = ECfg.make_lowlevel_config(level=3, agent_mode="escape")
        ts_esc = train_low_stage("L3esc", cfg_esc, ppo, team_e, None,
                                 args.iters // 2, seed=13)
        CKPT.export_policy(pol_dir, 3, "escape", ts_esc.params)
        print("[export] L3 escape", flush=True)

    # --- L4: vs frozen L3 ----------------------------------------------------
    f_tmpl = team_f.init(jax.random.PRNGKey(0))
    e_tmpl = team_e.init(jax.random.PRNGKey(0))
    l3 = CKPT.load_policy(pol_dir, 3, "fight", f_tmpl)
    esc3 = CKPT.load_policy(pol_dir, 3, "escape", e_tmpl)
    if params is None:
        params = l3
    if stage_i <= 2:
        bank = {"fight": CKPT.stack_fight_bank([l3, l3, l3]), "escape": esc3}
        opp_actor = P.make_frozen_opp_actor(team_f, team_e, bank)
        cfg4 = ECfg.make_lowlevel_config(level=4)
        ts4 = train_low_stage("L4", cfg4, ppo, team_f, opp_actor,
                              args.iters // 2, seed=4, restore_params=params)
        CKPT.export_policy(pol_dir, 4, "fight", ts4.params)

    # --- L5: vs sampled frozen L3/L4/escape ----------------------------------
    l4 = CKPT.load_policy(pol_dir, 4, "fight", f_tmpl)
    if stage_i <= 3:
        bank5 = {"fight": CKPT.stack_fight_bank([l3, l4, l4]), "escape": esc3}
        opp_actor5 = P.make_frozen_opp_actor(team_f, team_e, bank5)
        cfg5 = ECfg.make_lowlevel_config(level=5)
        ts5 = train_low_stage("L5", cfg5, ppo, team_f, opp_actor5,
                              args.iters // 2, seed=5, restore_params=l4)
        CKPT.export_policy(pol_dir, 5, "fight", ts5.params)
    l5 = CKPT.load_policy(pol_dir, 5, "fight", f_tmpl)

    # --- commander on top ----------------------------------------------------
    cfg_hl = ECfg.make_highlevel_config()
    hl_bank = highlevel.make_hl_bank(team_f, team_e, l5, esc3)
    hppo = HierPPOConfig(num_envs=128, rollout_len=32, seq_len=8,
                         sgd_iters=4, num_minibatches=4)
    trainer = CommanderPPO(cfg_hl, hppo, hl_bank)
    ts_c, env_state, obs, h = trainer.init(jax.random.PRNGKey(42))
    key = jax.random.PRNGKey(43)
    t0 = time.time()
    for i in range(args.iters // 2):
        key, k = jax.random.split(key)
        ts_c, env_state, obs, h, m = _retry(
            trainer.train_iter, ts_c, env_state, obs, h, k)
        if i == 0:
            jax.block_until_ready(m["reward_mean"])
            print(f"[HL] compiled in {time.time()-t0:.0f}s", flush=True)
        if i % 10 == 0 or i == args.iters // 2 - 1:
            print(f"[HL] {i}: rew={float(m['reward_mean']):.3f} "
                  f"w={int(m['agents_win'])} l={int(m['opps_win'])} "
                  f"d={int(m['draw'])}", flush=True)

    # --- batched evaluation --------------------------------------------------
    t0 = time.time()
    stats = harness.evaluate_highlevel(
        cfg_hl, trainer.model, ts_c.params, hl_bank, args.n_evals,
        jax.random.PRNGKey(77), eval_hl=True)
    evals = harness.postprocess_eval(
        stats, args.n_evals, os.path.join(args.out, "Metrics_smoke.json"))
    print(f"[eval] {args.n_evals} episodes in {time.time()-t0:.0f}s:",
          json.dumps({k: round(v, 2) for k, v in evals.items()}), flush=True)
    print("[eval] finished episodes:", stats["finished"], flush=True)
    print("CURRICULUM SMOKE COMPLETE", flush=True)


if __name__ == "__main__":
    main()
