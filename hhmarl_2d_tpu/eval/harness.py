"""Batched n-vs-m evaluation producing the reference's metrics JSON.

Replaces /root/reference/evaluation.py: instead of 1000 sequential
episodes, all episodes run as one vmapped batch on device; per-step eval
info counters (env_base.py:91-107) accumulate in-graph and are
post-processed into the same ``Metrics_*.json`` schema
(evaluation.py:66-82): win/lose/draw %, fight/escape usage %, and
per-opponent selection %.
"""

from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hhmarl_2d_tpu.env import highlevel
from hhmarl_2d_tpu.models.commander import GRU_SIZE
from hhmarl_2d_tpu.eval.episodes import _commander_forward

BASE_STAT_KEYS = ("agents_win", "opps_win", "draw", "agent_fight",
                  "agent_escape", "opp_fight", "opp_escape", "agent_steps",
                  "opp_steps")


def stat_keys(cfg):
    """Counter names incl. one opp{k} selection counter per commander
    target (the reference hardcodes opp1-3, evaluation.py:58)."""
    return BASE_STAT_KEYS + tuple(
        f"opp{k}" for k in range(1, max(3, cfg.n_opp_hl) + 1))

def max_macro_steps(cfg) -> int:
    """Upper bound on commander macro-steps per episode: every macro action
    runs at least HL_MIN_SUB_STEPS+1 ticks unless it ends in a kill/OOB
    event, and there are at most n_slots such events per episode (each
    aircraft dies at most once)."""
    from hhmarl_2d_tpu import constants as C
    return (-(-cfg.horizon // (C.HL_MIN_SUB_STEPS + 1))
            + cfg.n_slots + 2)


def evaluate_highlevel(cfg, model, params, bank, n_episodes: int, key,
                       eval_hl: bool = True,
                       fixed_action: int = 1,
                       chunk_size: int = 256,
                       fight_ratio=None):
    """Run ``n_episodes`` commander episodes in lockstep.

    eval_hl=False bypasses the commander and always assigns the closest
    opponent (evaluation.py:50-52).  Episodes run in vmapped chunks of
    ``chunk_size`` so arbitrarily large sweeps fit in bounded device
    memory (the jitted chunk program is compiled once and reused).
    The opponent commander's fight probability is a *traced* input, so
    ratio sweeps (and CLI runs with different --hier_opp_fight_ratio)
    reuse the same compiled chunk program.
    Returns the accumulated eval_stats dict (plus total_n_actions).
    """
    na = cfg.num_agents
    keys_stat = stat_keys(cfg)
    if fight_ratio is None:
        fight_ratio = cfg.hier_opp_fight_ratio / 100.0

    def one_episode(k, fr):
        st, obs = highlevel.reset(cfg, k)
        h = jnp.zeros((na, 2, GRU_SIZE))

        def step_fn(carry, kk):
            st, obs, h, done_seen, stats, n_actions = carry
            if eval_hl:
                logits, _, h_new = _commander_forward(model, params, obs, h, na)
                a = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                a = jnp.full((na,), fixed_action, jnp.int32)
                h_new = h
            st2, obs2, rew, done, info = highlevel.step(cfg, st, a, bank, kk,
                                                        fight_ratio=fr)
            keep = ~done_seen
            st = jax.tree_util.tree_map(
                lambda x, y: jnp.where(jnp.reshape(keep, (1,) * x.ndim)
                                       if x.ndim else keep, y, x), st, st2)
            obs = jnp.where(keep, obs2, obs)
            h = jnp.where(keep, h_new, h)
            stats = {kname: stats[kname] + jnp.where(keep, info[kname], 0)
                     for kname in keys_stat}
            n_actions = n_actions + keep.astype(jnp.int32)
            return (st, obs, h, done_seen | done, stats, n_actions), None

        stats0 = {kname: jnp.asarray(0, jnp.int32) for kname in keys_stat}
        keys = jax.random.split(jax.random.fold_in(k, 1), max_macro_steps(cfg))
        (st, obs, h, done, stats, n_actions), _ = jax.lax.scan(
            step_fn, (st, obs, h, jnp.asarray(False), stats0,
                      jnp.asarray(0, jnp.int32)), keys)
        stats["total_n_actions"] = n_actions
        stats["finished"] = done.astype(jnp.int32)
        return stats

    chunk = max(1, min(chunk_size, n_episodes))
    n_chunks = -(-n_episodes // chunk)            # ceil; tail keys ignored
    keys = jax.random.split(key, n_chunks * chunk)
    keys = keys.reshape((n_chunks, chunk) + keys.shape[1:])
    run = jax.jit(jax.vmap(one_episode, in_axes=(0, None)))
    fr = jnp.asarray(fight_ratio, jnp.float32)
    totals = None
    used = 0
    for c in range(n_chunks):
        take = min(chunk, n_episodes - used)
        stats = jax.device_get(run(keys[c], fr))
        part = {k: int(np.asarray(v)[:take].sum()) for k, v in stats.items()}
        totals = part if totals is None else {
            k: totals[k] + part[k] for k in part}
        used += take
    return totals


def sweep_fight_ratio(cfg, model, params, bank, n_episodes: int, key,
                      ratios=(0, 25, 50, 75, 100), eval_hl: bool = True,
                      chunk_size: int = 256):
    """hier_opp_fight_ratio sweep: one full evaluation per opponent-mix
    ratio (the knob of config.py:23 / README.md:44).  The ratio is a
    traced input of the chunk program, so the whole sweep shares one
    compile.  Returns {ratio: postprocessed metrics}."""
    table = {}
    for r in ratios:
        stats = evaluate_highlevel(cfg, model, params, bank, n_episodes,
                                   jax.random.fold_in(key, int(r)),
                                   eval_hl=eval_hl, chunk_size=chunk_size,
                                   fight_ratio=int(r) / 100.0)
        table[int(r)] = postprocess_eval(stats, n_episodes)
    return table


def postprocess_eval(ev: dict, n_evals: int,
                     eval_file: Optional[str] = None) -> dict:
    """evaluation.py:66-82."""
    def pct(a, b):
        return (a / b) * 100 if b else 0.0

    evals = {
        "win": pct(ev["agents_win"], n_evals),
        "lose": pct(ev["opps_win"], n_evals),
        "draw": pct(ev["draw"], n_evals),
        "fight": pct(ev["agent_fight"], ev["agent_steps"]),
        "esc": pct(ev["agent_escape"], ev["agent_steps"]),
        "fight_opp": pct(ev["opp_fight"], ev["opp_steps"]),
        "esc_opp": pct(ev["opp_escape"], ev["opp_steps"]),
    }
    for k in sorted(int(x[3:]) for x in ev if x.startswith("opp")
                    and x[3:].isdigit()):
        evals[f"opp{k}"] = pct(ev[f"opp{k}"], ev["agent_fight"])
    if eval_file:
        with open(eval_file, "w") as f:
            json.dump(evals, f, indent=3)
    return evals
