"""Single-episode rollouts for rendering and qualitative evaluation.

Equivalent of the reference's ``evaluate`` helpers (train_hetero.py:55-96,
train_hier.py:52-90): greedy policies, one episode, returning the reward
sum and a host-side EpisodeTrace for the PNG renderer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hhmarl_2d_tpu.env import highlevel, lowlevel
from hhmarl_2d_tpu.models.commander import GRU_SIZE
from hhmarl_2d_tpu.render.plotter import EpisodeTrace


def _record(sim):
    return dict(lat=sim.lat, lon=sim.lon, heading=sim.heading,
                alive=sim.alive, m_lat=sim.m_lat, m_lon=sim.m_lon,
                m_alive=sim.m_alive, m_heading=sim.m_heading,
                cannon_burst=sim.cannon_burst, ac_type=sim.ac_type)


def _to_trace(cfg, rec, done_t, frame_unit="s"):
    """Trim the scan recording at the first done step."""
    T = int(done_t) + 1
    return EpisodeTrace(
        lat=np.asarray(rec["lat"])[:T], lon=np.asarray(rec["lon"])[:T],
        heading=np.asarray(rec["heading"])[:T],
        alive=np.asarray(rec["alive"])[:T],
        m_lat=np.asarray(rec["m_lat"])[:T], m_lon=np.asarray(rec["m_lon"])[:T],
        m_alive=np.asarray(rec["m_alive"])[:T],
        cannon_burst=np.asarray(rec["cannon_burst"])[:T],
        num_agents=cfg.num_agents, map_size=cfg.map_size,
        ac_type=np.asarray(rec["ac_type"])[0],
        m_heading=np.asarray(rec["m_heading"])[:T],
        frame_unit=frame_unit)


def run_episode_lowlevel(cfg, team, params, key, opp_actor=None,
                         greedy=True):
    """Returns (total_reward, steps, info_at_end, EpisodeTrace)."""
    from hhmarl_2d_tpu.models.policy import mate_onehot
    na = cfg.num_agents

    def step_fn(carry, k):
        st, obs, acc, done_seen = carry
        k_act, k_env = jax.random.split(k)
        if cfg.num_agents == 2:
            actions, _, _, _ = team.act(params, obs[None], k_act,
                                        greedy=greedy)
        else:
            actions, _, _, _ = team.act_k(
                params, obs[None], (st.sim.ac_type[:na] == 1)[None],
                mate_onehot(st.tmate, na)[None], k_act, greedy=greedy)
        st2, obs2, rew, done, info = lowlevel.step(cfg, st, actions[0], k_env,
                                                   opp_actor)
        # freeze after first done (no auto-reset in the recording)
        keep = ~done_seen
        st = jax.tree_util.tree_map(
            lambda a, b: jnp.where(jnp.reshape(keep, (1,) * a.ndim)
                                   if a.ndim else keep, b, a), st, st2)
        obs = jnp.where(keep, obs2, obs)
        acc = acc + jnp.where(keep, jnp.sum(rew), 0.0)
        out = _record(st.sim)
        out["done"] = done_seen | done
        out["info"] = info
        return (st, obs, acc, done_seen | done), out

    st, obs = lowlevel.reset(cfg, key)
    keys = jax.random.split(jax.random.fold_in(key, 1), cfg.horizon)
    (st, obs, acc, _), rec = jax.lax.scan(
        step_fn, (st, obs, jnp.asarray(0.0), jnp.asarray(False)), keys)
    done_t = int(jnp.argmax(rec["done"]))
    info = {k: int(v[done_t]) for k, v in rec["info"].items()}
    return float(acc), done_t + 1, info, _to_trace(cfg, rec, done_t)


def run_episode_highlevel(cfg, model, params, bank, key, greedy=True,
                          fixed_action=None, max_macro=None):
    """Commander episode with GRU state threading (evaluation.py:39-56).

    fixed_action: when set (e.g. 1), bypasses the commander and always
    picks that action -- the eval_hl=False path (evaluation.py:50-52).
    """
    na = cfg.num_agents
    max_macro = max_macro or cfg.horizon  # macro steps upper bound

    def step_fn(carry, k):
        st, obs, h, acc, done_seen = carry
        k_act, k_env = jax.random.split(k)
        if fixed_action is None:
            logits, _, h_new = _commander_forward(model, params, obs, h, na)
            a = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            a = jnp.full((na,), fixed_action, jnp.int32)
            h_new = h
        st2, obs2, rew, done, info = highlevel.step(cfg, st, a, bank, k_env)
        keep = ~done_seen
        st = jax.tree_util.tree_map(
            lambda x, y: jnp.where(jnp.reshape(keep, (1,) * x.ndim)
                                   if x.ndim else keep, y, x), st, st2)
        obs = jnp.where(keep, obs2, obs)
        h = jnp.where(keep, h_new, h)
        acc = acc + jnp.where(keep, jnp.sum(rew), 0.0)
        out = _record(st.sim)
        out["done"] = done_seen | done
        out["info"] = jax.tree_util.tree_map(
            lambda v: jnp.where(keep, v, 0), info)
        return (st, obs, h, acc, done_seen | done), out

    st, obs = highlevel.reset(cfg, key)
    h = jnp.zeros((na, 2, GRU_SIZE))
    keys = jax.random.split(jax.random.fold_in(key, 1), max_macro)
    (st, obs, h, acc, _), rec = jax.lax.scan(
        step_fn, (st, obs, h, jnp.asarray(0.0), jnp.asarray(False)), keys)
    done_t = int(jnp.argmax(rec["done"]))
    infos = {k: np.asarray(v)[:done_t + 1].sum() for k, v in rec["info"].items()}
    return float(acc), done_t + 1, infos, _to_trace(cfg, rec, done_t,
                                                    frame_unit="macro")


def _commander_forward(model, params, obs, h, na):
    """Single-step shared-policy forward for all agents (batch of 1)."""
    logits, h_new = [], []
    for i in range(na):
        others = [j for j in range(na) if j != i]
        obs_o = jnp.stack([obs[None, None, j] for j in others], axis=2)
        lg, v, (ha, hv) = model.apply(
            params, obs[None, None, i], obs_o, jnp.zeros((1, 1, 1)),
            jnp.zeros((1, 1, na - 1, 1)), h[None, i, 0], h[None, i, 1])
        logits.append(lg[0, 0])
        h_new.append(jnp.stack([ha[0], hv[0]]))
    return jnp.stack(logits), None, jnp.stack(h_new)
