"""Policy wrappers: team acting, CTDE critic inputs, frozen opponents.

Replaces three reference subsystems at once:
 * RLlib policy mapping agent_id -> ac{id}_policy (train_hetero.py:240)
 * the ``central_critic_observer`` + ``on_postprocess_trajectory`` CTDE
   plumbing (train_hetero.py:113-181) -- here critic inputs are assembled
   directly in the rollout, no post-hoc batch mutation
 * the ``.pt`` export / manual ``_policy_actions`` inference path
   (env_base.py:312-398) -- frozen opponents are param pytrees evaluated
   in-graph with greedy argmax decoding.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from hhmarl_2d_tpu import constants as C
from hhmarl_2d_tpu.algo import distributions as D
from hhmarl_2d_tpu.env import obs as O
from hhmarl_2d_tpu.models import hetero


def _nvec(ac_type):
    return D.NVEC_AC1 if ac_type == 1 else D.NVEC_AC2


def norm_actions(actions, ac_type):
    """Normalized action columns the critic sees (train_hetero.py:140-160):
    [a0/12, a1/8, a2] (+ [a3] for AC1)."""
    a = actions.astype(jnp.float32)
    cols = [a[..., 0] / 12.0, a[..., 1] / 8.0, a[..., 2]]
    if ac_type == 1:
        cols.append(a[..., 3])
    return jnp.stack(cols, axis=-1)


class LowLevelTeam:
    """The two-policy team of the low-level stage.

    In the reference's 2-vs-2 setup the policy mapping is fixed: slot 0 is
    AC1, slot 1 is AC2 (train_hetero.py:240) -- ``forward``/``act`` keep
    that exact (and cheaper) path.  For k-vs-m teams, spawn assigns random
    aircraft types to slots >= 2 per episode (env_base.py:560), so
    ``forward_k``/``act_k`` evaluate BOTH type models on every slot's
    padded obs row and select by the slot's ac_type -- the same pattern
    the commander env uses for its embedded policies
    (greedy_actor_mixed); the CTDE critic pairs each slot with
    the teammate of its obs row (closest alive, env/obs.py).
    """

    def __init__(self, mode: str, num_agents: int = 2, dtype=None):
        self.mode = mode
        self.num_agents = num_agents
        # dtype = computation dtype (None = fp32; jnp.bfloat16 for the MXU
        # fast path).  Params are fp32 either way, so frozen stores load
        # into teams of any compute dtype.
        self.dtype = dtype
        self.models = {1: hetero.make_lowlevel_model(mode, 1, dtype),
                       2: hetero.make_lowlevel_model(mode, 2, dtype)}
        self.obs_dim = {t: hetero.obs_slices(mode, t)[0] for t in (1, 2)}

    def init(self, key) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        params = {}
        for t, k in ((1, k1), (2, k2)):
            d_own, d_other, a_own, a_other = hetero.obs_slices(self.mode, t)
            params[f"ac{t}"] = self.models[t].init(
                k, jnp.zeros((1, 1, d_own)), jnp.zeros((1, 1, d_other)),
                jnp.zeros((1, 1, a_own)), jnp.zeros((1, 1, a_other)))
        return params

    def _apply(self, params, t, obs_own, obs_other, act_own, act_other,
               seg=None):
        return self.models[t].apply(params[f"ac{t}"], obs_own, obs_other,
                                    act_own, act_other, seg)

    def forward(self, params, obs_pad, act_norm=None, seg=None):
        """Evaluate both slots on [B, T, 2, OBS_PAD] padded team obs.

        act_norm: optional normalized actions [B, T, 2, 4] for the critic
        (training); zeros during rollout (the reference's observer fills
        zeros pre-postprocessing, train_hetero.py:171-178).
        Returns (logits [B,T,2,26-pad], values [B,T,2]).
        """
        B, T = obs_pad.shape[0], obs_pad.shape[1]
        if act_norm is None:
            act_norm = jnp.zeros((B, T, 2, 4), jnp.float32)
        d1, d2 = self.obs_dim[1], self.obs_dim[2]
        obs1, obs2 = obs_pad[..., 0, :d1], obs_pad[..., 1, :d2]
        act1, act2 = act_norm[..., 0, :4], act_norm[..., 1, :3]
        logits1, v1 = self._apply(params, 1, obs1, obs2, act1, act2, seg)
        logits2, v2 = self._apply(params, 2, obs2, obs1, act2, act1, seg)
        logits2 = jnp.pad(logits2, ((0, 0), (0, 0), (0, hetero.ACT_LOGITS_AC1
                                                     - hetero.ACT_LOGITS_AC2)))
        return (jnp.stack([logits1, logits2], axis=2),
                jnp.stack([v1, v2], axis=2))

    def act(self, params, obs_pad, key, greedy=False):
        """Rollout acting on [B, 2, OBS_PAD] (T=1 internally).

        Returns (actions [B,2,4] int32, log_prob [B,2], value [B,2],
        logits [B,2,26]) -- logits are kept for the analytic KL penalty.
        """
        logits, values = self.forward(params, obs_pad[:, None])
        logits, values = logits[:, 0], values[:, 0]
        k1, k2 = jax.random.split(key)
        out_a, out_lp = [], []
        for slot, (t, k) in enumerate(((1, k1), (2, k2))):
            nv = _nvec(t)
            lg = logits[:, slot, :sum(nv)]
            a = D.mode(lg, nv) if greedy else D.sample(lg, nv, k)
            lp = D.log_prob(lg, nv, a)
            out_a.append(D.pad_actions(a))
            out_lp.append(lp)
        return (jnp.stack(out_a, axis=1), jnp.stack(out_lp, axis=1), values,
                logits)

    # --- generalized k-slot paths (n-vs-m teams) ---------------------------

    def forward_k(self, params, obs_pad, ac1, mate_oh, act_norm=None,
                  seg=None):
        """Evaluate k mixed-type slots: both type models run on every
        slot's row, outputs selected by the slot's type.

        obs_pad  [B, T, k, OBS_PAD] padded team obs rows
        ac1      [B, T, k] bool: slot's ac_type == 1
        mate_oh  [B, T, k, k] one-hot of each slot's teammate (zero row
                 when there is none -> zero critic 'other' inputs, like
                 the reference's zero rows for dead partners)
        act_norm optional [B, T, k, 4] normalized actions for the critic
        Returns (logits [B,T,k,26], values [B,T,k]).

        The teammate's obs/action columns are sliced (or zero-padded) to
        the d_other/a_other widths the own-type critic tower expects --
        exact when the teammate is the opposite type (the only case in the
        reference's 2-vs-2), a fixed-width feature view when a random
        k-team pairs same-type slots.
        """
        B, T, k = obs_pad.shape[:3]
        if act_norm is None:
            act_norm = jnp.zeros((B, T, k, 4), jnp.float32)
        act_norm = D.pad_actions(act_norm)
        obs_mate = jnp.einsum("btks,btsd->btkd", mate_oh, obs_pad)
        act_mate = jnp.einsum("btks,btsd->btkd", mate_oh, act_norm)

        def fold(x):  # [B, T, k, d] -> [B*k, T, d] (time stays axis 1)
            return jnp.moveaxis(x, 2, 1).reshape((B * k, T) + x.shape[3:])

        seg_k = None
        if seg is not None:
            seg_k = jnp.broadcast_to(seg[:, None, :], (B, k, T))
            seg_k = seg_k.reshape(B * k, T)

        outs = {}
        for t in (1, 2):
            d_own, d_other, a_own, a_other = hetero.obs_slices(self.mode, t)
            logits, v = self._apply(
                params, t, fold(obs_pad)[..., :d_own],
                fold(obs_mate)[..., :d_other],
                fold(act_norm)[..., :a_own], fold(act_mate)[..., :a_other],
                seg_k)
            pad = hetero.ACT_LOGITS_AC1 - logits.shape[-1]
            if pad:
                logits = jnp.pad(logits, ((0, 0), (0, 0), (0, pad)))
            outs[t] = (
                jnp.swapaxes(logits.reshape(B, k, T, -1), 1, 2),
                jnp.swapaxes(v.reshape(B, k, T), 1, 2))
        return (jnp.where(ac1[..., None], outs[1][0], outs[2][0]),
                jnp.where(ac1, outs[1][1], outs[2][1]))

    def act_k(self, params, obs_pad, ac1, mate_oh, key, greedy=False):
        """Rollout acting for k mixed-type slots on [B, k, OBS_PAD].

        Returns (actions [B,k,4], log_prob [B,k], value [B,k],
        logits [B,k,26]); AC2 slots carry zero-padded 3-component actions.
        """
        logits, values = self.forward_k(
            params, obs_pad[:, None], ac1[:, None], mate_oh[:, None])
        logits, values = logits[:, 0], values[:, 0]
        k1, k2 = jax.random.split(key)
        w1, w2 = sum(D.NVEC_AC1), sum(D.NVEC_AC2)
        lg1, lg2 = logits[..., :w1], logits[..., :w2]
        a1 = D.mode(lg1, D.NVEC_AC1) if greedy else D.sample(lg1, D.NVEC_AC1, k1)
        a2 = D.mode(lg2, D.NVEC_AC2) if greedy else D.sample(lg2, D.NVEC_AC2, k2)
        a = jnp.where(ac1[..., None], D.pad_actions(a1), D.pad_actions(a2))
        lp = jnp.where(ac1,
                       D.log_prob(lg1, D.NVEC_AC1, a[..., :len(D.NVEC_AC1)]),
                       D.log_prob(lg2, D.NVEC_AC2, a[..., :len(D.NVEC_AC2)]))
        return a, lp, values, logits


def mate_onehot(tmate, num_agents):
    """[..., k] teammate slot indices (-1 = none) -> [..., k, k] one-hot
    rows (zero row for -1)."""
    return (tmate[..., None] == jnp.arange(num_agents)).astype(jnp.float32)


def static_slot_types(sizes):
    """Trace-time slot types for consecutive groups of ``sizes``: spawn
    pins the first two slots of each group to types 1, 2 and randomizes
    the rest per episode (env_base.py:560 / env/spawn.py).  0 = unknown."""
    out = []
    for sz in sizes:
        out.extend([1, 2][:min(2, sz)] + [0] * max(0, sz - 2))
    return tuple(out)


def greedy_actor_mixed(team: LowLevelTeam, params, rows, ac1,
                       static_types=None):
    """Greedy actor-only decode of [m, OBS_PAD] padded rows.

    Replaces the evaluate-both-types-everywhere pattern: slots whose
    aircraft type is pinned at trace time (``static_types`` entry 1 or 2)
    run ONLY their own type model; unknown slots (entry 0) run both and
    select by the runtime ``ac1`` mask.  With the critic tower skipped
    (actor_only) this cuts embedded frozen-bank inference to ~1/3 of the
    both-types-both-towers cost at 3-vs-3.  Logits are bit-identical to
    the unfused path.  Returns acts [m, 4] (AC2 rows zero-padded).
    """
    m = rows.shape[0]
    if static_types is None:
        static_types = (0,) * m
    assert len(static_types) == m, (static_types, m)
    acts = {}
    for t in (1, 2):
        idx = [i for i, st in enumerate(static_types) if st in (0, t)]
        if not idx:
            acts[t] = jnp.zeros((m, 4), jnp.int32)
            continue
        d_own = hetero.obs_slices(team.mode, t)[0]
        if len(idx) == m:
            sub = rows[:, None, :d_own]
        else:
            sub = rows[jnp.asarray(idx)][:, None, :d_own]
        logits, _ = team.models[t].apply(params[f"ac{t}"], sub,
                                         actor_only=True)
        a = D.pad_actions(D.mode(logits[:, 0], _nvec(t)))
        if len(idx) == m:
            acts[t] = a
        else:
            acts[t] = jnp.zeros((m, 4), jnp.int32).at[jnp.asarray(idx)].set(a)
    st = jnp.asarray(static_types)
    use1 = jnp.where(st == 0, ac1, st == 1)
    return jnp.where(use1[:, None], acts[1], acts[2])


def make_frozen_opp_actor(opp_team_fight: LowLevelTeam,
                          opp_team_esc: LowLevelTeam,
                          bank: Dict[str, Any]):
    """Build the OppActor for curriculum levels 4-5.

    ``bank`` holds frozen params:
      - "fight": pytree stacked over levels [L3, L4, L5] on the leading
        axis (duplicate entries for levels not yet trained).  Level-4
        training uses L3 (opp_level is pinned to 3 at reset); level-5 fight
        training samples opp_level in {3,4,5} per episode
        (env_base.py:318-328); escape training plays vs L5 fight
        (env_base.py:329-331).
      - "escape": single escape param set (used when opp_level == 5 in
        fight mode).

    The actor computes opponent observations in-graph and decodes greedily
    (argmax of each categorical), matching _policy_actions
    (env_base.py:373-382).
    """

    def actor(cfg, sim, opp_level, key, geom=None):
        del key  # greedy decode
        n, na = cfg.n_slots, cfg.num_agents
        idx = jnp.clip(opp_level - 3, 0, 2)
        fight_params = jax.tree_util.tree_map(lambda x: x[idx], bank["fight"])

        obs_f, tgt_f, _ = O.lowlevel_side_obs(cfg, sim, "fight", "opp", geom)
        obs_e, tgt_e, _ = O.lowlevel_side_obs(cfg, sim, "esc", "opp", geom)

        # spawn pins opp slots na, na+1 to types 1, 2; slots >= 2 carry
        # per-episode random types -- only those run both type models
        ac1_opp = sim.ac_type[na:] == 1
        st = static_slot_types([cfg.num_opps])

        def team_actions(team, params, obs_side):
            return greedy_actor_mixed(team, params, obs_side, ac1_opp, st)

        acts_f = team_actions(opp_team_fight, fight_params, obs_f)
        acts_e = team_actions(opp_team_esc, bank["escape"], obs_e)

        # escape opponents only exist in fight-mode L5 episodes; escape
        # training always faces L5 *fight* opponents (env_base.py:329-331)
        if cfg.agent_mode == "fight":
            use_esc = opp_level == 5
        else:
            use_esc = jnp.asarray(False)
        acts = jnp.where(use_esc, acts_e, acts_f)
        tgts = jnp.where(use_esc, tgt_e, tgt_f)

        full_acts = jnp.zeros((n, 4), jnp.int32).at[na:].set(acts)
        full_tgts = jnp.full((n,), -1, jnp.int32).at[na:].set(tgts)
        return full_acts, full_tgts

    return actor
