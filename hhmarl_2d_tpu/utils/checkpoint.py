"""Checkpoint / resume and the frozen-policy store.

Replaces two reference subsystems (SURVEY.md section 5):
 * RLlib ``algo.save()`` / ``algo.restore`` every 50 epochs with cross-level
   restore chaining (train_hetero.py:98-107,253-257, config.py:65-84)
   -> Orbax checkpoints of the full TrainState.
 * the ``.pt`` torch policy export consumed by in-env self-play
   (policy_export.py, env_base.py:312-347) -> a frozen-params pytree store
   saved per (level, ac_type, mode), loaded into the in-graph policy bank.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _mngr(path: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(path),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True))


def save_train_state(path: str, step: int, state: Any):
    """Save a full learner state (params, optimizer, kl coeffs)."""
    mngr = _mngr(path)
    mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()


def latest_step(path: str) -> Optional[int]:
    """Latest saved step under ``path`` (None if no checkpoint exists)."""
    return _mngr(path).latest_step()


def restore_train_state(path: str, template: Any,
                        step: Optional[int] = None) -> Any:
    """Restore the latest (or given) step into the template's structure.

    Checkpoints saved before the optimizer switched to single-vector adam
    (optax.flatten, algo/ppo.py) carry a per-leaf opt_state that no longer
    matches the template; those restore params / kl_coeff / update_i and
    keep the template's freshly initialized optimizer state (evaluation
    never reads it; a resumed training run re-warms adam's moments).
    """
    mngr = _mngr(path)
    step = mngr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    try:
        return mngr.restore(step, args=ocp.args.StandardRestore(template))
    except Exception:
        raw = mngr.restore(step)
        print(f"checkpoint {path}@{step}: optimizer state predates the "
              "flattened-adam format; restored params only (optimizer "
              "reinitialized)", flush=True)
        import jax
        import jax.numpy as jnp

        def graft(t, r):
            return jax.tree_util.tree_map(
                lambda tl, rl: jnp.asarray(rl, tl.dtype), t, r)

        return template.replace(
            params=graft(template.params, raw["params"]),
            kl_coeff=jnp.asarray(raw["kl_coeff"],
                                 template.kl_coeff.dtype),
            update_i=jnp.asarray(raw["update_i"],
                                 template.update_i.dtype))


# --- frozen policy store (the ".pt" export equivalent) ----------------------

def policy_path(root: str, level: int, ac_type: int, mode: str) -> str:
    """policies/L{level}_AC{type}_{mode} (policy_export.py:25-32 naming)."""
    return os.path.join(root, f"L{level}_AC{ac_type}_{mode}")


def export_policy(root: str, level: int, mode: str, params: Any):
    """Persist the team's frozen actor-critic params for self-play."""
    ckptr = ocp.StandardCheckpointer()
    for t in (1, 2):
        p = os.path.abspath(policy_path(root, level, t, mode))
        ckptr.save(p, params[f"ac{t}"], force=True)
    ckptr.wait_until_finished()


def load_policy(root: str, level: int, mode: str, template: Any) -> Any:
    """Load a frozen team param dict {"ac1": ..., "ac2": ...}."""
    ckptr = ocp.StandardCheckpointer()
    out = {}
    for t in (1, 2):
        p = os.path.abspath(policy_path(root, level, t, mode))
        out[f"ac{t}"] = ckptr.restore(p, template[f"ac{t}"])
    return out


def stack_fight_bank(levels_params: list) -> Any:
    """Stack per-level fight params on a leading axis for lax dispatch."""
    import jax.numpy as jnp
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *levels_params)
