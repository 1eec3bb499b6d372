"""Cross-bank plumbing (--opp_policy_dir / --init_from_policies).

Self-play iterations need (a) opponents loaded from a DIFFERENT frozen
store than the one a run exports into, and (b) warm-starting a trainer's
params from an exported bank when only policy params survive (the
committed deploy/policies store has no TrainState checkpoints).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhmarl_2d_tpu.cli import args as ARGS
from hhmarl_2d_tpu.cli.train_high import build_hl_bank
from hhmarl_2d_tpu.models import policy as P
from hhmarl_2d_tpu.utils import checkpoint as CKPT


def _leaf(params):
    return np.asarray(jax.tree_util.tree_leaves(params)[0])


@pytest.fixture(scope="module")
def stores(tmp_path_factory):
    """Two stores with DIFFERENT random L5 fight params; store A also
    carries the L3/L4 fight + L3 escape entries the loaders expect."""
    root_a = str(tmp_path_factory.mktemp("bank_a"))
    root_b = str(tmp_path_factory.mktemp("bank_b"))
    team_f = P.LowLevelTeam("fight")
    team_e = P.LowLevelTeam("escape")
    fa = team_f.init(jax.random.PRNGKey(0))
    fb = team_f.init(jax.random.PRNGKey(1))
    ea = team_e.init(jax.random.PRNGKey(2))
    for lvl in (3, 4, 5):
        CKPT.export_policy(root_a, lvl, "fight", fa)
    CKPT.export_policy(root_a, 3, "escape", ea)
    for lvl in (3, 5):
        CKPT.export_policy(root_b, lvl, "fight", fb)
    CKPT.export_policy(root_b, 3, "escape", ea)
    return root_a, root_b, fa, fb


def _eval_args(**kw):
    ns = argparse.Namespace(eval_level_ag=5, eval_level_opp=5, eval_hl=True,
                            opp_policy_dir=None)
    ns.__dict__.update(kw)
    return ns


class TestOppPolicyDir:
    def test_hl_bank_splits_agent_and_opp_stores(self, stores):
        root_a, root_b, fa, fb = stores
        bank = build_hl_bank(_eval_args(policy_dir=root_a,
                                        opp_policy_dir=root_b))
        np.testing.assert_array_equal(_leaf(bank["fight"]), _leaf(fa))
        np.testing.assert_array_equal(_leaf(bank["fight_opp"]), _leaf(fb))
        assert bank["_meta"]["opp_policy_dir"] == root_b

    def test_hl_bank_default_shares_one_store(self, stores):
        root_a, _, fa, _ = stores
        bank = build_hl_bank(_eval_args(policy_dir=root_a))
        np.testing.assert_array_equal(_leaf(bank["fight_opp"]), _leaf(fa))
        assert bank["_meta"]["opp_policy_dir"] == root_a

    def test_lowlevel_opp_actor_reads_opp_store(self, stores):
        """train_low's frozen opponents come from --opp_policy_dir while
        exports keep refreshing --policy_dir (the iteration split)."""
        from hhmarl_2d_tpu.cli.train_low import build_opp_actor
        root_a, root_b, fa, fb = stores
        team_f = P.LowLevelTeam("fight")
        team_e = P.LowLevelTeam("escape")
        ns = argparse.Namespace(level=5, agent_mode="fight",
                                policy_dir=root_a, opp_policy_dir=root_b)
        actor = build_opp_actor(ns, team_f, team_e)
        assert actor is not None
        # store B has no L4: its stacked bank is [L3, L3->L4 fallback, L5]
        # with every entry from B, so the L5 slice must equal fb
        # (the actor closes over the bank; rebuild it to inspect)
        f_tmpl = team_f.init(jax.random.PRNGKey(0))
        l5_b = CKPT.load_policy(root_b, 5, "fight", f_tmpl)
        np.testing.assert_array_equal(_leaf(l5_b), _leaf(fb))

    def test_cli_flags_parse(self):
        a = ARGS.parse(0, ["--opp_policy_dir", "/tmp/x",
                           "--init_from_policies", "5", "--level", "5"])
        assert a.opp_policy_dir == "/tmp/x"
        assert a.init_from_policies == 5


class TestInitFromPolicies:
    def test_warm_start_replaces_params(self, stores):
        """The trainer's TrainState params structure round-trips through
        the policy store (the cli/train_low.py warm-start path)."""
        root_a, _, fa, _ = stores
        team_f = P.LowLevelTeam("fight")
        tmpl = team_f.init(jax.random.PRNGKey(9))
        loaded = CKPT.load_policy(root_a, 5, "fight", tmpl)
        assert (jax.tree_util.tree_structure(loaded)
                == jax.tree_util.tree_structure(tmpl))
        np.testing.assert_array_equal(_leaf(loaded), _leaf(fa))
