"""Evaluation harness, episode runner and renderer tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhmarl_2d_tpu.env import config as ECfg, highlevel
from hhmarl_2d_tpu.eval import harness
from hhmarl_2d_tpu.eval.episodes import run_episode_lowlevel
from hhmarl_2d_tpu.models import policy as P
from hhmarl_2d_tpu.models.commander import CommanderGru
from hhmarl_2d_tpu.render.plotter import plot_episode

# heavy suite: excluded from the default fast gate (pyproject addopts)
pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def hl_setup():
    cfg = ECfg.make_highlevel_config()
    team_f = P.LowLevelTeam("fight")
    team_e = P.LowLevelTeam("escape")
    bank = highlevel.make_hl_bank(
        team_f, team_e, team_f.init(jax.random.PRNGKey(0)),
        team_e.init(jax.random.PRNGKey(1)))
    return cfg, bank


class TestHarness:
    def test_no_commander_eval(self, hl_setup):
        """eval_hl=False: closest-opponent baseline, 8 episodes."""
        cfg, bank = hl_setup
        stats = harness.evaluate_highlevel(
            cfg, None, None, bank, 8, KEY, eval_hl=False)
        assert stats["finished"] == 8
        assert stats["agents_win"] + stats["opps_win"] + stats["draw"] == 8
        # fixed action 1 = all fight, no escapes
        assert stats["agent_escape"] == 0
        assert stats["agent_fight"] > 0

    def test_commander_eval(self, hl_setup):
        cfg, bank = hl_setup
        model = CommanderGru()
        d = 34
        z = jnp.zeros((1, 1, d))
        zo = jnp.zeros((1, 1, 2, d))
        za = jnp.zeros((1, 1, 1))
        zao = jnp.zeros((1, 1, 2, 1))
        h = jnp.zeros((1, 200))
        params = model.init(KEY, z, zo, za, zao, h, h)
        stats = harness.evaluate_highlevel(
            cfg, model, params, bank, 4, KEY, eval_hl=True)
        assert stats["finished"] == 4

    def test_chunked_eval_bounded_memory(self, hl_setup):
        """chunk_size < n_episodes: same totals invariants, one compile."""
        cfg, bank = hl_setup
        stats = harness.evaluate_highlevel(
            cfg, None, None, bank, 5, KEY, eval_hl=False, chunk_size=2)
        assert stats["finished"] == 5
        assert stats["agents_win"] + stats["opps_win"] + stats["draw"] == 5

    def test_fight_ratio_sweep(self, hl_setup):
        cfg, bank = hl_setup
        table = harness.sweep_fight_ratio(
            cfg, None, None, bank, 2, KEY, ratios=(0, 100), eval_hl=False)
        assert set(table) == {0, 100}
        for ev in table.values():
            assert 0.0 <= ev["win"] <= 100.0

    def test_postprocess_schema(self, tmp_path):
        ev = {"agents_win": 5, "opps_win": 3, "draw": 2, "agent_fight": 70,
              "agent_escape": 30, "opp_fight": 60, "opp_escape": 40,
              "agent_steps": 100, "opp_steps": 100, "opp1": 40, "opp2": 20,
              "opp3": 10}
        f = os.path.join(str(tmp_path), "Metrics_test.json")
        out = harness.postprocess_eval(ev, 10, f)
        assert out["win"] == 50.0 and out["lose"] == 30.0 and out["draw"] == 20.0
        assert out["fight"] == 70.0 and out["opp1"] == pytest.approx(400 / 7)
        with open(f) as fh:
            assert json.load(fh)["win"] == 50.0


class TestEpisodeRunner:
    def test_lowlevel_episode_and_render(self, tmp_path):
        cfg = ECfg.make_lowlevel_config(level=1)
        team = P.LowLevelTeam("fight")
        params = team.init(KEY)
        rew, steps, info, trace = run_episode_lowlevel(cfg, team, params, KEY)
        assert 1 <= steps <= cfg.horizon
        assert trace.lat.shape[0] == steps
        assert info["agents_win"] + info["opps_win"] + info["draw"] == 1
        png = os.path.join(str(tmp_path), "ep.png")
        plot_episode(trace, png, status=f"rew {rew:.2f}")
        assert os.path.exists(png) and os.path.getsize(png) > 10_000
