"""scripts/collect_artifacts.py: metrics.jsonl -> committed evidence."""

import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "collect_artifacts", os.path.join(ROOT, "scripts",
                                          "collect_artifacts.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_stage(results, name, n=12, rising=True):
    d = os.path.join(results, name)
    os.makedirs(d)
    with open(os.path.join(d, "metrics.jsonl"), "w") as f:
        for i in range(n):
            rew = (i if rising else -i) * 0.1
            f.write(json.dumps({
                "step": i * 10, "wall": i * 2.0, "reward_mean": rew,
                "episodes": 100.0, "agents_win": 5.0 + 4 * i,
                "opps_win": 50.0 - 3 * i, "draw": 45.0 - i,
                "kl_1": 0.01}) + "\n")


def test_collect_artifacts_end_to_end(tmp_path):
    mod = _load()
    results = str(tmp_path / "results")
    out = str(tmp_path / "artifacts")
    _write_stage(results, "L1_fight_2-vs-2")
    _write_stage(results, "Commander_3_vs_3")
    ev = os.path.join(results, "EVAL_Commander_3-vs-3")
    os.makedirs(ev)
    with open(os.path.join(ev, "Metrics_Commander_3-vs-3.json"), "w") as f:
        json.dump({"win": 61.0, "lose": 18.0, "draw": 21.0}, f)

    argv = sys.argv
    sys.argv = ["collect_artifacts", "--results", results, "--out", out]
    try:
        mod.main()
    finally:
        sys.argv = argv

    assert os.path.exists(os.path.join(out, "learning_curves.png"))
    assert os.path.exists(os.path.join(out, "metrics_L1_fight_2-vs-2.jsonl"))
    assert os.path.exists(os.path.join(out, "Metrics_Commander_3-vs-3.json"))
    md = open(os.path.join(out, "TRAINING.md")).read()
    # stage rows present, curriculum order respected, eval section included
    assert md.index("L1_fight_2-vs-2") < md.index("Commander_3_vs_3")
    # head/tail window means: reward (0+.1+.2)/3 -> (.9+1+1.1)/3
    assert "0.100 → 1.000" in md and "Evaluation" in md
    # win% normalized by episodes: head (5+9+13)/3, tail (41+45+49)/3
    assert "| 9.0 → 45.0 " in md
