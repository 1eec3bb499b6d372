"""Collect the self-play iteration-2 cross-bank evals into an artifact.

Reads the two EVAL_*_{iter2_vs_deploy,deploy_vs_iter2} metrics produced
by scripts/selfplay_iter2.sh plus the committed symmetric baseline
(artifacts/Metrics_Low-Level_3-vs-3_3opp_L5opp.json = deploy-vs-deploy
under the identical protocol) and writes artifacts/SELFPLAY_ITER2.{json,md}.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    base = os.path.join(ROOT, "results")
    fwd = load(os.path.join(
        base, "EVAL_Low-Level_3-vs-3_3opp_iter2_vs_deploy",
        "Metrics_Low-Level_3-vs-3_3opp_iter2_vs_deploy.json"))
    rev = load(os.path.join(
        base, "EVAL_Low-Level_3-vs-3_3opp_deploy_vs_iter2",
        "Metrics_Low-Level_3-vs-3_3opp_deploy_vs_iter2.json"))
    sym = load(os.path.join(
        ROOT, "artifacts", "Metrics_Low-Level_3-vs-3_3opp_L5opp.json"))
    cmdr = load(os.path.join(
        base, "EVAL_Commander_3-vs-3_3opp_cmdr_iter2",
        "Metrics_Commander_3-vs-3_3opp_cmdr_iter2.json"))

    train_meta = {}
    mfile = os.path.join(base, "L5_fight_iter2", "metrics.jsonl")
    if os.path.exists(mfile):
        lines = open(mfile).read().strip().split("\n")
        train_meta = {"iters_logged": len(lines),
                      "last": json.loads(lines[-1])}

    out = {
        "iter2_vs_deploy": fwd,
        "deploy_vs_iter2": rev,
        "deploy_vs_deploy_baseline": sym,
        "commander_iter2_bank": cmdr,
        "margin_fwd_win": round(fwd["win"] - sym["win"], 2),
        "margin_rev_win": round(rev["win"] - sym["win"], 2),
        "margin_cmdr_over_iter2_baseline": round(
            cmdr["win"] - fwd["win"], 2),
        "train": train_meta,
        "epochs": os.environ.get("E", "800"),
    }
    # iteration 3, when present (scripts/selfplay_iter3.sh)
    try:
        out["iter3_vs_iter2"] = load(os.path.join(
            base, "EVAL_Low-Level_3-vs-3_3opp_iter3_vs_iter2",
            "Metrics_Low-Level_3-vs-3_3opp_iter3_vs_iter2.json"))
        out["iter3_vs_deploy"] = load(os.path.join(
            base, "EVAL_Low-Level_3-vs-3_3opp_iter3_vs_deploy",
            "Metrics_Low-Level_3-vs-3_3opp_iter3_vs_deploy.json"))
        out["commander_iter3_bank"] = load(os.path.join(
            base, "EVAL_Commander_3-vs-3_3opp_cmdr_iter3",
            "Metrics_Commander_3-vs-3_3opp_cmdr_iter3.json"))
    except FileNotFoundError:
        pass
    jp = os.path.join(ROOT, "artifacts", "SELFPLAY_ITER2.json")
    with open(jp, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"-> {jp}")
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
