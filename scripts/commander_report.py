"""Paired commander-vs-baseline evaluation report.

Aggregates the four evaluation outputs of scripts/train_curriculum.sh --
commander (eval_hl) and fixed-closest-opponent baseline (no-eval_hl), each
1000 episodes, plus the two hier_opp_fight_ratio sweeps -- into one
markdown artifact making the hierarchy's value-add explicit: win/lose/draw
margins, commander action usage (fight vs escape), and per-opponent
selection, vs /root/reference/evaluation.py:32-82's protocol.

Usage: python scripts/commander_report.py [--results results] [--out artifacts]
"""

import argparse
import json
import os


def load(path):
    with open(path) as f:
        return json.load(f)


def fmt_row(name, ev):
    return (f"| {name} | {ev['win']:.1f} | {ev['lose']:.1f} | "
            f"{ev['draw']:.1f} | {ev['win'] - ev['lose']:+.1f} | "
            f"{ev.get('fight', 0):.1f} | {ev.get('esc', 0):.1f} | "
            f"{ev.get('opp1', 0):.1f} / {ev.get('opp2', 0):.1f} / "
            f"{ev.get('opp3', 0):.1f} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results")
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--suffix", default="",
                    help="Metrics-name suffix for non-default commander "
                         "spaces (e.g. _3opp for n_opp_hl=3 runs)")
    ap.add_argument("--report", default="COMMANDER_VS_BASELINE.md")
    args = ap.parse_args()

    s = args.suffix
    cmd_dir = os.path.join(args.results, f"EVAL_Commander_3-vs-3{s}")
    base_dir = os.path.join(args.results, f"EVAL_Low-Level_3-vs-3{s}")
    cmd = load(os.path.join(cmd_dir, f"Metrics_Commander_3-vs-3{s}.json"))
    base = load(os.path.join(base_dir, f"Metrics_Low-Level_3-vs-3{s}.json"))

    md = [
        "# Commander vs fixed-closest-opponent baseline",
        "",
        "Paired 1000-episode evaluations (same protocol as the reference's"
        " `evaluation.py`): the trained CommanderGru issuing macro actions"
        " vs the `eval_hl=False` baseline that always assigns every agent"
        " the closest opponent (`evaluation.py:50-52`). Same frozen"
        " low-level policies, same opponent mix"
        " (`hier_opp_fight_ratio=75`).",
        "",
        "| Policy | win% | lose% | draw% | margin | fight% | esc% |"
        " opp1/2/3 sel % |",
        "|---|---|---|---|---|---|---|---|",
        fmt_row("**Commander**", cmd),
        fmt_row("closest-opp baseline", base),
        "",
        f"**Win-rate margin: {cmd['win'] - base['win']:+.1f} points**"
        f" (net margin {cmd['win'] - cmd['lose'] - base['win'] + base['lose']:+.1f}).",
        "",
    ]

    # round-5 battery writes the fair baseline under its own --eval_tag
    # name; fall back to the pre-tag layout for older runs
    fair = os.path.join(args.results, f"EVAL_Low-Level_3-vs-3{s}_L5opp",
                        f"Metrics_Low-Level_3-vs-3{s}_L5opp.json")
    if not os.path.exists(fair):
        fair = os.path.join(args.results, f"EVAL_Low-Level_3-vs-3{s}_L5opp",
                            f"Metrics_Low-Level_3-vs-3{s}.json")
    if os.path.exists(fair):
        fv = load(fair)
        md += [
            "## Apples-to-apples: baseline vs the SAME L5 opponents",
            "",
            "The reference's `eval_hl=False` protocol gives the baseline"
            " *weaker* (L4) opponents while the commander faces L5"
            " (`env_base._get_policies` `_opp` policies,"
            " `config.py:100-102`), so the headline margin above"
            " understates the hierarchy. Re-running the baseline against"
            " L5 opponents (`--eval_level_opp 5`, 1000 episodes) isolates"
            " the commander's contribution:",
            "",
            "| Policy | win% | lose% | draw% | net margin |",
            "|---|---|---|---|---|",
            f"| **Commander** (vs L5) | {cmd['win']:.1f} | {cmd['lose']:.1f}"
            f" | {cmd['draw']:.1f} | {cmd['win'] - cmd['lose']:+.1f} |",
            f"| closest-opp baseline (vs L5) | {fv['win']:.1f}"
            f" | {fv['lose']:.1f} | {fv['draw']:.1f}"
            f" | {fv['win'] - fv['lose']:+.1f} |",
            "",
            f"**Commander win-rate margin at equal opponents:"
            f" {cmd['win'] - fv['win']:+.1f} points**"
            f" (net {cmd['win'] - cmd['lose'] - fv['win'] + fv['lose']:+.1f}).",
            "",
        ]

    sweep_c = os.path.join(cmd_dir, f"Metrics_Commander_3-vs-3{s}_sweep.json")
    sweep_b = os.path.join(base_dir, f"Metrics_Low-Level_3-vs-3{s}_sweep.json")
    if os.path.exists(sweep_c) and os.path.exists(sweep_b):
        sc, sb = load(sweep_c), load(sweep_b)
        md += [
            "## Opponent-mix sweep (hier_opp_fight_ratio)",
            "",
            "500 episodes per point. The opponents' commander fights with"
            " probability ratio/100 (else escapes).",
            "",
            "| ratio | commander win/lose/draw | baseline win/lose/draw |"
            " win margin |",
            "|---|---|---|---|",
        ]
        for r in sorted(sc, key=int):
            c, b = sc[r], sb[r]
            md.append(
                f"| {r} | {c['win']:.1f} / {c['lose']:.1f} / {c['draw']:.1f}"
                f" | {b['win']:.1f} / {b['lose']:.1f} / {b['draw']:.1f}"
                f" | {c['win'] - b['win']:+.1f} |")
        md.append("")

    out = os.path.join(args.out, args.report)
    os.makedirs(args.out, exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(md))
    print(f"wrote {out}")
    print("\n".join(md[:12]))


if __name__ == "__main__":
    main()
