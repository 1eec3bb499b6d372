"""Collect committed learning evidence from a curriculum run.

Reads every ``results/<stage>/metrics.jsonl`` produced by the CLI drivers
(train_low / train_high), renders per-stage learning curves (reward and
win/lose/draw rates over training iterations) into one PNG grid, writes a
summary table, and copies the raw metric streams + eval ``Metrics_*.json``
into ``artifacts/`` so the evidence is version-controlled while the bulky
``results/`` tree stays gitignored.

Usage: python scripts/collect_artifacts.py [--results results] [--out artifacts]
"""

import argparse
import glob
import json
import os
import shutil

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# dataviz reference palette (light mode): categorical slots 1-3 + chrome
C_BLUE = "#2a78d6"    # slot 1: reward / win
C_ORANGE = "#eb6834"  # slot 2: lose
C_AQUA = "#1baf7a"    # slot 3: draw
INK = "#0b0b0b"
MUTED = "#898781"
GRID = "#e1e0d9"
SURFACE = "#fcfcfb"

# curriculum display order (reference README.md:25-54 procedure)
STAGE_ORDER = [
    "L1_fight_2-vs-2", "L2_fight_2-vs-2", "L3_fight_2-vs-2",
    "L3_escape_2-vs-2", "L5_escape_2-vs-2",
    "L4_fight_2-vs-2", "L5_fight_2-vs-2", "Commander_3_vs_3",
    "Commander_3_vs_3_3opp",
]


def load_stage(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def _style_axis(ax):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.tick_params(colors=MUTED, labelsize=8)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)


def monotonic_steps(rows):
    """Cumulative iteration axis across restarts: a restored run's loop
    epochs restart at 0, so stitch the segments end-to-end."""
    steps, offset, prev = [], 0, None
    for r in rows:
        s = r["step"]
        if prev is not None and s < prev:
            offset += prev
        steps.append(offset + s)
        prev = s
    return steps


def plot_curves(stages, out_png):
    n = len(stages)
    fig, axes = plt.subplots(2, n, figsize=(3.1 * n, 5.2), squeeze=False)
    fig.patch.set_facecolor(SURFACE)
    for col, (name, rows) in enumerate(stages):
        steps = monotonic_steps(rows)
        rew = [r["reward_mean"] for r in rows]
        eps = [max(r.get("episodes", 0), 1e-9) for r in rows]
        win = [100 * r.get("agents_win", 0) / e for r, e in zip(rows, eps)]
        lose = [100 * r.get("opps_win", 0) / e for r, e in zip(rows, eps)]
        draw = [100 * r.get("draw", 0) / e for r, e in zip(rows, eps)]

        ax = axes[0][col]
        _style_axis(ax)
        ax.plot(steps, rew, color=C_BLUE, linewidth=2)
        ax.set_title(name.replace("_", " "), fontsize=9, color=INK)
        if col == 0:
            ax.set_ylabel("mean step reward", fontsize=8, color=MUTED)

        ax = axes[1][col]
        _style_axis(ax)
        ax.plot(steps, win, color=C_BLUE, linewidth=2, label="win")
        ax.plot(steps, lose, color=C_ORANGE, linewidth=2, label="lose")
        ax.plot(steps, draw, color=C_AQUA, linewidth=2, label="draw")
        ax.set_ylim(-2, 102)
        ax.set_xlabel("train iteration", fontsize=8, color=MUTED)
        if col == 0:
            ax.set_ylabel("episode outcome %", fontsize=8, color=MUTED)
            ax.legend(loc="center right", fontsize=8, frameon=False,
                      labelcolor=INK)
    fig.tight_layout()
    fig.savefig(out_png, dpi=110, facecolor=SURFACE)
    plt.close(fig)


def summarize(stages):
    lines = ["# Training evidence (real TPU v5e chip)", "",
             "Curves: ![learning curves](learning_curves.png)", "",
             "| Stage | iters | reward first→last | win% first→last | "
             "lose% | draw% |", "|---|---|---|---|---|---|"]
    for name, rows in stages:
        k = min(3, len(rows))  # average the first/last few logged points
        def avg(key, rs):
            eps = [max(r.get("episodes", 0), 1e-9) for r in rs]
            if key == "reward_mean":
                return sum(r[key] for r in rs) / len(rs)
            return 100 * sum(r.get(key, 0) for r in rs) / sum(eps)
        head, tail = rows[:k], rows[-k:]
        lines.append(
            f"| {name} | {monotonic_steps(rows)[-1]} "
            f"| {avg('reward_mean', head):.3f} → {avg('reward_mean', tail):.3f} "
            f"| {avg('agents_win', head):.1f} → {avg('agents_win', tail):.1f} "
            f"| {avg('opps_win', tail):.1f} | {avg('draw', tail):.1f} |")
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results")
    ap.add_argument("--out", default="artifacts")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    found = {os.path.basename(os.path.dirname(p)): p for p in
             glob.glob(os.path.join(args.results, "*", "metrics.jsonl"))}
    names = [s for s in STAGE_ORDER if s in found] + sorted(
        set(found) - set(STAGE_ORDER))
    stages = []
    for name in names:
        rows = load_stage(found[name])
        if rows:
            stages.append((name, rows))
            shutil.copy(found[name],
                        os.path.join(args.out, f"metrics_{name}.jsonl"))
    if not stages:
        raise SystemExit(f"no metrics found under {args.results}/")

    plot_curves(stages, os.path.join(args.out, "learning_curves.png"))
    md = summarize(stages)

    evals = glob.glob(os.path.join(args.results, "EVAL_*", "Metrics_*.json"))
    if evals:
        md += "\n## Evaluation\n\n"
        seen = {}
        for p in sorted(evals):
            name = os.path.basename(p)
            if name in seen:
                # two EVAL dirs can emit the same metrics basename (e.g.
                # the fair same-L5-opponents baseline re-run); carry the
                # dir's distinguishing suffix into the copy name
                tag = os.path.basename(os.path.dirname(p)).replace(
                    "EVAL_", "")
                name = name[:-5] + "." + tag + ".json"
            seen[name] = p
            shutil.copy(p, os.path.join(args.out, name))
            with open(p) as f:
                md += f"`{name}`: `{f.read().strip()}`\n\n"

    with open(os.path.join(args.out, "TRAINING.md"), "w") as f:
        f.write(md)
    print(f"wrote {args.out}/TRAINING.md + learning_curves.png "
          f"({len(stages)} stages)")


if __name__ == "__main__":
    main()
