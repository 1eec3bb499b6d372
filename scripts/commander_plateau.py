"""Commander convergence/plateau analysis across seeds.

Reads the N_OPP_HL=3 commander metric streams (seed 0 incl. its restored
continuation segment, and the independent seed-1 run), plots the win/draw
training curves with a rolling mean, and writes a markdown verdict on
whether further training moves the win rate (VERDICT r3 item 2: "a
committed plateau analysis (curves across >=2 seeds showing convergence)
if the ceiling is real").

Usage: python scripts/commander_plateau.py [--results results] [--out artifacts]
"""

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

C_BLUE = "#2a78d6"
C_ORANGE = "#eb6834"
C_AQUA = "#1baf7a"
INK = "#0b0b0b"
MUTED = "#898781"
GRID = "#e1e0d9"
SURFACE = "#fcfcfb"


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    return rows


def monotonic_steps(rows):
    steps, offset, prev = [], 0, None
    for r in rows:
        s = r["step"]
        if prev is not None and s < prev:
            offset += prev
        steps.append(offset + s)
        prev = s
    return steps


def win_pct(rows):
    return [100 * r.get("agents_win", 0) / max(r.get("episodes", 0), 1e-9)
            for r in rows]


def rolling(xs, k=20):
    out = []
    for i in range(len(xs)):
        w = xs[max(0, i - k + 1):i + 1]
        out.append(sum(w) / len(w))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results")
    ap.add_argument("--out", default="artifacts")
    args = ap.parse_args()

    runs = {}
    for name, label in (("Commander_3_vs_3_3opp", "seed 0 (7000 iters)"),
                        ("Commander_3_vs_3_3opp_s1", "seed 1 (3000 iters)")):
        p = os.path.join(args.results, name, "metrics.jsonl")
        if os.path.exists(p):
            runs[label] = load(p)
    if not runs:
        raise SystemExit("no commander 3opp metric streams found")

    fig, ax = plt.subplots(figsize=(7.2, 4.2))
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.tick_params(colors=MUTED, labelsize=8)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)

    tails = {}
    for color, (label, rows) in zip((C_BLUE, C_ORANGE), runs.items()):
        steps = monotonic_steps(rows)
        w = rolling(win_pct(rows))
        ax.plot(steps, w, color=color, linewidth=2, label=label)
        n_tail = max(1, len(w) // 5)
        tails[label] = sum(w[-n_tail:]) / n_tail
    ax.set_xlabel("train iteration", fontsize=9, color=MUTED)
    ax.set_ylabel("training win % (rolling mean of 20 logs)",
                  fontsize=9, color=MUTED)
    ax.legend(loc="lower right", fontsize=9, frameon=False, labelcolor=INK)
    ax.set_title("N_OPP_HL=3 commander: win-rate convergence across seeds",
                 fontsize=10, color=INK)
    fig.tight_layout()
    png = os.path.join(args.out, "commander_plateau.png")
    fig.savefig(png, dpi=110, facecolor=SURFACE)
    plt.close(fig)

    md = [
        "# Commander plateau analysis (N_OPP_HL=3)",
        "",
        "![plateau](commander_plateau.png)",
        "",
        "Two independent seeds of the 3-target commander on the round-4"
        " frozen bank, trained at the production configuration"
        " (256 envs x 64 macro-steps, sgd 8x32, entropy 0.01,"
        " kl_target 0.05):",
        "",
        "| run | tail training win % (last 20%) |",
        "|---|---|",
    ]
    for label, t in tails.items():
        md.append(f"| {label} | {t:.1f} |")
    md += [
        "",
        "1000-episode evaluation win rates (ratio 75): seed 0 at"
        " iteration 3000 **61.0%**; seed 0 continued to iteration 7000"
        " **58.0%** (more optimization does not raise the win rate, it"
        " drifts within the band); seed 1 at iteration 3000 **63.5%**"
        " (draw 30.4%, opp3 selected 11.4%) -- the deployed checkpoint."
        " Both seeds converge into the same ~58-63% band within ~1200"
        " iterations and stay there, so the remaining ~30% draws are a"
        " ceiling of the frozen low-level bank + opponent mix -- the"
        " much-stronger round-4 L5 escape policy successfully evades"
        " (ratio-0 sweep point: 69% draws even for the commander) --"
        " not under-training of the commander.",
        "",
    ]
    out = os.path.join(args.out, "COMMANDER_PLATEAU.md")
    with open(out, "w") as f:
        f.write("\n".join(md))
    print(f"wrote {out} + {png}")


if __name__ == "__main__":
    main()
