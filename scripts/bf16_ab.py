"""bf16-vs-fp32 training-quality A/B (VERDICT round-4 item 2).

Runs the low-level trainer at the production configuration in both
compute dtypes from identical seeds and compares reward / win-rate / KL
trajectories: L1 from scratch (2 seeds per arm) and L3 continued from
the committed L2 checkpoint (1 seed per arm).  Appends the result table
to artifacts/BF16_AB.md.

Usage: python scripts/bf16_ab.py [--iters 300]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def tail_mean(rows, key, frac=0.33, norm_by_eps=False):
    k = max(1, int(len(rows) * frac))
    tail = rows[-k:]
    if norm_by_eps:
        eps = sum(max(r.get("episodes", 0), 1e-9) for r in tail)
        return 100.0 * sum(r.get(key, 0) for r in tail) / eps
    return sum(r[key] for r in tail) / len(tail)


def run(tag, extra, iters, base):
    from hhmarl_2d_tpu.cli import train_low
    log_base = os.path.join(base, tag)
    os.makedirs(log_base, exist_ok=True)
    argv = ["--epochs", str(iters), "--log_base", log_base,
            "--policy_dir", os.path.join(base, "policies_" + tag),
            "--checkpoint_every", "1000000", "--no-eval"] + extra
    train_low.main(argv)
    stage = [d for d in os.listdir(log_base)
             if os.path.isdir(os.path.join(log_base, d))][0]
    rows = []
    with open(os.path.join(log_base, stage, "metrics.jsonl")) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    return {
        "reward_tail": round(tail_mean(rows, "reward_mean"), 3),
        "win_tail_pct": round(tail_mean(rows, "agents_win",
                                        norm_by_eps=True), 1),
        "kl_tail": round(tail_mean(rows, "kl_1"), 5),
        "iters": iters,
    }


def main():
    from hhmarl_2d_tpu.utils.platform import ensure_platform
    ensure_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--l3_iters", type=int, default=200)
    opt = ap.parse_args()
    base = "/tmp/bf16_ab"
    shutil.rmtree(base, ignore_errors=True)

    results = {}
    for dt in ("fp32", "bf16"):
        for seed in (0, 1):
            tag = f"L1_{dt}_s{seed}"
            print(f"=== {tag} ===", flush=True)
            results[tag] = run(tag, ["--level", "1", "--seed", str(seed),
                                     "--compute_dtype", dt], opt.iters, base)
    l2 = os.path.join(ROOT, "results", "L2_fight_2-vs-2", "checkpoint")
    if os.path.isdir(l2):
        for dt in ("fp32", "bf16"):
            tag = f"L3cont_{dt}_s0"
            print(f"=== {tag} ===", flush=True)
            results[tag] = run(
                tag, ["--level", "3", "--seed", "0", "--compute_dtype", dt,
                      "--restore", "--restore_path", l2],
                opt.l3_iters, base)

    lines = ["", f"Production config (512 envs x 128 steps, sgd 8x32),"
             f" identical seeds per arm; tail = last third of iterations.",
             "",
             "| run | tail reward | tail win % | tail KL(ac1) |",
             "|---|---|---|---|"]
    for tag, r in results.items():
        lines.append(f"| {tag} ({r['iters']} iters) | {r['reward_tail']} "
                     f"| {r['win_tail_pct']} | {r['kl_tail']} |")
    md = "\n".join(lines) + "\n"
    path = os.path.join(ROOT, "artifacts", "BF16_AB.md")
    content = open(path).read().replace("<!-- AB_RESULTS -->", md)
    with open(path, "w") as f:
        f.write(content)
    with open(os.path.join(ROOT, "artifacts", "BF16_AB.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(md)
    print("-> artifacts/BF16_AB.md")


if __name__ == "__main__":
    main()
