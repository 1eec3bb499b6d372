#!/bin/bash
# Full curriculum on the real TPU chip via the CLI drivers, producing the
# learning evidence referenced from README: per-level results/*/metrics.jsonl
# learning curves, the frozen policy store (policies/), rendered episodes,
# and the final 1000-episode eval Metrics_*.json.
#
# Mirrors the reference procedure (/root/reference/README.md:25-54):
# fight L1->L2->L3 with restore chaining, escape at L3, self-play L4/L5
# against the frozen bank, commander on top, then batch evaluation.
set -e
cd "$(dirname "$0")/.."
E=${E:-800}
ARGS="--num_envs 512 --rollout_len 128 --checkpoint_every 100 --render_every 400"
python -m hhmarl_2d_tpu.cli.train_low --level 1 --epochs "$E" $ARGS
python -m hhmarl_2d_tpu.cli.train_low --level 2 --epochs "$E" $ARGS
python -m hhmarl_2d_tpu.cli.train_low --level 3 --epochs "$E" $ARGS
python -m hhmarl_2d_tpu.cli.train_low --agent_mode escape --epochs 600 $ARGS
python -m hhmarl_2d_tpu.cli.train_low --level 4 --epochs "$E" $ARGS
python -m hhmarl_2d_tpu.cli.train_low --level 5 --epochs "$E" $ARGS
python -m hhmarl_2d_tpu.cli.train_high --epochs 600 --num_envs 256 \
    --rollout_len 64 --checkpoint_every 100 --render_every 300
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000
echo "CURRICULUM COMPLETE"
