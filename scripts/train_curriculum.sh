#!/bin/bash
# Full curriculum on the real TPU chip via the CLI drivers, producing the
# learning evidence referenced from README: per-level results/*/metrics.jsonl
# learning curves, the frozen policy store (policies/), rendered episodes,
# and the final paired 1000-episode evals (commander vs the no-commander
# closest-opponent baseline) plus the opponent-mix sweep.
#
# Mirrors the reference procedure (/root/reference/README.md:25-54):
# fight L1->L2->L3 with restore chaining, escape at L3, self-play L4/L5
# against the frozen bank, commander on top, then batch evaluation.
#
# Update intensity matches the reference's RLlib defaults (num_sgd_iter 30,
# minibatch 256 over batch 2000): with our 65k-step batches that means
# sgd_iters 8 x 32 minibatches (cli/args.py defaults).
set -e
cd "$(dirname "$0")/.."
E=${E:-1000}
ARGS="--num_envs 512 --rollout_len 128 --checkpoint_every 100 --render_every 400"
python -m hhmarl_2d_tpu.cli.train_low --level 1 --epochs 600 $ARGS
python -m hhmarl_2d_tpu.cli.train_low --level 2 --epochs 800 $ARGS
python -m hhmarl_2d_tpu.cli.train_low --level 3 --epochs "$E" $ARGS
python -m hhmarl_2d_tpu.cli.train_low --agent_mode escape --epochs 800 $ARGS
python -m hhmarl_2d_tpu.cli.train_low --level 4 --epochs "$E" $ARGS
python -m hhmarl_2d_tpu.cli.train_low --level 5 --epochs 1200 $ARGS
# second escape pass: auto-promotes to L5 vs the frozen L5 fight bank
# (config.py:86-92); exports the L5 escape policies the commander uses
python -m hhmarl_2d_tpu.cli.train_low --agent_mode escape --epochs 800 $ARGS
# commander with the full 3-target action space (README.md:76-77)
python -m hhmarl_2d_tpu.cli.train_high --epochs "${EH:-3000}" --n_opp_hl 3 \
    --log_name Commander_3_vs_3_3opp --num_envs 256 \
    --rollout_len 64 --checkpoint_every 100 --render_every 500
# paired evaluation: commander vs fixed-closest-opponent baseline
# (eval_chunk 500 everywhere so the sweeps below reuse the same compiled
# chunk program -- the fight ratio is a traced input, not a static config)
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 \
    --n_opp_hl 3 --log_name Commander_3_vs_3_3opp
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 \
    --n_opp_hl 3 --no-eval_hl
# opponent-mix sweep (hier_opp_fight_ratio in {0,25,50,75,100})
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 500 --eval_chunk 500 \
    --n_opp_hl 3 --log_name Commander_3_vs_3_3opp --sweep_fight_ratio
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 500 --eval_chunk 500 \
    --n_opp_hl 3 --no-eval_hl --sweep_fight_ratio
echo "CURRICULUM COMPLETE"
