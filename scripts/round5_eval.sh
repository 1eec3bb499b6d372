#!/bin/bash
# Round-5 evaluation battery — every README headline number regenerates
# from this script against the committed deploy/ snapshot:
#  - paired 1000-episode evals of the N_OPP_HL=3 commander (deployed
#    checkpoint, pinned step) vs the fixed-closest-opponent baseline
#    (evaluation.py:32-82 protocol), the fair same-L5-opponents baseline,
#    and the two opponent-mix sweeps
#  - the large n-vs-m eval: 5-vs-5 + sweep + rendered episode
# Crash-safe: baseline variants and render runs write under their own
# --eval_tag instead of directory shuffles (the round-4 mv dance left a
# renamed dir on failure, and the 2-episode render run overwrote the
# 1000-episode 5-vs-5 metrics file).
set -euo pipefail
cd "$(dirname "$0")/.."
HL3="--n_opp_hl 3"
DEPLOY="--policy_dir deploy/policies"
CMDR="--restore_path deploy/commander_3opp/checkpoint --restore_step 3001"
# commander (deployed checkpoint, pinned step)
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 $HL3 \
    $DEPLOY $CMDR
# closest-opponent baseline (reference protocol: L4 opponents)
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 $HL3 \
    $DEPLOY --no-eval_hl
# fair baseline: same L5 opponents as the commander faces
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 $HL3 \
    $DEPLOY --no-eval_hl --eval_level_opp 5 --eval_tag L5opp
# opponent-mix sweeps
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 500 --eval_chunk 500 $HL3 \
    $DEPLOY $CMDR --sweep_fight_ratio
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 500 --eval_chunk 500 $HL3 \
    $DEPLOY --no-eval_hl --sweep_fight_ratio
# 5-vs-5: 1000-episode eval + ratio sweep + rendered episode (own tag!)
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 250 \
    --num_agents 5 --num_opps 5 --n_opp_hl 5 $DEPLOY --no-eval_hl
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 500 --eval_chunk 250 \
    --num_agents 5 --num_opps 5 --n_opp_hl 5 $DEPLOY --no-eval_hl \
    --sweep_fight_ratio
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 2 --eval_chunk 2 \
    --num_agents 5 --num_opps 5 --n_opp_hl 5 $DEPLOY --no-eval_hl \
    --eval_tag render --render --render_every 1 --render_video
# default 2-target commander (deploy/commander_2opp)
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 \
    $DEPLOY --restore_path deploy/commander_2opp/checkpoint --restore_step 3001
echo "ROUND5 EVAL COMPLETE"
