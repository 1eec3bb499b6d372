#!/bin/bash
# Round-4 evaluation battery, run after scripts/round4_train.sh:
#  - paired 1000-episode evals of the N_OPP_HL=3 commander vs the
#    fixed-closest-opponent baseline (evaluation.py:32-82 protocol),
#    both on the refreshed frozen bank, plus the fair same-L5-opponents
#    baseline and the two opponent-mix sweeps
#  - the large n-vs-m eval: 5-vs-5 sweep + rendered episode
#    (BASELINE config 5; evaluation.py:32-64 n-vs-m via config)
set -euo pipefail
cd "$(dirname "$0")/.."
HL3="--n_opp_hl 3"
# commander (restores from Commander_3_vs_3_3opp/checkpoint)
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 $HL3 \
    --log_name Commander_3_vs_3_3opp
# closest-opponent baseline (reference protocol: L4 opponents)
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 $HL3 \
    --no-eval_hl
# fair baseline: same L5 opponents as the commander faces
mv results/EVAL_Low-Level_3-vs-3_3opp results/EVAL_Low-Level_3-vs-3_3opp_base
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 $HL3 \
    --no-eval_hl --eval_level_opp 5
mv results/EVAL_Low-Level_3-vs-3_3opp results/EVAL_Low-Level_3-vs-3_3opp_L5opp
mv results/EVAL_Low-Level_3-vs-3_3opp_base results/EVAL_Low-Level_3-vs-3_3opp
# opponent-mix sweeps
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 500 --eval_chunk 500 $HL3 \
    --log_name Commander_3_vs_3_3opp --sweep_fight_ratio
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 500 --eval_chunk 500 $HL3 \
    --no-eval_hl --sweep_fight_ratio
# 5-vs-5: 1000-episode eval + ratio sweep + rendered episode (PNG + GIF)
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 250 \
    --num_agents 5 --num_opps 5 --n_opp_hl 5 --no-eval_hl
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 500 --eval_chunk 250 \
    --num_agents 5 --num_opps 5 --n_opp_hl 5 --no-eval_hl --sweep_fight_ratio
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 2 --eval_chunk 2 \
    --num_agents 5 --num_opps 5 --n_opp_hl 5 --no-eval_hl \
    --render --render_every 1 --render_video
echo "ROUND4 EVAL COMPLETE"
