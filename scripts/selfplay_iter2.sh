#!/bin/bash
# Self-play iteration 2 of the L5 fight bank — the "round-6 lever"
# artifacts/COMMANDER_ORACLE.md identifies (stronger per-engagement win
# odds), measured:
#   1. warm-start a fresh L5 fight run from the committed deploy bank
#      (--init_from_policies 5) and train it against the PINNED deploy
#      opponents (--opp_policy_dir), exporting into its own store
#   2. cross-bank head-to-head evals, both directions, vs the committed
#      symmetric baseline artifacts/Metrics_Low-Level_3-vs-3_3opp_L5opp.json
#      (deploy-vs-deploy under the identical protocol: agents
#      fixed-closest fight, opponents ratio-75 fight/escape)
#   3. the deployed commander (unchanged checkpoint) flying the
#      iteration-2 bank against the deploy-bank opponents
# Then: python scripts/selfplay_iter2_report.py -> artifacts/SELFPLAY_ITER2.*
#
# SKIP_TRAIN=1 reconstructs the iteration-2 store from the committed
# deploy/policies_iter2 overlay (the two L5 fight entries that training
# changed) and only re-runs the evals — the committed artifact numbers
# regenerate without the ~8-minute training leg.
set -euo pipefail
cd "$(dirname "$0")/.."
STORE=results/iter2_policies
if [ ! -d "$STORE" ]; then
  mkdir -p results && cp -r deploy/policies "$STORE"
  if [ -n "${SKIP_TRAIN:-}" ]; then
    cp -r deploy/policies_iter2/. "$STORE"/
  fi
fi
if [ -z "${SKIP_TRAIN:-}" ]; then
  python -m hhmarl_2d_tpu.cli.train_low --level 5 --epochs "${E:-800}" \
      --num_envs 512 --rollout_len 128 --checkpoint_every 100 --no-eval \
      --log_name L5_fight_iter2 --policy_dir "$STORE" \
      --opp_policy_dir deploy/policies --init_from_policies 5
fi
# head-to-head: iteration-2 agents vs deployed L5 opponents
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 \
    --n_opp_hl 3 --no-eval_hl --eval_level_opp 5 --policy_dir "$STORE" \
    --opp_policy_dir deploy/policies --eval_tag iter2_vs_deploy
# reverse direction: deployed agents vs iteration-2 opponents
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 \
    --n_opp_hl 3 --no-eval_hl --eval_level_opp 5 \
    --policy_dir deploy/policies --opp_policy_dir "$STORE" \
    --eval_tag deploy_vs_iter2
# the deployed commander on the iteration-2 bank vs deploy opponents
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 \
    --n_opp_hl 3 --policy_dir "$STORE" --opp_policy_dir deploy/policies \
    --restore_path deploy/commander_3opp/checkpoint --restore_step 3001 \
    --eval_tag cmdr_iter2
echo "SELFPLAY ITER2 COMPLETE"
