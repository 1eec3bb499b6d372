#!/bin/bash
# Self-play iteration 3 (see artifacts/SELFPLAY_ITER2.md "Iteration 3"):
# warm-start from the iteration-2 store, train vs the PINNED iteration-2
# bank, then the three cross-bank evals.  Requires results/iter2_policies
# (scripts/selfplay_iter2.sh, or SKIP_TRAIN=1 to rebuild both stores from
# the committed deploy/policies_iter{2,3} overlays and only re-run evals).
set -euo pipefail
cd "$(dirname "$0")/.."
S2=results/iter2_policies
S3=results/iter3_policies
if [ -n "${SKIP_TRAIN:-}" ]; then
  for s in "$S2" "$S3"; do
    if [ ! -d "$s" ]; then mkdir -p results && cp -r deploy/policies "$s"; fi
  done
  cp -r deploy/policies_iter2/. "$S2"/
  cp -r deploy/policies_iter3/. "$S3"/
else
  [ -d "$S2" ] || { echo "run scripts/selfplay_iter2.sh first"; exit 1; }
  [ -d "$S3" ] || cp -r "$S2" "$S3"
  python -m hhmarl_2d_tpu.cli.train_low --level 5 --epochs "${E:-800}" \
      --num_envs 512 --rollout_len 128 --checkpoint_every 100 --no-eval \
      --log_name L5_fight_iter3 --policy_dir "$S3" \
      --opp_policy_dir "$S2" --init_from_policies 5
fi
# head-to-head vs the previous iteration
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 \
    --n_opp_hl 3 --no-eval_hl --eval_level_opp 5 --policy_dir "$S3" \
    --opp_policy_dir "$S2" --eval_tag iter3_vs_iter2
# absolute progress on the fixed deploy yardstick
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 \
    --n_opp_hl 3 --no-eval_hl --eval_level_opp 5 --policy_dir "$S3" \
    --opp_policy_dir deploy/policies --eval_tag iter3_vs_deploy
# the deployed commander on the iteration-3 bank
python -m hhmarl_2d_tpu.cli.evaluate --n_evals 1000 --eval_chunk 500 \
    --n_opp_hl 3 --policy_dir "$S3" --opp_policy_dir deploy/policies \
    --restore_path deploy/commander_3opp/checkpoint --restore_step 3001 \
    --eval_tag cmdr_iter3
echo "SELFPLAY ITER3 COMPLETE"
