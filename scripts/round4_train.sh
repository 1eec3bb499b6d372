#!/bin/bash
# Round-4 capability push (VERDICT.md round-3 "next round" items 1-2):
#  - extend L2 (restore from its own checkpoint), retrain L3 on top,
#    fresh L3 escape, L4, L5, then the escape auto-promotion run at L5
#    (config.py:86-92 semantics -- round 3 never ran the second escape
#    pass, so the deployed bank had no L5 escape policy)
#  - train the commander with the full 3-target action space
#    (N_OPPS_HL=3, /root/reference/README.md:76-77, envs/env_hier.py:20)
#    on the refreshed frozen bank
# Round-3 stage runs are archived in results_r3/ + policies_r3/.
set -euo pipefail
cd "$(dirname "$0")/.."
ARGS="--num_envs 512 --rollout_len 128 --checkpoint_every 100 --render_every 400"
rm -rf results/L3_fight_2-vs-2 results/L3_escape_2-vs-2 \
       results/L4_fight_2-vs-2 results/L5_fight_2-vs-2 \
       results/L5_escape_2-vs-2
python -m hhmarl_2d_tpu.cli.train_low --level 2 --epochs 1200 $ARGS \
    --restore --restore_path results/L2_fight_2-vs-2/checkpoint
python -m hhmarl_2d_tpu.cli.train_low --level 3 --epochs 2000 $ARGS
python -m hhmarl_2d_tpu.cli.train_low --agent_mode escape --epochs 1000 $ARGS
python -m hhmarl_2d_tpu.cli.train_low --level 4 --epochs 1200 $ARGS
python -m hhmarl_2d_tpu.cli.train_low --level 5 --epochs 1600 $ARGS
# escape round 2: auto-promotes to L5, faces the frozen L5 fight bank
python -m hhmarl_2d_tpu.cli.train_low --agent_mode escape --epochs 800 $ARGS
# commander with 3 designatable opponents (obs 44, action Discrete(4))
python -m hhmarl_2d_tpu.cli.train_high --epochs 3000 --n_opp_hl 3 \
    --log_name Commander_3_vs_3_3opp --num_envs 256 --rollout_len 64 \
    --checkpoint_every 100 --render_every 500
echo "ROUND4 CHAIN COMPLETE"
