#!/bin/bash
# Round-4 tail of the reference-control chain (run_reference_control.sh's
# wrapper died when the VM hiccuped; the S-LSTM python run survived).
# Waits for that S-LSTM matched-budget training (pid in /tmp/refctl.pid if
# present, else $1) to finish, then:
#   1. evaluates the S-LSTM reference checkpoint with this repo's evaluator
#      (the "reference torch engine" row of RESULTS.md's matched-budget table),
#   2. trains the SGAN reference control (matched-budget recipe).  SGAN is
#      slower than the round has hours; --save_every 2 checkpoints make a
#      partial run comparable engine-for-engine at the highest epoch both
#      engines reached (tpuctl SGAN has epoch 0/2/4/6 checkpoints).
# Everything nice -19 so TPU-side host work keeps priority on the 1 core.
set -u
cd "$(dirname "$0")/.."
log=${REFCTL_LOG:-refctl.log}
pid=${1:-$(cat /tmp/refctl_train.pid 2>/dev/null || echo 0)}

while [ "$pid" -gt 0 ] && kill -0 "$pid" 2>/dev/null; do sleep 30; done

out=OUTPUT_BLOCK/trajdata_split/lstm_social_refctl_m_seed42.pkl
if [ -f "$out" ]; then
  echo "EVAL refctl S-LSTM $(date +%T)" >>"$log"
  nice -n 19 timeout 3600 python -m \
    trajnetplusplusbaselines_tpu.tools.eval_reference_checkpoint \
    --path trajdata_split --output "$out" >>"$log" 2>&1 \
    || echo "EVAL FAILED rc=$?" >>"$log"
else
  echo "refctl S-LSTM checkpoint missing; training died early" >>"$log"
fi

sgan_out=OUTPUT_BLOCK/trajdata_split/sgan_directional_refctl_m_seed42.pkl
if [ ! -f "$sgan_out" ]; then
  echo "TRAIN refctl SGAN (matched budget) $(date +%T)" >>"$log"
  nice -n 19 python scripts/reference_control.py \
    --type directional --module sgan --k 3 --augment \
    --sample 0.25 --epochs 6 --step_size 3 --save_every 2 \
    --path trajdata_split --seed 42 --output refctl_m_seed42 >>"$log" 2>&1 \
    || echo "SGAN control rc=$? (partial checkpoints kept)" >>"$log"
fi
echo "REFCTL TAIL DONE $(date +%T)" >>"$log"
