#!/bin/bash
# Second round-4 tail of the reference-control chain.  The first tail
# (run_refctl_round4_tail.sh) evaluated the S-LSTM control but its SGAN
# launch died on argparse: the reference SGAN trainer has no --step_size
# (schedulers are per-optimizer: --g_step_size/--d_step_size,
# /root/reference/trajnetbaselines/sgan/trainer.py).  This tail waits for
# the in-flight S-Attn reference control (pid $1), evaluates it, then runs
# the SGAN control with the corrected flags and evaluates whatever epochs
# it reaches (--save_every 2 keeps partials comparable epoch-for-epoch).
set -u
cd "$(dirname "$0")/.."
log=${REFCTL_LOG:-refctl.log}
pid=${1:?pid of the running attentionmlp reference control}

while kill -0 "$pid" 2>/dev/null; do sleep 30; done

attn=OUTPUT_BLOCK/trajdata_split/lstm_attentionmlp_refctl_m_seed42.pkl
attn_best="$attn"
if [ ! -f "$attn_best" ]; then
  for e in 6 4 2; do
    if [ -f "$attn.epoch$e" ]; then attn_best="$attn.epoch$e"; break; fi
  done
fi
if [ -f "$attn_best" ]; then
  echo "EVAL refctl S-Attn $attn_best $(date +%T)" >>"$log"
  nice -n 19 timeout 3600 python -m \
    trajnetplusplusbaselines_tpu.tools.eval_reference_checkpoint \
    --path trajdata_split --output "$attn_best" >>"$log" 2>&1 \
    || echo "S-Attn EVAL FAILED rc=$?" >>"$log"
else
  echo "refctl S-Attn checkpoint missing; training died early" >>"$log"
fi

sgan_out=OUTPUT_BLOCK/trajdata_split/sgan_directional_refctl_m_seed42.pkl
if [ ! -f "$sgan_out" ]; then
  echo "TRAIN refctl SGAN take 2 (matched budget) $(date +%T)" >>"$log"
  nice -n 19 python scripts/reference_control.py \
    --type directional --module sgan --k 3 --augment \
    --sample 0.25 --epochs 6 --g_step_size 3 --d_step_size 3 \
    --save_every 2 --path trajdata_split --seed 42 \
    --output refctl_m_seed42 >>"$log" 2>&1 \
    || echo "SGAN control rc=$? (partial checkpoints kept)" >>"$log"
fi
sgan_best="$sgan_out"
if [ ! -f "$sgan_best" ]; then
  for e in 6 4 2; do
    if [ -f "$sgan_out.epoch$e" ]; then sgan_best="$sgan_out.epoch$e"; break; fi
  done
fi
if [ -f "$sgan_best" ]; then
  echo "EVAL refctl SGAN $sgan_best $(date +%T)" >>"$log"
  nice -n 19 timeout 3600 python -m \
    trajnetplusplusbaselines_tpu.tools.eval_reference_checkpoint \
    --path trajdata_split --output "$sgan_best" --module sgan --modes 3 \
    >>"$log" 2>&1 || echo "SGAN EVAL FAILED rc=$?" >>"$log"
fi
echo "REFCTL TAIL2 DONE $(date +%T)" >>"$log"
