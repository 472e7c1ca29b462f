#!/bin/bash
# This framework's side of the matched-budget control matrix (VERDICT r3 #2/#6).
# Trains the SAME families, recipe, seed, and (bit-identical, see
# reference_control.py's sorted-listdir shim) --sample subset as
# scripts/run_reference_control.sh trains the reference torch engine on, so
# the two engines' checkpoints are engine-for-engine comparable.
#
# Matched-budget recipe: 1/4 data, 6 epochs, StepLR at 3, seed 42.
set -u
cd "$(dirname "$0")/.."
log=${REFCTL_LOG:-refctl.log}

MATCH="--sample 0.25 --epochs 6 --step_size 3 --save_every 2"

train_t() { # prefix module type extra-args...
  local prefix=$1 module=$2 type=$3; shift 3
  local out="OUTPUT_BLOCK/trajdata_split/${prefix}_${type}_tpuctl_m_seed42.pkl"
  if [ -f "$out" ] && [ -f "$out.epoch6" ]; then
    echo "SKIP (done): $out" >>"$log"
    return 0
  fi
  echo "TRAIN $out $(date +%T)" >>"$log"
  for attempt in 1 2 3; do
    timeout 3600 python -m "trajnetplusplusbaselines_tpu.trainers.$module" \
      --type "$type" --augment $MATCH --path trajdata_split \
      --seed 42 --output "tpuctl_m_seed42" "$@" >>"$log" 2>&1 && return 0
    echo "RETRY($attempt): $prefix $type rc=$?" >>"$log"
    sleep 15
  done
  echo "FAILED: $prefix $type" >>"$log"
}

# Same order as run_reference_control.sh.
train_t lstm lstm social --n 16 --embedding_arch two_layer --layer_dims 1024
# The SGAN trainer schedules per-optimizer (--g_step_size/--d_step_size);
# MATCH's --step_size is an LSTM-trainer flag it ignores, so the decay at
# epoch 3 must be passed explicitly or the control trains at constant LR
# while the reference side decays (advisor r4, medium).
train_t sgan sgan directional --k 3 --g_step_size 3 --d_step_size 3
# S-Attn control carries ONLY the ingredient the reference trainer can also
# express (--lr); no logit cap, no grad clip (recipe asymmetry documented in
# RESULTS.md's control section).
train_t lstm lstm attentionmlp --lr 3e-4
echo "TPUCTL COMPLETE $(date +%T)" >>"$log"
