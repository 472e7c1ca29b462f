#!/bin/bash
# Round 5: restore the core protocol families whose checkpoints/prediction
# dirs were cleaned from disk after round 3, so (a) the collision_test gate
# (now riding along in test/) gets a verdict for EVERY learned protocol row
# and (b) the full prediction tree is reproducible on demand.
#
# The vmapped seed-ensemble reproduces the sequential protocol runs'
# parameter streams exactly (tests/test_ensemble.py), so retrained
# checkpoints are the published-recipe models, not new experiments.
# Train+eval run per family, TPU-serial, resumable (skip-if-exists both
# stages).
set -u
cd "$(dirname "$0")/.."
log=${GATE_REFRESH_LOG:-gate_refresh.log}
path=trajdata_split
seeds="42 10 20 30 40"

family() { # type extra-train-args...
  local type=$1; shift
  local done_marker="OUTPUT_BLOCK/$path/lstm_${type}_seed40.pkl"
  if [ -f "$done_marker" ]; then
    echo "SKIP TRAIN lstm_$type (checkpoints exist) $(date +%T)" >>"$log"
  else
    echo "TRAIN lstm_$type $(date +%T)" >>"$log"
    timeout 5400 python -m trajnetplusplusbaselines_tpu.trainers.ensemble \
      --type "$type" --augment --save_every 20 --path "$path" \
      --seeds $seeds "$@" >>"$log" 2>&1 || {
        echo "TRAIN FAILED lstm_$type rc=$? $(date +%T)" >>"$log"; return 1; }
  fi
  local outs=""
  for s in $seeds; do outs="$outs OUTPUT_BLOCK/$path/lstm_${type}_seed${s}.pkl"; done
  echo "EVAL lstm_$type $(date +%T)" >>"$log"
  timeout 5400 python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
    --path "$path" --fill_missing --output $outs >>"$log" 2>&1 || {
      echo "EVAL FAILED lstm_$type rc=$? $(date +%T)" >>"$log"; return 1; }
  echo "DONE lstm_$type $(date +%T)" >>"$log"
}

family vanilla
family directional
family nn_lstm
# S-Attn protocol recipe (RESULTS.md "The S-Attn instability, diagnosed")
family attentionmlp --lr 3e-4 --attn_logit_cap 25 --clip_grad 400
family social --n 16 --embedding_arch two_layer --layer_dims 1024
echo "GATE REFRESH COMPLETE $(date +%T)" >>"$log"
