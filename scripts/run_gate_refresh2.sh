#!/bin/bash
# Round 5 tail: seed-42 SGAN and VAE published-recipe retrains so the
# multimodal protocol rows get a collision_test gate verdict too (their
# round-3 checkpoints were cleaned from disk; retraining all 5 seeds of
# each would cost ~8 h TPU, so the gate is driven on the canonical seed
# and labeled per-seed in RESULTS.md).  Resumable; eval includes the gate
# scene via the now-standard test/ ride-along.
set -u
cd "$(dirname "$0")/.."
log=${GATE_REFRESH_LOG:-gate_refresh2.log}
path=trajdata_split

stage() { # module type modes extra...
  local module=$1 type=$2 modes=$3; shift 3
  local out="OUTPUT_BLOCK/$path/${module}_${type}_seed42.pkl"
  if [ -f "$out" ]; then
    echo "SKIP TRAIN $out $(date +%T)" >>"$log"
  else
    echo "TRAIN $out $(date +%T)" >>"$log"
    timeout 7200 python -m "trajnetplusplusbaselines_tpu.trainers.$module" \
      --type "$type" --augment --save_every 20 --seed 42 --output seed42 \
      --path "$path" "$@" >>"$log" 2>&1 || {
        echo "TRAIN FAILED $out rc=$? $(date +%T)" >>"$log"; return 1; }
  fi
  echo "EVAL $out $(date +%T)" >>"$log"
  timeout 5400 python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
    --path "$path" --modes "$modes" --fill_missing --output "$out" \
    >>"$log" 2>&1 || echo "EVAL FAILED $out rc=$? $(date +%T)" >>"$log"
}

stage sgan directional 3 --k 3 --d_steps 1 --g_steps 1
stage vae directional 3 --k 3
echo "GATE REFRESH 2 COMPLETE $(date +%T)" >>"$log"
