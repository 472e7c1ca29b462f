#!/bin/bash
# Phase 2 of the round-2 protocol: remaining social-LSTM seeds, then the full
# eval pass, then the extras stream.  Runs alongside scripts/run_stream2.sh
# (which owns the sgan/vae seed trainings): before evaluating a multimodal
# checkpoint this script WAITS for stream2 to finish it, so the two streams
# never write the same files.
set -u
path=${TRAJNET_PATH:-trajdata_split}
data_root=${TRAJNET_DATA_ROOT:-DATA_BLOCK}
log=${SWEEP_LOG:-sweeps.log}
SEEDS=${SEEDS:-"42 10 20 30 40"}

run() {
  for attempt in 1 2 3; do
    timeout 3600 "$@" >>"$log" 2>&1 && return 0
    echo "RETRY($attempt) rc=$?: $*" >>"$log"
    sleep 15
  done
  echo "FAILED: $*" >>"$log"
  return 1
}

train() { # prefix module type seed extra-flags...
  local prefix=$1 module=$2 type=$3 seed=$4
  shift 4
  local out="OUTPUT_BLOCK/$path/${prefix}_${type}_seed${seed}.pkl"
  if [ -f "$out" ] && [ -f "$out.epoch25" ]; then
    echo "SKIP train (done): $out" >>"$log"
    return 0
  fi
  echo "TRAIN $out $(date +%T)" >>"$log"
  run python -m "trajnetplusplusbaselines_tpu.trainers.$module" \
    --type "$type" --augment --save_every 20 --seed "$seed" \
    --path "$path" --data_root "$data_root" --output "seed${seed}" "$@"
}

wait_for() { # block until checkpoint + .epoch25 exist (stream2 finished it)
  local out=$1
  until [ -f "$out" ] && [ -f "$out.epoch25" ]; do
    echo "WAIT for $out $(date +%T)" >>"$log"
    sleep 60
  done
}

evaluate() { # model.pkl [--modes k]
  echo "EVAL $1 $(date +%T)" >>"$log"
  run python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
    --path "$path" --output "$1" "${@:2}"
}

for seed in $SEEDS; do
  train lstm lstm social "$seed" --n 16 --embedding_arch two_layer --layer_dims 1024
done

for type in directional vanilla nn_lstm attentionmlp social; do
  for seed in $SEEDS; do
    evaluate "OUTPUT_BLOCK/$path/lstm_${type}_seed${seed}.pkl"
  done
done
for seed in $SEEDS; do
  out="OUTPUT_BLOCK/$path/sgan_directional_seed${seed}.pkl"
  wait_for "$out"
  evaluate "$out" --modes 3
done
for seed in $SEEDS; do
  out="OUTPUT_BLOCK/$path/vae_directional_seed${seed}.pkl"
  wait_for "$out"
  evaluate "$out" --modes 3
done
echo "PROTOCOL COMPLETE $(date +%T)" >>"$log"

bash scripts/run_extras.sh
