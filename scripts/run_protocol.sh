#!/bin/bash
# Full published 5-seed protocol over every model family (VERDICT round-1 #2).
# Mirrors /root/reference/scripts/interaction/*.sh + scripts/multimodal/*.sh:
# seeds 42/10/20/30/40, 25 epochs, --augment, default hyperparams per family.
# Resilient to the flaky TPU tunnel: every command retries up to 3 times, and
# completed runs (checkpoint .epoch25 present) are skipped so the script can
# resume after interruption.
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

evaluate() { # model.pkl [--modes k]
  echo "EVAL $1 $(date +%T)" >>"$log"
  run python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
    --path "$path" --output "$1" "${@:2}"
}

for seed in $SEEDS; do train lstm lstm directional "$seed"; done
for seed in $SEEDS; do train lstm lstm vanilla "$seed"; done
for seed in $SEEDS; do train lstm lstm nn_lstm "$seed" --neigh 4; done
for seed in $SEEDS; do
  train lstm lstm attentionmlp "$seed" --spatial_dim 32 --vel_dim 32 --lr 3e-4
done
for seed in $SEEDS; do
  train lstm lstm social "$seed" --n 16 --embedding_arch two_layer --layer_dims 1024
done
for seed in $SEEDS; do
  train sgan sgan directional "$seed" --k 3 --d_steps 1 --g_steps 1
done
for seed in $SEEDS; do train vae vae directional "$seed" --k 3; done

for type in directional vanilla nn_lstm attentionmlp social; do
  for seed in $SEEDS; do
    evaluate "OUTPUT_BLOCK/$path/lstm_${type}_seed${seed}.pkl"
  done
done
for seed in $SEEDS; do
  evaluate "OUTPUT_BLOCK/$path/sgan_directional_seed${seed}.pkl" --modes 3
done
for seed in $SEEDS; do
  evaluate "OUTPUT_BLOCK/$path/vae_directional_seed${seed}.pkl" --modes 3
done
echo "PROTOCOL COMPLETE $(date +%T)" >>"$log"
