#!/bin/bash
# Second concurrent training stream: SGAN + VAE seeds, run while the main
# protocol grinds through the social LSTM runs.  Same skip/retry contract as
# run_protocol.sh, so whichever stream reaches a config first trains it and
# the other skips it (the main protocol only reaches sgan/vae hours later).
set -u
path=${TRAJNET_PATH:-trajdata_split}
data_root=${TRAJNET_DATA_ROOT:-DATA_BLOCK}
log=${SWEEP_LOG:-stream2.log}
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

train() {
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

for seed in $SEEDS; do
  train sgan sgan directional "$seed" --k 3 --d_steps 1 --g_steps 1
done
for seed in $SEEDS; do train vae vae directional "$seed" --k 3; done
echo "STREAM2 COMPLETE $(date +%T)" >>"$log"
