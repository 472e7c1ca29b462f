#!/bin/bash
# Registry completion runs (VERDICT r3 #4): a protocol row for every --type
# in the pooling registry that run_protocol.sh does not already cover, plus
# NMMP and goal-conditioned D-LSTM promoted from single-seed to the full
# 5-seed protocol.  All LSTM families train their 5 seeds in ONE vmapped
# ensemble process (trainers/ensemble.py); evaluation passes all five seed
# checkpoints to a single lstm_cli invocation (compiled programs shared
# in-process; the axon remote AOT compiler bypasses the persistent cache).
#
# Reference anchors: occupancy is the published Social-LSTM ablation
# (/root/reference/trajnetbaselines/lstm/gridbased_pooling.py:112-116),
# nn/traj_pool are non_gridbased_pooling.py:64,457, dir_social is
# gridbased_pooling.py:172-212, NMMP more_non_gridbased_pooling.py:5-79.
# None ship a training script, so each trains at the trainer defaults
# + --augment (the vanilla.sh recipe), like the other registry rows.
set -u
cd "$(dirname "$0")/.."
path=${TRAJNET_PATH:-trajdata_split}
data_root=${TRAJNET_DATA_ROOT:-DATA_BLOCK}
log=${SWEEP_LOG:-registry.log}
SEEDS=${SEEDS:-"42 10 20 30 40"}

run() {
  for attempt in 1 2 3; do
    timeout 5400 "$@" >>"$log" 2>&1 && return 0
    echo "RETRY($attempt) rc=$?: $*" >>"$log"
    sleep 15
  done
  echo "FAILED: $*" >>"$log"
  return 1
}

all_done() { # prefix type
  local prefix=$1 type=$2 seed
  for seed in $SEEDS; do
    local out="OUTPUT_BLOCK/$path/${prefix}_${type}_seed${seed}.pkl"
    [ -f "$out" ] && [ -f "$out.epoch25" ] || return 1
  done
  return 0
}

train_ensemble() { # prefix type extra-flags...
  local prefix=$1 type=$2
  shift 2
  if all_done "$prefix" "$type"; then
    echo "SKIP ensemble train (done): ${prefix}_$type" >>"$log"
    return 0
  fi
  echo "TRAIN ensemble ${prefix}_$type seeds [$SEEDS] $(date +%T)" >>"$log"
  run python -m trajnetplusplusbaselines_tpu.trainers.ensemble \
    --type "$type" --augment --save_every 20 --seeds $SEEDS \
    --path "$path" --data_root "$data_root" "$@"
}

evaluate() { # prefix type extra-flags...
  local prefix=$1 type=$2 outs=""
  shift 2
  local seed
  for seed in $SEEDS; do
    outs="$outs OUTPUT_BLOCK/$path/${prefix}_${type}_seed${seed}.pkl"
  done
  echo "EVAL ${prefix}_${type} seeds [$SEEDS] $(date +%T)" >>"$log"
  run python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
    --path "$path" --output $outs "$@"
}

train_ensemble lstm occupancy
train_ensemble lstm dir_social
train_ensemble lstm nn --neigh 4
train_ensemble lstm traj_pool
train_ensemble lstm nmmp
train_ensemble lstm_goals directional --goals

for type in occupancy dir_social nn traj_pool nmmp; do
  evaluate lstm "$type"
done
evaluate lstm_goals directional
echo "REGISTRY COMPLETE $(date +%T)" >>"$log"
