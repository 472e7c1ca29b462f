#!/bin/bash
# Phase-2 runs after the main 5-seed protocol (VERDICT round-1 #5/#8/#9):
# - goal-conditioned D-LSTM (--goals, goal_files/ from tools.get_dest)
# - NMMP-pooled LSTM
# - a 50-mode SGAN prediction run driving the evaluator's NLL branch
#   (/root/reference/evaluator/trajnet_evaluator.py:158-165)
set -u
path=${TRAJNET_PATH:-trajdata_split}
data_root=${TRAJNET_DATA_ROOT:-DATA_BLOCK}
log=${SWEEP_LOG:-extras.log}

run() {
  for attempt in 1 2 3; do
    timeout 2400 "$@" >>"$log" 2>&1 && return 0
    echo "RETRY($attempt) rc=$?: $*" >>"$log"
    sleep 15
  done
  echo "FAILED: $*" >>"$log"
  return 1
}

# goal-conditioned D-LSTM (reference lstm.py:110-115 goal embedding)
out="OUTPUT_BLOCK/$path/lstm_goals_directional_seed42.pkl"
if [ ! -f "$out.epoch25" ]; then
  echo "TRAIN $out $(date +%T)" >>"$log"
  run python -m trajnetplusplusbaselines_tpu.trainers.lstm \
    --type directional --goals --augment --save_every 20 --seed 42 \
    --path "$path" --data_root "$data_root" --output seed42
fi

# NMMP
out="OUTPUT_BLOCK/$path/lstm_nmmp_seed42.pkl"
if [ ! -f "$out.epoch25" ]; then
  echo "TRAIN $out $(date +%T)" >>"$log"
  run python -m trajnetplusplusbaselines_tpu.trainers.lstm \
    --type nmmp --augment --save_every 20 --seed 42 \
    --path "$path" --data_root "$data_root" --output seed42
fi

echo "EVAL goals $(date +%T)" >>"$log"
run python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
  --path "$path" --output "OUTPUT_BLOCK/$path/lstm_goals_directional_seed42.pkl"
echo "EVAL nmmp $(date +%T)" >>"$log"
run python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
  --path "$path" --output "OUTPUT_BLOCK/$path/lstm_nmmp_seed42.pkl"

# SGAN variety-only (reference scripts/multimodal/variety.sh: --d_steps 0)
for seed in 42 10 20 30 40; do
  out="OUTPUT_BLOCK/$path/sgan_directional_seed${seed}_variety.pkl"
  if [ ! -f "$out.epoch25" ]; then
    echo "TRAIN $out $(date +%T)" >>"$log"
    run python -m trajnetplusplusbaselines_tpu.trainers.sgan \
      --type directional --augment --save_every 20 --seed "$seed" \
      --path "$path" --data_root "$data_root" \
      --output "seed${seed}_variety" --k 3 --d_steps 0
  fi
done
for seed in 42 10 20 30 40; do
  echo "EVAL variety seed$seed $(date +%T)" >>"$log"
  run python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
    --path "$path" --modes 3 \
    --output "OUTPUT_BLOCK/$path/sgan_directional_seed${seed}_variety.pkl"
done

# 50-mode SGAN: exercises the modes>48 NLL evaluator branch end-to-end
echo "EVAL sgan modes=50 $(date +%T)" >>"$log"
run python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
  --path "$path" --modes 50 --batch_scenes 16 \
  --output "OUTPUT_BLOCK/$path/sgan_directional_seed42.pkl"
echo "EXTRAS COMPLETE $(date +%T)" >>"$log"
