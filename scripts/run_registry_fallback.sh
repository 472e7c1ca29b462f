#!/bin/bash
# Per-seed fallback for the two registry families whose 5-member vmapped
# ensemble crashes the TPU worker (registry.log round 4): dir_social dies
# with a kernel fault even under --remat, nmmp HBM-OOMs (f32[11,5,8,128,128]
# temporaries from 5 members x 5 message-passing iterations).  Single-seed
# runs of both families are verified to train fine on TPU, so each seed
# trains in its own single-model process (the run_protocol.sh `train` shape),
# then all five checkpoints of a family evaluate in ONE lstm_cli process
# (compiled programs shared in-process; see CLAUDE.md).
#
# Order is train+eval PER FAMILY, dir_social first: its protocol row is
# missing entirely (nmmp already has a single-seed row), so if the round ends
# mid-script the highest-value artifact is already complete.
#
# Waits for the run_registry.sh chain (PID in /tmp/registry.pid) to release
# the TPU before starting, so at most 2 TPU clients ever run concurrently.
# DEADLINE_TS (unix seconds, optional): no new run starts after it, so
# background training never contends with the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
path=${TRAJNET_PATH:-trajdata_split}
data_root=${TRAJNET_DATA_ROOT:-DATA_BLOCK}
log=${SWEEP_LOG:-registry_fallback.log}
SEEDS=${SEEDS:-"42 10 20 30 40"}
DEADLINE_TS=${DEADLINE_TS:-0}

if [ -f /tmp/registry.pid ]; then
  while kill -0 "$(cat /tmp/registry.pid)" 2>/dev/null; do sleep 60; done
fi

past_deadline() {
  [ "$DEADLINE_TS" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE_TS" ]
}

run() {
  for attempt in 1 2 3; do
    timeout 3600 "$@" >>"$log" 2>&1 && return 0
    echo "RETRY($attempt) rc=$?: $*" >>"$log"
    sleep 15
  done
  echo "FAILED: $*" >>"$log"
  return 1
}

for type in dir_social nmmp; do
  trained=""
  for seed in $SEEDS; do
    out="OUTPUT_BLOCK/$path/lstm_${type}_seed${seed}.pkl"
    if [ -f "$out" ] && [ -f "$out.epoch25" ]; then
      echo "SKIP (done): $out" >>"$log"
      trained="$trained $out"
      continue
    fi
    if past_deadline; then
      echo "DEADLINE reached before TRAIN $out $(date +%T)" >>"$log"
      break
    fi
    echo "TRAIN $out $(date +%T)" >>"$log"
    run python -m trajnetplusplusbaselines_tpu.trainers.lstm \
      --type "$type" --augment --save_every 20 --seed "$seed" \
      --path "$path" --data_root "$data_root" --output "seed${seed}" \
      && trained="$trained $out"
  done
  if [ -n "$trained" ] && ! past_deadline; then
    echo "EVAL lstm_${type}:$trained $(date +%T)" >>"$log"
    run python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
      --path "$path" --output $trained
  else
    echo "SKIP EVAL lstm_${type} (deadline or nothing trained) $(date +%T)" >>"$log"
  fi
done
echo "FALLBACK COMPLETE $(date +%T)" >>"$log"
