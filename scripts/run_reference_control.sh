#!/bin/bash
# Reference-engine control runs on trajdata_split (VERDICT round-2 #3).
# Trains the *reference* torch trainer (CPU, ~1.7 h/run on this 1-core box)
# under the same recipe as scripts/run_protocol.sh; evaluate the resulting
# torch checkpoints with tools/eval_reference_checkpoint.py.
# Ordered so that one seed of each config completes before second seeds start.
set -u
cd "$(dirname "$0")/.."
log=${REFCTL_LOG:-refctl.log}

train() { # type seed
  local type=$1 seed=$2
  local out="OUTPUT_BLOCK/trajdata_split/lstm_${type}_refctl_seed${seed}.pkl"
  if [ -f "$out" ] && [ -f "$out.epoch25" ]; then
    echo "SKIP (done): $out" >>"$log"
    return 0
  fi
  echo "TRAIN $out $(date +%T)" >>"$log"
  nice -n 19 python scripts/reference_control.py \
    --type "$type" --augment --save_every 25 --path trajdata_split \
    --seed "$seed" --output "refctl_seed${seed}" >>"$log" 2>&1 \
    || echo "FAILED: $type seed $seed rc=$?" >>"$log"
}

train_x() { # prefix type seed extra-args...
  local prefix=$1 type=$2 seed=$3; shift 3
  local out="OUTPUT_BLOCK/trajdata_split/${prefix}_${type}_refctl_seed${seed}.pkl"
  if [ -f "$out" ] && [ -f "$out.epoch25" ]; then
    echo "SKIP (done): $out" >>"$log"
    return 0
  fi
  echo "TRAIN $out $(date +%T)" >>"$log"
  nice -n 19 python scripts/reference_control.py \
    --type "$type" --augment --save_every 25 --path trajdata_split \
    --seed "$seed" --output "refctl_seed${seed}" "$@" >>"$log" 2>&1 \
    || echo "FAILED: $prefix $type seed $seed rc=$?" >>"$log"
}

train vanilla 42
train directional 42
train vanilla 10
train directional 10
# Round-4 additions (VERDICT r3 #2/#6): engine-for-engine controls for the
# remaining published families, highest-information first.
# S-LSTM: /root/reference/scripts/interaction/social.sh recipe.
train_x lstm social 42 --n 16 --embedding_arch two_layer --layer_dims 1024
# S-GAN: /root/reference/scripts/multimodal/sgan.sh recipe (k=3 variety).
train_x sgan directional 42 --module sgan --k 3
# S-Attn at the stabilized lr: the reference trainer exposes --lr but has NO
# grad-clip or logit-cap flags (trainer.py's optimizer step is unclipped), so
# this control carries 1 of the 3 stabilization ingredients — documented in
# RESULTS.md's control section.
train_x lstm attentionmlp 42 --lr 3e-4
echo "REFCTL COMPLETE $(date +%T)" >>"$log"
