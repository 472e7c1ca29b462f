#!/bin/bash
# 5-seed train+predict sweep over one interaction encoder.
# Usage: scripts/interaction/sweep.sh <type> [extra trainer flags...]
# Mirrors the reference's per-type scripts (scripts/interaction/*.sh) with the
# type as an argument; published configs:
#   vanilla      : (no extra flags)
#   directional  : (no extra flags)                        [D-LSTM]
#   social       : --n 16 --embedding_arch two_layer --layer_dims 1024 [S-LSTM]
#   attentionmlp : --spatial_dim 32 --vel_dim 32 --lr 3e-4   [S-Attn; diverges at lr 1e-3]
#   nn_lstm      : --neigh 4
set -e
interaction=${1:-vanilla}
shift || true
path=${TRAJNET_PATH:-trajdata_split}
data_root=${TRAJNET_DATA_ROOT:-DATA_BLOCK}

for seed in 42 10 20 30 40; do
    python -m trajnetplusplusbaselines_tpu.trainers.lstm \
        --type "$interaction" --augment --save_every 20 --seed $seed \
        --path "$path" --data_root "$data_root" --output seed${seed} "$@"
done

for seed in 42 10 20 30 40; do
    python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
        --path "$path" \
        --output OUTPUT_BLOCK/${path}/lstm_${interaction}_seed${seed}.pkl
done
