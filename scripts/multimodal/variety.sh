#!/bin/bash
# SGAN variety-loss-only sweep (k=3, no discriminator), as the reference's
# scripts/multimodal/variety.sh.
set -e
interaction=${1:-directional}
path=${TRAJNET_PATH:-trajdata_split}
data_root=${TRAJNET_DATA_ROOT:-DATA_BLOCK}
modes=3

for seed in 42 10 20 30 40; do
    python -m trajnetplusplusbaselines_tpu.trainers.sgan \
        --type "$interaction" --augment --save_every 20 --seed $seed \
        --path "$path" --data_root "$data_root" \
        --output seed${seed}_variety --k $modes --d_steps 0
done

for seed in 42 10 20 30 40; do
    python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
        --path "$path" --modes $modes \
        --output OUTPUT_BLOCK/${path}/sgan_${interaction}_seed${seed}_variety.pkl
done
