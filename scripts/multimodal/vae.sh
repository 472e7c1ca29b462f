#!/bin/bash
# VAE multimodal sweep.
set -e
interaction=${1:-directional}
path=${TRAJNET_PATH:-trajdata_split}
data_root=${TRAJNET_DATA_ROOT:-DATA_BLOCK}
modes=3

for seed in 42 10 20 30 40; do
    python -m trajnetplusplusbaselines_tpu.trainers.vae \
        --type "$interaction" --augment --save_every 20 --seed $seed \
        --path "$path" --data_root "$data_root" --output seed${seed} --k $modes
done

for seed in 42 10 20 30 40; do
    python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
        --path "$path" --modes $modes \
        --output OUTPUT_BLOCK/${path}/vae_${interaction}_seed${seed}.pkl
done
