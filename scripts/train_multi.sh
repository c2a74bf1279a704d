#!/bin/bash
# Fold x model sweep for contrastive pretraining
# (reference: scripts/train_multi.sh).
set -euo pipefail
PREFIX=${PREFIX:-./data/CS_pulse-shape_data_forLUT/CS_103_Uto2024/fold}

for id in {1..5}; do
  for card in efficientnet_b0_cnn_2_512_clip efficientnet_b0_cnn_2_512_siglip \
              vit_t_16_transformer_2_512_clip vit_t_16_transformer_2_512_siglip; do
    python3 scripts/train_multi.py --dataset "${PREFIX}${id}" \
        --modelcard "model_cards/multi/${card}.yaml"
  done
done
