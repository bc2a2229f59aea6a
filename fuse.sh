#!/usr/bin/env bash
# Fuse trained concept ED-LoRAs into one base checkpoint (reference fuse.sh).
config_file="potter+hermione+thanos_chilloutmix"

python gradient_fusion.py \
    --concept_cfg="datasets/data_cfgs/multi-concept/real/${config_file}.json" \
    --save_path="experiments/composed_edlora/${config_file}" \
    --pretrained_models="experiments/pretrained_models/chilloutmix" \
    --optimize_textenc_iters=500 \
    --optimize_unet_iters=50
