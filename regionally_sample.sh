#!/usr/bin/env bash
# Regionally controllable multi-concept sampling (reference regionally_sample.sh).
fused_model="experiments/composed_edlora/potter+hermione+thanos_chilloutmix/combined_model_base"
expdir="potter+hermione+thanos_chilloutmix"

keypose_condition='datasets/validation_spatial_condition/multi-characters/real_pose/potter_hermione_thanos_pose.png'
keypose_adaptor_weight=1.0
sketch_condition=''
sketch_adaptor_weight=1.0

context_prompt='two people are standing near a lake, 4K, high quality, high resolution, best quality'
context_neg_prompt='cropped, worst quality, low quality'

region1_prompt='[a <potter1> <potter2>, in a jacket, standing near a lake]'
region1_neg_prompt="[${context_neg_prompt}]"
region1='[12, 36, 1024, 600]'

region2_prompt='[a <hermione1> <hermione2>, in a dress, standing near a lake]'
region2_neg_prompt="[${context_neg_prompt}]"
region2='[18, 696, 1024, 1180]'

prompt_rewrite="${region1_prompt}-*-${region1_neg_prompt}-*-${region1}|${region2_prompt}-*-${region2_neg_prompt}-*-${region2}"

python regionally_controlable_sampling.py \
  --pretrained_model="${fused_model}" \
  --sketch_adaptor_weight=${sketch_adaptor_weight} \
  --sketch_condition="${sketch_condition}" \
  --keypose_adaptor_weight=${keypose_adaptor_weight} \
  --keypose_condition="${keypose_condition}" \
  --save_dir="results/multi-concept/${expdir}" \
  --prompt="${context_prompt}" \
  --negative_prompt="${context_neg_prompt}" \
  --prompt_rewrite="${prompt_rewrite}" \
  --suffix="baseline" \
  --seed=19
