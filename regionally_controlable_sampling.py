#!/usr/bin/env python
"""Regionally controllable multi-concept sampling CLI.

Drop-in surface for the reference `regionally_controlable_sampling.py`
(--pretrained_model/--sketch_condition/--keypose_condition/--prompt/
--prompt_rewrite/--seed/...; regionally_sample.sh): loads a fused checkpoint
+ new_concept_cfg.json, parses the '[p]-*-[neg]-*-[box]|...' region DSL, and
samples one image with keypose/sketch T2I-Adapter control.

Adapter weights load from local diffusers-format T2IAdapter directories
(--keypose_adapter_path/--sketch_adapter_path; this environment has no hub
egress — the reference pulls TencentARC/t2iadapter_*_sd14v1 from HF,
regionally_controlable_sampling.py:62-63).
"""
from __future__ import annotations

import argparse
import ast
import hashlib
import json
import os

import numpy as np

from mixofshow_tpu.convert.diffusers_import import (_find_weights,
                                                    convert_clip_text,
                                                    convert_unet, convert_vae,
                                                    load_state_dict)
from mixofshow_tpu.diffusion import DPMSolverMultistep
from mixofshow_tpu.models.clip import CLIPTextConfig
from mixofshow_tpu.models.t2i_adapter import (T2IAdapterConfig,
                                              convert_t2i_adapter,
                                              init_t2i_adapter)
from mixofshow_tpu.models.unet import UNetConfig
from mixofshow_tpu.models.vae import VAEConfig
from mixofshow_tpu.pipelines import RegionallyT2IAdapterPipeline
from mixofshow_tpu.text import CLIPTokenizer


def build_model(pretrained_model: str, keypose_adapter_path=None,
                sketch_adapter_path=None, dtype=None,
                model_size: str = 'sd15'):
    import dataclasses
    import jax.numpy as jnp

    if model_size == 'tiny':
        from mixofshow_tpu.zoo import tiny_configs
        ucfg, ccfg, vcfg = tiny_configs()
        adapter_cfgs = (T2IAdapterConfig.tiny(3), T2IAdapterConfig.tiny(1))
    else:
        ucfg, vcfg = UNetConfig.sd15(), VAEConfig.sd15()
        ccfg = CLIPTextConfig.sd15()
        adapter_cfgs = (T2IAdapterConfig.keypose(), T2IAdapterConfig.sketch())

    cfg_json = os.path.join(pretrained_model, 'new_concept_cfg.json')
    assert os.path.exists(cfg_json), f'missing {cfg_json}'
    with open(cfg_json) as f:
        new_concept_cfg = json.load(f)

    te_sd = load_state_dict(_find_weights(
        os.path.join(pretrained_model, 'text_encoder')))
    n_vocab = te_sd['text_model.embeddings.token_embedding.weight'].shape[0]
    ccfg = dataclasses.replace(ccfg, vocab_size=n_vocab)
    te = convert_clip_text(te_sd, ccfg)
    unet = convert_unet(load_state_dict(_find_weights(
        os.path.join(pretrained_model, 'unet'))), ucfg)
    vae = convert_vae(load_state_dict(_find_weights(
        os.path.join(pretrained_model, 'vae'))), vcfg)

    tokenizer = CLIPTokenizer(pretrained_model)
    n_new = n_vocab - tokenizer.vocab_size
    tokenizer.add_tokens([f'<new{i}>' for i in range(n_new)])

    def load_adapter(path, cfg):
        if path and os.path.isdir(path):
            return convert_t2i_adapter(
                load_state_dict(_find_weights(path) or _find_weights(
                    os.path.join(path, 'adapter'))), cfg)
        print(f'adapter path {path!r} not found — random init (no hub '
              'egress in this environment)')
        return init_t2i_adapter(0, cfg)

    pipe = RegionallyT2IAdapterPipeline(
        unet, te, vae, tokenizer=tokenizer,
        unet_config=ucfg, text_config=ccfg, vae_config=vcfg,
        scheduler=DPMSolverMultistep.create(),
        new_concept_cfg=new_concept_cfg,
        keypose_adapter=load_adapter(keypose_adapter_path, adapter_cfgs[0]),
        sketch_adapter=load_adapter(sketch_adapter_path, adapter_cfgs[1]),
        keypose_config=adapter_cfgs[0], sketch_config=adapter_cfgs[1],
        **({'dtype': dtype} if dtype is not None else {}))
    return pipe


def prepare_text(prompt: str, region_prompts: str, height: int, width: int):
    """'[p]-*-[neg]-*-[box]|...' → (context_prompt, [(p, neg, box), ...])
    (reference prepare_text, regionally_controlable_sampling.py:67-94,
    with literal_eval replacing eval)."""
    region_collection = []
    for region in region_prompts.split('|'):
        if region == '':
            break
        prompt_region, neg_prompt_region, pos = region.split('-*-')
        prompt_region = prompt_region.replace('[', '').replace(']', '')
        neg_prompt_region = neg_prompt_region.replace('[', '').replace(']', '')
        pos = ast.literal_eval(pos)
        if len(pos) == 0:
            pos = [0, 0, 1, 1]
        else:
            pos[0], pos[2] = pos[0] / height, pos[2] / height
            pos[1], pos[3] = pos[1] / width, pos[3] / width
        region_collection.append((prompt_region, neg_prompt_region, pos))
    return (prompt, region_collection)


def parse_args():
    parser = argparse.ArgumentParser('', add_help=False)
    parser.add_argument('--pretrained_model', required=True, type=str)
    parser.add_argument('--sketch_condition', default=None, type=str)
    parser.add_argument('--sketch_adaptor_weight', default=1.0, type=float)
    parser.add_argument('--region_sketch_adaptor_weight', default='', type=str)
    parser.add_argument('--keypose_condition', default=None, type=str)
    parser.add_argument('--keypose_adaptor_weight', default=1.0, type=float)
    parser.add_argument('--region_keypose_adaptor_weight', default='', type=str)
    parser.add_argument('--keypose_adapter_path', default=None, type=str)
    parser.add_argument('--sketch_adapter_path', default=None, type=str)
    parser.add_argument('--save_dir', default=None, type=str)
    parser.add_argument('--prompt', default='photo of a toy', type=str)
    parser.add_argument('--negative_prompt', default='', type=str)
    parser.add_argument('--prompt_rewrite', default='', type=str)
    parser.add_argument('--seed', default=16141, type=int)
    parser.add_argument('--suffix', default='', type=str)
    parser.add_argument('--height', default=None, type=int)
    parser.add_argument('--width', default=None, type=int)
    parser.add_argument('--num_inference_steps', default=50, type=int)
    parser.add_argument('--num_images_per_prompt', default=1, type=int,
                        help='batch N images of the layout through one '
                             'denoise scan (different noise per image)')
    parser.add_argument('--model_size', default='sd15', type=str,
                        choices=['sd15', 'tiny'])
    return parser.parse_args()


def main():
    from PIL import Image
    args = parse_args()

    pipe = build_model(args.pretrained_model, args.keypose_adapter_path,
                       args.sketch_adapter_path,
                       model_size=args.model_size)

    sketch_condition, width_sketch, height_sketch = None, 0, 0
    if args.sketch_condition and os.path.exists(args.sketch_condition):
        sketch_condition = Image.open(args.sketch_condition).convert('L')
        width_sketch, height_sketch = sketch_condition.size
        print('use sketch condition')
    else:
        print('skip sketch condition')

    keypose_condition, width_pose, height_pose = None, 0, 0
    if args.keypose_condition and os.path.exists(args.keypose_condition):
        keypose_condition = Image.open(args.keypose_condition).convert('RGB')
        width_pose, height_pose = keypose_condition.size
        print('use pose condition')
    else:
        print('skip pose condition')

    if width_sketch and width_pose:
        assert (width_sketch == width_pose
                and height_sketch == height_pose), \
            'conditions should be same size'
    width = max(width_pose, width_sketch) or (args.width or 512)
    height = max(height_pose, height_sketch) or (args.height or 512)

    input_prompt = [prepare_text(args.prompt, args.prompt_rewrite, height,
                                 width)]

    images = pipe(
        prompt=input_prompt,
        negative_prompt=[args.negative_prompt],
        keypose_adapter_input=(
            [keypose_condition] if keypose_condition else None),
        keypose_adaptor_weight=args.keypose_adaptor_weight,
        region_keypose_adaptor_weight=args.region_keypose_adaptor_weight,
        sketch_adapter_input=(
            [sketch_condition] if sketch_condition else None),
        sketch_adaptor_weight=args.sketch_adaptor_weight,
        region_sketch_adaptor_weight=args.region_sketch_adaptor_weight,
        height=height, width=width,
        num_inference_steps=args.num_inference_steps,
        num_images_per_prompt=args.num_images_per_prompt,
        seed=args.seed, output_type='pil')

    configs = [
        f'pretrained_model: {args.pretrained_model}\n',
        f'context_prompt: {args.prompt}\n',
        f'neg_context_prompt: {args.negative_prompt}\n',
        f'sketch_condition: {args.sketch_condition}\n',
        f'sketch_adaptor_weight: {args.sketch_adaptor_weight}\n',
        f'region_sketch_adaptor_weight: {args.region_sketch_adaptor_weight}\n',
        f'keypose_condition: {args.keypose_condition}\n',
        f'keypose_adaptor_weight: {args.keypose_adaptor_weight}\n',
        f'region_keypose_adaptor_weight: '
        f'{args.region_keypose_adaptor_weight}\n',
        f'random seed: {args.seed}\n',
        f'prompt_rewrite: {args.prompt_rewrite}\n',
    ]
    hash_code = hashlib.sha256(''.join(configs).encode()).hexdigest()[:8]
    save_prompt = input_prompt[0][0].replace(' ', '_')
    save_dir = os.path.join(args.save_dir or 'results/regional',
                            f'seed_{args.seed}')
    os.makedirs(save_dir, exist_ok=True)
    for i, image in enumerate(images):
        idx = f'---{i}' if len(images) > 1 else ''
        save_name = f'{save_prompt}---{args.suffix}---{hash_code}{idx}.png'
        image.save(os.path.join(save_dir, save_name))
        with open(os.path.join(save_dir, save_name.replace('.png', '.txt')),
                  'w') as fw:
            fw.writelines(configs)
        print(f'saved {os.path.join(save_dir, save_name)}')


if __name__ == '__main__':
    main()
