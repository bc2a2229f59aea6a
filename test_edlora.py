#!/usr/bin/env python
"""ED-LoRA checkpoint validation CLI (alpha sweep sampling).

Drop-in surface for the reference `test_edlora.py` (`python test_edlora.py
-opt options/test/EDLoRA/....yml`): load a delta checkpoint, sample every
validation prompt with fixed per-index latents at each alpha in
`val.alpha_list`, write per-image PNGs + composed grid.

TPU-first difference: alphas share one compiled sampling program (unmerged
LoRA + traced alpha scalar) instead of re-merging an fp16 pipeline per alpha
(reference test_edlora.py:89-94).
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from mixofshow_tpu.convert.delta_io import load_edlora_delta
from mixofshow_tpu.convert.diffusers_import import convert_edlora_delta
from mixofshow_tpu.data import PromptDataset
from mixofshow_tpu.diffusion import DPMSolverMultistep
from mixofshow_tpu.parallel import make_mesh
from mixofshow_tpu.pipelines import EDLoRAPipeline, init_concepts
from mixofshow_tpu.pipelines.validation import visual_validation
from mixofshow_tpu.utils.logging_utils import set_path_logger
from mixofshow_tpu.utils.options import load_options, set_manual_seed
from mixofshow_tpu.zoo import load_models


def test(args):
    opt = load_options(args.opt)
    if opt.get('manual_seed') is not None:
        set_manual_seed(opt['manual_seed'])
    logger = set_path_logger(opt, args.opt, is_train=False)
    logger.info(f'devices: {jax.devices()}')

    bundle = load_models(opt['models'].get('pretrained_path'),
                         seed=opt.get('manual_seed', 0))

    # register concept tokens exactly as training did, then load the delta
    new_concept_cfg, _ = init_concepts(
        bundle.tokenizer, opt['models']['new_concept_token'], None,
        np.asarray(bundle.text_encoder['token_embedding']),
        enable_edlora=opt['models'].get('enable_edlora', True))

    delta = convert_edlora_delta(load_edlora_delta(opt['path']['lora_path']))
    concept_table = np.concatenate(
        [delta['new_concept_embedding'][name] for name in new_concept_cfg],
        axis=0)

    val_dataset = PromptDataset(opt['datasets']['val_vis'])
    # shard validation batches across every available chip (the reference
    # distributes this via accelerate processes, test_edlora.py:24-57)
    mesh = make_mesh()
    mesh = mesh if mesh.shape['data'] > 1 else None
    for alpha in opt['val'].get('alpha_list', [1.0]):
        logger.info(f'validation at alpha={alpha}')
        pipe = EDLoRAPipeline(
            bundle.unet, bundle.text_encoder, bundle.vae,
            tokenizer=bundle.tokenizer, unet_config=bundle.unet_config,
            text_config=bundle.text_config, vae_config=bundle.vae_config,
            scheduler=DPMSolverMultistep.create(
                prediction_type=bundle.prediction_type),
            new_concept_cfg=new_concept_cfg,
            concept_embedding=concept_table,
            unet_lora=delta['unet_lora'] or None,
            text_lora=delta['text_lora'] or None,
            lora_alpha=float(alpha), mesh=mesh)
        out = visual_validation(pipe, val_dataset, f'Alpha-{alpha}', opt)
        logger.info(f'wrote {out}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True)
    test(parser.parse_args())
