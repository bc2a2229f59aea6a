"""Model bundle loading shared by the CLIs.

Loads a diffusers SD1.x checkpoint directory when `pretrained_path` points at
one (the reference's from_pretrained surface, trainer_edlora.py:38-41), or
random-initializes the requested architecture otherwise — this environment
ships no SD weights, and random weights exercise the full compute path for
tests/benchmarks.

`pretrained_path` forms:
  /path/to/diffusers_dir      — load weights + tokenizer vocab
  random:sd15 | random:tiny   — random init at that size (seeded)
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, Optional

from mixofshow_tpu.models import (CLIPTextConfig, UNetConfig, VAEConfig,
                                  init_clip_text, init_unet, init_vae)
from mixofshow_tpu.text import CLIPTokenizer

logger = logging.getLogger('mixofshow_tpu')


@dataclasses.dataclass
class ModelBundle:
    unet: Dict
    text_encoder: Dict
    vae: Dict
    tokenizer: CLIPTokenizer
    unet_config: UNetConfig
    text_config: CLIPTextConfig
    vae_config: VAEConfig
    prediction_type: str = 'epsilon'


def tiny_configs():
    u = UNetConfig.tiny()
    c = CLIPTextConfig(width=u.cross_attention_dim, layers=2, heads=2,
                       mlp_dim=128)
    v = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_groups=8)
    return u, c, v


def load_models(pretrained_path: str, seed: int = 0) -> ModelBundle:
    if pretrained_path and os.path.isdir(pretrained_path):
        from mixofshow_tpu.convert import load_pipeline_params
        out = load_pipeline_params(pretrained_path)
        cfgs = out['configs']
        missing = {'unet', 'vae', 'text_encoder'} - set(out)
        if missing:
            raise FileNotFoundError(
                f'checkpoint dir {pretrained_path} missing: {missing}')
        return ModelBundle(
            unet=out['unet'], text_encoder=out['text_encoder'],
            vae=out['vae'], tokenizer=CLIPTokenizer(pretrained_path),
            unet_config=cfgs['unet'], text_config=cfgs['text_encoder'],
            vae_config=cfgs['vae'],
            prediction_type=cfgs['prediction_type'])

    size = (pretrained_path or 'random:sd15').split(':')[-1]
    if size == 'tiny':
        ucfg, ccfg, vcfg = tiny_configs()
    else:
        ucfg, ccfg, vcfg = (UNetConfig.sd15(), CLIPTextConfig.sd15(),
                            VAEConfig.sd15())
    logger.warning('pretrained_path %r is not a checkpoint dir — '
                   'random-initializing %s models (seed %d)',
                   pretrained_path, size, seed)
    return ModelBundle(
        unet=init_unet(seed, ucfg),
        text_encoder=init_clip_text(seed + 1, ccfg),
        vae=init_vae(seed + 2, vcfg),
        tokenizer=CLIPTokenizer(),
        unet_config=ucfg, text_config=ccfg, vae_config=vcfg)
