#!/usr/bin/env python
"""Headline benchmark: 512x512, 50-step CFG sampling throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north-star of 2 images/sec/chip at 512x512/50 steps
(BASELINE.md) — the reference publishes no throughput numbers (SURVEY.md §6).

Runs the full EDLoRAPipeline compute path (CLIP encode -> scan denoise with
CFG -> VAE decode) on SD1.5-sized models in bf16. Weights are random — no SD
checkpoint ships in this environment — which exercises identical compute.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    from mixofshow_tpu.models import (CLIPTextConfig, UNetConfig, VAEConfig,
                                      init_clip_text, init_unet, init_vae)
    from mixofshow_tpu.pipelines import EDLoRAPipeline, init_concepts
    from mixofshow_tpu.text import CLIPTokenizer

    batch = int(os.environ.get('BENCH_BATCH', '1'))
    steps = int(os.environ.get('BENCH_STEPS', '50'))
    size = int(os.environ.get('BENCH_SIZE', '512'))

    ucfg, ccfg, vcfg = UNetConfig.sd15(), CLIPTextConfig.sd15(), VAEConfig.sd15()
    unet = init_unet(0, ucfg)
    te = init_clip_text(1, ccfg)
    vae = init_vae(2, vcfg)
    tok = CLIPTokenizer()
    cfg, table = init_concepts(tok, '<c1>+<c2>', None,
                               np.asarray(te['token_embedding']))
    pipe = EDLoRAPipeline(unet, te, vae, tokenizer=tok,
                          unet_config=ucfg, text_config=ccfg, vae_config=vcfg,
                          new_concept_cfg=cfg, concept_embedding=table)

    prompt = ['a photo of <c1> <c2> on a mountain'] * batch
    # compile
    img = pipe(prompt, height=size, width=size, num_inference_steps=steps,
               seed=0)
    assert np.isfinite(img).all()

    n_runs = int(os.environ.get('BENCH_RUNS', '3'))
    t0 = time.time()
    for i in range(n_runs):
        img = pipe(prompt, height=size, width=size,
                   num_inference_steps=steps, seed=i + 1)
    dt = (time.time() - t0) / n_runs
    imgs_per_sec = batch / dt

    print(json.dumps({
        'metric': f'{size}x{size} {steps}-step images/sec/chip',
        'value': round(imgs_per_sec, 4),
        'unit': 'img/s',
        'vs_baseline': round(imgs_per_sec / 2.0, 4),
    }))


if __name__ == '__main__':
    main()
