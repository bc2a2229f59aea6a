#!/usr/bin/env python
"""Generate the golden regression arrays under tests/goldens/.

Each function builds a fully deterministic tiny-model workflow (fixed init
seeds, fixed torch-seeded latents, fp32 compute on the CPU backend) and
returns a small fp32 array. `main()` saves them; tests/test_goldens.py
compares live runs against the saved files.

Run deliberately (a numeric change is a reviewable event, not noise):
  JAX_PLATFORMS=cpu python tools/gen_goldens.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'goldens')

PROMPT = 'a photo of <g1> <g2> at the beach'


def _pipe(with_lora: bool):
    import jax.numpy as jnp

    from mixofshow_tpu.models import lora as lora_lib
    from mixofshow_tpu.pipelines import EDLoRAPipeline, init_concepts
    from mixofshow_tpu.zoo import load_models

    bundle = load_models('random:tiny', seed=0)
    cfg, table = init_concepts(
        bundle.tokenizer, '<g1>+<g2>', None,
        np.asarray(bundle.text_encoder['token_embedding']))
    kw = {}
    if with_lora:
        # deterministic non-zero LoRA: kaiming down + a fixed non-zero up
        lora = lora_lib.init_lora_tree(
            3, bundle.unet, lambda p: '/attn1/' in p or '/attn2/' in p,
            rank=4, dtype=jnp.float32)
        lora = _fill_up(lora)
        kw = dict(unet_lora=lora, lora_alpha=1.0)
    return EDLoRAPipeline(
        bundle.unet, bundle.text_encoder, bundle.vae,
        tokenizer=bundle.tokenizer, unet_config=bundle.unet_config,
        text_config=bundle.text_config, vae_config=bundle.vae_config,
        new_concept_cfg=cfg, concept_embedding=table,
        dtype=jnp.float32, **kw)


def _fill_up(lora):
    import jax
    import jax.numpy as jnp

    def fill(leaf):
        if isinstance(leaf, dict) and 'up' in leaf:
            return dict(leaf, up=jnp.full_like(leaf['up'], 0.02))
        return leaf
    return jax.tree.map(fill, lora,
                        is_leaf=lambda x: isinstance(x, dict) and 'up' in x)


def _latents(b=2):
    from mixofshow_tpu.data.prompt_dataset import _seeded_latents
    return np.stack([_seeded_latents((4, 8, 8), seed=i + 1)
                     for i in range(b)])


def edlora_sample():
    pipe = _pipe(with_lora=False)
    img = pipe([PROMPT, 'a castle'], height=64, width=64,
               num_inference_steps=2, guidance_scale=4.0,
               latents=_latents(), output_type='np')
    return np.asarray(img, np.float32)


def edlora_sample_with_lora():
    pipe = _pipe(with_lora=True)
    img = pipe([PROMPT], height=64, width=64, num_inference_steps=2,
               guidance_scale=4.0, latents=_latents(1), output_type='np')
    return np.asarray(img, np.float32)


def regional_sample():
    import dataclasses

    import jax.numpy as jnp
    from PIL import Image

    from mixofshow_tpu.models.t2i_adapter import (T2IAdapterConfig,
                                                  init_t2i_adapter)
    from mixofshow_tpu.pipelines import (RegionallyT2IAdapterPipeline,
                                         init_concepts)
    from mixofshow_tpu.zoo import load_models

    bundle = load_models('random:tiny', seed=0)
    cfg, table = init_concepts(
        bundle.tokenizer, '<g1> <g2>', None,
        np.asarray(bundle.text_encoder['token_embedding']))
    # fused-checkpoint layout: concept rows live inside the expanded table
    te = dict(bundle.text_encoder)
    te['token_embedding'] = jnp.concatenate(
        [jnp.asarray(te['token_embedding']), jnp.asarray(table)])
    big_c = dataclasses.replace(bundle.text_config,
                                vocab_size=bundle.text_config.vocab_size
                                + table.shape[0])
    acfg = T2IAdapterConfig.tiny(3)
    pipe = RegionallyT2IAdapterPipeline(
        bundle.unet, te, bundle.vae,
        tokenizer=bundle.tokenizer, unet_config=bundle.unet_config,
        text_config=big_c, vae_config=bundle.vae_config,
        new_concept_cfg=cfg,
        keypose_adapter=init_t2i_adapter(7, acfg), keypose_config=acfg,
        dtype=jnp.float32)
    keypose = np.zeros((64, 64, 3), np.uint8)
    keypose[16:48, 16:48] = 255
    regions = [('a <g1> <g2> person', 'lowres', [0.0, 0.0, 1.0, 0.5]),
               ('a castle', 'blurry', [0.0, 0.5, 1.0, 1.0])]
    img = pipe([('two friends at a lake', regions)],
               keypose_adapter_input=[Image.fromarray(keypose)],
               keypose_adaptor_weight=0.8,
               height=64, width=64, num_inference_steps=2,
               guidance_scale=4.0, seed=5, output_type='np')
    return np.asarray(img, np.float32)


def train_losses():
    import jax
    import jax.numpy as jnp

    from mixofshow_tpu.models import init_clip_text, init_unet, init_vae
    from mixofshow_tpu.pipelines.concepts import bind_concept_prompt
    from mixofshow_tpu.pipelines.trainer_edlora import (EDLoRATrainer,
                                                        make_optimizer)
    from mixofshow_tpu.text import CLIPTokenizer
    from mixofshow_tpu.zoo import tiny_configs

    ucfg, ccfg, vcfg = tiny_configs()
    ft = {'text_embedding': {'enable_tuning': True, 'lr': 1e-3},
          'text_encoder': {'enable_tuning': True, 'lr': 1e-5,
                           'lora_cfg': {'rank': 4}},
          'unet': {'enable_tuning': True, 'lr': 1e-4,
                   'lora_cfg': {'rank': 4}}}
    trainer = EDLoRATrainer(
        init_unet(0, ucfg), init_clip_text(1, ccfg), init_vae(2, vcfg),
        tokenizer=CLIPTokenizer(), unet_config=ucfg, text_config=ccfg,
        vae_config=vcfg, new_concept_token='<g1>+<g2>',
        initializer_token='<rand-0.013>+<rand-0.017>', finetune_cfg=ft,
        attn_reg_weight=0.01, reg_full_identity=False, noise_offset=0.01,
        compute_dtype=jnp.float32)
    opt = make_optimizer(ft, total_steps=4)
    state = trainer.init_state(opt)
    step = trainer.make_train_step(opt)
    bound = bind_concept_prompt([PROMPT.replace('<g1> <g2>', '<g1> <g2>')],
                                trainer.new_concept_cfg)
    ids = trainer.tokenizer(bound).reshape(1, 16, 77)
    pos = [i for i, t in enumerate(ids[0, 0])
           if t in trainer.concept_token_ids]
    rng = np.random.default_rng(0)
    batch = {
        'images': np.asarray(rng.normal(size=(1, 64, 64, 3)), np.float32),
        'text_ids': ids.astype(np.int32),
        'masks': np.ones((1, 8, 8, 1), np.float32),
        'img_masks': np.ones((1, 64, 64, 1), np.float32),
        'concept_pos': np.asarray([pos], np.int32),
        'concept_pos_mask': np.ones((1, len(pos)), np.float32),
    }
    out = []
    for i in range(2):
        state, ld = step(state, batch, jax.random.PRNGKey(i),
                         trainer.frozen_params)
        out += [float(ld['loss']), float(ld['Norm_mean'])]
    return np.asarray(out, np.float32)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in (('edlora_sample', edlora_sample),
                     ('edlora_sample_lora', edlora_sample_with_lora),
                     ('regional_sample', regional_sample),
                     ('train_losses', train_losses)):
        arr = fn()
        np.save(os.path.join(GOLDEN_DIR, name + '.npy'), arr)
        print(f'{name}: shape={arr.shape} mean={arr.mean():.6f} '
              f'[{arr.min():.4f}, {arr.max():.4f}]')


if __name__ == '__main__':
    import jax
    jax.config.update('jax_platforms', 'cpu')
    main()
