#!/usr/bin/env python
"""One-command fp32 output-parity harness against real SD1.x checkpoints.

The ground-truth check that closes docs/Parity.md's "requires real weights"
gap (VERDICT r3 item 4): given a user-supplied diffusers SD1.x directory —
and optionally a reference ED-LoRA delta `.pth` and/or a fused/combined
checkpoint dir — run the fixed-latent protocol the reference uses for
validation (test_edlora.py:24-57: torch-seeded per-index latents from
PromptDataset, NEGATIVE_PROMPT, DPM-Solver++ at G/S from the CLI) and either

  * `--emit DIR`   — write our fp32 decoded outputs (`<name>.npy` in [0,1]
    plus a `<name>.png` preview) for offline diff against the reference
    implementation run elsewhere, or
  * `--ref-dir DIR` — compare against stored reference outputs (`<name>.npy`
    fp32 arrays, or `<name>.png` 8-bit renders) and print a machine-readable
    pass/fail report.

The `<name>` protocol is the shared naming contract (identical to
`visual_validation` and the reference's img_name format,
test_edlora.py:40-46): `{prompt with spaces->_}---G_{g}_S_{steps}---{idx:02d}`.

Examples:
  python tools/parity_check.py --pretrained /ckpts/sd15 \
      --prompts "a photo of a dog" "a castle on a hill" --emit /tmp/ours
  python tools/parity_check.py --pretrained /ckpts/sd15 \
      --delta /ckpts/potter/edlora_model-latest.pth \
      --prompts "a <potter1> <potter2> in the forest" --ref-dir /tmp/theirs
  python tools/parity_check.py --fused /ckpts/combined_model_base \
      --prompts "a <potter1> <potter2>, 4K" --ref-dir /tmp/theirs

Exit code: 0 when emitting, or when every compared image passes; 1 on any
comparison failure. The report is one JSON document on stdout.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _protocol_name(prompt: str, guidance: float, steps: int,
                   idx: int) -> str:
    # the reference's img_name format (test_edlora.py:40-46, spaces->'_')
    # minus the trailing iteration tag; kept filename-safe like utils/vis.py
    from mixofshow_tpu.utils.vis import safe_filename
    stem = safe_filename(prompt.replace(' ', '_'))
    return f'{stem}---G_{guidance}_S_{steps}---{idx:02d}'


def build_pipeline(args):
    """Assemble an EDLoRAPipeline for one of the three checkpoint modes:
    base diffusers dir / base+delta / fused-combined dir."""
    import jax.numpy as jnp

    from mixofshow_tpu.diffusion import DPMSolverMultistep
    from mixofshow_tpu.pipelines import EDLoRAPipeline, init_concepts
    from mixofshow_tpu.zoo import load_models

    dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[args.dtype]

    if args.fused:
        # fused/combined checkpoint (our gradient_fusion save layout ==
        # the reference's: extended-vocab text encoder + merged unet +
        # new_concept_cfg.json; reference gradient_fusion.py:828-843)
        from mixofshow_tpu.convert.diffusers_import import (
            _find_weights, convert_clip_text, convert_unet, convert_vae,
            load_state_dict)
        from mixofshow_tpu.models import (CLIPTextConfig, UNetConfig,
                                          VAEConfig)
        from mixofshow_tpu.text import CLIPTokenizer

        root = args.fused
        if args.model_size == 'tiny':
            from mixofshow_tpu.zoo import tiny_configs
            ucfg, base_ccfg, vcfg = tiny_configs()
        else:
            ucfg, base_ccfg, vcfg = (UNetConfig.sd15(),
                                     CLIPTextConfig.sd15(),
                                     VAEConfig.sd15())
        with open(os.path.join(root, 'new_concept_cfg.json')) as f:
            new_concept_cfg = json.load(f)
        te_sd = load_state_dict(_find_weights(
            os.path.join(root, 'text_encoder')))
        n_vocab = te_sd[
            'text_model.embeddings.token_embedding.weight'].shape[0]
        ccfg = dataclasses.replace(base_ccfg, vocab_size=n_vocab)
        tokenizer = CLIPTokenizer(root)
        tokenizer.add_tokens(
            [f'<new{i}>' for i in range(n_vocab - tokenizer.vocab_size)])
        return EDLoRAPipeline(
            convert_unet(load_state_dict(_find_weights(
                os.path.join(root, 'unet'))), ucfg),
            convert_clip_text(te_sd, ccfg),
            convert_vae(load_state_dict(_find_weights(
                os.path.join(root, 'vae'))), vcfg),
            tokenizer=tokenizer, unet_config=ucfg,
            text_config=ccfg, vae_config=vcfg,
            scheduler=DPMSolverMultistep.create(),
            new_concept_cfg=new_concept_cfg, dtype=dtype)

    bundle = load_models(args.pretrained, seed=0)
    common = dict(
        tokenizer=bundle.tokenizer, unet_config=bundle.unet_config,
        text_config=bundle.text_config, vae_config=bundle.vae_config,
        scheduler=DPMSolverMultistep.create(
            prediction_type=bundle.prediction_type),
        dtype=dtype)

    if not args.delta:
        # base SD: no concepts — an empty cfg makes bind_concept_prompt a
        # no-op expansion (all 16 layer prompts identical)
        return EDLoRAPipeline(bundle.unet, bundle.text_encoder,
                              bundle.vae, new_concept_cfg={}, **common)

    # base + reference ED-LoRA delta: concept names come from the delta
    # itself, registered exactly as test_edlora.py does
    from mixofshow_tpu.convert.delta_io import load_edlora_delta
    from mixofshow_tpu.convert.diffusers_import import convert_edlora_delta
    delta = convert_edlora_delta(load_edlora_delta(args.delta))
    concept_names = list(delta['new_concept_embedding'])
    new_concept_cfg, _ = init_concepts(
        bundle.tokenizer, '+'.join(concept_names), None,
        np.asarray(bundle.text_encoder['token_embedding']))
    concept_table = np.concatenate(
        [delta['new_concept_embedding'][n] for n in new_concept_cfg],
        axis=0)
    return EDLoRAPipeline(
        bundle.unet, bundle.text_encoder, bundle.vae,
        new_concept_cfg=new_concept_cfg, concept_embedding=concept_table,
        unet_lora=delta['unet_lora'] or None,
        text_lora=delta['text_lora'] or None,
        lora_alpha=args.alpha, **common)


def _load_ref(path_base: str):
    """A stored reference output: fp32 .npy (H,W,3 in [0,1]) preferred,
    8-bit .png accepted."""
    if os.path.exists(path_base + '.npy'):
        return np.load(path_base + '.npy').astype(np.float32), 'npy'
    if os.path.exists(path_base + '.png'):
        from PIL import Image
        arr = np.asarray(Image.open(path_base + '.png').convert('RGB'))
        return arr.astype(np.float32) / 255.0, 'png'
    return None, None


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument('--pretrained', help='diffusers SD1.x checkpoint dir')
    ap.add_argument('--delta', help='reference ED-LoRA delta .pth')
    ap.add_argument('--fused', help='fused/combined checkpoint dir '
                                    '(overrides --pretrained/--delta)')
    ap.add_argument('--prompts', nargs='+', required=True,
                    help='prompt strings, or one path to a prompt file')
    ap.add_argument('--ref-dir', help='stored reference outputs to compare')
    ap.add_argument('--emit', help='write our outputs here for offline diff')
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--guidance', type=float, default=7.5)
    ap.add_argument('--height', type=int, default=512)
    ap.add_argument('--width', type=int, default=512)
    ap.add_argument('--samples-per-prompt', type=int, default=1)
    ap.add_argument('--alpha', type=float, default=1.0,
                    help='LoRA alpha for --delta mode')
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--dtype', default='float32',
                    choices=['float32', 'bfloat16'],
                    help='compute dtype (float32 is the parity protocol; '
                         'the reference runs fp16, so bf16 quantifies our '
                         'serving-dtype drift instead)')
    ap.add_argument('--model-size', default='sd15',
                    choices=['sd15', 'tiny'],
                    help="config family for --fused dirs (and 'random:tiny' "
                         'pseudo-paths work via --pretrained for smoke '
                         'tests)')
    ap.add_argument('--max-tol', type=float, default=0.10,
                    help='per-pixel max-abs failure threshold')
    ap.add_argument('--mean-tol', type=float, default=0.01,
                    help='mean-abs failure threshold')
    args = ap.parse_args(argv)

    if not (args.fused or args.pretrained):
        ap.error('need --pretrained or --fused')
    if not (args.ref_dir or args.emit):
        ap.error('need --ref-dir (compare) and/or --emit (record)')

    import jax

    from mixofshow_tpu.data import PromptDataset
    from mixofshow_tpu.utils.options import NEGATIVE_PROMPT
    from mixofshow_tpu.utils.vis import array_to_pil, pil_imwrite

    prompts = args.prompts
    if len(prompts) == 1 and os.path.exists(prompts[0]):
        prompts = prompts[0]  # PromptDataset reads the file itself
    dataset = PromptDataset({
        'prompts': prompts if isinstance(prompts, str) else list(prompts),
        'num_samples_per_prompt': args.samples_per_prompt,
        'latent_size': (4, args.height // 8, args.width // 8),
        'share_latent_across_prompt': True,
    })

    pipe = build_pipeline(args)
    d = jax.devices()[0]
    report = {
        'protocol': 'fixed-latent (PromptDataset torch-seeded noise), '
                    f'{args.steps} steps, G={args.guidance}, '
                    f'negative_prompt=NEGATIVE_PROMPT, dtype={args.dtype}',
        'checkpoint': {'pretrained': args.pretrained, 'delta': args.delta,
                       'fused': args.fused, 'alpha': args.alpha},
        'device_kind': getattr(d, 'device_kind', '?'),
        'platform': d.platform, 'jax_version': jax.__version__,
        'images': [],
    }

    if args.emit:
        os.makedirs(args.emit, exist_ok=True)
    items = [dataset[i] for i in range(len(dataset))]
    n_pass = n_fail = 0
    for i in range(0, len(items), args.batch):
        chunk = items[i:i + args.batch]
        imgs = pipe([c['prompts'] for c in chunk],
                    height=args.height, width=args.width,
                    num_inference_steps=args.steps,
                    guidance_scale=args.guidance,
                    negative_prompt=[NEGATIVE_PROMPT] * len(chunk),
                    latents=np.stack([c['latents'] for c in chunk]),
                    output_type='np')  # the fp32-parity protocol surface
        for c, img in zip(chunk, np.asarray(imgs, np.float32)):
            name = _protocol_name(c['prompts'], args.guidance, args.steps,
                                  int(c['indices']))
            entry = {'name': name}
            if args.emit:
                np.save(os.path.join(args.emit, name + '.npy'), img)
                pil_imwrite(array_to_pil(img),
                            os.path.join(args.emit, name + '.png'))
                entry['emitted'] = True
            if args.ref_dir:
                ref, kind = _load_ref(os.path.join(args.ref_dir, name))
                if ref is None:
                    entry['compared'] = False
                    entry['error'] = 'no reference output found'
                    n_fail += 1
                elif ref.shape != img.shape:
                    entry['compared'] = False
                    entry['error'] = (f'shape {list(ref.shape)} vs '
                                      f'{list(img.shape)}')
                    n_fail += 1
                else:
                    diff = np.abs(ref - img)
                    mse = float((diff ** 2).mean())
                    # an 8-bit reference quantizes at 1/510 mean error; widen
                    # the mean gate accordingly so PNG refs don't false-fail
                    mean_tol = args.mean_tol + (1 / 510 if kind == 'png'
                                                else 0.0)
                    ok = (float(diff.max()) <= args.max_tol
                          and float(diff.mean()) <= mean_tol)
                    entry.update({
                        'compared': True, 'ref_format': kind,
                        'max_abs': round(float(diff.max()), 6),
                        'mean_abs': round(float(diff.mean()), 6),
                        'psnr_db': round(float(
                            10 * np.log10(1.0 / mse)) if mse else 99.0, 2),
                        'pass': ok,
                    })
                    n_pass += ok
                    n_fail += not ok
            report['images'].append(entry)

    if args.ref_dir:
        report['summary'] = {'pass': n_pass, 'fail': n_fail,
                             'all_pass': n_fail == 0}
    print(json.dumps(report, indent=1))
    return 1 if (args.ref_dir and n_fail) else 0


if __name__ == '__main__':
    sys.exit(main())
