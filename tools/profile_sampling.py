#!/usr/bin/env python
"""Device-profile the SD1.5 sampling hot paths and attribute per-op time.

The reference stack has no profiling story (SURVEY.md §5 — tqdm bars only);
this is the TPU-native equivalent: capture a jax.profiler trace of a target
program, join the trace events with the compiled HLO's metadata, and print
device time grouped by op/shape/source-line. This exact workflow located the
three big sampling wins of round 2 (fp32-UNet-in-scan, flash layout
transposes, the d=40 attention MXU floor).

Targets (--target):
  unet      one b<B> CFG-batch UNet eval (the denoise step body)
  scan      the full 50-step _sample_loop
  vae       VAE decode at b<B> 512^2
  train     the full compiled ED-LoRA train step at b<B> 512^2
  regional  the full 50-step regional denoise scan (--regions boxes,
            keypose adapter features, region-rewrite cross-attention) at
            --height x --width, sample batch B/2 — the reference flagship
            workload (regionally_sample.sh)

Timing notes for tunneled TPUs (axon): block_until_ready does NOT reliably
wait, so wall-clock numbers here come from fetch-synchronized marginal
timing (chain N dependent calls, fetch one element, difference two chain
lengths); device numbers come from the trace envelope, which matches.

Usage:
  python tools/profile_sampling.py --target unet --batch 8
  python tools/profile_sampling.py --target vae --trace-dir /tmp/prof
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(target: str, batch: int, height: int = 512, width: int = 512,
           regions: int = 3):
    import jax
    import jax.numpy as jnp

    from mixofshow_tpu.models.layers import cast_floats, to_device
    from mixofshow_tpu.models.unet import UNetConfig, init_unet, unet_apply
    from mixofshow_tpu.models.vae import VAEConfig, init_vae, vae_decode

    rng = np.random.default_rng(0)
    if target == 'regional':
        # the full regional denoise scan: CFG sample batch B/2, `regions`
        # near-full-height boxes, keypose adapter features, region-rewrite
        # cross-attention — the device side of RegionallyT2IAdapterPipeline
        # at the given canvas (512x512 = the north-star shape; 1024x2048 =
        # the reference demo, regionally_sample.sh:48-90)
        from mixofshow_tpu.diffusion import DPMSolverMultistep
        from mixofshow_tpu.models.t2i_adapter import (T2IAdapterConfig,
                                                      init_t2i_adapter,
                                                      t2i_adapter_apply)
        from mixofshow_tpu.pipelines.pipeline_regional import \
            _regional_sample_loop
        from mixofshow_tpu.utils.initcache import cached_init
        ucfg = UNetConfig.sd15()
        params = to_device(cast_floats(
            cached_init('unet_sd15_s0_f32', lambda: init_unet(0, ucfg)),
            jnp.bfloat16))
        b = max(1, batch // 2)  # sample batch; CFG doubles inside the loop
        ctx = jnp.asarray(rng.normal(size=(2 * b, 16, 77, 768)), jnp.bfloat16)
        region_list = tuple(
            (jnp.asarray(rng.normal(size=(2 * b, 16, 77, 768)), jnp.bfloat16),
             jnp.asarray([0.02, 0.05 + 0.33 * i, 0.95, 0.30 + 0.33 * i],
                         jnp.float32))
            for i in range(regions))
        kcfg = T2IAdapterConfig.keypose()
        adapter = to_device(cast_floats(
            cached_init('t2i_keypose_s3_f32',
                        lambda: init_t2i_adapter(3, kcfg)), jnp.bfloat16))
        feats = t2i_adapter_apply(
            adapter, jnp.zeros((1, height, width, 3), jnp.bfloat16), kcfg)
        feats = [jnp.concatenate([jnp.repeat(f, b, 0)] * 2) for f in feats]
        solver = DPMSolverMultistep.create()
        coeffs = solver.step_coeffs(50)

        def fn(bundle, lats):
            # conditions ride in as ARGUMENTS (closure constants would embed
            # ~60 MB in the HLO and slow the remote compile service)
            p, ctx_, rl_, feats_ = bundle
            return _regional_sample_loop(
                p, ctx_, rl_, tuple(feats_), lats.astype(jnp.float32),
                jnp.float32(7.5), coeffs, ucfg, solver, True,
                ucfg.attention_heads)
        lats = jnp.asarray(
            rng.normal(size=(b, height // 8, width // 8, 4)), jnp.float32)
        return (jax.jit(fn), (params, ctx, region_list, tuple(feats)),
                lats)
    if target in ('unet', 'scan'):
        ucfg = UNetConfig.sd15()
        params = to_device(cast_floats(init_unet(0, ucfg), jnp.bfloat16))
        x = jnp.asarray(rng.normal(size=(batch, 64, 64, 4)), jnp.bfloat16)
        t = jnp.full((batch,), 500, jnp.int32)
        ctx = jnp.asarray(rng.normal(size=(batch, 16, 77, 768)),
                          jnp.bfloat16)
        if target == 'unet':
            fn = jax.jit(lambda p, x: unet_apply(p, x, t, ctx, ucfg)[0])
            return fn, params, x
        from mixofshow_tpu.diffusion import DPMSolverMultistep
        from mixofshow_tpu.pipelines.pipeline_edlora import _sample_loop
        solver = DPMSolverMultistep.create()
        coeffs = solver.step_coeffs(50)

        def fn(p, lats):
            final, _ = _sample_loop(p, None, 1.0, ctx,
                                    lats.astype(jnp.float32),
                                    jnp.float32(7.5), coeffs, ucfg, solver,
                                    True)
            return final
        lats = jnp.asarray(rng.normal(size=(batch // 2, 64, 64, 4)),
                           jnp.float32)
        return fn, params, lats
    if target == 'train':
        # the full compiled ED-LoRA train step at the bench operating point
        # (b<batch> 512², masked loss + attn-reg): VAE encode + 16-layer CLIP
        # + UNet fwd+bwd + optax. Attributes where the 7.3 steps/s goes.
        from mixofshow_tpu.pipelines.concepts import bind_concept_prompt
        from mixofshow_tpu.pipelines.trainer_edlora import (EDLoRATrainer,
                                                            make_optimizer)
        from mixofshow_tpu.text import CLIPTokenizer
        from mixofshow_tpu.models.clip import CLIPTextConfig, init_clip_text
        from mixofshow_tpu.models.vae import init_vae as _init_vae

        ft = {'text_embedding': {'enable_tuning': True, 'lr': 1e-3},
              'text_encoder': {'enable_tuning': True, 'lr': 1e-5,
                               'lora_cfg': {'rank': 4}},
              'unet': {'enable_tuning': True, 'lr': 1e-4,
                       'lora_cfg': {'rank': 4}}}
        trainer = EDLoRATrainer(
            init_unet(0, UNetConfig.sd15()),
            init_clip_text(1, CLIPTextConfig.sd15()),
            _init_vae(2, VAEConfig.sd15()), tokenizer=CLIPTokenizer(),
            new_concept_token='<c1>+<c2>',
            initializer_token='<rand-0.013>+<rand-0.017>',
            finetune_cfg=ft, noise_offset=0.01, attn_reg_weight=0.01,
            reg_full_identity=False)
        opt = make_optimizer(ft, 1000)
        state = trainer.init_state(opt)
        raw_step = trainer.make_train_step(opt)
        bound = bind_concept_prompt(['a photo of <c1> <c2>'] * batch,
                                    trainer.new_concept_cfg)
        ids = trainer.tokenizer(bound).reshape(batch, 16, 77)
        pos = [i for i, t in enumerate(ids[0, 0])
               if t in trainer.concept_token_ids]
        bt = jax.device_put({
            'images': np.asarray(rng.normal(size=(batch, 512, 512, 3)),
                                 np.float32),
            'text_ids': ids.astype(np.int32),
            'masks': np.ones((batch, 64, 64, 1), np.float32),
            'img_masks': np.ones((batch, 512, 512, 1), np.float32),
            'concept_pos': np.asarray([pos] * batch, np.int32),
            'concept_pos_mask': np.ones((batch, 2), np.float32)})
        frozen = jax.device_put(trainer.frozen_params)
        import jax.random as jr

        def fn(bundle, key_scalar):
            # bundle = (state, batch, frozen) rides in as ARGUMENTS — a
            # closure capture here would embed 4 GB of constants in the HLO
            # and break the remote compile service. State is donated by the
            # compiled step, so work on a fresh copy per call; the returned
            # scalar depends on the post-update tree (a real fetch chain).
            st, bt_, frozen_ = bundle
            _, loss = raw_step(jax.tree.map(jnp.array, st), bt_,
                               jr.fold_in(jr.PRNGKey(0),
                                          key_scalar.astype(jnp.int32)),
                               frozen_)
            return loss['Norm_mean'] + 0 * key_scalar
        return jax.jit(fn), (state, bt, frozen), jnp.float32(0.0)
    vcfg = VAEConfig.sd15()
    params = to_device(cast_floats(init_vae(2, vcfg), jnp.bfloat16))
    lat = jnp.asarray(rng.normal(size=(batch, 64, 64, 4)), jnp.bfloat16)
    fn = jax.jit(
        lambda p, z: vae_decode(p, z / vcfg.scaling_factor, vcfg))
    return fn, params, lat


def _marginal_ms(fn, params, x, n_lo=3, n_hi=10):
    """Fetch-synchronized marginal wall time per call: run N dependent (or,
    when output/input shapes differ, independent) calls ending in a
    one-element fetch, and difference two chain lengths."""
    out = fn(params, x)
    _ = np.asarray(out).ravel()[0]
    chains = out.shape == x.shape and out.dtype == x.dtype

    def run(n):
        t0 = time.time()
        o = x
        for _ in range(n):
            o = fn(params, o if chains else x)
        _ = np.asarray(o).ravel()[0]
        return time.time() - t0

    lo, hi = run(n_lo), run(n_hi)
    return (hi - lo) / (n_hi - n_lo) * 1e3


def _attribute(trace_dir: str, hlo_text: str, n_runs: int, top: int):
    meta = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r'(?:ROOT )?%?([\w.\-]+) = (\(.*?\)|\S+?) ([a-z\-_]+)\(',
                     s)
        if not m:
            continue
        name, shape, op = m.groups()
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', s)
        meta[name] = (shape, op,
                      f'{os.path.basename(src.group(1))}:{src.group(2)}'
                      if src else '?')

    paths = sorted(glob.glob(trace_dir + '/**/*.trace.json.gz',
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print('no trace found under', trace_dir)
        return
    with gzip.open(paths[-1], 'rt') as f:
        trace = json.load(f)
    events = trace['traceEvents']
    pid_names = {e['pid']: e['args'].get('name', '') for e in events
                 if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    by = defaultdict(float)
    by_src = defaultdict(float)
    env = 0.0
    for e in events:
        if e.get('ph') != 'X':
            continue
        if 'TPU' not in pid_names.get(e.get('pid'), ''):
            continue
        n = e.get('name', '')
        ms = e.get('dur', 0) / 1e3 / n_runs
        if n.startswith('jit'):
            env += ms
            continue
        if n.startswith('_lambda'):
            by[('pallas-kernel', n.split('(')[0], '')] += ms
            by_src['pallas'] += ms
            continue
        sh, op, src = meta.get(n, ('?', n.split('.')[0], '?'))
        by[(op, sh[:46], src)] += ms
        by_src[src] += ms
    print(f'\ndevice envelope: {env:.2f} ms per call')
    print('\n-- by source line --')
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:15]:
        print(f'{v:8.2f} ms  {k}')
    print('\n-- top (op, shape, source) --')
    for (op, sh, src), v in sorted(by.items(), key=lambda kv: -kv[1])[:top]:
        print(f'{v:8.3f} ms  {op:14s} {sh:46s} {src}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--target',
                    choices=('unet', 'scan', 'vae', 'train', 'regional'),
                    default='unet')
    ap.add_argument('--batch', type=int, default=8,
                    help='CFG batch for unet/regional (2x sample batch), '
                         'sample batch for vae/scan')
    ap.add_argument('--height', type=int, default=512,
                    help='canvas height (regional target)')
    ap.add_argument('--width', type=int, default=512,
                    help='canvas width (regional target)')
    ap.add_argument('--regions', type=int, default=3,
                    help='region count (regional target)')
    ap.add_argument('--trace-dir', default='/tmp/mixofshow_prof')
    ap.add_argument('--runs', type=int, default=3)
    ap.add_argument('--top', type=int, default=30)
    args = ap.parse_args()

    import jax

    fn, params, x = _build(args.target, args.batch, args.height, args.width,
                           args.regions)
    t0 = time.time()
    out = fn(params, x)
    _ = np.asarray(out).ravel()[0]
    print(f'compile+first: {time.time() - t0:.1f}s')

    ms = _marginal_ms(fn, params, x)
    print(f'marginal wall: {ms:.1f} ms per call')

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.runs):
            out = fn(params, x)
        _ = np.asarray(out).ravel()[0]

    hlo = fn.lower(params, x).compile().as_text() \
        if hasattr(fn, 'lower') else ''
    _attribute(args.trace_dir, hlo, args.runs, args.top)


if __name__ == '__main__':
    main()
