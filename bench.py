#!/usr/bin/env python
"""Headline benchmark: 512x512, 50-step CFG sampling throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} — enriched,
budget permitting, with the other two BASELINE.md metrics (ED-LoRA tuning
steps/sec and fusion wall-clock) as nested fields. The headline line is
printed IMMEDIATELY after the sampling bench and re-printed after each
sub-bench, so the last stdout line always carries the maximal record even if
the process is killed mid-way.

Baseline: the driver north-star of 2 images/sec/chip at 512x512/50 steps
(BASELINE.md) — the reference publishes no throughput numbers (SURVEY.md §6).

Runs the full EDLoRAPipeline compute path (CLIP encode -> scan denoise with
CFG -> VAE decode) on SD1.5-sized models in bf16. Weights are random — no SD
checkpoint ships in this environment — which exercises identical compute.

Everything runs in ONE process under a wall-clock budget (BENCH_BUDGET
seconds, default 900): a sub-bench only starts if enough budget remains,
and a skipped/failed sub-bench records why in the artifact instead of
blowing the driver's time limit (round-2 bench returned rc=124 because an
attached 2400 s train subprocess exceeded it).

BENCH_MODE selects a single metric instead:
  sample (default) — full set as above
  train            — ED-LoRA tuning steps/sec only (512x512, batch 2, masked
                     loss + attention regularization, the reference's
                     operating point, BASELINE.md)
  regional         — the reference's regional demo shape: 1024x2048 canvas,
                     3 region prompts, keypose adapter, 50 steps
                     (regionally_sample.sh:48-90)
  fusion           — fusion wall-clock only (2 SD1.5-size concepts, 4-phase
                     compose incl. checkpoint save)
"""
import gc
import json
import os
import time

import numpy as np

_T0 = time.time()


def _remaining(budget):
    return budget - (time.time() - _T0)


def _device_info():
    """Device identity for every bench record: perf ceilings (MXU floor,
    peak TFLOP/s) are device-kind-dependent claims — an unrecorded device
    kind silently invalidates them if the bench chip ever changes
    (VERDICT r3 'what's missing' #4)."""
    import jax
    d = jax.devices()[0]
    return {'device_kind': getattr(d, 'device_kind', '?'),
            'platform': d.platform,
            'num_devices': jax.device_count(),
            'jax_version': jax.__version__}



def _init_sd15():
    """Deterministic SD1.5-size init trees.

    On an accelerator backend the UNet/VAE generate ON DEVICE
    (utils/device_init.py): uploading the host-cached fp32 trees through
    the tunnel measured ~10 MB/s — 384 s of the 404 s "warm-cache first
    call" was pure param transfer (docs/Performance.md). The text encoder
    stays host-side + disk-cached (utils/initcache.py): concept init and
    the trainer read its token_embedding values on host. MOS_DEVICE_INIT=0
    forces the host path for everything."""
    from mixofshow_tpu.models import (CLIPTextConfig, UNetConfig, VAEConfig,
                                      init_clip_text, init_unet, init_vae)
    from mixofshow_tpu.utils.initcache import cached_init
    ucfg, ccfg, vcfg = UNetConfig.sd15(), CLIPTextConfig.sd15(), VAEConfig.sd15()
    import jax
    if (os.environ.get('MOS_DEVICE_INIT', '1') != '0'
            and jax.default_backend() != 'cpu'):
        from mixofshow_tpu.utils.device_init import device_init
        unet = device_init(lambda: init_unet(0, ucfg), seed=0)
        vae = device_init(lambda: init_vae(2, vcfg), seed=2)
    else:
        unet = cached_init('unet_sd15_s0_f32', lambda: init_unet(0, ucfg))
        vae = cached_init('vae_sd15_s2_f32', lambda: init_vae(2, vcfg))
    te = cached_init('clip_sd15_s1_f32', lambda: init_clip_text(1, ccfg))
    return (ucfg, ccfg, vcfg), (unet, te, vae)

def bench_train(emit=True):
    import jax
    import jax.numpy as jnp
    from mixofshow_tpu.pipelines.concepts import bind_concept_prompt
    from mixofshow_tpu.pipelines.trainer_edlora import (EDLoRATrainer,
                                                        make_optimizer)
    from mixofshow_tpu.text import CLIPTokenizer

    batch = int(os.environ.get('BENCH_BATCH', '2'))
    size = int(os.environ.get('BENCH_SIZE', '512'))
    ft = {'text_embedding': {'enable_tuning': True, 'lr': 1e-3},
          'text_encoder': {'enable_tuning': True, 'lr': 1e-5,
                           'lora_cfg': {'rank': 4}},
          'unet': {'enable_tuning': True, 'lr': 1e-4,
                   'lora_cfg': {'rank': 4}}}
    _, (unet, te, vae) = _init_sd15()
    trainer = EDLoRATrainer(
        unet, te, vae, tokenizer=CLIPTokenizer(),
        new_concept_token='<c1>+<c2>',
        initializer_token='<rand-0.013>+<rand-0.017>',
        finetune_cfg=ft, noise_offset=0.01, attn_reg_weight=0.01,
        reg_full_identity=False)
    opt = make_optimizer(ft, 1000)
    state = trainer.init_state(opt)
    step = trainer.make_train_step(opt)

    bound = bind_concept_prompt(['a photo of <c1> <c2>'] * batch,
                                trainer.new_concept_cfg)
    ids = trainer.tokenizer(bound).reshape(batch, 16, 77)
    pos = [i for i, t in enumerate(ids[0, 0])
           if t in trainer.concept_token_ids]
    rng = np.random.default_rng(0)
    lat = size // 8
    masks = np.ones((batch, lat, lat, 1), np.float32)
    masks[:, :lat // 2] = 0
    bt = {'images': rng.normal(size=(batch, size, size, 3)).astype(np.float32),
          'text_ids': ids.astype(np.int32),
          'masks': masks,
          'img_masks': np.ones((batch, size, size, 1), np.float32),
          'concept_pos': np.asarray([pos] * batch, np.int32),
          'concept_pos_mask': np.ones((batch, 2), np.float32)}

    import jax.random as jr
    frozen = trainer.frozen_params
    frozen = jax.tree.map(jnp.asarray, frozen)  # pin on device
    bt = jax.tree.map(jnp.asarray, bt)  # pin batch on device once, too:
    # re-transferring the host numpy batch each step would put host-transfer
    # time inside the timed loop (VERDICT r3 weak #6)
    state, loss = step(state, bt, jr.PRNGKey(0), frozen)
    warm = float(loss['Norm_mean'])  # fetch = compile + first step done
    assert np.isfinite(warm)

    # Timing protocol (verify-skill recipe): block_until_ready does NOT
    # reliably wait over the remote-TPU tunnel — the r3 artifact's
    # 81.6 steps/s was exactly this bug (~570 TFLOP/s implied on a chip that
    # sustains ~88). Every timing must end in a REAL FETCH; we fetch
    # loss['Norm_mean'], which depends on the post-update trainable tree, so
    # it waits for the final optimizer apply of the chain. Constant overhead
    # (dispatch ramp, fetch latency) cancels by differencing two chain
    # lengths.
    def chain(n, seed0):
        nonlocal state
        t0 = time.time()
        for i in range(n):
            state, loss = step(state, bt, jr.PRNGKey(seed0 + i), frozen)
        nm = float(loss['Norm_mean'])
        dt = time.time() - t0
        assert np.isfinite(nm)
        return dt

    n1 = int(os.environ.get('BENCH_TRAIN_N1', '3'))
    n2 = int(os.environ.get('BENCH_TRAIN_N2', '13'))
    t1 = chain(n1, 1)
    t2 = chain(n2, 1 + n1)
    sps = (n2 - n1) / (t2 - t1)
    # The reference publishes no steps/sec (SURVEY.md §6). Baseline estimate:
    # its operating point is 2xA100 DDP at batch 2/GPU with fp16 AMP
    # (README.md:123); SD1.5 LoRA fine-tuning at 512^2 batch-2 measures
    # ~2.5 it/s on one A100-80GB in public diffusers benchmarks, so the
    # per-accelerator ESTIMATE is ~2.5 steps/s — stated as an estimate, not
    # a reference-published number.
    est_ref_sps = 2.5
    rec = {
        'metric': f'ED-LoRA {size}x{size} b{batch} train steps/sec/chip',
        'value': round(sps, 4), 'unit': 'steps/s',
        'vs_baseline': round(sps / est_ref_sps, 4),
        'baseline_note': 'vs ~2.5 steps/s/A100 estimate (batch 2, fp16); '
                         'reference publishes no throughput',
        'timing_note': 'differenced chains ending in a real scalar fetch; '
                       'the r3 artifact value (81.6) was a wait bug '
                       '(block_until_ready over the remote tunnel)',
        **_device_info()}
    if emit:
        print(json.dumps(rec))
    _record_prior('train', rec)
    return rec


def bench_fusion(emit=True, size=None, steps=None):
    """Fusion wall-clock: 2 SD1.5-size concepts through the full 4-phase
    compose (spectral solver) INCLUDING the diffusers-checkpoint save —
    the reference's center-node workload (gradient_fusion.py:750-813,
    fuse.sh). Deltas are random-weight but full-coverage (every layer group
    the reference trains), so the solve/capture compute is identical to a
    real merge."""
    import shutil
    import tempfile

    from mixofshow_tpu.convert.delta_io import save_edlora_delta
    from mixofshow_tpu.fusion import compose_concepts
    from mixofshow_tpu.pipelines.trainer_edlora import (EDLoRATrainer,
                                                        make_optimizer)
    from mixofshow_tpu.text import CLIPTokenizer
    from mixofshow_tpu.zoo import ModelBundle

    size = size or int(os.environ.get('BENCH_FUSION_SIZE', '512'))
    steps = steps or int(os.environ.get('BENCH_FUSION_STEPS', '20'))
    (ucfg, ccfg, vcfg), (unet, te, vae) = _init_sd15()
    tok = CLIPTokenizer()
    ft = {'text_embedding': {'enable_tuning': True, 'lr': 1e-3},
          'text_encoder': {'enable_tuning': True, 'lr': 1e-5,
                           'lora_cfg': {'rank': 4}},
          'unet': {'enable_tuning': True, 'lr': 1e-4,
                   'lora_cfg': {'rank': 4}}}

    tmp = tempfile.mkdtemp(prefix='bench_fusion_')
    try:
        cfg = []
        for i, (a, b) in enumerate([('<a1>', '<a2>'), ('<b1>', '<b2>')]):
            tr = EDLoRATrainer(
                unet, te, vae, tokenizer=CLIPTokenizer(),
                new_concept_token=f'{a}+{b}',
                initializer_token=f'<rand-0.01{3 + i}>+<rand-0.01{7 + i}>',
                finetune_cfg=ft, seed=10 * (i + 1))
            st = tr.init_state(make_optimizer(ft, 10))
            import jax
            bumped = jax.tree.map(lambda x: x + 0.01, st.trainable)
            import dataclasses
            st = dataclasses.replace(st, trainable=bumped)
            path = os.path.join(tmp, f'concept{i}.pth')
            save_edlora_delta(path, tr.delta_state_dict(st))
            cfg.append({'lora_path': path, 'unet_alpha': 1.0,
                        'text_encoder_alpha': 1.0,
                        'concept_name': f'{a} {b}'})
            del tr, st, bumped
        cfg_path = os.path.join(tmp, 'concepts.json')
        with open(cfg_path, 'w') as f:
            json.dump(cfg, f)
        bundle = ModelBundle(unet=unet, text_encoder=te, vae=vae,
                             tokenizer=tok, unet_config=ucfg,
                             text_config=ccfg, vae_config=vcfg)
        cache_before = _cache_entries()
        t0 = time.time()
        compose_concepts(cfg_path, None, tmp, suffix='bench',
                         spatial_steps=steps, image_size=size,
                         bundle=bundle)
        dt = time.time() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # No reference wall-clock exists (fusion runs 500/50 LBFGS iters/layer on
    # GPU, unpublished duration). Report absolute seconds; vs_baseline is
    # seconds-vs-600s-estimate for the reference's LBFGS phases on 2 concepts
    # (50 text-enc linears x 500 iters + ~80 UNet layers x 50 iters) — an
    # ESTIMATE, clearly labelled.
    est_ref_s = 600.0
    rec = {
        'metric': f'fusion wall-clock, 2 concepts, SD1.5, {steps}-step '
                  f'{size}px spatial capture, incl. checkpoint save',
        'value': round(dt, 2), 'unit': 's',
        'vs_baseline': round(est_ref_s / dt, 4),
        'baseline_note': 'speedup vs ~600s estimate for reference LBFGS '
                         'fusion of 2 concepts; reference publishes no '
                         'wall-clock',
        'xla_cache_entries': cache_before,
        **_device_info()}
    if emit:
        print(json.dumps(rec))
    # full-size composes get their own prior file so they never clobber the
    # shrunk driver-workload record the adaptive budget gate keys on
    _record_prior('fusion' if size <= 256 else 'fusion_full', rec)
    return rec


def bench_regional(emit=True):
    """Regional sampling throughput at the NORTH-STAR shape by default:
    512x512, 3 regions, keypose, 50 steps — BASELINE.md metric 1 measured on
    the reference flagship pipeline (regionally_sample.sh drives this
    pipeline; the 2 img/s/chip target is defined at 512^2/50 steps).
    BENCH_HEIGHT/BENCH_WIDTH select other shapes (1024x2048 = the reference
    demo canvas, recorded under its own prior name). Reports serial batch-1,
    batched (num_images_per_prompt=BENCH_BATCH), and 1-deep pipelined
    serving numbers, like bench_sample."""
    from mixofshow_tpu.models.t2i_adapter import (T2IAdapterConfig,
                                                  init_t2i_adapter)
    from mixofshow_tpu.pipelines import (RegionallyT2IAdapterPipeline,
                                         init_concepts)
    from mixofshow_tpu.text import CLIPTokenizer

    height = int(os.environ.get('BENCH_HEIGHT', '512'))
    width = int(os.environ.get('BENCH_WIDTH', '512'))
    steps = int(os.environ.get('BENCH_STEPS', '50'))
    # batched serving config: images of one layout batch through one scan
    batch = int(os.environ.get('BENCH_BATCH', '8' if height * width
                               <= 512 * 512 else '2'))

    (ucfg, ccfg, vcfg), (unet, te, vae) = _init_sd15()
    tok = CLIPTokenizer()
    names = '<potter1> <potter2>+<hermione1> <hermione2>+<thanos1> <thanos2>'
    cfg, table = init_concepts(tok, names, None,
                               np.asarray(te['token_embedding']))
    te = dict(te)
    te['token_embedding'] = np.concatenate(
        [np.asarray(te['token_embedding']), table])
    kcfg = T2IAdapterConfig.keypose()
    from mixofshow_tpu.utils.initcache import cached_init
    kadapter = cached_init('t2i_keypose_s3_f32',
                           lambda: init_t2i_adapter(3, kcfg))
    pipe = RegionallyT2IAdapterPipeline(
        unet, te, vae, tokenizer=tok,
        unet_config=ucfg, text_config=ccfg, vae_config=vcfg,
        new_concept_cfg=cfg,
        keypose_adapter=kadapter, keypose_config=kcfg,
        quantize=os.environ.get('BENCH_QUANT') or None)

    # 3 near-full-height boxes, the reference demo layout
    prompt = [(
        'three people standing in a park, best quality',
        [('a <potter1> <potter2>, in a jacket', 'low quality',
          [0.02, 0.05, 0.95, 0.30]),
         ('a <hermione1> <hermione2>, in a dress', 'low quality',
          [0.02, 0.35, 0.95, 0.62]),
         ('a <thanos1> <thanos2>, with armor', 'low quality',
          [0.02, 0.68, 0.95, 0.97])])]
    keypose = np.zeros((height, width, 3), np.uint8)
    # serial/batched runs use output_type='pil' exactly like bench_sample:
    # it is the pipelines' default (the reference surface) and keeps the
    # per-batch tunnel fetch uint8 (a float32 'np' fetch is 4x the bytes
    # and was ~8 s/batch of pure transfer at b8 512^2 — it measured the
    # tunnel, not the pipeline)
    cache_before = _cache_entries()
    t_compile0 = time.time()
    img = pipe(prompt, keypose_adapter_input=keypose, height=height,
               width=width, num_inference_steps=steps, seed=0,
               output_type='pil')
    assert np.asarray(img[0]).std() > 0
    compile_s = time.time() - t_compile0
    n_runs = int(os.environ.get('BENCH_RUNS', '2'))
    t0 = time.time()
    for i in range(n_runs):
        img = pipe(prompt, keypose_adapter_input=keypose, height=height,
                   width=width, num_inference_steps=steps, seed=i + 1,
                   output_type='pil')
    dt = (time.time() - t0) / n_runs

    # batched: num_images_per_prompt through one denoise scan — the same
    # b8 serving configuration bench_sample headlines, so the two benches
    # are apples-to-apples
    batched_ips = None
    if batch > 1:
        img = pipe(prompt, keypose_adapter_input=keypose, height=height,
                   width=width, num_inference_steps=steps, seed=10,
                   num_images_per_prompt=batch, output_type='pil')  # compile
        t0 = time.time()
        for i in range(n_runs):
            img = pipe(prompt, keypose_adapter_input=keypose, height=height,
                       width=width, num_inference_steps=steps, seed=11 + i,
                       num_images_per_prompt=batch, output_type='pil')
        batched_ips = batch / ((time.time() - t0) / n_runs)

    # pipelined serving: 1-deep overlapped submits at the batched config
    pend = pipe.submit(prompt, keypose_adapter_input=keypose, height=height,
                       width=width, num_inference_steps=steps, seed=100,
                       num_images_per_prompt=batch, output_type='pil')
    n_pipe = n_runs + 1
    done = 0
    t0 = time.time()
    for i in range(n_pipe):
        nxt = pipe.submit(prompt, keypose_adapter_input=keypose,
                          height=height, width=width,
                          num_inference_steps=steps, seed=101 + i,
                          num_images_per_prompt=batch,
                          output_type='pil') if i < n_pipe - 1 else None
        done += len(pend.result())
        pend = nxt
    serve_ips = done / (time.time() - t0)

    north_star = height == 512 and width == 512
    # the target is 2 img/s/chip at 512^2; other shapes scale by pixel count
    target = 2.0 if north_star else 2.0 * 512 * 512 / (height * width)
    # headline = the batched serving configuration (one serial call,
    # num_images_per_prompt=batch), the same shape bench_sample's headline
    # measures; batch-1 (the reference CLI's one-image-per-invocation
    # pattern) is reported alongside as batch1_img_s
    headline = batched_ips if batched_ips is not None else 1.0 / dt
    rec = {
        'metric': f'regional {height}x{width} 3-region {steps}-step '
                  f'images/sec/chip (serial b{batch})',
        'value': round(headline, 4), 'unit': 'img/s',
        'vs_baseline': round(headline / target, 4),
        'baseline_note': ('vs 2 img/s/chip at 512^2 (BASELINE.md north '
                          'star)' if north_star else
                          'vs 2 img/s/chip at 512^2 scaled by pixel count'),
        'batch1_img_s': round(1.0 / dt, 4),
        'pipelined_serving_img_s': round(serve_ips, 4),
        'batch': batch,
        'xla_cache_entries': cache_before,
        'compile_or_warmup_s': round(compile_s, 1),
        **_device_info()}
    if emit:
        print(json.dumps(rec))
    _record_prior('regional' if north_star else 'regional_demo', rec)
    return rec


def _cache_entries():
    """Entry count of the persistent XLA compile cache (0 if disabled).
    Used to judge whether a recorded fusion cost was warm or cold: the
    dominant cost of the compose is remote compilation, so a measurement
    taken with a populated cache predicts the next run far better than the
    704 s cold number."""
    try:
        import jax
        d = getattr(jax.config, 'jax_compilation_cache_dir', None)
        return len(os.listdir(d)) if d else 0
    except Exception:
        return 0


def _prior_path(name):
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f'BENCH_{name}_last.json')


def _record_prior(name, rec):
    """Persist the latest on-chip number for a sub-bench too expensive to
    re-run inside every driver budget (regional: 30 s/image demo shape,
    VERDICT r3 item 7; fusion: 704 s measured cold through the remote
    compile service, r4). The driver's enriched record then carries the
    most recent measurement machine-readably every round."""
    try:
        out = dict(rec)
        out['measured_at'] = time.strftime('%Y-%m-%dT%H:%M:%SZ',
                                           time.gmtime())
        with open(_prior_path(name), 'w') as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass


def _prior(name):
    try:
        with open(_prior_path(name)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def bench_sample():
    from mixofshow_tpu.pipelines import EDLoRAPipeline, init_concepts
    from mixofshow_tpu.text import CLIPTokenizer

    # batch 8 is the throughput-serving configuration — fixed per-batch
    # costs (dispatch, solver, fetch) amortize: 1.173 vs 1.165 img/s at b4
    # measured round 3 (the metric is images/sec/CHIP)
    batch = int(os.environ.get('BENCH_BATCH', '8'))
    steps = int(os.environ.get('BENCH_STEPS', '50'))
    size = int(os.environ.get('BENCH_SIZE', '512'))

    (ucfg, ccfg, vcfg), (unet, te, vae) = _init_sd15()
    tok = CLIPTokenizer()
    cfg, table = init_concepts(tok, '<c1>+<c2>', None,
                               np.asarray(te['token_embedding']))
    # BENCH_QUANT=int8 measures the opt-in quantized serving mode
    # (ops/quant.py) — never the default (changes the math vs the
    # reference's fp16 sampling)
    pipe = EDLoRAPipeline(unet, te, vae, tokenizer=tok,
                          unet_config=ucfg, text_config=ccfg, vae_config=vcfg,
                          new_concept_cfg=cfg, concept_embedding=table,
                          quantize=os.environ.get('BENCH_QUANT') or None)

    prompt = ['a photo of <c1> <c2> on a mountain'] * batch
    # environment-state fields (VERDICT r4 item 4): cache population at
    # start + wall-clock of the warmup call (≈ compile cost when cold) +
    # host 1-min load make cold-vs-warm runs and cross-round drift auditable
    cache_before = _cache_entries()
    t_compile0 = time.time()
    # compile; 'pil' is the reference pipeline's default output_type, so the
    # metric includes decode + uint8 image materialization like a real run
    imgs = pipe(prompt, height=size, width=size, num_inference_steps=steps,
                seed=0, output_type='pil')
    arr = np.asarray(imgs[0])
    assert arr.shape == (size, size, 3) and arr.std() > 0
    compile_s = time.time() - t_compile0

    n_runs = int(os.environ.get('BENCH_RUNS', '3'))
    t0 = time.time()
    for i in range(n_runs):
        imgs = pipe(prompt, height=size, width=size,
                    num_inference_steps=steps, seed=i + 1,
                    output_type='pil')
    dt = (time.time() - t0) / n_runs
    imgs_per_sec = batch / dt

    # serving throughput: 1-deep pipelined submits (EDLoRAPipeline.submit)
    # overlap host tokenization/fetch/PIL with device compute — the
    # deployment pattern; device work stays strictly serial
    pend = pipe.submit(prompt, height=size, width=size,
                       num_inference_steps=steps, seed=100,
                       output_type='pil')
    t0 = time.time()
    n_pipe = n_runs + 1
    done = 0
    for i in range(n_pipe):
        nxt = pipe.submit(prompt, height=size, width=size,
                          num_inference_steps=steps, seed=101 + i,
                          output_type='pil') if i < n_pipe - 1 else None
        imgs = pend.result()
        done += len(imgs)
        pend = nxt
    serve_ips = done / (time.time() - t0)

    try:
        host_load_1m = round(os.getloadavg()[0], 2)
    except OSError:
        host_load_1m = None
    return {
        'metric': f'{size}x{size} {steps}-step b{batch} images/sec/chip',
        'value': round(imgs_per_sec, 4),
        'unit': 'img/s',
        'vs_baseline': round(imgs_per_sec / 2.0, 4),
        'pipelined_serving_img_s': round(serve_ips, 4),
        'xla_cache_entries': cache_before,
        'compile_or_warmup_s': round(compile_s, 1),
        'host_load_1m': host_load_1m,
        **_device_info(),
    }


def main():
    mode = os.environ.get('BENCH_MODE', 'sample')
    if mode == 'train':
        bench_train()
        return
    if mode == 'regional':
        bench_regional()
        return
    if mode == 'fusion':
        bench_fusion()
        return

    budget = float(os.environ.get('BENCH_BUDGET', '900'))
    record = bench_sample()
    for name, why in (
            ('train', 'cheap enough to re-measure most rounds; the prior '
                      'covers a budget-exhausted skip'),
            ('regional', 'the north-star workload: 512x512/3-region/50-step '
                         'regional sampling (BASELINE.md metric 1)'),
            ('regional_demo', 'the reference demo canvas, 1024x2048/'
                              '3-region — ~30 s/image'),
            ('fusion', 'measured 704 s cold through the remote compile '
                       'service even at the shrunk driver workload'),
            ('fusion_full', 'the full-size 512px/20-step compose — too big '
                            'for any driver budget; measured standalone')):
        prior = _prior(name)
        if prior is not None:
            # most recent on-chip measurement by a standalone
            # BENCH_MODE=<name> run — too big to re-run inside every driver
            # budget (reason: see `why` above)
            record[f'{name}_prior'] = prior
    # print the headline line IMMEDIATELY (the driver parses the last line;
    # if a later sub-bench dies or the budget expires this line is still on
    # record), then re-print enriched after each sub-bench. Each sub-bench
    # writes a '<name>_state: started' marker FIRST so a driver kill
    # (rc=124) can never erase why a metric is missing (VERDICT r3 weak #2).
    print(json.dumps(record), flush=True)
    gc.collect()  # drop sampling pipeline device buffers before train init

    # ED-LoRA tuning steps/sec (BASELINE.md metric 2). In-process — the
    # round-2 subprocess variant blew the driver budget (VERDICT r2).
    if os.environ.get('BENCH_SKIP_TRAIN') == '1':
        record['train_skipped'] = 'BENCH_SKIP_TRAIN=1'
    elif _remaining(budget) < float(os.environ.get('BENCH_TRAIN_MIN', '240')):
        record['train_skipped'] = (
            f'budget: {_remaining(budget):.0f}s remaining')
    else:
        record['train_state'] = (
            f'started at {_remaining(budget):.0f}s remaining')
        print(json.dumps(record), flush=True)
        try:
            record['train'] = bench_train(emit=False)
            record['train_state'] = 'ok'
        except Exception as e:  # record WHY the train metric is missing
            record['train_error'] = f'{type(e).__name__}: {e}'[:300]
    print(json.dumps(record), flush=True)
    gc.collect()

    # fusion wall-clock (BASELINE.md metric 3). Driver-mode runs a SHRUNK
    # workload (256 px / 5 spatial steps, labeled in the metric string): the
    # full 512/20 compose cold-compiles through the remote compile service
    # and blew the driver limit twice (rc=124 in r2+r3). Even the shrunk
    # workload measured 704 s COLD (r4 dress rehearsal) — so the guard
    # demands that much headroom unless the persistent XLA cache is warm
    # for these shapes, and the fusion_prior above keeps the most recent
    # real measurement in the record when the attempt is skipped.
    fsize = int(os.environ.get('BENCH_FUSION_SIZE', '256'))
    fsteps = int(os.environ.get('BENCH_FUSION_STEPS', '5'))
    # Adaptive gate: the compose's dominant cost is remote compilation, so
    # when the persistent XLA cache is at least as populated as it was for
    # the most recent recorded fusion run, 1.3x that run's wall-clock (floor
    # 240 s) predicts this one; otherwise assume the measured 750 s cold
    # cost. BENCH_FUSION_MIN overrides.
    fmin = 750.0
    fprior = _prior('fusion')
    if (fprior and fprior.get('xla_cache_entries', 0) > 0
            and _cache_entries() >= fprior['xla_cache_entries']
            and f'{fsize}px' in fprior.get('metric', '')):
        fmin = max(240.0, 1.3 * float(fprior['value']))
    fmin = float(os.environ.get('BENCH_FUSION_MIN', fmin))
    if os.environ.get('BENCH_SKIP_FUSION') == '1':
        record['fusion_skipped'] = 'BENCH_SKIP_FUSION=1'
    elif _remaining(budget) < fmin:
        record['fusion_skipped'] = (
            f'budget: {_remaining(budget):.0f}s remaining < {fmin:.0f}s '
            '(measured cold cost of the shrunk compose; see fusion_prior '
            'for the most recent real measurement)')
    else:
        record['fusion_state'] = (
            f'started ({fsize}px/{fsteps}-step driver workload) at '
            f'{_remaining(budget):.0f}s remaining')
        print(json.dumps(record), flush=True)
        try:
            record['fusion'] = bench_fusion(emit=False, size=fsize,
                                            steps=fsteps)
            record['fusion_state'] = 'ok'
        except Exception as e:
            record['fusion_error'] = f'{type(e).__name__}: {e}'[:300]
    print(json.dumps(record), flush=True)


if __name__ == '__main__':
    main()
