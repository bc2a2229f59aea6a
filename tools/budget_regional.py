"""Closed host/device budget of one SERIAL regional sampling batch.

Same protocol as tools/budget_serial.py (which closed the plain-sampling
budget, VERDICT r4 #3) but for `RegionallyT2IAdapterPipeline.__call__` at
the north-star shape — the regional serial-vs-pipelined gap measured
3-6 s/batch across sessions vs plain sampling's 0.35 s, and none of the
obvious suspects explain it (tokenize measured 9 ms/call): this prints
where the seconds actually go, phase by phase.

Phases of a serial regional b8 call (pipeline_regional.py:379-440):
  tokenize     pure host: bind_concept_prompt + BPE for 4 layerwise
               prompts (16 binds each) + 4 negatives
  encode       wall of encode_region_prompt (tokenize + 8 CLIP dispatches
               + h2d of ids; async device work)
  adapter      wall of preprocess + t2i_adapter_apply + weight-map h2d
  dispatch     wall of full submit(...) — everything up to enqueue of the
               denoise scan + decode (no device wait)
  fetch+pil    uint8 transfer over the tunnel + PIL wrap, on a drained queue
  serial       full __call__ wall (the headline's shape)
  pipelined    1-deep steady state (the device ceiling)

Run ALONE on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/budget_regional.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mixofshow_tpu.models.t2i_adapter import (T2IAdapterConfig,
                                                  init_t2i_adapter)
    from mixofshow_tpu.pipelines import (RegionallyT2IAdapterPipeline,
                                         init_concepts)
    from mixofshow_tpu.text import CLIPTokenizer
    from mixofshow_tpu.pipelines.concepts import bind_concept_prompt
    from mixofshow_tpu.utils.initcache import cached_init
    from bench import _init_sd15

    batch = int(os.environ.get('BENCH_BATCH', '8'))
    steps = int(os.environ.get('BENCH_STEPS', '50'))
    height = int(os.environ.get('BENCH_HEIGHT', '512'))
    width = int(os.environ.get('BENCH_WIDTH', '512'))
    n_runs = int(os.environ.get('BENCH_RUNS', '3'))

    (ucfg, ccfg, vcfg), (unet, te, vae) = _init_sd15()
    tok = CLIPTokenizer()
    names = '<potter1> <potter2>+<hermione1> <hermione2>+<thanos1> <thanos2>'
    cfg, table = init_concepts(tok, names, None,
                               np.asarray(te['token_embedding']))
    te = dict(te)
    te['token_embedding'] = np.concatenate(
        [np.asarray(te['token_embedding']), table])
    kcfg = T2IAdapterConfig.keypose()
    kadapter = cached_init('t2i_keypose_s3_f32',
                           lambda: init_t2i_adapter(3, kcfg))
    pipe = RegionallyT2IAdapterPipeline(
        unet, te, vae, tokenizer=tok,
        unet_config=ucfg, text_config=ccfg, vae_config=vcfg,
        new_concept_cfg=cfg, keypose_adapter=kadapter, keypose_config=kcfg)

    prompt = [(
        'three people standing in a park, best quality',
        [('a <potter1> <potter2>, in a jacket', 'low quality',
          [0.02, 0.05, 0.95, 0.30]),
         ('a <hermione1> <hermione2>, in a dress', 'low quality',
          [0.02, 0.35, 0.95, 0.62]),
         ('a <thanos1> <thanos2>, with armor', 'low quality',
          [0.02, 0.68, 0.95, 0.97])])]
    keypose = np.zeros((height, width, 3), np.uint8)
    kw = dict(keypose_adapter_input=keypose, height=height, width=width,
              num_inference_steps=steps, num_images_per_prompt=batch,
              output_type='pil')

    t_warm = time.time()
    pipe(prompt, seed=0, **kw)  # warm every program
    warmup_s = time.time() - t_warm

    def med(xs):
        return float(np.median(xs))

    # 1. pure-host tokenization, as encode_region_prompt does it
    texts = [prompt[0][0]] + [r[0] for r in prompt[0][1]]
    negs = [''] + [r[1] for r in prompt[0][1]]
    ts = []
    for _ in range(n_runs):
        t0 = time.time()
        for p in texts:
            tok(bind_concept_prompt([p], cfg))
        for q in negs:
            tok([q])
        ts.append(time.time() - t0)
    tokenize_s = med(ts)

    # 2. encode wall (tokenize + CLIP dispatch, async). Reported twice:
    # memo-hit (the serving steady state — one layout, many seeds) and
    # fresh (memo cleared: the cost of a layout change).
    ts = []
    for _ in range(n_runs):
        t0 = time.time()
        pe, rl = pipe.encode_region_prompt(prompt, '')
        ts.append(time.time() - t0)
    encode_s = med(ts)
    ts = []
    for _ in range(n_runs):
        pipe._encode_memo = None
        t0 = time.time()
        pe, rl = pipe.encode_region_prompt(prompt, '')
        ts.append(time.time() - t0)
    encode_fresh_s = med(ts)

    # 3. adapter wall (preprocess + adapter apply + weight maps, async)
    from mixofshow_tpu.models.t2i_adapter import preprocess_adapter_image
    ts = []
    for _ in range(n_runs):
        t0 = time.time()
        knp = preprocess_adapter_image(keypose, height, width)
        pipe._adapter_features(knp, 1.0, '', None, 1.0, '', height, width,
                               True, num_images=batch)
        ts.append(time.time() - t0)
    adapter_s = med(ts)

    # 4. dispatch wall: submit() returns once everything is enqueued
    pends, ts = [], []
    for i in range(n_runs):
        t0 = time.time()
        pends.append(pipe.submit(prompt, seed=50 + i, **kw))
        ts.append(time.time() - t0)
    dispatch_s = med(ts)
    for p in pends:
        p.result()

    # 5. fetch+PIL on a drained queue (fetch-synchronized probe first)
    ts = []
    for i in range(n_runs):
        pend = pipe.submit(prompt, seed=80 + i, **kw)
        np.asarray(pend._dev[0, 0, 0])
        t0 = time.time()
        pend.result()
        ts.append(time.time() - t0)
    fetch_pil_s = med(ts)

    # 6. full serial wall
    ts = []
    for i in range(n_runs):
        t0 = time.time()
        pipe(prompt, seed=100 + i, **kw)
        ts.append(time.time() - t0)
    serial_s = med(ts)

    # 7. pipelined steady state, 1-deep
    pend = pipe.submit(prompt, seed=200, **kw)
    t0 = time.time()
    n_pipe = n_runs + 1
    for i in range(n_pipe):
        nxt = pipe.submit(prompt, seed=201 + i, **kw) \
            if i < n_pipe - 1 else None
        pend.result()
        pend = nxt
    pipelined_s = (time.time() - t0) / n_pipe

    rec = {
        'shape': f'{height}x{width} {steps}-step b{batch} 3-region keypose',
        'warmup_first_call_s': round(warmup_s, 1),
        'tokenize_s': round(tokenize_s, 4),
        'encode_wall_s': round(encode_s, 4),
        'encode_fresh_s': round(encode_fresh_s, 4),
        'adapter_wall_s': round(adapter_s, 4),
        'dispatch_s': round(dispatch_s, 4),
        'fetch_pil_s': round(fetch_pil_s, 4),
        'serial_s': round(serial_s, 4),
        'pipelined_s': round(pipelined_s, 4),
        'serial_img_s': round(batch / serial_s, 4),
        'pipelined_img_s': round(batch / pipelined_s, 4),
        'device_exposed_s': round(serial_s - dispatch_s - fetch_pil_s, 4),
        'unaccounted_s': round(serial_s - pipelined_s
                               - dispatch_s - fetch_pil_s, 4),
    }
    print(json.dumps(rec, indent=1))


if __name__ == '__main__':
    main()
