"""Closed host/device budget of one SERIAL sampling batch (VERDICT r4 #3).

Decomposes the serial `EDLoRAPipeline.__call__` wall-clock into its four
phases so the serial-vs-pipelined gap (1.178 vs 1.243 img/s in r4 — about
0.35 s/batch) is accounted line by line, and the "exact-math ~1.3-1.4
img/s cap" prose can be reconciled against what the kernels actually
deliver (docs/Performance.md "closed budget").

Phases of a serial b8 call (pipeline_edlora.py:311-422):
  tokenize   pure host: bind_concept_prompt + BPE for prompt + negative
  dispatch   wall of `submit(...)` — tokenize + jit-cache lookup + enqueue
             of encode/scan/decode (async; no device wait)
  device     compute the host must wait out after dispatch (measured as
             result-wall of a submit once a fence confirmed queue drain,
             differenced against fetch+pil)
  fetch+pil  uint8 transfer over the tunnel + PIL wrapping, measured on a
             batch whose device work already finished

Run ALONE on the chip (two processes multiplex and both slow ~2x):
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/budget_serial.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from mixofshow_tpu.pipelines import EDLoRAPipeline, init_concepts
    from mixofshow_tpu.text import CLIPTokenizer
    from mixofshow_tpu.pipelines.concepts import bind_concept_prompt
    from bench import _init_sd15  # repo-root bench helpers (path above)

    batch = int(os.environ.get('BENCH_BATCH', '8'))
    steps = int(os.environ.get('BENCH_STEPS', '50'))
    size = int(os.environ.get('BENCH_SIZE', '512'))
    n_runs = int(os.environ.get('BENCH_RUNS', '3'))

    (ucfg, ccfg, vcfg), (unet, te, vae) = _init_sd15()
    tok = CLIPTokenizer()
    cfg, table = init_concepts(tok, '<c1>+<c2>', None,
                               np.asarray(te['token_embedding']))
    pipe = EDLoRAPipeline(unet, te, vae, tokenizer=tok, unet_config=ucfg,
                          text_config=ccfg, vae_config=vcfg,
                          new_concept_cfg=cfg, concept_embedding=table)
    prompt = ['a photo of <c1> <c2> on a mountain'] * batch
    kw = dict(height=size, width=size, num_inference_steps=steps,
              output_type='pil')

    # warm every program
    pipe(prompt, seed=0, **kw)

    def med(xs):
        return float(np.median(xs))

    # 1. pure-host tokenization (prompt + negative), as __call__ does it
    ts = []
    for _ in range(n_runs):
        t0 = time.time()
        tok(bind_concept_prompt(prompt, cfg))
        tok([''] * batch)
        ts.append(time.time() - t0)
    tokenize_s = med(ts)

    # 2. dispatch wall: submit() returns once everything is enqueued
    pends, ts = [], []
    for i in range(n_runs):
        t0 = time.time()
        pends.append(pipe.submit(prompt, seed=50 + i, **kw))
        ts.append(time.time() - t0)
    dispatch_s = med(ts)
    for p in pends:
        p.result()

    # 3. fetch+PIL on a DRAINED queue: dispatch one batch, wait for the
    # device by fetching a 1-element probe of the uint8 output, then time
    # result() — pure transfer + PIL.
    ts = []
    for i in range(n_runs):
        pend = pipe.submit(prompt, seed=80 + i, **kw)
        # fetch-synchronized drain (block_until_ready is unreliable over
        # the axon tunnel — verify skill, round 2)
        np.asarray(pend._dev[0, 0, 0])
        t0 = time.time()
        pend.result()
        ts.append(time.time() - t0)
    fetch_pil_s = med(ts)

    # 4. full serial wall (the headline's shape)
    ts = []
    for i in range(n_runs):
        t0 = time.time()
        pipe(prompt, seed=100 + i, **kw)
        ts.append(time.time() - t0)
    serial_s = med(ts)

    # 5. pipelined steady-state (device ceiling), 1-deep
    pend = pipe.submit(prompt, seed=200, **kw)
    t0 = time.time()
    n_pipe = n_runs + 1
    for i in range(n_pipe):
        nxt = pipe.submit(prompt, seed=201 + i, **kw) \
            if i < n_pipe - 1 else None
        pend.result()
        pend = nxt
    pipelined_s = (time.time() - t0) / n_pipe

    device_s = serial_s - dispatch_s - fetch_pil_s
    rec = {
        'shape': f'{size}x{size} {steps}-step b{batch}',
        'tokenize_s': round(tokenize_s, 4),
        'dispatch_s': round(dispatch_s, 4),
        'device_exposed_s': round(device_s, 4),
        'fetch_pil_s': round(fetch_pil_s, 4),
        'serial_s': round(serial_s, 4),
        'pipelined_s': round(pipelined_s, 4),
        'serial_img_s': round(batch / serial_s, 4),
        'pipelined_img_s': round(batch / pipelined_s, 4),
        'host_overhead_s': round(dispatch_s + fetch_pil_s, 4),
        'unaccounted_s': round(serial_s - pipelined_s
                               - dispatch_s - fetch_pil_s, 4),
    }
    print(json.dumps(rec, indent=1))


if __name__ == '__main__':
    main()
