#!/usr/bin/env python
"""Microbenchmark the fused attention-block kernel vs the unfused processor.

Per SD1.5 sampling shape (CFG batch 8), times the WHOLE attention processor
(QKV projection + softmax + out-projection + bias) two ways:
  * unfused: unet.mh_attention's default path (dense projections + flash or
    dense attention, whatever its routing picks);
  * fused:   ops.fused_attention.attention_block — one Pallas program.

Timed via profiler trace (host timing through the remote tunnel is
unreliable — verify skill round-2 recipe). Run ALONE on the real chip.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

# (name, b, sq, c, kv_len, cc) — kv_len==sq means self-attention
SHAPES = [
    ('self64', 8, 4096, 320, 4096, 320),
    ('cross64', 8, 4096, 320, 77, 768),
    ('self32', 8, 1024, 640, 1024, 640),
    ('cross32', 8, 1024, 640, 77, 768),
    ('self16', 8, 256, 1280, 256, 1280),
    ('cross16', 8, 256, 1280, 77, 768),
    ('self8', 8, 64, 1280, 64, 1280),
    ('cross8', 8, 64, 1280, 77, 768),
    ('vae64', 4, 4096, 512, 4096, 512),   # VAE mid-attention (1 head), b4
]
HEADS = 8


def main():
    outdir = '/tmp/prof_attn_block'
    os.makedirs(outdir, exist_ok=True)
    from mixofshow_tpu.models.unet import mh_attention
    from mixofshow_tpu.ops.fused_attention import (attention_block,
                                                   attention_block_supported)

    fns = {}
    key = jax.random.PRNGKey(0)
    for name, b, sq, c, sk, cc in SHAPES:
        heads = 1 if name.startswith('vae') else HEADS
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (b, sq, c), jnp.bfloat16)
        ctx = (x if sk == sq else
               jax.random.normal(ks[1], (b, sk, cc), jnp.bfloat16))
        p = {
            'to_q': {'kernel': jax.random.normal(ks[2], (c, c),
                                                 jnp.bfloat16) * 0.05},
            'to_k': {'kernel': jax.random.normal(ks[3], (cc, c),
                                                 jnp.bfloat16) * 0.05},
            'to_v': {'kernel': jax.random.normal(ks[4], (cc, c),
                                                 jnp.bfloat16) * 0.05},
            'to_out': {'kernel': jax.random.normal(ks[5], (c, c),
                                                   jnp.bfloat16) * 0.05,
                       'bias': jnp.zeros((c,), jnp.bfloat16)},
        }

        def named_jit(fn, label):
            fn.__name__ = label
            return jax.jit(fn)

        fns[f'{name}/unfused'] = (named_jit(
            lambda p, x, ctx, heads=heads: mh_attention(p, x, ctx, heads)[0],
            f'{name}_unfused'), (p, x, ctx))

        if attention_block_supported(sq, sk, c, cc, heads):
            fns[f'{name}/fused'] = (named_jit(
                lambda p, x, ctx, heads=heads: attention_block(
                    x, ctx, p['to_q']['kernel'], p['to_k']['kernel'],
                    p['to_v']['kernel'], p['to_out']['kernel'],
                    p['to_out']['bias'], heads),
                f'{name}_fused'), (p, x, ctx))
        else:
            print(f'{name}: fused UNSUPPORTED by VMEM budget', flush=True)

        from mixofshow_tpu.ops.fused_attention import (
            attention_packed, attention_packed_supported)
        if attention_packed_supported(sq, sk, c, cc, heads):
            fns[f'{name}/packed'] = (named_jit(
                lambda p, x, ctx, heads=heads: attention_packed(
                    x, ctx, p['to_q']['kernel'], p['to_k']['kernel'],
                    p['to_v']['kernel'], p['to_out']['kernel'],
                    p['to_out']['bias'], heads),
                f'{name}_packed'), (p, x, ctx))
        else:
            print(f'{name}: packed UNSUPPORTED', flush=True)

    for name, (fn, args) in list(fns.items()):
        try:
            jax.block_until_ready(fn(*args))
            print(f'{name}: compiled', flush=True)
        except Exception as e:
            print(f'{name}: FAILED {type(e).__name__}: {e}', file=sys.stderr,
                  flush=True)
            del fns[name]

    import numpy as np
    jax.profiler.start_trace(outdir)
    out = None
    for rep in range(5):
        for name, entry in fns.items():
            out = entry[0](*entry[1])
    np.asarray(jax.tree.leaves(out)[0])[0]  # real fetch — tunnel-safe sync
    jax.profiler.stop_trace()

    files = sorted(glob.glob(os.path.join(outdir, '**', '*.trace.json.gz'),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(files[-1], 'rt') as f:
        data = json.load(f)
    # DEVICE-lane envelopes only: host-side jit_* events measure dispatch
    # queueing of async calls, not execution (profile_sampling.py recipe)
    pid_names = {e['pid']: e['args'].get('name', '') for e in
                 data.get('traceEvents', [])
                 if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    agg, cnt = defaultdict(float), defaultdict(int)
    for e in data.get('traceEvents', []):
        if e.get('ph') != 'X':
            continue
        if 'TPU' not in pid_names.get(e.get('pid'), ''):
            continue
        n = e.get('name', '')
        if n.startswith('jit_'):
            agg[n.split('(')[0]] += e.get('dur', 0) / 1e3
            cnt[n.split('(')[0]] += 1
    print('\nper-call device ms:')
    for n, ms in sorted(agg.items()):
        print(f'  {ms / max(cnt[n], 1):8.3f} ms  x{cnt[n]}  {n}')


if __name__ == '__main__':
    main()
