#!/usr/bin/env python
"""Microbenchmark attention implementations at SD1.5 sampling shapes.

Compares our ops.flash_attention kernels against jax's built-in pallas TPU
flash kernel and the dense XLA path, timed via profiler trace (host timing
through the remote tunnel is unreliable). Run on the real chip.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [  # (b, sq, sk, h, d) — CFG batch 8 = 4 images
    ('self64', 8, 4096, 4096, 8, 40),
    ('self32', 8, 1024, 1024, 8, 80),
    ('cross64', 8, 4096, 77, 8, 40),
]


def main():
    outdir = '/tmp/prof_attn'
    os.makedirs(outdir, exist_ok=True)
    from mixofshow_tpu.ops.flash_attention import flash_attention

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jax_flash, BlockSizes)

    fns = {}
    for name, b, sq, sk, h, d in SHAPES:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(key, (b, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(key, (b, sk, h, d), jnp.bfloat16)

        def named_jit(fn, label):
            fn.__name__ = label
            return jax.jit(fn)

        fns[f'{name}/ours'] = (named_jit(
            lambda q, k, v: flash_attention(q, k, v), f'{name}_ours'),
            (q, k, v))

        if sq == sk:  # jax builtin wants (b, h, s, d); needs sk%512==0
            qT = jnp.swapaxes(q, 1, 2)
            kT = jnp.swapaxes(k, 1, 2)
            vT = jnp.swapaxes(v, 1, 2)
            bs = BlockSizes(
                block_q=min(512, sq), block_k_major=min(512, sk),
                block_k=min(512, sk), block_b=1,
                block_q_major_dkv=min(512, sq), block_k_major_dkv=min(512, sk),
                block_q_dkv=min(512, sq), block_k_dkv=min(512, sk),
                block_q_dq=min(512, sq), block_k_dq=min(512, sk),
                block_k_major_dq=min(512, sk))
            jaxf = named_jit(
                lambda q, k, v, bs=bs, d=d: jax_flash(
                    q, k, v, causal=False, sm_scale=1.0 / (d ** 0.5),
                    block_sizes=bs), f'{name}_jaxflash')
            fns[f'{name}/jaxflash'] = (jaxf, (qT, kT, vT))

        def dense(q, k, v):
            dd = q.shape[-1]
            logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                                preferred_element_type=jnp.float32) \
                / (dd ** 0.5)
            p = jax.nn.softmax(logits, -1)
            return jnp.einsum('bhqk,bkhd->bqhd', p.astype(v.dtype), v,
                              preferred_element_type=v.dtype)
        fns[f'{name}/dense'] = (named_jit(dense, f'{name}_dense'),
                                (q, k, v))

    # warm all
    for name, (fn, args) in fns.items():
        try:
            jax.block_until_ready(fn(*args))
        except Exception as e:
            print(f'{name}: FAILED {type(e).__name__}: {e}', file=sys.stderr)
            fns[name] = None
    print('compiled; tracing...', flush=True)
    jax.profiler.start_trace(outdir)
    for rep in range(3):
        for name, entry in fns.items():
            if entry:
                out = entry[0](*entry[1])
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    files = sorted(glob.glob(os.path.join(outdir, '**', '*.trace.json.gz'),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(files[-1], 'rt') as f:
        data = json.load(f)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in data.get('traceEvents', []):
        if e.get('ph') != 'X':
            continue
        n = e.get('name', '')
        if n.startswith('jit_'):
            agg[n.split('(')[0]] += e.get('dur', 0) / 1e3
            cnt[n.split('(')[0]] += 1
    print('\nper-call device ms:')
    for n, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f'  {ms / max(cnt[n], 1):8.3f} ms  x{cnt[n]}  {n}')


if __name__ == '__main__':
    main()
