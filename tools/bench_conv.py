#!/usr/bin/env python
"""Microbenchmark SD1.5's hot convs: lane-padding and layout experiments.

The profile shows 3x3 convs at 320 channels running ~49 TF/s on v5e (25% of
peak). Tests whether padding channels to the 128-lane boundary (320 -> 384)
or folding the GN epilogue differently helps. Timed via profiler trace.
"""
import glob
import gzip
import json
import os
from collections import defaultdict

import jax
import jax.numpy as jnp


def main():
    outdir = '/tmp/prof_conv'
    os.makedirs(outdir, exist_ok=True)
    b, s = 8, 64
    key = jax.random.PRNGKey(0)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.bfloat16)

    cases = {}

    def add(label, cin, cout, hw=s, bb=b):
        x = jax.random.normal(key, (bb, hw, hw, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)

        def f(x, w):
            return conv(x, w)
        f.__name__ = label
        cases[label] = (jax.jit(f), (x, w),
                        2 * bb * hw * hw * cin * cout * 9)

    add('c320', 320, 320)
    add('c384pad', 384, 384)          # lane-aligned variant
    add('c256', 256, 256)
    add('c640_s32', 640, 640, hw=32)
    add('c1280_s16', 1280, 1280, hw=16)

    for label, (fn, args, _) in cases.items():
        jax.block_until_ready(fn(*args))
    print('compiled; tracing...', flush=True)
    jax.profiler.start_trace(outdir)
    for _ in range(5):
        for label, (fn, args, _) in cases.items():
            out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    files = sorted(glob.glob(os.path.join(outdir, '**', '*.trace.json.gz'),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(files[-1], 'rt') as f:
        data = json.load(f)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in data.get('traceEvents', []):
        if e.get('ph') == 'X' and e.get('name', '').startswith('jit_'):
            n = e['name'].split('(')[0][4:]
            agg[n] += e.get('dur', 0) / 1e3
            cnt[n] += 1
    for label, (_, _, flops) in cases.items():
        if label in agg:
            ms = agg[label] / cnt[label]
            print(f'{label:12s} {ms:8.3f} ms  {flops / ms / 1e9:7.1f} TF/s')


if __name__ == '__main__':
    main()
