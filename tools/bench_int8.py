#!/usr/bin/env python
"""Does XLA:TPU lower int8 dot/conv to the MXU's 2x int8 path on v5e?

Decides whether a quantized serving mode is worth building: v5e advertises
394 TOPS int8 vs 197 TFLOPS bf16. If jnp.dot(int8, int8 -> int32) only
reaches bf16 throughput (i.e. XLA upcasts), weight+activation int8 cannot
beat the bf16 pipeline and the idea dies here.

Shapes are the SD1.5 UNet's hot dense matmuls at the CFG-b8 sampling
eval (batch 16 through the UNet): GEGLU in/out at res 64/32, attention
projections at res 64, plus a res-64 3x3 conv. Timed via profiler trace
(device-lane jit_* events), run ALONE on the chip.
"""
import glob
import gzip
import json
import os
from collections import defaultdict

import jax
import jax.numpy as jnp


def main():
    outdir = '/tmp/prof_int8'
    os.makedirs(outdir, exist_ok=True)
    key = jax.random.PRNGKey(0)
    cases = {}

    def add_dot(label, m, k, n):
        xb = jax.random.normal(key, (m, k), jnp.bfloat16)
        wb = jax.random.normal(key, (k, n), jnp.bfloat16)
        xi = (xb * 10).astype(jnp.int8)
        wi = (wb * 10).astype(jnp.int8)

        def f_bf16(x, w):
            return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)

        def f_int8(x, w):
            return jnp.dot(x, w, preferred_element_type=jnp.int32)

        def f_int8_dyn(x, w):
            # full dynamic-quant round trip: absmax -> quantize -> int8 dot
            # -> rescale (what the serving path would actually run)
            a = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
            sx = a / 127.0 + 1e-8
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            y = jnp.dot(xq, w, preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * sx).astype(jnp.bfloat16)

        flops = 2 * m * k * n
        f_bf16.__name__ = label + '_bf16'
        f_int8.__name__ = label + '_i8'
        f_int8_dyn.__name__ = label + '_i8dyn'
        cases[label + '_bf16'] = (jax.jit(f_bf16), (xb, wb), flops)
        cases[label + '_i8'] = (jax.jit(f_int8), (xi, wi), flops)
        cases[label + '_i8dyn'] = (jax.jit(f_int8_dyn), (xb, wi), flops)

    # GEGLU at res-64: (16*4096, 320) x (320, 2560); out: (.,1280)x(1280,320)
    add_dot('geglu64_in', 16 * 4096, 320, 2560)
    add_dot('geglu64_out', 16 * 4096, 1280, 320)
    # GEGLU at res-32 (640 ch)
    add_dot('geglu32_in', 16 * 1024, 640, 5120)
    # attention projection at res-64
    add_dot('proj64', 16 * 4096, 320, 320)

    def add_conv(label, c, hw, dtype, pet):
        x = (jax.random.normal(key, (16, hw, hw, c), jnp.bfloat16) * 4)
        w = (jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 4)
        if dtype == jnp.int8:
            x, w = x.astype(jnp.int8), w.astype(jnp.int8)

        def f(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=pet)
        f.__name__ = label
        cases[label] = (jax.jit(f), (x, w), 2 * 16 * hw * hw * c * c * 9)

    add_conv('conv64_bf16', 320, 64, jnp.bfloat16, jnp.bfloat16)
    add_conv('conv64_i8', 320, 64, jnp.int8, jnp.int32)

    for label, (fn, args, _) in cases.items():
        try:
            jax.block_until_ready(fn(*args))
        except Exception as e:
            print(f'{label}: COMPILE/RUN FAILED: {type(e).__name__}: {e}'[:200])
            cases[label] = None
    live = {k: v for k, v in cases.items() if v is not None}
    print('compiled; tracing...', flush=True)
    jax.profiler.start_trace(outdir)
    for _ in range(8):
        for label, (fn, args, _) in live.items():
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
    for label, v in live.items():
        if label in agg:
            ms = agg[label] / cnt[label]
            print(f'{label:18s} {ms:8.3f} ms  {v[2] / ms / 1e9:7.1f} T/s')


if __name__ == '__main__':
    main()
