#!/usr/bin/env python
"""Microbenchmark ops/region_attention.py across tile geometries.

End-to-end regional numbers through the tunnel swing +-20% across sessions
(serial includes host dispatch/fetch noise), so tile-geometry A/Bs need a
device-only measurement: this chains N kernel calls (each feeding the next
call's q, so XLA cannot elide any) and ends in a real scalar fetch, then
differences two chain lengths — the same protocol as bench.py's train bench
(bench.py:128-150).

Shapes are the north-star regional workload's cross-attention layers:
512x512 canvas -> latent 64x64, b8 serving + CFG = batch 16, SD1.5 head
geometry per resolution, 3 near-full-height column-strip boxes
(regionally_sample.sh:66-74 layout). Per-res layer counts weight the total.

Usage (on the real chip):
  python tools/bench_region_kernel.py                # tile widths 16,32,64,128
  MOS_BENCH_TILE_WS=8,16 python tools/bench_region_kernel.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

# (name, layers_in_unet, h, w, heads, d) at 512^2 — SD1.5 cross-attn pool:
# res64 x2 down + x3 up, res32 x2+x3, res16 x2+x3, res8 mid x1
SHAPES = [
    ('res64', 5, 64, 64, 8, 40),
    ('res32', 5, 32, 32, 8, 80),
    ('res16', 5, 16, 16, 8, 160),
    ('res8', 1, 8, 8, 8, 160),
]
BH = 16 * 8  # CFG(2) * images(8) * heads(8) / heads -> B=16 below
BOXES = np.asarray([[0.02, 0.05, 0.95, 0.30],
                    [0.02, 0.35, 0.95, 0.62],
                    [0.02, 0.68, 0.95, 0.97]], np.float32)


def time_shape(h, w, heads, d, tile_w, n1=6, n2=26):
    from mixofshow_tpu.ops.region_attention import (boxes_to_grid,
                                                    region_cross_attention)
    if tile_w:
        os.environ['MOS_REGION_TILE_W'] = str(tile_w)
    else:  # 0 = the kernel's default per-grid policy
        os.environ.pop('MOS_REGION_TILE_W', None)
    b, sk, nr = 16, 128, 3
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h * w, heads, d), jnp.bfloat16)
    gk = jax.random.normal(key, (b, sk, heads, d), jnp.bfloat16)
    gv = jax.random.normal(key, (b, sk, heads, d), jnp.bfloat16)
    rk = jax.random.normal(key, (nr, b, sk, heads, d), jnp.bfloat16)
    rv = jax.random.normal(key, (nr, b, sk, heads, d), jnp.bfloat16)
    boxes = boxes_to_grid(jnp.asarray(BOXES), h, w)

    # fresh function object per tile width: _tile_sizes reads the env var at
    # trace time, and jit caches by function identity — a new def re-traces
    def step(q):
        o = region_cross_attention(q, gk, gv, rk, rv, boxes, (h, w), 77)
        return o.astype(jnp.bfloat16)

    step = jax.jit(step)
    q1 = step(q)
    float(q1[0, 0, 0, 0].astype(jnp.float32))  # compile + real fetch

    def chain(n):
        x = q
        t0 = time.time()
        for _ in range(n):
            x = step(x)
        float(x[0, 0, 0, 0].astype(jnp.float32))  # real fetch = wait
        return time.time() - t0

    t1 = chain(n1)
    t2 = chain(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    tile_ws = [int(x) for x in
               os.environ.get('MOS_BENCH_TILE_WS', '16,32,64,128').split(',')]
    rows = []
    for tw in tile_ws:
        per_res = {}
        total_ms = 0.0
        for name, layers, h, w, heads, d in SHAPES:
            dt = time_shape(h, w, heads, d, min(tw, w) if tw else 0)
            per_res[name] = round(dt * 1e3, 3)
            total_ms += layers * dt * 1e3
        row = {'tile_w': tw, 'per_res_ms': per_res,
               'unet_cross_attn_total_ms': round(total_ms, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    best = min(rows, key=lambda r: r['unet_cross_attn_total_ms'])
    print(json.dumps({'best_tile_w': best['tile_w'],
                      'device_kind': jax.devices()[0].device_kind}))


if __name__ == '__main__':
    main()
