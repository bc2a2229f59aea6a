#!/usr/bin/env python
"""Reproduce the in-model conv inefficiency: full resnet-block chains.

Isolated 3x3 convs at c=320 run 134 TF/s, but inside the UNet the same
convs measure ~50 TF/s. This chains N resnet blocks exactly as
models/unet.py composes them (GN+SiLU -> conv -> +temb -> GN+SiLU -> conv
-> +residual) to find where the efficiency goes.
"""
import glob
import gzip
import json
import os
from collections import defaultdict

import jax
import jax.numpy as jnp

from mixofshow_tpu.models.layers import conv2d, dense, group_norm
from mixofshow_tpu.models.unet import _resnet, _init_resnet


def main():
    outdir = '/tmp/prof_resnet'
    os.makedirs(outdir, exist_ok=True)
    b, s, c, temb_dim = 8, 64, 320, 1280
    n_blocks = 4
    rng_np = __import__('numpy').random.default_rng(0)
    params = [_init_resnet(rng_np, c, c, temb_dim, 32, jnp.bfloat16)
              for _ in range(n_blocks)]
    params = jax.device_put(params)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, s, c), jnp.bfloat16)
    temb = jax.random.normal(jax.random.PRNGKey(1), (b, temb_dim),
                             jnp.bfloat16)

    cases = {}

    def chain(params, x, temb):
        for p in params:
            x = _resnet(p, x, temb, 32)
        return x
    chain.__name__ = 'resnet_chain'
    cases['resnet_chain'] = (jax.jit(chain), (params, x, temb))

    def convs_only(params, x, temb):
        for p in params:
            h = conv2d(p['conv1'], x)
            x = conv2d(p['conv2'], h) + x
        return x
    convs_only.__name__ = 'convs_only'
    cases['convs_only'] = (jax.jit(convs_only), (params, x, temb))

    def no_gn_stats(params, x, temb):
        # GN apply with FAKE constant stats (no reduction passes)
        for p in params:
            h = jax.nn.silu(x * p['norm1']['scale'] + p['norm1']['bias'])
            h = conv2d(p['conv1'], h)
            h = h + dense(p['time_emb_proj'], jax.nn.silu(temb))[:, None,
                                                                None, :]
            h = jax.nn.silu(h * p['norm2']['scale'] + p['norm2']['bias'])
            x = conv2d(p['conv2'], h) + x
        return x
    no_gn_stats.__name__ = 'no_gn_stats'
    cases['no_gn_stats'] = (jax.jit(no_gn_stats), (params, x, temb))

    # NCHW-internal chain (VERDICT r4 lever A): transpose once at the chain
    # boundary, run every conv with ('NCHW','OIHW','NCHW') dimension
    # numbers, GN reduces over (2,3). If XLA's inter-conv layout transitions
    # are NHWC-induced, this chain should show it; if TPU lowering
    # normalizes both to the same internal layout, it measures neutral.
    params_nchw = jax.tree.map(lambda a: a, params)
    for p in params_nchw:
        for k in ('conv1', 'conv2'):
            p[k] = dict(p[k], kernel=jnp.transpose(p[k]['kernel'], (3, 2, 0, 1)))

    def chain_nchw(params, x, temb):
        x = jnp.transpose(x, (0, 3, 1, 2))
        for p in params:
            # groups=32 GN in NCHW: reshape (b, g, c/g, h, w)
            b_, c_, h_, w_ = x.shape
            xg = x.reshape(b_, 32, c_ // 32, h_, w_)
            m = xg.mean((2, 3, 4), keepdims=True)
            v = ((xg - m) ** 2).mean((2, 3, 4), keepdims=True)
            hN = ((xg - m) * jax.lax.rsqrt(v + 1e-5)).reshape(x.shape)
            hN = jax.nn.silu(
                hN * p['norm1']['scale'][None, :, None, None]
                + p['norm1']['bias'][None, :, None, None])
            hN = jax.lax.conv_general_dilated(
                hN, p['conv1']['kernel'], (1, 1), 'SAME',
                dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
                preferred_element_type=jnp.bfloat16) \
                + p['conv1']['bias'][None, :, None, None]
            t = dense(p['time_emb_proj'], jax.nn.silu(temb))
            hN = hN + t[:, :, None, None]
            b_, c_, h_, w_ = hN.shape
            xg = hN.reshape(b_, 32, c_ // 32, h_, w_)
            m = xg.mean((2, 3, 4), keepdims=True)
            v = ((xg - m) ** 2).mean((2, 3, 4), keepdims=True)
            h2 = ((xg - m) * jax.lax.rsqrt(v + 1e-5)).reshape(hN.shape)
            h2 = jax.nn.silu(
                h2 * p['norm2']['scale'][None, :, None, None]
                + p['norm2']['bias'][None, :, None, None])
            h2 = jax.lax.conv_general_dilated(
                h2, p['conv2']['kernel'], (1, 1), 'SAME',
                dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
                preferred_element_type=jnp.bfloat16) \
                + p['conv2']['bias'][None, :, None, None]
            x = x + h2
        return jnp.transpose(x, (0, 2, 3, 1))
    chain_nchw.__name__ = 'chain_nchw'
    cases['chain_nchw'] = (jax.jit(chain_nchw), (params_nchw, x, temb))

    for label, (fn, args) in cases.items():
        jax.block_until_ready(fn(*args))
    print('tracing...', flush=True)
    jax.profiler.start_trace(outdir)
    for _ in range(5):
        for label, (fn, args) in cases.items():
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
    conv_flops = 2 * b * s * s * c * c * 9 * 2 * n_blocks  # 2 convs/block
    for label in cases:
        if label in agg:
            ms = agg[label] / cnt[label]
            print(f'{label:16s} {ms:8.3f} ms  conv-TF/s-equiv '
                  f'{conv_flops / ms / 1e9:7.1f}')


if __name__ == '__main__':
    main()
