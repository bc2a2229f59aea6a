#!/usr/bin/env python
"""Microbenchmark VAE decode variants at the serving shape (b4, 64x64x4
latents -> 512^2 pixels, bf16).

Round-2 profiling: decode spends ~160 ms device time, dominated by layout
transitions between spatially-tiled convs at the 512^2 resolutions
(docs/Performance.md). Variants:
  * b4      — current: one batched decode;
  * b1map   — lax.map over the batch (4 sequential b1 decodes — smaller
    activations may change XLA's spatial tiling);
  * uint8   — the b4 decode fused straight to uint8 (what the PIL path
    actually fetches).
Run ALONE on the real chip; trace-based timing.
"""
import glob
import gzip
import json
import os
from collections import defaultdict

import jax
import jax.numpy as jnp


def main():
    outdir = '/tmp/prof_vae_decode'
    os.makedirs(outdir, exist_ok=True)
    import numpy as np

    from mixofshow_tpu.models import VAEConfig, init_vae
    from mixofshow_tpu.models.layers import cast_floats
    from mixofshow_tpu.models.vae import vae_decode

    vcfg = VAEConfig.sd15()
    vae = cast_floats(init_vae(2, vcfg), jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 4),
                            jnp.bfloat16)

    def named_jit(fn, label):
        fn.__name__ = label
        return jax.jit(fn)

    def d_b4(vae, lat):
        return vae_decode(vae, lat, vcfg)

    def d_b1map(vae, lat):
        return jax.lax.map(lambda l: vae_decode(vae, l[None], vcfg)[0], lat)

    def d_uint8(vae, lat):
        img = vae_decode(vae, lat, vcfg)
        img = jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255.0).astype(jnp.uint8)

    fns = {n: named_jit(f, n) for n, f in
           [('decode_b4', d_b4), ('decode_b1map', d_b1map),
            ('decode_uint8', d_uint8)]}
    for n, f in fns.items():
        jax.block_until_ready(f(vae, lat))
        print(f'{n}: compiled', flush=True)

    jax.profiler.start_trace(outdir)
    out = None
    for rep in range(5):
        for n, f in fns.items():
            out = f(vae, lat)
    np.asarray(out)[0, 0, 0]  # real fetch — tunnel-safe sync
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
