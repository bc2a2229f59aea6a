#!/usr/bin/env python
"""Profile the sampling-path UNet step on the real TPU and print top ops.

Usage: python tools/profile_unet.py [--batch 4] [--size 512] [--steps 3]

Traces a jitted CFG denoise step (the hot function of sampling — 100 UNet
evals per image at 50 steps) with jax.profiler, then parses the trace
protobuf/json for device-side op durations, aggregated by fusion name, so
perf work targets real numbers instead of guesses. Host wall-clock through
the remote-device tunnel is unreliable (see docs/Perf.md) — the trace event
durations are the only trustworthy timing source here.
"""
import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def run_trace(batch: int, size: int, steps: int, outdir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mixofshow_tpu.diffusion import DPMSolverMultistep
    from mixofshow_tpu.models import UNetConfig, init_unet, unet_apply
    from mixofshow_tpu.models.layers import cast_floats, to_device

    ucfg = UNetConfig.sd15()
    params = to_device(cast_floats(init_unet(0, ucfg), jnp.bfloat16))
    solver = DPMSolverMultistep.create()
    coeffs = jax.tree.map(to_device, solver.step_coeffs(50))

    lat = size // 8

    @jax.jit
    def cfg_step(params, latents, m_prev, embeds, i):
        latent_in = jnp.concatenate([latents, latents])
        t = jnp.broadcast_to(coeffs.timestep[i], (latent_in.shape[0],))
        eps, _ = unet_apply(params, latent_in.astype(jnp.bfloat16), t,
                            embeds, ucfg)
        eps_u, eps_c = jnp.split(eps.astype(jnp.float32), 2)
        eps = eps_u + 7.5 * (eps_c - eps_u)
        return solver.step(latents, m_prev, eps, coeffs, i)

    latents = to_device(np.zeros((batch, lat, lat, 4), np.float32))
    m_prev = to_device(np.zeros((batch, lat, lat, 4), np.float32))
    embeds = to_device(np.zeros((2 * batch, 16, 77, 768), np.bfloat16()
                                if hasattr(np, 'bfloat16') else np.float32))
    embeds = jnp.asarray(embeds, jnp.bfloat16)

    # warm (compile)
    out = cfg_step(params, latents, m_prev, embeds, jnp.int32(0))
    jax.block_until_ready(out)
    print('compiled; tracing...', flush=True)

    jax.profiler.start_trace(outdir)
    for i in range(steps):
        out = cfg_step(params, latents, m_prev, embeds, jnp.int32(i + 1))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print('trace done', flush=True)


def parse_trace(outdir: str, top: int = 40):
    files = sorted(glob.glob(os.path.join(outdir, '**', '*.trace.json.gz'),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print('no trace files under', outdir)
        return
    with gzip.open(files[-1], 'rt') as f:
        data = json.load(f)
    events = data.get('traceEvents', [])
    # device-side complete events, keyed by op name
    pid_names = {e.get('pid'): e.get('args', {}).get('name', '')
                 for e in events if e.get('ph') == 'M'
                 and e.get('name') == 'process_name'}
    device_pids = {p for p, n in pid_names.items()
                   if 'TPU' in n or 'Device' in n or '/device' in n.lower()}
    agg = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get('ph') != 'X':
            continue
        if device_pids and e.get('pid') not in device_pids:
            continue
        name = e.get('name', '')
        dur = e.get('dur', 0) / 1e3  # us -> ms
        # collapse fusion instance suffixes
        base = re.sub(r'[._]?[0-9]+$', '', name)
        agg[base] += dur
        count[base] += 1
        total += dur
    print(f'\n== top {top} device ops by total time (ms across trace) ==')
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f'{ms:10.3f} ms  x{count[name]:<4d} {name[:110]}')
    print(f'{total:10.3f} ms  TOTAL device')

    # individual (uncollapsed) ops with source attribution from args
    indiv = defaultdict(float)
    icount = defaultdict(int)
    args_of = {}
    for e in events:
        if e.get('ph') != 'X':
            continue
        if device_pids and e.get('pid') not in device_pids:
            continue
        name = e.get('name', '')
        indiv[name] += e.get('dur', 0) / 1e3
        icount[name] += 1
        if name not in args_of and e.get('args'):
            args_of[name] = e['args']
    print(f'\n== top {top} INDIVIDUAL ops ==')
    for name, ms in sorted(indiv.items(), key=lambda kv: -kv[1])[:top]:
        a = args_of.get(name, {})
        src = a.get('source_info') or a.get('tf_op') or a.get('long_name', '')
        shape = a.get('shape', '')
        print(f'{ms:9.3f} ms x{icount[name]:<4d} {name[:60]:60s} '
              f'{str(shape)[:40]} {str(src)[:90]}')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--outdir', default='/tmp/prof_unet')
    ap.add_argument('--parse-only', action='store_true')
    args = ap.parse_args()
    if not args.parse_only:
        os.makedirs(args.outdir, exist_ok=True)
        run_trace(args.batch, args.size, args.steps, args.outdir)
    parse_trace(args.outdir)
