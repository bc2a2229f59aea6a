#!/usr/bin/env python
"""Compare GroupNorm statistics strategies on the full VAE decode (b4,
64x64x4 -> 512^2, bf16) — the workload where GN stats measured 58 ms of
fp32 transposed copies (profile_sampling --target vae, round 3).

Times each variant with fetch-synchronized marginal wall timing (host
wall over the axon tunnel lies; this differences two chain lengths and
ends in a real fetch). Run ALONE on the real chip.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def marginal_ms(fn, *args, n_lo=2, n_hi=8):
    out = fn(*args)
    np.asarray(out).ravel()[0]

    def run(n):
        t0 = time.time()
        for _ in range(n):
            o = fn(*args)
        np.asarray(o).ravel()[0]
        return time.time() - t0

    lo, hi = run(n_lo), run(n_hi)
    return (hi - lo) / (n_hi - n_lo) * 1e3


def main():
    from mixofshow_tpu.models import layers
    from mixofshow_tpu.models.layers import cast_floats, to_device
    from mixofshow_tpu.models.vae import VAEConfig, init_vae, vae_decode

    vcfg = VAEConfig.sd15()
    params = to_device(cast_floats(init_vae(2, vcfg), jnp.bfloat16))
    lat = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64, 64, 4)),
                      jnp.bfloat16)

    for impl in ('onepass', 'h_first', 'w_first', 'pallas'):
        layers.GN_STATS_IMPL = impl

        def decode(p, z):
            return vae_decode(p, z / vcfg.scaling_factor, vcfg)
        decode.__name__ = f'decode_{impl}'
        fn = jax.jit(decode)
        t0 = time.time()
        out = fn(params, lat)
        np.asarray(out).ravel()[0]
        compile_s = time.time() - t0
        ms = marginal_ms(fn, params, lat)
        print(f'{impl:10s}: {ms:8.1f} ms/decode   (compile+first '
              f'{compile_s:.0f}s)', flush=True)


if __name__ == '__main__':
    main()
