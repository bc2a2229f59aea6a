"""AutoencoderKL (SD1.x VAE), functional JAX, NHWC.

TPU-native equivalent of the diffusers `AutoencoderKL` the reference loads
(reference: trainer_edlora.py:38; latent scaling 0.18215 applied by callers,
trainer_edlora.py:204). Architecture: 4 encoder stages (128/256/512/512, 2
resnets each, asymmetric-padded stride-2 downsampling), mid block with one
single-head attention, mirrored decoder with 3 resnets per stage.

The encoder returns (mean, logvar); `sample_latents` draws the reparameterized
sample — kept separate so jit'd training can thread its PRNG key explicitly.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from mixofshow_tpu.models.layers import (as_rng, conv2d, group_norm,
                                         init_conv2d, init_norm, sdpa)

EPS = 1e-6

# GroupNorm statistics strategy for the VAE only. Default 'pallas': the
# VAE's spatially-tiled resolutions are where XLA's reduce lowering pays
# ~58 ms of fp32 transposed copies per b4 512^2 decode — the one-read
# stats kernel measures 165.7 -> 122.3 ms (tools/bench_gn.py, v5e). The
# UNet keeps 'onepass': there GN statistics fuse into the conv epilogues,
# and forcing the kernel measured 61.8 -> 67.4 ms per CFG-b8 eval
# (docs/Performance.md round 3).
import os as _os
VAE_GN_IMPL = _os.environ.get('MOS_VAE_GN', 'pallas') or None


def _gn(p, x, groups, act=None):
    from mixofshow_tpu.models.layers import group_norm
    return group_norm(p, x, groups, eps=EPS, act=act,
                      stats_impl=VAE_GN_IMPL)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215

    @staticmethod
    def sd15() -> 'VAEConfig':
        return VAEConfig()


# ------------------------------------------------------------------ init
def _init_resnet(rng, cin, cout, dtype):
    p = {
        'norm1': init_norm(cin, dtype),
        'conv1': init_conv2d(rng, 3, 3, cin, cout, dtype=dtype),
        'norm2': init_norm(cout, dtype),
        'conv2': init_conv2d(rng, 3, 3, cout, cout, dtype=dtype),
    }
    if cin != cout:
        p['shortcut'] = init_conv2d(rng, 1, 1, cin, cout, dtype=dtype)
    return p


def _init_attn(rng, c, dtype):
    return {
        'norm': init_norm(c, dtype),
        'q': init_conv2d(rng, 1, 1, c, c, dtype=dtype),
        'k': init_conv2d(rng, 1, 1, c, c, dtype=dtype),
        'v': init_conv2d(rng, 1, 1, c, c, dtype=dtype),
        'proj': init_conv2d(rng, 1, 1, c, c, dtype=dtype),
    }


def init_vae(rng, cfg: VAEConfig = VAEConfig(), dtype=jnp.float32):
    n_stages = len(cfg.block_out_channels)
    rng = as_rng(rng)
    ch = cfg.block_out_channels

    enc = {'conv_in': init_conv2d(rng, 3, 3, cfg.in_channels, ch[0],
                                  dtype=dtype), 'down': []}
    cin = ch[0]
    for i in range(n_stages):
        stage = {'resnets': []}
        for _ in range(cfg.layers_per_block):
            stage['resnets'].append(_init_resnet(rng, cin, ch[i], dtype))
            cin = ch[i]
        if i < n_stages - 1:
            stage['downsample'] = init_conv2d(rng, 3, 3, cin, cin,
                                              dtype=dtype)
        enc['down'].append(stage)
    enc['mid'] = {
        'resnet1': _init_resnet(rng, cin, cin, dtype),
        'attn': _init_attn(rng, cin, dtype),
        'resnet2': _init_resnet(rng, cin, cin, dtype),
    }
    enc['norm_out'] = init_norm(cin, dtype)
    enc['conv_out'] = init_conv2d(rng, 3, 3, cin,
                                  2 * cfg.latent_channels, dtype=dtype)

    dec = {'conv_in': init_conv2d(rng, 3, 3, cfg.latent_channels,
                                  ch[-1], dtype=dtype)}
    cin = ch[-1]
    dec['mid'] = {
        'resnet1': _init_resnet(rng, cin, cin, dtype),
        'attn': _init_attn(rng, cin, dtype),
        'resnet2': _init_resnet(rng, cin, cin, dtype),
    }
    dec['up'] = []
    for i, cout in enumerate(reversed(ch)):
        stage = {'resnets': []}
        for _ in range(cfg.layers_per_block + 1):
            stage['resnets'].append(_init_resnet(rng, cin, cout, dtype))
            cin = cout
        if i < n_stages - 1:
            stage['upsample'] = init_conv2d(rng, 3, 3, cin, cin,
                                            dtype=dtype)
        dec['up'].append(stage)
    dec['norm_out'] = init_norm(cin, dtype)
    dec['conv_out'] = init_conv2d(rng, 3, 3, cin, cfg.in_channels,
                                  dtype=dtype)

    return {
        'encoder': enc,
        'decoder': dec,
        'quant_conv': init_conv2d(rng, 1, 1, 2 * cfg.latent_channels,
                                  2 * cfg.latent_channels, dtype=dtype),
        'post_quant_conv': init_conv2d(rng, 1, 1, cfg.latent_channels,
                                       cfg.latent_channels, dtype=dtype),
    }


# ----------------------------------------------------------------- forward
def _resnet(p, x, groups=32):
    h = _gn(p['norm1'], x, groups, act='silu')
    h = conv2d(p['conv1'], h)
    h = _gn(p['norm2'], h, groups, act='silu')
    h = conv2d(p['conv2'], h)
    if 'shortcut' in p:
        x = conv2d(p['shortcut'], x)
    return x + h


def _attn(p, x, groups=32):
    b, h, w, c = x.shape
    hid = _gn(p['norm'], x, groups)
    if jax.default_backend() == 'tpu':
        # whole-processor Pallas kernel: the dense path materializes
        # (B, 1, HW, HW) fp32 logits — 268 MB at the 512^2 decode's 64^2
        # mid-attention, batch 4 — while the kernel keeps the single-head
        # QKV projection + softmax + proj epilogue in VMEM. 1x1 convs on
        # (B, HW, C) tokens ARE the dense projections (biases included).
        # `precise` preserves fp32 math when the surrounding graph is fp32
        # (training-side encode); bf16 graphs keep bf16 matmuls.
        from mixofshow_tpu.ops.fused_attention import (
            attention_block, attention_block_supported)
        if attention_block_supported(h * w, h * w, c, c, 1):
            tokens = hid.reshape(b, h * w, c)
            out = attention_block(
                tokens, tokens,
                p['q']['kernel'].reshape(c, c), p['k']['kernel'].reshape(c, c),
                p['v']['kernel'].reshape(c, c),
                p['proj']['kernel'].reshape(c, c), p['proj']['bias'], 1,
                precise=(x.dtype == jnp.float32),
                bias_q=p['q']['bias'], bias_k=p['k']['bias'],
                bias_v=p['v']['bias'])
            return x + out.reshape(b, h, w, c)
    q = conv2d(p['q'], hid).reshape(b, h * w, 1, c)
    k = conv2d(p['k'], hid).reshape(b, h * w, 1, c)
    v = conv2d(p['v'], hid).reshape(b, h * w, 1, c)
    out, _ = sdpa(q, k, v)
    out = conv2d(p['proj'], out.reshape(b, h, w, c))
    return x + out


def vae_encode(params, images: jnp.ndarray,
               cfg: VAEConfig = VAEConfig()) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images (B,H,W,3) in [-1,1] → (mean, logvar), each (B,H/8,W/8,4).

    Callers multiply the sample by cfg.scaling_factor (0.18215), matching
    trainer_edlora.py:203-204."""
    x = conv2d(params['encoder']['conv_in'], images)
    for i, stage in enumerate(params['encoder']['down']):
        for r in stage['resnets']:
            x = _resnet(r, x, cfg.norm_groups)
        if 'downsample' in stage:
            # diffusers pads (0,1,0,1): right/bottom only, then VALID stride 2
            x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
            x = conv2d(stage['downsample'], x, stride=2, padding='VALID')
    m = params['encoder']['mid']
    x = _resnet(m['resnet1'], x, cfg.norm_groups)
    x = _attn(m['attn'], x, cfg.norm_groups)
    x = _resnet(m['resnet2'], x, cfg.norm_groups)
    x = _gn(params['encoder']['norm_out'], x, cfg.norm_groups, act='silu')
    x = conv2d(params['encoder']['conv_out'], x)
    moments = conv2d(params['quant_conv'], x)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample_latents(key, mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def vae_decode(params, latents: jnp.ndarray,
               cfg: VAEConfig = VAEConfig()) -> jnp.ndarray:
    """latents (B,h,w,4) — caller divides by scaling_factor first — → images
    (B,8h,8w,3) in [-1,1]."""
    x = conv2d(params['post_quant_conv'], latents)
    x = conv2d(params['decoder']['conv_in'], x)
    m = params['decoder']['mid']
    x = _resnet(m['resnet1'], x, cfg.norm_groups)
    x = _attn(m['attn'], x, cfg.norm_groups)
    x = _resnet(m['resnet2'], x, cfg.norm_groups)
    for stage in params['decoder']['up']:
        for r in stage['resnets']:
            x = _resnet(r, x, cfg.norm_groups)
        if 'upsample' in stage:
            b, h, w, c = x.shape
            # nearest 2x via broadcast-reshape (no gather lowering)
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (b, h, 2, w, 2, c)).reshape(b, 2 * h,
                                                             2 * w, c)
            x = conv2d(stage['upsample'], x)
    x = _gn(params['decoder']['norm_out'], x, cfg.norm_groups, act='silu')
    return conv2d(params['decoder']['conv_out'], x)
