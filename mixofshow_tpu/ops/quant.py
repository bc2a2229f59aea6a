"""Weight+activation int8 quantization for the serving dense pool.

Opt-in serving mode (EDLoRAPipeline(quantize='int8')) — NOT part of the
reference's surface (it samples fp16; SURVEY.md §6). Motivation: v5e's MXU
advertises int8 at 2x the bf16 rate (394 vs 197 T/s), and the sampling
profile's dense pool (attention projections + GEGLU, ~18 ms of the 62 ms
CFG step — docs/Performance.md) is the one pool whose floor that halves.
The d=40 attention floor itself is output-tile-bound, so the flash kernels
stay bf16.

MEASURED VERDICT (v5e, tools/bench_int8.py + end-to-end A/B): XLA:TPU
reaches only 1.2-1.5x bf16 on pure int8 dots at these shapes, and the
dynamic-quant round trip makes the small/output-side projections LOSE
(proj d=320: 67 vs 92 T/s bf16); end-to-end sampling measured 1.078 vs
1.173 img/s serial (-8%). Serve bf16 on v5e — this mode is kept as the
measured record and for hardware with a wider int8 path (docs/Serving.md).

Scheme (standard symmetric dynamic PTQ, as in SmoothQuant/Q-Diffusion-style
serving stacks, built from scratch here):
  * weights: per-output-channel symmetric int8, folded scale kept fp32;
  * activations: dynamic per-token (per-row) absmax int8 at the matmul edge;
  * accumulate int32 on the MXU, rescale once in fp32, emit bf16.

Quantized tensors ride INSIDE the params tree next to the bf16 'kernel'
(`wq`/`wscale` leaves): `layers.dense` routes on their presence, so every
dense call site is quant-capable with no plumbing, and LoRA deltas still
apply exactly in bf16 on top of the int8 base matmul (alpha sweeps keep
working). Only trees built by `quantize_unet` carry these leaves.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['quantize_dense', 'quantize_conv', 'quantize_unet',
           'int8_matmul', 'int8_conv']


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray,
                out_dtype=None) -> jnp.ndarray:
    """(…, in) x int8 (in, out) -> (…, out) with dynamic per-row activation
    quantization. int32 MXU accumulation; one fused fp32 rescale."""
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = amax / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (sx * wscale)).astype(out_dtype)


def int8_conv(x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray,
              stride, padding, out_dtype=None) -> jnp.ndarray:
    """NHWC x int8 HWIO -> NHWC. Activation scale is per-IMAGE (one scalar
    per batch element): a conv mixes neighboring pixels, so finer-grained
    (per-pixel) scales would break the linearity the int32 accumulation
    relies on."""
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
    sx = amax / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride),
        padding=padding if isinstance(padding, str) else
        [(padding, padding), (padding, padding)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (sx * wscale)).astype(out_dtype)


def quantize_dense(p: dict) -> dict:
    """Add per-output-channel int8 `wq` + fp32 `wscale` next to `kernel`."""
    w = np.asarray(p['kernel'], np.float32)
    wscale = np.abs(w).max(axis=0) / 127.0 + 1e-12
    wq = np.clip(np.rint(w / wscale), -127, 127).astype(np.int8)
    out = dict(p)
    out['wq'] = wq
    out['wscale'] = wscale.astype(np.float32)
    return out


def quantize_conv(p: dict) -> dict:
    """Add per-output-channel int8 `wq` + fp32 `wscale` next to an HWIO
    conv `kernel`."""
    w = np.asarray(p['kernel'], np.float32)
    wscale = np.abs(w).max(axis=(0, 1, 2)) / 127.0 + 1e-12
    wq = np.clip(np.rint(w / wscale), -127, 127).astype(np.int8)
    out = dict(p)
    out['wq'] = wq
    out['wscale'] = wscale.astype(np.float32)
    return out


# The transformer dense sites of the sampling profile's 18 ms pool.
_ATTN_KEYS = ('to_q', 'to_k', 'to_v', 'to_out')
_FF_KEYS = ('proj', 'out')
# The resnet conv pool (~20 ms/eval at ~145 TF/s bf16). Shortcuts /
# down/upsamplers / conv_in/conv_out stay bf16 (small, or quality-critical
# edges of the graph).
_CONV_KEYS = ('conv1', 'conv2')


def quantize_unet(params: dict, convs: bool = False) -> dict:
    """Quantize every transformer attention projection and GEGLU linear in a
    UNet params tree (host-side, numpy); `convs=True` additionally
    quantizes the resnet 3x3 convs (mode 'int8+conv'). Norms /
    time-embeddings pass through untouched — bandwidth-bound."""
    def walk(node, name=''):
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, name) for v in node)
        if not isinstance(node, dict):
            return node
        if name in ('attn1', 'attn2'):
            return {k: (quantize_dense(v) if k in _ATTN_KEYS else
                        walk(v, k)) for k, v in node.items()}
        if name == 'ff':
            return {k: (quantize_dense(v) if k in _FF_KEYS else
                        walk(v, k)) for k, v in node.items()}
        if convs and 'conv1' in node and 'conv2' in node:  # a resnet block
            return {k: (quantize_conv(v) if k in _CONV_KEYS else
                        walk(v, k)) for k, v in node.items()}
        return {k: walk(v, k) for k, v in node.items()}

    return walk(jax.tree.map(lambda x: np.asarray(x), params))
