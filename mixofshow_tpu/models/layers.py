"""Functional NN building blocks over plain parameter pytrees.

Design stance (SURVEY.md §7): the reference extends models by *mutation*
(monkey-patched forwards, processor swapping). Here every layer is a pure
function `f(params, x, ...)` over a nested-dict pytree, and LoRA deltas are a
*separate* pytree threaded to call sites — so jit/pjit see one functional
program and gradients are taken w.r.t. the LoRA tree alone.

Conventions:
  * activations are NHWC, conv kernels HWIO (TPU-native layouts)
  * dense kernels are (in, out): y = x @ W + b
  * LoRA leaf: {'down': (in, r), 'up': (r, out)}; applied as
    y += alpha * (x @ down) @ up   (reference: edlora.py:244-246)
  * norms compute in fp32 regardless of activation dtype
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- dense/conv
def dense(p, x, lora=None, alpha: float | jnp.ndarray = 1.0):
    """y = x @ kernel + bias, with optional LoRA delta.

    Trees built by ops.quant.quantize_unet carry int8 `wq` + fp32 `wscale`
    next to `kernel`; their base matmul runs on the MXU's 2x int8 path with
    dynamic per-token activation quantization (opt-in serving mode). The
    LoRA delta still applies exactly in the activation dtype on top."""
    dt = x.dtype
    if 'wq' in p:
        from mixofshow_tpu.ops.quant import int8_matmul
        y = int8_matmul(x, p['wq'], p['wscale'], dt)
    else:
        y = jnp.dot(x, p['kernel'].astype(dt), preferred_element_type=dt)
    if 'bias' in p:
        y = y + p['bias'].astype(dt)
    if lora is not None:
        delta = jnp.dot(jnp.dot(x, lora['down'].astype(dt)),
                        lora['up'].astype(dt), preferred_element_type=dt)
        y = y + jnp.asarray(alpha, dt) * delta
    return y


def conv2d(p, x, stride: int = 1, padding='SAME', lora=None,
           alpha: float | jnp.ndarray = 1.0):
    """NHWC conv. LoRA (1x1 factorized) supported for 1x1 convs, matching the
    reference's Conv2d LoRA branch (edlora.py:227-230). Trees built by
    ops.quant.quantize_unet(convs=True) carry int8 `wq`/`wscale` leaves and
    route to the MXU int8 conv (opt-in serving mode)."""
    dt = x.dtype
    if 'wq' in p:
        from mixofshow_tpu.ops.quant import int8_conv
        y = int8_conv(x, p['wq'], p['wscale'], stride, padding, dt)
    else:
        y = jax.lax.conv_general_dilated(
            x, p['kernel'].astype(dt),
            window_strides=(stride, stride),
            padding=padding if isinstance(padding, str) else
            [(padding, padding), (padding, padding)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=dt)
    if 'bias' in p:
        y = y + p['bias'].astype(dt)
    if lora is not None:
        # 1x1 conv LoRA == per-pixel dense LoRA
        delta = jnp.dot(jnp.dot(x, lora['down'].astype(dt)),
                        lora['up'].astype(dt), preferred_element_type=dt)
        y = y + jnp.asarray(alpha, dt) * delta
    return y


# ----------------------------------------------------------------------- norm
# GroupNorm statistics strategy. Round-3 VAE-decode profiling
# (tools/profile_sampling.py --target vae): the plain
# `jnp.sum(x, axis=(1,2), dtype=f32)` pair made XLA materialize TWO fp32
# copies of every spatially-tiled conv output in a transposed {3,0,2,1}
# layout — 58 ms of the 163 ms b4 512^2 decode, ~20x over the bandwidth
# floor. Variants (switchable for measurement, tools/bench_gn.py):
#   onepass   the sum/sum-of-squares pair above
#   h_first   reduce axis 1 to (b, w, c) fp32, then axis 1 — the partial
#             reduce can fuse inside XLA's spatial tiles
#   w_first   reduce axis 2 first
#   pallas    ops/gn_stats.py kernel: one bf16 read of x, fp32 accumulators
import os as _os
GN_STATS_IMPL = _os.environ.get('MOS_GN_STATS', 'onepass')


def _gn_sums(x, impl):
    """Per-(batch, channel) fp32 (sum, sum-of-squares) over spatial axes."""
    if impl == 'pallas' and x.ndim == 4 and jax.default_backend() == 'tpu':
        from mixofshow_tpu.ops.gn_stats import spatial_sums
        return spatial_sums(x)
    if impl == 'h_first':
        s1 = jnp.sum(x, axis=1, dtype=jnp.float32)
        q1 = jnp.sum(jax.lax.square(x), axis=1, dtype=jnp.float32)
        return s1.sum(axis=1), q1.sum(axis=1)
    if impl == 'w_first':
        s1 = jnp.sum(x, axis=2, dtype=jnp.float32)
        q1 = jnp.sum(jax.lax.square(x), axis=2, dtype=jnp.float32)
        return s1.sum(axis=1), q1.sum(axis=1)
    s = jnp.sum(x, axis=(1, 2), dtype=jnp.float32)
    s2 = jnp.sum(jax.lax.square(x), axis=(1, 2), dtype=jnp.float32)
    return s, s2


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-5,
               act: Optional[str] = None,
               stats_impl: Optional[str] = None):
    """GroupNorm over NHWC (channels last), fp32 statistics.

    TPU-shaped: statistics reduce over the SPATIAL axes first (channels —
    the lane dimension — stay intact, so the reduction vectorizes), then the
    tiny (B, C) moments collapse to per-group values. A grouped reshape
    before the reduce would slice the lane dimension into c/g-wide slivers,
    which lowers to a slow strided reduction (profiled at ~14 ms/step on the
    SD1.5 sampling path). The normalization itself is applied in the
    activation dtype via folded per-channel scale/bias — only the O(B*C)
    statistics run fp32, so HBM traffic is 3 bf16 passes instead of fp32
    round-trips. Variance uses the one-pass E[x^2]-E[x]^2 form with fp32
    accumulators and a maximum(.,0) clamp — see the cancellation note below."""
    b, h, w, c = x.shape
    g = num_groups
    # ONE spatial pass: sum and sum-of-squares together (XLA multi-output
    # fusion reads x once), fp32 accumulation over bf16 input. E[x^2]-E[x]^2
    # cancellation is benign here: accumulators are fp32 and the inputs are
    # bf16 activations, so the variance keeps far more precision than the
    # data carries (torch's own GN uses a one-pass Welford in fp32).
    # LAYOUT-AGNOSTIC on purpose: reduce (h, w) in place — no reshape, no
    # fp32 materialization of x. At VAE-decoder resolutions XLA spatially
    # tiles the convs (halo buffers like f32[512,32,65,128]); a reshape to
    # (b, h*w, c) plus an fp32 upcast forced ~25 ms of re-layout copies per
    # 512^2 b4 decode. The square runs in the input dtype with an fp32
    # accumulator — bf16 squares carry 2^-9 relative error, below the
    # noise already in bf16 activations (fp32 inputs keep fp32 squares).
    impl = stats_impl or GN_STATS_IMPL
    s, s2 = _gn_sums(x, impl)                                    # (b, c)
    mean_g = s.reshape(b, g, c // g).mean(axis=-1) / (h * w)   # (b, g)
    m2_g = s2.reshape(b, g, c // g).mean(axis=-1) / (h * w)    # (b, g)
    mean_c = jnp.repeat(mean_g, c // g, axis=-1)         # (b, c) fp32
    var_g = jnp.maximum(m2_g - mean_g * mean_g, 0.0)
    rstd_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), c // g, axis=-1)
    # fold affine: out = x * a + bb, a/b computed fp32 on (b, c) only
    a = p['scale'].astype(jnp.float32)[None, :] * rstd_c
    bb = p['bias'].astype(jnp.float32)[None, :] - mean_c * a
    # apply stays XLA even under impl='pallas': routing the affine through
    # ops/gn_stats.scale_bias_act measured SLOWER (136.3 vs 122.3 ms b4
    # decode, tools/bench_gn.py) — the kernel boundary blocks XLA from
    # fusing the silu/affine into neighboring ops, while the stats kernel
    # removes the truly unfusable cross-tile fp32 reduction copies.
    # pass 3: apply in activation dtype
    out = x * a.astype(x.dtype)[:, None, None, :] \
        + bb.astype(x.dtype)[:, None, None, :]
    if act == 'silu':
        out = jax.nn.silu(out)
    return out


def layer_norm(p, x, eps: float = 1e-5):
    """LayerNorm over the last axis; fp32 statistics, activation-dtype apply
    (a full fp32 round-trip of the activations doubles HBM traffic at every
    transformer norm — stats-only upcast matches the parity tolerance)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    a = p['scale'].astype(jnp.float32) * rstd
    bb = p['bias'].astype(jnp.float32) - mean * a
    return x * a.astype(x.dtype) + bb.astype(x.dtype)


# ------------------------------------------------------------------ attention
def sdpa(q, k, v, scale: Optional[float] = None, causal: bool = False,
         return_probs: bool = False, impl: str = 'auto'):
    """Multi-head scaled dot-product attention, (B, S, H, D) layout.

    fp32 softmax (numerically matches the reference's
    `attn.get_attention_scores` upcast behavior). `return_probs` exposes the
    softmax probabilities for the AttentionStore / attention-regularization
    path (reference: edlora.py:81-83, ptp_util.py) — callers must only
    request it on small maps.

    `impl='auto'` routes large unmasked attention to the Pallas flash kernel
    on TPU (ops/flash_attention.py — the xformers replacement); probs
    capture, causal masks, small key counts (cross-attn's 77), and non-TPU
    backends take the dense XLA path.
    """
    if (impl in ('auto', 'flash') and not causal and not return_probs
            and scale is None and jax.default_backend() == 'tpu'):
        from mixofshow_tpu.ops.flash_attention import (
            flash_attention, flash_attention_supported)
        if flash_attention_supported(q.shape[1], k.shape[1], q.shape[-1]):
            return flash_attention(q, k, v), None
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        qlen, klen = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((qlen, klen), dtype=bool))
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(v.dtype), v,
                     preferred_element_type=v.dtype)
    if return_probs:
        return out, probs
    return out, None


# ------------------------------------------------------------------- inits
# Host-side numpy init: random init is a one-time cold path (real runs load
# checkpoint weights), and doing it on host avoids compiling hundreds of tiny
# device programs. `as_rng` accepts an int seed, a numpy Generator, or a JAX
# PRNG key for convenience.
def as_rng(seed) -> np.random.Generator:
    if isinstance(seed, np.random.Generator):
        return seed
    if isinstance(seed, (int, np.integer)):
        return np.random.default_rng(int(seed))
    # a JAX PRNG key (typed key array or raw uint32 key data)
    if jnp.issubdtype(getattr(seed, 'dtype', None), jax.dtypes.prng_key):
        seed = jax.random.key_data(seed)
    return np.random.default_rng([int(x) for x in np.asarray(seed).ravel()])


class LeafSpec:
    """Placeholder leaf recorded under `spec_mode()`: the distribution of an
    init leaf, without generating values. utils/device_init.py turns a tree
    of these into one jitted on-device generation program — on a remote-TPU
    link, uploading an SD1.5 fp32 tree costs ~400 s at the measured
    ~10 MB/s, while generating it on device is free (docs/Performance.md,
    warm-first-call budget)."""

    __slots__ = ('kind', 'shape', 'dtype', 'param')

    def __init__(self, kind, shape, dtype, param=0.0):
        self.kind = kind          # 'uniform' | 'normal' | 'ones' | 'zeros'
        self.shape = tuple(shape) if not isinstance(shape, int) else (shape,)
        self.dtype = dtype
        self.param = param        # uniform: bound; normal: scale

    def __repr__(self):
        return (f'LeafSpec({self.kind}, {self.shape}, '
                f'{np.dtype(self.dtype).name}, {self.param})')


_SPEC_MODE = False


class spec_mode:
    """Context manager: init helpers record LeafSpecs instead of generating
    host arrays. Init builders are pure compositions of these helpers (no
    post-hoc arithmetic on leaves), so the recorded tree has exactly the
    host tree's structure/shapes/dtypes."""

    def __enter__(self):
        global _SPEC_MODE
        self._prev, _SPEC_MODE = _SPEC_MODE, True
        return self

    def __exit__(self, *exc):
        global _SPEC_MODE
        _SPEC_MODE = self._prev
        return False


def _uniform_f32(rng: np.random.Generator, bound: float, shape, dtype):
    """U[-bound, bound] generated NATIVELY in float32. `rng.uniform` always
    generates float64; on this host's slow single core that costs minutes
    for SD1.5-size trees (~1B params) — native f32 generation measures ~3x
    faster and halves peak memory."""
    if _SPEC_MODE:
        return LeafSpec('uniform', shape, dtype, bound)
    x = rng.random(shape, dtype=np.float32)
    x *= 2.0 * bound
    x -= bound
    return x if dtype == np.float32 else x.astype(dtype)


def init_dense(rng, in_dim: int, out_dim: int, bias: bool = True,
               dtype=jnp.float32):
    """torch nn.Linear default init (kaiming uniform a=sqrt(5) ~ U[-1/sqrt(in), +])."""
    rng = as_rng(rng)
    bound = 1.0 / math.sqrt(in_dim)
    # host numpy — device placement happens in one batched transfer at the
    # first jit call (eager per-leaf transfers are pathological on
    # remote-device setups: ~700 round trips for the SD1.5 UNet)
    p = {'kernel': _uniform_f32(rng, bound, (in_dim, out_dim), dtype)}
    if bias:
        p['bias'] = _uniform_f32(rng, bound, (out_dim,), dtype)
    return p


def init_conv2d(rng, kh: int, kw: int, in_dim: int, out_dim: int,
                bias: bool = True, dtype=jnp.float32):
    rng = as_rng(rng)
    fan_in = kh * kw * in_dim
    bound = 1.0 / math.sqrt(fan_in)
    p = {'kernel': _uniform_f32(rng, bound, (kh, kw, in_dim, out_dim),
                                dtype)}
    if bias:
        p['bias'] = _uniform_f32(rng, bound, (out_dim,), dtype)
    return p


def init_norm(dim: int, dtype=jnp.float32):
    if _SPEC_MODE:
        return {'scale': LeafSpec('ones', (dim,), dtype),
                'bias': LeafSpec('zeros', (dim,), dtype)}
    return {'scale': np.ones((dim,), dtype), 'bias': np.zeros((dim,), dtype)}


def init_embedding(rng, num: int, dim: int, scale: float = 0.02,
                   dtype=jnp.float32):
    if _SPEC_MODE:
        return LeafSpec('normal', (num, dim), dtype, scale)
    rng = as_rng(rng)
    x = rng.standard_normal((num, dim), dtype=np.float32)
    x *= scale
    return x if dtype == np.float32 else x.astype(dtype)


# ------------------------------------------------------------------- helpers
def to_device(tree, sharding=None):
    """Place a (possibly host-numpy) pytree on device ONCE. Long-lived
    params must be pinned — host leaves passed to jit are re-transferred on
    every call, which is catastrophic on remote-device links."""
    import jax as _jax
    if sharding is None:
        return _jax.device_put(tree)
    return _jax.device_put(tree, sharding)


def cast_floats(tree, dtype):
    """Cast all floating leaves of a pytree (e.g. fp32 params → bf16 compute).

    Host (numpy) leaves are cast on host — numpy handles bf16 via ml_dtypes —
    so nothing touches the device; device leaves are cast in ONE jitted
    program instead of per-leaf eager dispatches (which would mean hundreds
    of round trips on a remote-device setup)."""
    def _is_float(x):
        return hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating)

    def _cast_host(x):
        if isinstance(x, np.ndarray) and _is_float(x):
            return x.astype(dtype)
        return x

    host_cast = jax.tree.map(_cast_host, tree)
    leaves = jax.tree.leaves(host_cast)
    if any(isinstance(x, jax.Array) and _is_float(x) and x.dtype != dtype
           for x in leaves):
        cast_all = jax.jit(lambda t: jax.tree.map(
            lambda x: x.astype(dtype) if _is_float(x) else x, t))
        return cast_all(host_cast)
    return host_cast


def timestep_embedding(timesteps, dim: int, max_period: int = 10000,
                       flip_sin_to_cos: bool = True, scale: float = 1.0):
    """Sinusoidal timestep embedding (SD convention: half dim sin, half cos,
    flip order so cos comes first; downscale_freq_shift=0)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = scale * timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                          axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb
