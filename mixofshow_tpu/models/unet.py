"""SD1.x UNet2DConditionModel, functional JAX, NHWC, TPU-first.

TPU-native equivalent of the diffusers UNet the reference drives
(reference: trainer_edlora.py:41, pipeline_edlora.py:277). The reference's
three mutation-based extension points are replaced by functional arguments:

  * ED-LoRA layerwise text embeddings: every cross-attention layer has a
    static index in down→mid→up order (reference edlora.py:176-190 registers
    processors in exactly this order; 16 layers for SD1.5). When
    `encoder_hidden_states` is 4-D (B, 16, 77, C) each attn2 slices its own
    layer (edlora.py:130-131); a 3-D (B, 77, C) tensor is broadcast.
  * LoRA: a pytree mirroring this module's param tree is threaded to every
    attention linear (reference trainer_edlora.py:118-136 wraps the same
    `where='Attention'` targets by monkey-patching).
  * regional / controlled cross-attention: `cross_attn_override` — a pure
    callable invoked instead of the default cross-attention — replaces
    processor swapping (edlora.py:193-218,
    pipeline_regionally_t2iadapter.py:148-163).

Aux outputs: `return_cross_probs=True` returns softmax cross-attention maps
grouped by UNet placement, the functional AttentionStore feed
(reference ptp_util.py:67-101).

T2I-Adapter features (`adapter_features`, list of one map per down block) are
added after each down block's resnet stack, matching diffusers 0.19.x
is_adapter injection used by the regional pipeline
(pipeline_regionally_t2iadapter.py:556-566).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mixofshow_tpu.models.layers import (as_rng, conv2d, dense, group_norm,
                                         init_conv2d, init_dense, init_norm,
                                         layer_norm, sdpa, timestep_embedding)
from mixofshow_tpu.models.lora import maybe


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_heads: int = 8  # SD1.x: attention_head_dim config == num heads
    norm_groups: int = 32
    sample_size: int = 64
    # which down blocks carry cross-attention transformers (SD1.5: first 3)
    down_cross: Tuple[bool, ...] = (True, True, True, False)

    @staticmethod
    def sd15() -> 'UNetConfig':
        return UNetConfig()

    @staticmethod
    def tiny() -> 'UNetConfig':
        """Small config for tests: same topology, 16x fewer channels."""
        return UNetConfig(block_out_channels=(32, 64, 128, 128),
                          cross_attention_dim=64, attention_heads=2,
                          norm_groups=8, sample_size=16)

    @property
    def up_cross(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.down_cross))

    @property
    def num_cross_layers(self) -> int:
        down = sum(self.layers_per_block for c in self.down_cross if c)
        up = sum(self.layers_per_block + 1 for c in self.up_cross if c)
        return down + 1 + up  # +1 for mid — 16 for SD1.5


def cross_layer_query_sizes(cfg: UNetConfig, h: int, w: int):
    """Static (place, layer_idx, q_len) of every cross-attn layer at latent
    size (h, w) — lets callers pre-size per-layer capture buffers (the
    inference attention-controller path keeps only small maps, mirroring the
    reference's <=32^2 inference store, ptp_util.py:74-77)."""
    sizes = []
    idx = 0
    ch, cw = h, w
    for i, has_cross in enumerate(cfg.down_cross):
        if has_cross:
            for _ in range(cfg.layers_per_block):
                sizes.append(('down', idx, ch * cw))
                idx += 1
        if i < len(cfg.block_out_channels) - 1:
            ch, cw = -(-ch // 2), -(-cw // 2)  # SAME-padded stride-2 conv
    sizes.append(('mid', idx, ch * cw))
    idx += 1
    for i, has_cross in enumerate(cfg.up_cross):
        if has_cross:
            for _ in range(cfg.layers_per_block + 1):
                sizes.append(('up', idx, ch * cw))
                idx += 1
        if i < len(cfg.block_out_channels) - 1:
            ch, cw = 2 * ch, 2 * cw
    return sizes


def cross_layer_paths(cfg: UNetConfig):
    """Param-tree path prefix of each cross-attention transformer block in
    layer-index order (down→mid→up — the ordering every ED-LoRA mechanism
    keys on, reference edlora.py:176-190, gradient_fusion.py:331-369)."""
    paths = []
    for i, has_cross in enumerate(cfg.down_cross):
        if has_cross:
            for j in range(cfg.layers_per_block):
                paths.append(f'down_blocks/{i}/attentions/{j}')
    paths.append('mid/attention')
    for i, has_cross in enumerate(cfg.up_cross):
        if has_cross:
            for j in range(cfg.layers_per_block + 1):
                paths.append(f'up_blocks/{i}/attentions/{j}')
    return paths


# ---------------------------------------------------------------------- init
def _init_resnet(rng, cin, cout, temb_dim, groups, dtype):
    p = {
        'norm1': init_norm(cin, dtype),
        'conv1': init_conv2d(rng, 3, 3, cin, cout, dtype=dtype),
        'time_emb_proj': init_dense(rng, temb_dim, cout, dtype=dtype),
        'norm2': init_norm(cout, dtype),
        'conv2': init_conv2d(rng, 3, 3, cout, cout, dtype=dtype),
    }
    if cin != cout:
        p['shortcut'] = init_conv2d(rng, 1, 1, cin, cout, dtype=dtype)
    return p


def _init_attention(rng, query_dim, context_dim, dtype):
    return {
        'to_q': init_dense(rng, query_dim, query_dim, bias=False, dtype=dtype),
        'to_k': init_dense(rng, context_dim, query_dim, bias=False, dtype=dtype),
        'to_v': init_dense(rng, context_dim, query_dim, bias=False, dtype=dtype),
        'to_out': init_dense(rng, query_dim, query_dim, dtype=dtype),
    }


def _init_transformer(rng, c, context_dim, groups, dtype):
    inner = 4 * c
    return {
        'norm': init_norm(c, dtype),
        'proj_in': init_conv2d(rng, 1, 1, c, c, dtype=dtype),
        'ln1': init_norm(c, dtype),
        'attn1': _init_attention(rng, c, c, dtype),
        'ln2': init_norm(c, dtype),
        'attn2': _init_attention(rng, c, context_dim, dtype),
        'ln3': init_norm(c, dtype),
        'ff': {
            'proj': init_dense(rng, c, 2 * inner, dtype=dtype),  # GEGLU
            'out': init_dense(rng, inner, c, dtype=dtype),
        },
        'proj_out': init_conv2d(rng, 1, 1, c, c, dtype=dtype),
    }


def init_unet(rng, cfg: UNetConfig = UNetConfig(), dtype=jnp.float32):
    rng = as_rng(rng)
    ch = cfg.block_out_channels
    temb_dim = 4 * ch[0]
    params = {
        'conv_in': init_conv2d(rng, 3, 3, cfg.in_channels, ch[0],
                               dtype=dtype),
        'time_embedding': {
            'linear_1': init_dense(rng, ch[0], temb_dim, dtype=dtype),
            'linear_2': init_dense(rng, temb_dim, temb_dim, dtype=dtype),
        },
        'down_blocks': [], 'up_blocks': [],
    }
    # down
    cin = ch[0]
    for i, has_cross in enumerate(cfg.down_cross):
        block = {'resnets': [], 'attentions': []}
        for _ in range(cfg.layers_per_block):
            block['resnets'].append(
                _init_resnet(rng, cin, ch[i], temb_dim,
                             cfg.norm_groups, dtype))
            cin = ch[i]
            if has_cross:
                block['attentions'].append(
                    _init_transformer(rng, cin, cfg.cross_attention_dim,
                                      cfg.norm_groups, dtype))
        if i < len(ch) - 1:
            block['downsample'] = init_conv2d(rng, 3, 3, cin, cin,
                                              dtype=dtype)
        params['down_blocks'].append(block)
    # mid
    params['mid'] = {
        'resnet1': _init_resnet(rng, cin, cin, temb_dim,
                                cfg.norm_groups, dtype),
        'attention': _init_transformer(rng, cin,
                                       cfg.cross_attention_dim,
                                       cfg.norm_groups, dtype),
        'resnet2': _init_resnet(rng, cin, cin, temb_dim,
                                cfg.norm_groups, dtype),
    }
    # up
    rev_ch = list(reversed(ch))
    for i, has_cross in enumerate(cfg.up_cross):
        cout = rev_ch[i]
        skip_ch = rev_ch[min(i + 1, len(ch) - 1)]
        block = {'resnets': [], 'attentions': []}
        for j in range(cfg.layers_per_block + 1):
            skip = rev_ch[i] if j < cfg.layers_per_block else skip_ch
            block['resnets'].append(
                _init_resnet(rng, cin + skip, cout, temb_dim,
                             cfg.norm_groups, dtype))
            cin = cout
            if has_cross:
                block['attentions'].append(
                    _init_transformer(rng, cin, cfg.cross_attention_dim,
                                      cfg.norm_groups, dtype))
        if i < len(ch) - 1:
            block['upsample'] = init_conv2d(rng, 3, 3, cin, cin,
                                            dtype=dtype)
        params['up_blocks'].append(block)

    params['norm_out'] = init_norm(cin, dtype)
    params['conv_out'] = init_conv2d(rng, 3, 3, cin, cfg.out_channels,
                                     dtype=dtype)
    return params


def cross_attention_kv(params, encoder_hidden_states, cfg: UNetConfig,
                       lora=None, alpha=1.0):
    """Precompute every cross-attention layer's K/V text projections.

    The text context is constant across a whole denoise run, but a UNet call
    inside the sampling scan recomputes all 32 to_k/to_v projections every
    step (the reference pays the same cost per step in its Python loop,
    pipeline_edlora.py:271-295). Hoisting them out of the scan trades
    ~60 MB of HBM (bf16, CFG b8) for 32 matmuls/step. Returns
    {layer_idx: (k, v)} with (B, 77, heads, head_dim) entries, consumed by
    `unet_apply(cross_kv=...)`."""
    ehs = encoder_hidden_states
    heads = cfg.attention_heads
    out = {}
    for idx, path in enumerate(cross_layer_paths(cfg)):
        parts = path.split('/')
        node = params
        for part in parts:
            node = node[int(part)] if part.isdigit() else node[part]
        p = node['attn2']
        lw = maybe(lora, *parts, 'attn2')
        ctx = ehs[:, idx] if ehs.ndim == 4 else ehs
        k = dense(p['to_k'], ctx, maybe(lw, 'to_k'), alpha)
        v = dense(p['to_v'], ctx, maybe(lw, 'to_v'), alpha)
        b, s = ctx.shape[0], ctx.shape[1]
        d = k.shape[-1] // heads
        out[idx] = (k.reshape(b, s, heads, d), v.reshape(b, s, heads, d))
    return out


# ------------------------------------------------------------------- forward
def _resnet(p, x, temb, groups):
    h = group_norm(p['norm1'], x, groups, act='silu')
    h = conv2d(p['conv1'], h)
    t = dense(p['time_emb_proj'], jax.nn.silu(temb))
    h = h + t[:, None, None, :]
    h = group_norm(p['norm2'], h, groups, act='silu')
    h = conv2d(p['conv2'], h)
    if 'shortcut' in p:
        x = conv2d(p['shortcut'], x)
    return x + h


def mh_attention(p, x, context, heads: int, lora=None, alpha=1.0,
                 return_probs: bool = False, return_pre_out: bool = False,
                 fuse: bool = False, kv=None):
    """diffusers `Attention` equivalent; (B, S, C) in/out.

    `return_pre_out` also yields the pre-output-projection tokens (the
    to_out layer's input — fusion's capture point). `fuse` routes the whole
    processor (QKV projection + softmax + out-projection) to the Pallas
    attention-block kernel on TPU (ops/fused_attention.py) — inference-only
    (no VJP); LoRA folds into the effective weights (rank-4 outer product).
    `kv` supplies precomputed (B, S_k, H, D) key/value projections
    (see `cross_attention_kv` — the denoise-scan hoist), skipping the
    to_k/to_v matmuls."""
    b, s, c = x.shape
    d = c // heads
    if fuse and kv is None and not return_probs and not return_pre_out \
            and 'bias' not in p['to_q'] and 'wq' not in p['to_q'] \
            and jax.default_backend() == 'tpu':
        from mixofshow_tpu.ops.fused_attention import (
            attention_block, attention_block_supported, attention_packed,
            attention_packed_supported)
        use_packed = (fuse == 'packed')
        supported = (attention_packed_supported if use_packed
                     else attention_block_supported)
        if supported(s, context.shape[1], c, context.shape[-1], heads):
            def eff(name):
                w = p[name]['kernel']
                lw = maybe(lora, name)
                if lw is not None:
                    w = w + jnp.asarray(alpha, w.dtype) * jnp.dot(
                        lw['down'].astype(w.dtype), lw['up'].astype(w.dtype),
                        preferred_element_type=w.dtype)
                return w

            bias = p['to_out'].get('bias')
            if bias is None:
                bias = jnp.zeros((c,), x.dtype)
            op = attention_packed if use_packed else attention_block
            out = op(x, context.astype(x.dtype), eff('to_q'),
                     eff('to_k'), eff('to_v'), eff('to_out'),
                     bias, heads)
            return out, None
    # (a fused single QKV matmul was tried and measured slightly SLOWER
    # end-to-end: XLA does not hoist the in-scan weight concat out of the
    # denoise while-loop, so it re-materialized every step)
    q = dense(p['to_q'], x, maybe(lora, 'to_q'), alpha).reshape(b, s, heads, d)
    if kv is None:
        k = dense(p['to_k'], context, maybe(lora, 'to_k'), alpha)
        v = dense(p['to_v'], context, maybe(lora, 'to_v'), alpha)
        k = k.reshape(b, -1, heads, d)
        v = v.reshape(b, -1, heads, d)
    else:
        k = kv[0].astype(x.dtype)
        v = kv[1].astype(x.dtype)

    # (contracting to_out head-by-head against the kernel's raw (B,H,S,D)
    # output was tried and measured IDENTICAL — XLA re-fuses the unrolled
    # dots into the same transposing matmul pattern)
    out4, probs = sdpa(q, k, v, return_probs=return_probs)
    pre_out = out4.reshape(b, s, c)
    out = dense(p['to_out'], pre_out, maybe(lora, 'to_out'), alpha)
    if return_pre_out:
        return out, probs, pre_out
    return out, probs


def _geglu_ff(p, x, lora=None, alpha=1.0, return_inner: bool = False):
    h = dense(p['proj'], x, maybe(lora, 'proj'), alpha)
    h, gate = jnp.split(h, 2, axis=-1)
    # exact (erf) gelu — diffusers GEGLU uses F.gelu's default, not the tanh
    # approximation jax.nn.gelu defaults to
    inner = h * jax.nn.gelu(gate, approximate=False)
    out = dense(p['out'], inner, maybe(lora, 'out'), alpha)
    if return_inner:
        return out, inner
    return out


# Gram capture points for the fusion spatial phase — the full candidate list
# of the reference (gradient_fusion.py:637-641: attn2.to_q/to_out, attn1.*,
# ff.net.*, proj_in/proj_out). `capture_grams=True` captures the attention
# subset (the layers ED-LoRA training actually adapts); a tuple captures
# exactly the named points (ff/proj grams are large — inner dim is 4c — so
# they are only computed when a delta carries those layers).
DEFAULT_GRAM_POINTS = ('attn1_qkv', 'attn1_out', 'attn2_q', 'attn2_out')
ALL_GRAM_POINTS = DEFAULT_GRAM_POINTS + ('ff_in', 'ff_out',
                                         'proj_in', 'proj_out')


def _transformer(p, x, context, layer_idx: int, place: str, cfg: UNetConfig,
                 lora=None, alpha=1.0,
                 cross_attn_override: Optional[Callable] = None,
                 return_cross_probs: bool = False,
                 capture_grams: bool = False,
                 prob_columns=None,
                 fuse_attention: bool = False,
                 cross_kv=None):
    """Transformer2DModel with one BasicTransformerBlock (SD1.x shape).

    `context` is (B, 77, C) or layerwise (B, L, 77, C) — sliced at
    `layer_idx` here, mirroring EDLoRA_AttnProcessor (edlora.py:130-131).

    `capture_grams` additionally emits fp32 input Gram matrices for the
    spatial linears fusion optimizes (reference gradient_fusion.py:637-641
    hook targets — attn1.*, attn2 q/out, ff.net.*, proj_in/proj_out); attn2
    k/v inputs are text features handled by the cross-KV phase instead.
    True captures DEFAULT_GRAM_POINTS; a tuple captures the named points."""
    from mixofshow_tpu.ops.solve import gram

    points = (DEFAULT_GRAM_POINTS if capture_grams is True
              else capture_grams or ())

    b, h, w, c = x.shape
    residual = x
    gn_out = group_norm(p['norm'], x, cfg.norm_groups, eps=1e-6)
    hid = conv2d(p['proj_in'], gn_out,
                 lora=maybe(lora, 'proj_in'),
                 alpha=alpha).reshape(b, h * w, c)

    grams = {}
    if 'proj_in' in points:
        grams['proj_in'] = gram(gn_out.reshape(b, h * w, c))

    # self-attention
    attn_in = layer_norm(p['ln1'], hid)
    need_pre1 = 'attn1_out' in points
    if need_pre1:
        sa, _, sa_pre = mh_attention(p['attn1'], attn_in, attn_in,
                                     cfg.attention_heads,
                                     maybe(lora, 'attn1'), alpha,
                                     return_pre_out=True)
        grams['attn1_out'] = gram(sa_pre)
    else:
        sa, _ = mh_attention(p['attn1'], attn_in, attn_in,
                             cfg.attention_heads,
                             maybe(lora, 'attn1'), alpha,
                             fuse=fuse_attention)
    if 'attn1_qkv' in points:
        grams['attn1_qkv'] = gram(attn_in)
    hid = hid + sa

    # cross-attention (the ED-LoRA layer-indexed slot)
    ctx = context[:, layer_idx] if context.ndim == 4 else context
    attn_in = layer_norm(p['ln2'], hid)
    probs = None
    if cross_attn_override is not None:
        ca = cross_attn_override(p['attn2'], attn_in, ctx, layer_idx, place,
                                 (h, w), maybe(lora, 'attn2'), alpha)
        ca_pre = None
    elif 'attn2_out' in points or return_cross_probs:
        ca, probs, ca_pre = mh_attention(p['attn2'], attn_in, ctx,
                                         cfg.attention_heads,
                                         maybe(lora, 'attn2'),
                                         alpha, return_probs=return_cross_probs,
                                         return_pre_out=True, kv=cross_kv)
        if probs is not None and prob_columns is not None:
            # keep only the requested key columns (the <=2 concept tokens) —
            # full (B, heads, Q, 77) maps never become autodiff residuals
            # (SURVEY.md §7 'attention-map capture vs. flash attention')
            cols = prob_columns[:, None, None, :]
            probs = jnp.take_along_axis(
                probs, jnp.broadcast_to(
                    cols, (*probs.shape[:3], prob_columns.shape[-1])),
                axis=-1)
    else:
        ca, _ = mh_attention(p['attn2'], attn_in, ctx,
                             cfg.attention_heads, maybe(lora, 'attn2'),
                             alpha, fuse=fuse_attention, kv=cross_kv)
        ca_pre = None
    if 'attn2_q' in points:
        grams['attn2_q'] = gram(attn_in)
    if 'attn2_out' in points and ca_pre is not None:
        grams['attn2_out'] = gram(ca_pre)
    hid = hid + ca

    # feed-forward (GEGLU)
    ff_in = layer_norm(p['ln3'], hid)
    ff_out, ff_inner = _geglu_ff(p['ff'], ff_in, maybe(lora, 'ff'), alpha,
                                 return_inner=True)
    if 'ff_in' in points:
        grams['ff_in'] = gram(ff_in)
    if 'ff_out' in points:
        grams['ff_out'] = gram(ff_inner)
    hid = hid + ff_out

    if 'proj_out' in points:
        grams['proj_out'] = gram(hid)
    hid = conv2d(p['proj_out'], hid.reshape(b, h, w, c),
                 lora=maybe(lora, 'proj_out'), alpha=alpha)
    return hid + residual, probs, grams


def unet_apply(params, sample: jnp.ndarray, timesteps: jnp.ndarray,
               encoder_hidden_states: jnp.ndarray,
               cfg: UNetConfig = UNetConfig(),
               lora=None, lora_alpha=1.0,
               adapter_features: Optional[Sequence[jnp.ndarray]] = None,
               cross_attn_override: Optional[Callable] = None,
               return_cross_probs: bool = False,
               capture_grams: bool = False,
               prob_columns=None,
               remat: bool = False,
               fuse_attention: bool = False,
               cross_kv=None):
    """Predict noise/velocity. sample: (B, H, W, 4) NHWC; timesteps: (B,) or
    scalar; encoder_hidden_states: (B, 77, C) or layerwise (B, L, 77, C).

    `cross_kv` ({layer_idx: (k, v)}, see `cross_attention_kv`) supplies
    precomputed cross-attention K/V text projections — the denoise-scan
    hoist (they are loop-invariant across steps).

    Returns (out, aux) where aux['cross_probs'] is a list of
    (place, layer_idx, probs(B, heads, Q, K)) when requested."""
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
    dt = sample.dtype
    temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
    temb = dense(params['time_embedding']['linear_1'], temb.astype(dt))
    temb = dense(params['time_embedding']['linear_2'], jax.nn.silu(temb))

    ehs = encoder_hidden_states.astype(dt)
    probs_out: List = []
    grams_out: dict = {}
    layer_idx = 0

    tfm = _transformer
    if remat:
        tfm = jax.checkpoint(_transformer,
                             static_argnums=(3, 4, 5, 8, 9, 10, 12),
                             policy=jax.checkpoint_policies.nothing_saveable)

    def run_pair(p_attn, x, idx, place, blora):
        return tfm(p_attn, x, ehs, idx, place, cfg, blora, lora_alpha,
                   cross_attn_override, return_cross_probs, capture_grams,
                   prob_columns, fuse_attention,
                   None if cross_kv is None else cross_kv[idx])

    x = conv2d(params['conv_in'], sample)
    residuals = [x]

    # ---- down
    for i, block in enumerate(params['down_blocks']):
        blora = maybe(lora, 'down_blocks', i)
        has_cross = cfg.down_cross[i]
        for j, res_p in enumerate(block['resnets']):
            x = _resnet(res_p, x, temb, cfg.norm_groups)
            if has_cross:
                x, pr, gr = run_pair(block['attentions'][j], x, layer_idx,
                                     'down', maybe(blora, 'attentions', j))
                if pr is not None:
                    probs_out.append(('down', layer_idx, pr))
                if gr:
                    grams_out[layer_idx] = gr
                layer_idx += 1
            residuals.append(x)
        if adapter_features is not None and i < len(adapter_features):
            # diffusers 0.19.x asymmetry: inside cross-attn blocks the adapter
            # feature lands on the last resnet/attn output (and therefore its
            # residual and the downsample input); for plain DownBlock2D it is
            # added after the block, leaving that block's residuals untouched.
            x = x + adapter_features[i].astype(dt)
            if has_cross:
                residuals[-1] = x
        if 'downsample' in block:
            x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
            x = conv2d(block['downsample'], x, stride=2, padding='VALID')
            residuals.append(x)

    # ---- mid
    x = _resnet(params['mid']['resnet1'], x, temb, cfg.norm_groups)
    x, pr, gr = run_pair(params['mid']['attention'], x, layer_idx, 'mid',
                         maybe(lora, 'mid', 'attention'))
    if pr is not None:
        probs_out.append(('mid', layer_idx, pr))
    if gr:
        grams_out[layer_idx] = gr
    layer_idx += 1
    x = _resnet(params['mid']['resnet2'], x, temb, cfg.norm_groups)

    # ---- up
    for i, block in enumerate(params['up_blocks']):
        blora = maybe(lora, 'up_blocks', i)
        has_cross = cfg.up_cross[i]
        for j, res_p in enumerate(block['resnets']):
            skip = residuals.pop()
            x = _resnet(res_p, jnp.concatenate([x, skip], axis=-1), temb,
                        cfg.norm_groups)
            if has_cross:
                x, pr, gr = run_pair(block['attentions'][j], x, layer_idx,
                                     'up', maybe(blora, 'attentions', j))
                if pr is not None:
                    probs_out.append(('up', layer_idx, pr))
                if gr:
                    grams_out[layer_idx] = gr
                layer_idx += 1
        if 'upsample' in block:
            b, h, w, c = x.shape
            # nearest 2x via broadcast-reshape (no gather lowering)
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (b, h, 2, w, 2, c)).reshape(b, 2 * h,
                                                             2 * w, c)
            x = conv2d(block['upsample'], x)

    x = group_norm(params['norm_out'], x, cfg.norm_groups, act='silu')
    out = conv2d(params['conv_out'], x)
    aux = {}
    if return_cross_probs:
        aux['cross_probs'] = probs_out
    if capture_grams:
        aux['grams'] = grams_out
    return out, aux
