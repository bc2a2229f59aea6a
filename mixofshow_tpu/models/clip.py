"""CLIP text encoder (SD1.x text conditioning), functional JAX.

TPU-native equivalent of the transformers `CLIPTextModel` the reference loads
(reference: trainer_edlora.py:40, architecture = openai/clip-vit-large-patch14
text tower: 12 layers, width 768, 12 heads, quick-gelu, causal mask).

ED-LoRA specifics built in natively rather than by model surgery:
  * concept embeddings live in a separate `(num_new_tokens, width)` table
    passed at call time; token ids >= vocab_size index into it. The base
    vocab table is never resized or row-masked (contrast reference
    trainer_edlora.py:167-185 and the row-restore trick train_edlora.py:135).
  * LoRA on the attention q/k/v/out projections (the reference's
    `where='CLIPAttention'` targets — trainer_edlora.py:97-115) threads
    through the `lora` pytree argument.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mixofshow_tpu.models.layers import (as_rng, dense, init_dense,
                                         init_embedding, init_norm,
                                         layer_norm, sdpa)
from mixofshow_tpu.models.lora import maybe


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    max_positions: int = 77
    eps: float = 1e-5

    @staticmethod
    def sd15() -> 'CLIPTextConfig':
        return CLIPTextConfig()


def init_clip_text(rng, cfg: CLIPTextConfig, dtype=jnp.float32):
    rng = as_rng(rng)
    params = {
        'token_embedding': init_embedding(rng, cfg.vocab_size, cfg.width,
                                          dtype=dtype),
        'position_embedding': init_embedding(rng, cfg.max_positions,
                                             cfg.width, dtype=dtype),
        'final_norm': init_norm(cfg.width, dtype),
        'blocks': [],
    }
    for _ in range(cfg.layers):
        params['blocks'].append({
            'ln1': init_norm(cfg.width, dtype),
            'attn': {
                'q': init_dense(rng, cfg.width, cfg.width, dtype=dtype),
                'k': init_dense(rng, cfg.width, cfg.width, dtype=dtype),
                'v': init_dense(rng, cfg.width, cfg.width, dtype=dtype),
                'out': init_dense(rng, cfg.width, cfg.width, dtype=dtype),
            },
            'ln2': init_norm(cfg.width, dtype),
            'mlp': {
                'fc1': init_dense(rng, cfg.width, cfg.mlp_dim, dtype=dtype),
                'fc2': init_dense(rng, cfg.mlp_dim, cfg.width, dtype=dtype),
            },
        })
    return params


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _attn_block(p, x, heads: int, lora=None, lora_alpha=1.0):
    b, s, c = x.shape
    d = c // heads
    q = dense(p['q'], x, maybe(lora, 'q'), lora_alpha).reshape(b, s, heads, d)
    k = dense(p['k'], x, maybe(lora, 'k'), lora_alpha).reshape(b, s, heads, d)
    v = dense(p['v'], x, maybe(lora, 'v'), lora_alpha).reshape(b, s, heads, d)
    out, _ = sdpa(q, k, v, causal=True)
    pre_out = out.reshape(b, s, c)
    return dense(p['out'], pre_out, maybe(lora, 'out'), lora_alpha), pre_out


def embed_tokens(token_embedding: jnp.ndarray, input_ids: jnp.ndarray,
                 concept_embedding: Optional[jnp.ndarray] = None):
    """Vocab lookup with a detached concept table for ids >= vocab_size.

    Two clipped gathers + select — never materializes a concatenated table,
    so the frozen base table costs no extra HBM traffic per step."""
    vocab_size = token_embedding.shape[0]
    # jnp.asarray: params may be host numpy (lazy placement), and numpy
    # arrays cannot be indexed by tracers
    table = jnp.asarray(token_embedding)
    base = table[jnp.clip(input_ids, 0, vocab_size - 1)]
    if concept_embedding is None:
        return base
    n_new = concept_embedding.shape[0]
    new = jnp.asarray(concept_embedding)[
        jnp.clip(input_ids - vocab_size, 0, n_new - 1)]
    is_new = (input_ids >= vocab_size)[..., None]
    return jnp.where(is_new, new.astype(base.dtype), base)


def clip_text_encode(params, input_ids: jnp.ndarray,
                     cfg: CLIPTextConfig = CLIPTextConfig(),
                     concept_embedding: Optional[jnp.ndarray] = None,
                     lora=None, lora_alpha: float | jnp.ndarray = 1.0,
                     dtype=None,
                     capture_grams: bool = False,
                     token_mask: Optional[jnp.ndarray] = None):
    """Returns last_hidden_state (B, S, width) after the final layer norm —
    the `text_encoder(ids)[0]` the reference consumes (trainer_edlora.py:232).

    With `capture_grams=True` additionally returns, per block, fp32 input
    Gram matrices of each linear ({'qkv','out','fc1','fc2'}: (C,C) / (M,M)),
    rows masked by `token_mask` (B, S). This is the functional replacement
    for the reference's forward hooks feeding gradient fusion
    (gradient_fusion.py:150-167,492-544) — fusion's least-squares only needs
    XᵀX, never the activations themselves (see ops/solve.py).
    """
    from mixofshow_tpu.ops.solve import gram

    x = embed_tokens(params['token_embedding'], input_ids, concept_embedding)
    if dtype is not None:
        x = x.astype(dtype)
    x = x + params['position_embedding'][:x.shape[1]].astype(x.dtype)
    grams = []
    for i, blk in enumerate(params['blocks']):
        blora = maybe(lora, 'blocks', i)
        attn_in = layer_norm(blk['ln1'], x, cfg.eps)
        attn_out, pre_out = _attn_block(blk['attn'], attn_in, cfg.heads,
                                        maybe(blora, 'attn'), lora_alpha)
        x = x + attn_out
        h = layer_norm(blk['ln2'], x, cfg.eps)
        mid = quick_gelu(dense(blk['mlp']['fc1'], h))
        x = x + dense(blk['mlp']['fc2'], mid)
        if capture_grams:
            grams.append({'qkv': gram(attn_in, token_mask),
                          'out': gram(pre_out, token_mask),
                          'fc1': gram(h, token_mask),
                          'fc2': gram(mid, token_mask)})
    out = layer_norm(params['final_norm'], x, cfg.eps)
    if capture_grams:
        return out, grams
    return out
