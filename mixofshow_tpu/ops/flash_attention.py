"""Pallas TPU flash attention (forward) for UNet/VAE self-attention.

Replaces the reference's optional xformers memory-efficient attention
(edlora.py:151-153, pipeline_regionally_t2iadapter.py:111-113) — the one
kernel-level component in the reference stack (SURVEY.md §2B). The dense XLA
path materializes (B, H, S, S) fp32 logits (1 GB per layer at 512×512
sampling); this kernel keeps everything in VMEM with an online softmax.

Design (for SD1.x scales: S ≤ 16k, D ∈ {40, 80, 160}):
  * grid = (batch*heads, S/BLOCK_Q); each program owns one query block and
    streams that head's full K/V — which fit VMEM at these sizes (16k × 128
    bf16 = 4 MB) — in BLOCK_K chunks with running (max, sum, acc) state;
  * head_dim is zero-padded to the 128-lane boundary outside the kernel
    (zero lanes contribute nothing to q·kᵀ or p·v);
  * fp32 softmax statistics and accumulation, bf16 matmul inputs
    (`preferred_element_type=f32` → MXU accumulates in fp32).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """One (head, q-block): online-softmax over K blocks.

    q_ref: (1, BQ, Dp); k_ref/v_ref: (1, S, Dp); o_ref: (1, BQ, Dp)."""
    bq = q_ref.shape[1]
    dp = q_ref.shape[2]
    s_len = k_ref.shape[1]
    nk = s_len // block_k

    q = q_ref[0].astype(jnp.bfloat16)

    def body(j, carry):
        m_i, l_i, acc = carry  # (BQ,1), (BQ,1), (BQ,Dp) — 2D for TPU layout
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (BQ, BK)
        m_new = jnp.maximum(m_i, s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_i * alpha + p.sum(axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, dp), jnp.float32)
    m_f, l_f, acc_f = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc_f / l_f).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = 256, block_k: int = 512) -> jnp.ndarray:
    """Self/cross attention, (B, S, H, D) layout like layers.sdpa.

    No mask support (SD1.x never masks spatial attention). Scale is
    1/sqrt(D) over the TRUE head dim, applied inside.

    Differentiable: the VJP recomputes dense attention gradients in fp32
    (flash forward everywhere; a streaming backward kernel is a later
    optimization — memory during backward matches the dense path)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    dp = max(128, ((d + 127) // 128) * 128)
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    sq_p = ((sq + block_q - 1) // block_q) * block_q
    sk_p = ((sk + block_k - 1) // block_k) * block_k

    def to_bh(x, s_pad):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)
        x = _pad_to(x, dp, 2)
        return _pad_to(x, s_pad, 1)

    qf = to_bh(q, sq_p)
    kf = to_bh(k, sk_p)
    vf = to_bh(v, sk_p)
    if sk_p != sk:
        # padded keys must not receive probability mass: push their logits to
        # -inf by giving them a huge negative component against any query.
        # Simpler: mask via an extra bias is overkill here — SD sequence
        # lengths (64..16384, 77) are handled by choosing block_k | sk; guard:
        raise ValueError(f'sequence {sk} not divisible by block_k {block_k}')

    grid = (b * h, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sk_p, dp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sk_p, dp), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0)),
        # interpreter mode off-TPU so the kernel stays testable on CPU
        interpret=jax.default_backend() != 'tpu',
    )(qf, kf, vf)

    out = out[:, :sq, :d].reshape(b, h, sq, d)
    return jnp.swapaxes(out, 1, 2)


def _flash_fwd(q, k, v, block_q, block_k):
    return flash_attention(q, k, v, block_q, block_k), (q, k, v)


def _flash_bwd(block_q, block_k, res, g):
    """Dense-recompute attention backward (fp32)."""
    q, k, v = res
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    logits = jnp.einsum('bqhd,bkhd->bhqk', qf, kf) * scale
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum('bhqk,bqhd->bkhd', p, gf)
    dp = jnp.einsum('bqhd,bkhd->bhqk', gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum('bhqk,bkhd->bqhd', ds, kf) * scale
    dk = jnp.einsum('bhqk,bqhd->bkhd', ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_supported(sq: int, sk: int, d: int) -> bool:
    """Shapes this kernel handles without masking fallbacks."""
    if d > 256:
        return False
    block_k = min(512, sk)
    return sk % block_k == 0 and sk >= 128
