"""Fused attention BLOCK kernel: QKV projection + attention + out-projection.

Round-2 profiling (docs/Performance.md) found 8-10 ms/step of
attention-adjacent projections running at 20-60 TF/s: XLA fuses the
(B, S, H, D) <-> (B, H, S, D) transposes around the flash kernel into the
to_q/to_k/to_v/to_out matmuls, pushing them onto transposed `{1,2,0}`
residual-stream layouts. Pinning layouts op-by-op is not expressible in JAX;
instead this kernel absorbs the projections, so the ONLY tensors XLA sees
are the natural (B, S, C) attention input and the natural (B, S, C) output —
no head-split tensor ever exists in HBM.

Per (batch, q-block, head-innermost) program:
  * at (qb==0, h==0): project K/V for ALL heads from the context block into
    a persistent (H, Sk, D) VMEM scratch (grid iteration on TPU is
    sequential, so the stash survives until `b` changes);
  * q = x_rows @ wq[h], scale folded in (one (BQ, C)x(C, D) MXU op);
  * single-pass fp32 softmax against the stashed K/V (same single K/V
    block strategy as ops/flash_attention.py — at SD1.x sizes the whole
    logit row block fits VMEM);
  * out-projection epilogue: acc += pv @ wo[h], initialized with the
    to_out bias at h==0 and written back once at h==H-1 — to_out's
    cross-head contraction becomes an in-VMEM accumulation instead of a
    transposing XLA matmul.

Inference-only (no VJP): the training path keeps ops/flash_attention.py,
whose backward kernels need the materialized q/k/v anyway. LoRA is handled
by the caller folding alpha*(down@up) into the effective weights (a rank-4
(C, C) outer product — negligible next to one UNet eval).

Replaces the xformers fast path of the reference's attention processors
(edlora.py:151-153) at the whole-processor granularity, not just the
softmax.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _kernel(x_ref, ctx_ref, wq_ref, wk_ref, wv_ref, wo_ref, bias_ref,
            o_ref, kst_ref, vst_ref, acc_ref, *, scale: float, kv_len: int,
            heads: int, mm_dtype):
    """x_ref (1, BQ, C); ctx_ref (1, Sk_p, Cc); wq (H, C, D); wk/wv
    (H, Cc, D); wo (H, D, C); bias (1, C); o_ref (1, BQ, C);
    kst/vst (H, Sk_p, D) mm_dtype scratch; acc (BQ, C) f32 scratch."""
    h = pl.program_id(2)
    qb = pl.program_id(1)
    sk_p = ctx_ref.shape[1]
    bq = x_ref.shape[1]

    # stash K/V for every head once per batch row (ctx block is indexed by
    # b only, so this amortizes over all (qb, h) programs of the row)
    @pl.when((qb == 0) & (h == 0))
    def _():
        c = ctx_ref[0].astype(mm_dtype)
        for hh in range(heads):
            kst_ref[hh] = jax.lax.dot_general(
                c, wk_ref[hh].astype(mm_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(mm_dtype)
            vst_ref[hh] = jax.lax.dot_general(
                c, wv_ref[hh].astype(mm_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(mm_dtype)

    x = x_ref[0].astype(mm_dtype)
    q = jax.lax.dot_general(
        x, wq_ref[h].astype(mm_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (BQ, D)
    q = (q * scale).astype(mm_dtype)

    k = kst_ref[h]
    v = vst_ref[h]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, Sk_p)
    if kv_len < sk_p:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, sk_p), 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(mm_dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    pv = pv / l                                              # (BQ, D)

    part = jax.lax.dot_general(
        pv.astype(mm_dtype), wo_ref[h].astype(mm_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (BQ, C)

    @pl.when(h == 0)
    def _():
        acc_ref[:] = part + bias_ref[0].astype(jnp.float32)

    @pl.when(h > 0)
    def _():
        acc_ref[:] += part

    @pl.when(h == heads - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _block_q(sq: int, sk_p: int) -> int:
    # logits block (BQ, Sk_p) fp32 under ~4MB; BQ >= 64 keeps MXU passes full
    for bq in (256, 128, 64):
        if bq * sk_p * 4 <= 4 * 1024 * 1024 or bq == 64:
            return min(bq, max(64, sq))
    return 64


def attention_block(x, ctx, wq, wk, wv, wo, bias, heads: int,
                    precise: bool = False):
    """x (B, Sq, C); ctx (B, Sk, Cc); wq (C, C); wk/wv (Cc, C); wo (C, C);
    bias (C,). Returns to_out(softmax(x wq (ctx wk)^T / sqrt(D)) (ctx wv)).

    All four projections and the softmax run in ONE Pallas program per
    (batch, q-block); see module docstring. `precise` keeps matmul inputs
    in the input dtype (fp32 parity tests)."""
    b, sq, c = x.shape
    cc = ctx.shape[-1]
    sk = ctx.shape[1]
    d = c // heads
    scale = 1.0 / math.sqrt(d)
    mm_dtype = x.dtype if precise else jnp.bfloat16

    sk_p = max(128, ((sk + 127) // 128) * 128)
    bq = _block_q(sq, sk_p)
    sq_p = ((sq + bq - 1) // bq) * bq

    xp = _pad_to(x, sq_p, 1)
    ctxp = _pad_to(ctx, sk_p, 1)

    # (in, H*D) kernels -> (H, in, D); wo (H*D, C) -> (H, D, C)
    wq_h = jnp.transpose(wq.reshape(c, heads, d), (1, 0, 2))
    wk_h = jnp.transpose(wk.reshape(cc, heads, d), (1, 0, 2))
    wv_h = jnp.transpose(wv.reshape(cc, heads, d), (1, 0, 2))
    wo_h = wo.reshape(heads, d, c)

    grid = (b, sq_p // bq, heads)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, kv_len=sk, heads=heads,
                          mm_dtype=mm_dtype),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j, h: (i, j, 0)),
            pl.BlockSpec((1, sk_p, cc), lambda i, j, h: (i, 0, 0)),
            pl.BlockSpec((heads, c, d), lambda i, j, h: (0, 0, 0)),
            pl.BlockSpec((heads, cc, d), lambda i, j, h: (0, 0, 0)),
            pl.BlockSpec((heads, cc, d), lambda i, j, h: (0, 0, 0)),
            pl.BlockSpec((heads, d, c), lambda i, j, h: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j, h: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((heads, sk_p, d), mm_dtype),
            pltpu.VMEM((heads, sk_p, d), mm_dtype),
            pltpu.VMEM((bq, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, ctxp, wq_h, wk_h, wv_h, wo_h, bias.reshape(1, c))
    return out[:, :sq]


def _lanes(n: int) -> int:
    """Physical minor-dim footprint: VMEM tiles are 128 lanes wide, so a
    (…, d) buffer with d=40 occupies 128 lanes of storage (the flash
    kernels avoid *HBM* padding bytes, but VMEM residency always pays the
    tile)."""
    return max(128, ((n + 127) // 128) * 128)


def attention_block_supported(sq: int, sk: int, c: int, cc: int,
                              heads: int) -> bool:
    """VMEM budget check with PHYSICAL (lane-padded) footprints.

    The dominant residents: bf16 K/V stash (2 x H x Sk_p x lanes(D)),
    the double-buffered ctx block, fp32 logits/exp temporaries, weights,
    and the fp32 out accumulator. Budget is 72MB — the repo's flash kernel
    empirically sustains ~67MB resident under a 100MB scoped limit on v5e
    (regional S=32k), so this leaves headroom for Mosaic temporaries."""
    d = c // heads
    if d * heads != c or d > 256:
        return False
    sk_p = max(128, ((sk + 127) // 128) * 128)
    bq = _block_q(sq, sk_p)
    stash = 2 * heads * sk_p * _lanes(d) * 2
    ctx_blk = 2 * sk_p * _lanes(cc) * 2            # double-buffered bf16
    logits = 2 * bq * sk_p * 4                     # s + exp(s) fp32 temps
    weights = (heads * c * _lanes(d) * 3 + heads * d * _lanes(c)) * 2
    acc = 2 * bq * _lanes(c) * 4                   # acc scratch + out temp
    io_blocks = 2 * 2 * bq * _lanes(c) * 2         # x + o, double-buffered
    total = stash + ctx_blk + logits + weights + acc + io_blocks
    return total <= 72 * 1024 * 1024
