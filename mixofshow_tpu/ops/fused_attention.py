"""Fused attention BLOCK kernel: QKV projection + attention + out-projection.

Round-2 profiling (docs/Performance.md) found 8-10 ms/step of
attention-adjacent projections running at 20-60 TF/s: XLA fuses the
(B, S, H, D) <-> (B, H, S, D) transposes around the flash kernel into the
to_q/to_k/to_v/to_out matmuls, pushing them onto transposed `{1,2,0}`
residual-stream layouts. Pinning layouts op-by-op is not expressible in JAX;
this kernel absorbs the projections so the ONLY tensors XLA sees are the
natural (B, S, C) attention input and the natural (B, S, C) output — no
head-split tensor and no q/k/v ever exist in HBM at all.

Design (v2 — the v1 per-head grid measured slower than unfused at every
SD1.5 shape: per-head (·, C)x(C, 40) projections ran at ~31% MXU
utilization and the (b, q-block, head) grid paid per-program overhead):

  * PADDED-WEIGHT head alignment: each head's projection columns are
    zero-padded from D to Dp = ceil(D/128)*128 host-side, giving ONE
    full-width (C, H*Dp) weight per projection. Projections become single
    large MXU dots, and every per-head slice inside the kernel lands on a
    128-aligned lane boundary — no relayout, no per-head matmul. Zero pad
    lanes contribute exactly 0 to every contraction (q_pad = x @ 0 = 0;
    k_pad/v_pad likewise), so the math is unchanged.
  * grid (batch, q-block); at qb==0 the kernel projects K/V for ALL heads
    in one (Sk_p, Cc) x (Cc, H*Dp) dot each into persistent VMEM scratch
    (TPU grid iteration is sequential, so the stash survives until the
    batch row changes);
  * per program: q_all = x_rows @ wq_pad (one dot, scale folded in), then a
    static loop over heads — single-pass fp32 softmax per head against the
    stashed K/V (the whole fp32 logit row block fits VMEM at SD1.x sizes,
    same strategy as ops/flash_attention.py) writing (BQ, Dp) slices into a
    pv scratch;
  * out-projection epilogue: one (BQ, H*Dp) x (H*Dp, C) dot + bias — the
    cross-head contraction never leaves VMEM.
  * optional q/k/v biases (the VAE's 1x1-conv attention projections carry
    biases; the UNet's to_q/to_k/to_v do not).

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


def _kernel(x_ref, ctx_ref, wq_ref, wk_ref, wv_ref, wo_ref, bq_ref, bk_ref,
            bv_ref, bo_ref, o_ref, kst_ref, vst_ref, pv_ref, *, scale: float,
            kv_len: int, heads: int, dp: int, mm_dtype):
    """x (1, BQ, C); ctx (1, Sk_p, Cc); wq (C, H*Dp); wk/wv (Cc, H*Dp);
    wo (H*Dp, C); bq/bk/bv (1, H*Dp); bo (1, C); o (1, BQ, C);
    kst/vst (Sk_p, H*Dp) mm_dtype scratch; pv (BQ, H*Dp) mm_dtype scratch."""
    j = pl.program_id(1)
    sk_p = ctx_ref.shape[1]
    nq = x_ref.shape[1]

    # project K/V for ALL heads once per batch row (ctx block is indexed by
    # b only, so this amortizes over every q-block program of the row)
    @pl.when(j == 0)
    def _():
        c = ctx_ref[0].astype(mm_dtype)
        kst_ref[:] = (jax.lax.dot_general(
            c, wk_ref[:].astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + bk_ref[0].astype(jnp.float32)).astype(mm_dtype)
        vst_ref[:] = (jax.lax.dot_general(
            c, wv_ref[:].astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + bv_ref[0].astype(jnp.float32)).astype(mm_dtype)

    x = x_ref[0].astype(mm_dtype)
    q_all = jax.lax.dot_general(
        x, wq_ref[:].astype(mm_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (BQ, H*Dp)
    q_all = ((q_all + bq_ref[0].astype(jnp.float32)) * scale) \
        .astype(mm_dtype)

    masked = kv_len < sk_p
    for h in range(heads):
        sl = slice(h * dp, (h + 1) * dp)                    # 128-aligned
        s = jax.lax.dot_general(
            q_all[:, sl], kst_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (BQ, Sk_p)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (nq, sk_p), 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = p.sum(axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(mm_dtype), vst_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        pv_ref[:, sl] = (pv / l).astype(mm_dtype)            # (BQ, Dp)

    out = jax.lax.dot_general(
        pv_ref[:], wo_ref[:].astype(mm_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (BQ, C)
    o_ref[0] = (out + bo_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _dp(d: int) -> int:
    """Per-head slice width: lane blocks must be 128-aligned."""
    return max(128, ((d + 127) // 128) * 128)


def _pad_heads(w, heads: int, d: int, dp: int):
    """(Cin, H*D) projection kernel -> (Cin, H*Dp) with zero pad columns
    per head (so in-kernel head slices are 128-aligned and pad lanes
    contribute 0 to every contraction)."""
    cin = w.shape[0]
    return _pad_to(w.reshape(cin, heads, d), dp, 2).reshape(cin, heads * dp)


def _block_q(sq: int, sk_p: int) -> int:
    # fp32 logits block (BQ, Sk_p) under ~4MB; BQ >= 64 keeps MXU rows full
    for bq in (256, 128, 64):
        if bq * sk_p * 4 <= 4 * 1024 * 1024 or bq == 64:
            return min(bq, max(64, sq))
    return 64


def attention_block(x, ctx, wq, wk, wv, wo, bias, heads: int,
                    precise: bool = False, bias_q=None, bias_k=None,
                    bias_v=None):
    """x (B, Sq, C); ctx (B, Sk, Cc); wq (C, C); wk/wv (Cc, C); wo (C, C);
    bias (C,). Returns to_out(softmax(x wq (ctx wk)^T / sqrt(D)) (ctx wv)).

    All four projections and the softmax run in ONE Pallas program per
    (batch, q-block); see module docstring. `precise` keeps matmul inputs
    in the input dtype (fp32 parity tests). `bias_q/k/v` are optional (C,)
    projection biases (the VAE's attention uses them; the UNet does not)."""
    b, sq, c = x.shape
    cc = ctx.shape[-1]
    sk = ctx.shape[1]
    d = c // heads
    dp = _dp(d)
    hdp = heads * dp
    scale = 1.0 / math.sqrt(d)
    mm_dtype = x.dtype if precise else jnp.bfloat16

    sk_p = max(128, ((sk + 127) // 128) * 128)
    bq = _block_q(sq, sk_p)
    sq_p = ((sq + bq - 1) // bq) * bq

    xp = _pad_to(x, sq_p, 1)
    ctxp = _pad_to(ctx, sk_p, 1)

    wq_p = _pad_heads(wq, heads, d, dp)
    wk_p = _pad_heads(wk, heads, d, dp)
    wv_p = _pad_heads(wv, heads, d, dp)
    # wo (H*D, C) -> zero ROW pad per head -> (H*Dp, C)
    wo_p = _pad_to(wo.reshape(heads, d, c), dp, 1).reshape(hdp, c)

    def vec(bias_vec):
        if bias_vec is None:
            return jnp.zeros((1, hdp), x.dtype)
        return _pad_to(bias_vec.reshape(heads, d), dp, 1).reshape(1, hdp)

    grid = (b, sq_p // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, kv_len=sk, heads=heads,
                          dp=dp, mm_dtype=mm_dtype),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sk_p, cc), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((c, hdp), lambda i, j: (0, 0)),
            pl.BlockSpec((cc, hdp), lambda i, j: (0, 0)),
            pl.BlockSpec((cc, hdp), lambda i, j: (0, 0)),
            pl.BlockSpec((hdp, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, hdp), lambda i, j: (0, 0)),
            pl.BlockSpec((1, hdp), lambda i, j: (0, 0)),
            pl.BlockSpec((1, hdp), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((sk_p, hdp), mm_dtype),
            pltpu.VMEM((sk_p, hdp), mm_dtype),
            pltpu.VMEM((bq, hdp), mm_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, ctxp, wq_p, wk_p, wv_p, wo_p, vec(bias_q), vec(bias_k),
      vec(bias_v), bias.reshape(1, c))
    return out[:, :sq]


def attention_block_supported(sq: int, sk: int, c: int, cc: int,
                              heads: int) -> bool:
    """VMEM budget check with PHYSICAL footprints (head width padded to a
    128 lane multiple — that padding is also what the stash/weights
    physically occupy). Dominant residents: bf16 K/V stash
    (2 x Sk_p x H*Dp), double-buffered ctx block, the four padded weights,
    fp32 logits temporaries, and the pv scratch. Budget 72MB — the repo's
    flash kernel empirically sustains ~67MB resident under a 100MB scoped
    limit on v5e (regional S=32k), leaving headroom for Mosaic
    temporaries."""
    d = c // heads
    if d * heads != c or d > 512:
        return False
    dp = _dp(d)
    hdp = heads * dp
    sk_p = max(128, ((sk + 127) // 128) * 128)
    bq = _block_q(sq, sk_p)

    def lanes(n):
        return max(128, ((n + 127) // 128) * 128)

    stash = 2 * sk_p * hdp * 2
    ctx_blk = 2 * sk_p * lanes(cc) * 2             # double-buffered bf16
    weights = (3 * cc * hdp + hdp * lanes(c)) * 2  # bf16-ish, fetched once
    logits = 2 * bq * sk_p * 4                     # s + exp(s) fp32 temps
    pv = bq * hdp * 2 + bq * hdp * 4               # scratch + q_all fp32
    io_blocks = 2 * 2 * bq * lanes(c) * 2          # x + o, double-buffered
    total = stash + ctx_blk + weights + logits + pv + io_blocks
    return total <= 72 * 1024 * 1024


# ------------------------------------------------- packed-flash variant (v3)
def _packed_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       kv_len: int, mm_dtype):
    """One (batch, head, q-block), single K/V block, no LSE (inference-only).

    q (1, BQ, Dp); k/v (1, Sk_p, Dp); o (1, BQ, Dp). Zero pad lanes beyond
    the true head dim contribute 0 to both contractions; key columns past
    kv_len are masked."""
    bq = q_ref.shape[1]
    sk_p = k_ref.shape[1]
    q = (q_ref[0].astype(jnp.float32) * scale).astype(mm_dtype)
    k = k_ref[0].astype(mm_dtype)
    v = v_ref[0].astype(mm_dtype)
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
    o_ref[0] = (pv / l).astype(o_ref.dtype)


def _packed_flash(q, k, v, heads: int, d: int, kv_len: int,
                  mm_dtype=jnp.bfloat16):
    """Flash attention over PACKED head-padded tensors (B, S, H*Dp) in their
    natural (row-major) layout — every per-head block is a 128-aligned lane
    column, so NO transpose or head-split tensor ever exists in HBM. The
    wrapper around XLA full-width projections (attention_packed) is what
    avoids the `{1,2,0}` projection layout tax of the bshd flash path."""
    b, sq, hdp = q.shape
    dp = hdp // heads
    sk_p = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    bq = _block_q(sq, sk_p)
    sq_p = ((sq + bq - 1) // bq) * bq
    qp = _pad_to(q, sq_p, 1)

    grid = (b, heads, sq_p // bq)
    out = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale, kv_len=kv_len,
                          mm_dtype=mm_dtype),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, hdp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, h, j: (i, j, h)),
            pl.BlockSpec((1, sk_p, dp), lambda i, h, j: (i, 0, h)),
            pl.BlockSpec((1, sk_p, dp), lambda i, h, j: (i, 0, h)),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, h, j: (i, j, h)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, k, v)
    return out[:, :sq]


def attention_packed(x, ctx, wq, wk, wv, wo, bias, heads: int,
                     precise: bool = False):
    """Whole attention processor, packed-flash strategy: projections stay
    FULL-WIDTH XLA matmuls against zero-padded weights (C, H*Dp) — peak MXU
    rate, natural (B, S, ·) layouts on both sides, no transposes for XLA to
    fuse into them — and the Pallas kernel consumes the packed tensors by
    slicing 128-aligned head columns via BlockSpec index maps. The padded
    lanes cost (Dp/D)x projection flops and HBM bytes; at SD1.5 shapes that
    is cheaper than the measured transposed-layout projection tax of the
    (B,H,S,D) flash path (docs/Performance.md)."""
    b, sq, c = x.shape
    sk = ctx.shape[1]
    d = c // heads
    dp = _dp(d)
    mm_dtype = x.dtype if precise else jnp.bfloat16

    sk_p = max(128, ((sk + 127) // 128) * 128)
    ctxp = _pad_to(ctx, sk_p, 1)

    q = jnp.dot(x, _pad_heads(wq, heads, d, dp),
                preferred_element_type=x.dtype)
    k = jnp.dot(ctxp, _pad_heads(wk, heads, d, dp),
                preferred_element_type=x.dtype)
    v = jnp.dot(ctxp, _pad_heads(wv, heads, d, dp),
                preferred_element_type=x.dtype)
    pre = _packed_flash(q, k, v, heads, d, sk, mm_dtype)
    wo_p = _pad_to(wo.reshape(heads, d, c), dp, 1).reshape(heads * dp, c)
    return jnp.dot(pre, wo_p, preferred_element_type=x.dtype) + \
        bias.astype(x.dtype)


def attention_packed_supported(sq: int, sk: int, c: int, cc: int,
                               heads: int) -> bool:
    """Single-K/V-block budget: the fp32 logits row block (BQ, Sk_p) must
    fit the 4MB VMEM logits budget, plus that head's K/V resident."""
    d = c // heads
    if d * heads != c or d > 512:
        return False
    # short contexts: the one-block kernel launch loses to the dense XLA
    # softmax (cross-attention's 77 keys measured 0.97 vs 0.20 ms at res-64,
    # tools/bench_attn_block.py v5e) — same routing rule as
    # flash_attention_supported
    if sk < 1024:
        return False
    sk_p = max(128, ((sk + 127) // 128) * 128)
    bq = _block_q(sq, sk_p)
    if bq * sk_p * 4 > 4 * 1024 * 1024:
        return False
    dp = _dp(d)
    kv = 2 * 2 * sk_p * dp * 2          # K+V blocks, double-buffered bf16
    logits = 2 * bq * sk_p * 4
    return kv + logits <= 48 * 1024 * 1024
