"""Pallas TPU flash attention (forward + backward) for UNet/VAE attention.

Replaces the reference's optional xformers memory-efficient attention
(edlora.py:151-153, pipeline_regionally_t2iadapter.py:111-113) — the one
kernel-level component in the reference stack (SURVEY.md §2B). The dense XLA
path materializes (B, H, S, S) fp32 logits (1 GB per layer at 512×512);
these kernels keep everything in VMEM with an online softmax, forward and
backward.

Design (for SD1.x scales: S ≤ 16k, D ∈ {40, 80, 160}):
  * internal layout is (B, H, S, D) reached by a pure `swapaxes` from the
    caller's (B, S, H, D) — NO b·h-flattening reshape: transpose+reshape
    forced XLA to materialize copy ops (~2 ms per SD1.5 UNet eval at b8)
    while a bare dimension permutation stays a layout assignment;
  * forward: grid (batch, head, q-block); each program owns one query block
    and streams that head's full K/V — which fit VMEM at these sizes
    (16k × 128 bf16 = 4 MB) — in BLOCK_K chunks with running (max, sum,
    acc) state; when the whole fp32 logit row block fits a 4MB budget the
    key dim is ONE block (the online softmax degenerates to a single pass;
    at d=40 the per-512-block MXU pipeline drain otherwise dominates);
    also emits the log-sum-exp rows for the backward;
  * backward: FlashAttention-2 style two kernels — dK/dV over key blocks
    (streaming query chunks) and dQ over query blocks (streaming key
    chunks) — recomputing probabilities from the saved LSE, never
    materializing S×S;
  * NO head-dim padding: a block whose minor dim equals the array's minor
    dim satisfies the TPU tiling rule, and at SD1.5's d=40 pre-padding to
    128 lanes made every K/V stream read 3.2x more HBM bytes (zeros);
  * softmax scale folded into q (O(S·D) instead of an O(S²) VPU op);
  * fp32 softmax statistics and accumulation, bf16 matmul inputs.
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


# ------------------------------------------------------------------ forward
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
                scale: float, kv_len: int):
    """One (batch, head, q-block): online-softmax over K blocks.

    q_ref: (1, 1, BQ, D); k_ref/v_ref: (1, 1, S, D); o_ref: (1, 1, BQ, D);
    lse_ref: (1, 1, BQ, 8) — log-sum-exp replicated across a narrow lane
    tile (the block minor dim equals the array dim, so 8 lanes suffice —
    128 replicated lanes cost 134 MB of writes per res-64 layer). `kv_len`
    is the TRUE key count: columns past it (zero-padding to the block
    boundary, e.g. the 77-token cross-attention context padded to 128) are
    masked to -inf."""
    bq = q_ref.shape[2]
    dp = q_ref.shape[3]
    s_len = k_ref.shape[2]
    nk = s_len // block_k
    masked = kv_len < s_len

    # scale folded into q (O(BQ*D) fp32 mul) instead of the logits
    # (O(BQ*S) — one full-matrix VPU op saved per key block; the softmax
    # elementwise chain, not the MXU, bounds this kernel at small d)
    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(jnp.bfloat16)

    def body(j, carry):
        m_i, l_i, acc = carry  # (BQ,1), (BQ,1), (BQ,Dp) — 2D for TPU layout
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :] \
            .astype(jnp.bfloat16)
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :] \
            .astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (BQ, BK)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) \
                + j * block_k
            s = jnp.where(col < kv_len, s, NEG_INF)
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
    o_ref[0, 0] = (acc_f / l_f).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(m_f + jnp.log(l_f),
                                     (bq, lse_ref.shape[3]))


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kv_blocking(sk: int, block_k: int, block_q: int = 256,
                 single_block: bool = True):
    """Pad the key length to a 128 multiple and pick the largest block size
    that divides it (so short contexts — cross-attention's 77 tokens — run
    as one masked block instead of falling back to dense XLA).

    When the whole fp32 logit row block (BQ, Sk) fits a 4MB VMEM budget the
    key dim becomes ONE block: the online-softmax rescale chain degenerates
    to a single pass and the QK^T/PV dots run at full length (at SD1.5's
    d=40 the MXU pipeline drain per 512-wide dot dominates — measured
    ~4.6 ms per res-64 self-attention layer at b8 with 512-blocks).
    FORWARD ONLY: the backward kernels hold full-sequence q/do/lse/dvec
    plus accumulators resident, and a 4096-wide block pushed them to
    21.8M scoped VMEM (>16M limit) — they keep chunked keys."""
    sk_p = max(128, ((sk + 127) // 128) * 128)
    if single_block and sk_p * block_q * 4 <= 4 * 1024 * 1024:
        return sk_p, sk_p
    for cand in (block_k, 512, 256, 128):
        if cand <= sk_p and sk_p % cand == 0:
            return sk_p, cand
    return sk_p, 128


def _prep(q, k, v, block_q, block_k, single_block: bool = True):
    """(B, S, H, D) → (B, H, S, D) by pure transpose; pad sequence axes."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, max(sq, 8))
    sk_p, block_k = _kv_blocking(sk, block_k, block_q, single_block)
    sq_p = ((sq + block_q - 1) // block_q) * block_q

    def to_bhsd(x, s_pad):
        return _pad_to(jnp.swapaxes(x, 1, 2), s_pad, 2)

    return (to_bhsd(q, sq_p), to_bhsd(k, sk_p), to_bhsd(v, sk_p),
            b, sq, h, d, sq_p, sk, sk_p, block_q, block_k)


def _fwd_call(q, k, v, block_q, block_k):
    (qf, kf, vf, b, sq, h, d, sq_p, sk, sk_p, bq, bk) = _prep(
        q, k, v, block_q, block_k)
    scale = 1.0 / math.sqrt(d)
    grid = (b, h, sq_p // bq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=bk, scale=scale, kv_len=sk),
        out_shape=(jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, sq_p, 8), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda i, hh, j: (i, hh, j, 0)),
            pl.BlockSpec((1, 1, sk_p, d), lambda i, hh, j: (i, hh, 0, 0)),
            pl.BlockSpec((1, 1, sk_p, d), lambda i, hh, j: (i, hh, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), lambda i, hh, j: (i, hh, j, 0)),
            pl.BlockSpec((1, 1, bq, 8), lambda i, hh, j: (i, hh, j, 0)),
        ),
        # long-context shapes (regional 1024x2048 demo: S=32k) keep that
        # head's K/V resident + double-buffered; the default 16MB scoped
        # budget rejects them even though v5e VMEM comfortably fits
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qf, kf, vf)
    return out, lse, (b, sq, h, d, sq_p, sk, sk_p, bq, bk)


# ----------------------------------------------------------------- backward
def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, dvec_ref, k_ref, v_ref,
                    dk_ref, dv_ref, *, block_q: int, scale: float,
                    kv_len: int):
    """One (batch, head, k-block): accumulate dK/dV over query chunks.

    q/do: (1, 1, Sq, D) full; lse/dvec: (1, 1, Sq, 8) lane-replicated;
    k/v: (1, 1, BK, D). Key columns past `kv_len` (block padding) carry p=0
    so their dK/dV stay zero."""
    sq = q_ref.shape[2]
    bk = k_ref.shape[2]
    dp = q_ref.shape[3]
    nq = sq // block_q
    col0 = pl.program_id(2) * bk

    k_blk = k_ref[0, 0].astype(jnp.bfloat16)
    v_blk = v_ref[0, 0].astype(jnp.bfloat16)

    def body(i, carry):
        dk, dv = carry
        # q pre-scaled (see _fwd_kernel): s is already scaled, and
        # dot(ds, q_scaled) == scale * dot(ds, q) == dK — no trailing
        # full-matrix rescale needed
        q_i = (q_ref[0, 0, pl.ds(i * block_q, block_q), :]
               .astype(jnp.float32) * scale).astype(jnp.bfloat16)
        do_i = do_ref[0, 0, pl.ds(i * block_q, block_q), :] \
            .astype(jnp.bfloat16)
        lse_i = lse_ref[0, 0, pl.ds(i * block_q, block_q), 0:1]   # (BQ, 1)
        d_i = dvec_ref[0, 0, pl.ds(i * block_q, block_q), 0:1]
        s = jax.lax.dot_general(
            q_i, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (BQ, BK)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1) + col0
        s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse_i)
        dv = dv + jax.lax.dot_general(
            p.astype(jnp.bfloat16), do_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (BK, Dp)
        dp_ = jax.lax.dot_general(
            do_i, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (BQ, BK)
        ds = p * (dp_ - d_i)
        dk = dk + jax.lax.dot_general(
            ds.astype(jnp.bfloat16), q_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (BK, Dp)
        return dk, dv

    dk0 = jnp.zeros((bk, dp), jnp.float32)
    dv0 = jnp.zeros((bk, dp), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, do_ref, lse_ref, dvec_ref, k_ref, v_ref, dq_ref,
                   *, block_k: int, scale: float, kv_len: int):
    """One (batch, head, q-block): accumulate dQ over key chunks."""
    bq = q_ref.shape[2]
    dp = q_ref.shape[3]
    sk = k_ref.shape[2]
    nk = sk // block_k

    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    do = do_ref[0, 0].astype(jnp.bfloat16)
    lse = lse_ref[0, 0, :, 0:1]    # (BQ, 1)
    dvec = dvec_ref[0, 0, :, 0:1]

    def body(j, dq):
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :] \
            .astype(jnp.bfloat16)
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :] \
            .astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) \
            + j * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp_ = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp_ - dvec)
        return dq + jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros((bq, dp), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


# ---------------------------------------------------------------- public op
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = 256, block_k: int = 512,
                    out_layout: str = 'bshd') -> jnp.ndarray:
    """Self/cross attention, (B, S, H, D) layout like layers.sdpa.

    No mask support (SD1.x never masks spatial attention). Scale is
    1/sqrt(D) over the TRUE head dim, applied inside. Fully differentiable:
    the VJP runs streaming Pallas backward kernels from the saved LSE.

    `out_layout='bhsd'` skips the output transpose and returns the kernel's
    native (B, H, S, D) — for callers that consume the output per head
    (unet.mh_attention contracts the output projection head-by-head, which
    keeps every surrounding matmul on contiguous operands)."""
    out, _, meta = _fwd_call(q, k, v, block_q, block_k)
    sq = meta[1]
    out = out[:, :, :sq]
    return jnp.swapaxes(out, 1, 2) if out_layout == 'bshd' else out


def _flash_fwd(q, k, v, block_q, block_k, out_layout):
    out, lse, meta = _fwd_call(q, k, v, block_q, block_k)
    sq = meta[1]
    o = out[:, :, :sq]
    if out_layout == 'bshd':
        o = jnp.swapaxes(o, 1, 2)
    return o, (q, k, v, out, lse)


def _flash_bwd(block_q, block_k, out_layout, res, g):
    q, k, v, out_p, lse = res  # out_p/lse: (B, H, Sq_p, ·) padded
    (qf, kf, vf, b, sq, h, d, sq_p, sk, sk_p, bq, bk) = _prep(
        q, k, v, block_q, block_k, single_block=False)
    scale = 1.0 / math.sqrt(d)
    if out_layout == 'bshd':
        g = jnp.swapaxes(g, 1, 2)
    gf = _pad_to(g, sq_p, 2)
    # D_i = rowsum(dout * out), lane-replicated to an 8-wide minor tile
    dvec = (gf.astype(jnp.float32)
            * out_p.astype(jnp.float32)).sum(-1, keepdims=True)
    dvec = jnp.broadcast_to(dvec, (*dvec.shape[:-1], 8))

    grid_k = (b, h, sk_p // bk)
    dk_p, dv_p = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=bq, scale=scale,
                          kv_len=sk),
        out_shape=(jax.ShapeDtypeStruct((b, h, sk_p, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, sk_p, d), v.dtype)),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec((1, 1, sq_p, d), lambda i, hh, j: (i, hh, 0, 0)),
            pl.BlockSpec((1, 1, sq_p, d), lambda i, hh, j: (i, hh, 0, 0)),
            pl.BlockSpec((1, 1, sq_p, 8), lambda i, hh, j: (i, hh, 0, 0)),
            pl.BlockSpec((1, 1, sq_p, 8), lambda i, hh, j: (i, hh, 0, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda i, hh, j: (i, hh, j, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda i, hh, j: (i, hh, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bk, d), lambda i, hh, j: (i, hh, j, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda i, hh, j: (i, hh, j, 0)),
        ),
        interpret=_interpret(),
    )(qf, gf, lse, dvec, kf, vf)

    grid_q = (b, h, sq_p // bq)
    dq_p = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=bk, scale=scale,
                          kv_len=sk),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda i, hh, j: (i, hh, j, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda i, hh, j: (i, hh, j, 0)),
            pl.BlockSpec((1, 1, bq, 8), lambda i, hh, j: (i, hh, j, 0)),
            pl.BlockSpec((1, 1, bq, 8), lambda i, hh, j: (i, hh, j, 0)),
            pl.BlockSpec((1, 1, sk_p, d), lambda i, hh, j: (i, hh, 0, 0)),
            pl.BlockSpec((1, 1, sk_p, d), lambda i, hh, j: (i, hh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda i, hh, j: (i, hh, j, 0)),
        interpret=_interpret(),
    )(qf, gf, lse, dvec, kf, vf)

    def back(x, s):
        return jnp.swapaxes(x, 1, 2)[:, :s]

    return back(dq_p, sq), back(dk_p, sk), back(dv_p, sk)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_supported(sq: int, sk: int, d: int) -> bool:
    """Shapes worth routing to these kernels. Unaligned key counts are
    HANDLED (zero-padded to a masked block), but short contexts are not
    WORTH it: for cross-attention's 77 text keys the dense XLA path measures
    ~9x faster than a one-block kernel launch (tools/bench_attention.py,
    v5e: 0.10 ms dense vs 0.86 ms kernel at (8,4096,77,8,40)) — the fp32
    logits are only (B,H,Q,77) and XLA fuses the softmax. Flash wins when
    the logits matrix is the bandwidth problem, i.e. large sk.

    K/V stay RESIDENT in VMEM per (head, q-block) program, double-buffered:
    cap sk*d so 2 tensors x 2 buffers x bf16 fit comfortably under the 16MB
    scoped-vmem limit (the VAE's 4096x512 single-head attention exceeds it
    and measured-OOM'd at batch 8 — it stays dense)."""
    return (d <= 512 and sq >= 128 and sk >= 1024
            and sk * d * 2 * 2 * 2 <= 12 * 1024 * 1024)
