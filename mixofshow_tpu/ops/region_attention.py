"""Pallas TPU region-masked cross-attention for regional sampling.

The reference computes cross-attention twice per region: once for the whole
grid against the global prompt, then — for the query rows inside each box —
against that region's K/V (pipeline_regionally_t2iadapter.py:60-83, sliced
per box in torch eager mode). A direct jit translation must either make the
box coordinates static (recompiling per layout) or compute FULL-grid
attention per region and mask (what pipeline_regional.py's XLA fallback
does) — ~(1+N_regions)x the minimal work at the reference's 1024x2048
3-region demo.

This kernel does the minimal work with TRACED boxes (one compiled program
per region COUNT, any layout): the grid is tiled spatially, box bounds
arrive as prefetched scalars, and each tile computes

  * global attention against the context K/V (77 text tokens, one block),
  * PLUS, for each region whose box overlaps the tile (`@pl.when` — skipped
    at runtime otherwise), attention against that region's K/V, blended by
    the per-pixel box mask with overlap counting (reference :34-41,60-83).

Per-tile cost is therefore global + only the overlapping regions, exactly
like the reference's row slicing, with no recompilation across layouts.

Layouts: q (BH, H, W, D) spatial; K/V (BH, Sk_pad, D) with true key count
`kv_len` masked (77 text tokens padded to 128 lanes). fp32 softmax, bf16
matmul inputs, like ops/flash_attention.py.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _attend(q, k_ref, v_ref, *, scale: float, kv_len: int,
            mm_dtype=jnp.bfloat16):
    """Single-block attention: q (N, D) vs one K/V block (Sk_p, D).
    fp32 logits/softmax, `mm_dtype` matmul inputs; returns (N, D) fp32."""
    k = k_ref[0].astype(mm_dtype)
    v = v_ref[0].astype(mm_dtype)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    n, sk = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (n, sk), 1)
    s = jnp.where(col < kv_len, s, NEG_INF)
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(mm_dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return pv / l


def _kernel(boxes_ref, q_ref, gk_ref, gv_ref, *rest, scale: float,
            kv_len: int, n_regions: int, th: int, tw: int,
            mm_dtype=jnp.bfloat16):
    """One (batch*head, tile_row, tile_col) program.

    boxes_ref: (R, 4) int32 SMEM — (sh, sw, eh, ew) pixel bounds at this
    layer's grid scale (rasterized with the reference's ceil/floor rule
    before the call). q_ref: (1, th, tw, D); gk/gv: (1, Sk_p, D); rest =
    [rk_0, rv_0, …, rk_{R-1}, rv_{R-1}, o_ref, acc, cnt] — per-region K/V
    arrive as SEPARATE (1, Sk_p, D) inputs because a stacked (R, …, D)
    block cannot be sliced along the region axis when D is not a lane
    multiple (Mosaic memref_slice requires 128-aligned minor slices)."""
    region_kv = rest[:2 * n_regions]
    o_ref, acc_ref, cnt_ref = rest[2 * n_regions:]
    d = q_ref.shape[-1]
    r0 = pl.program_id(1) * th
    c0 = pl.program_id(2) * tw

    q = q_ref[0].reshape(th * tw, d).astype(mm_dtype)
    out_g = _attend(q, gk_ref, gv_ref, scale=scale, kv_len=kv_len,
                    mm_dtype=mm_dtype)

    # per-token pixel coords in LINEAR (th*tw, 1) layout — a (th, tw) mask
    # reshaped to (th*tw, 1) would change the lane dim, which Mosaic's
    # layout inference rejects ("unsupported shape cast")
    lin = jax.lax.broadcasted_iota(jnp.int32, (th * tw, 1), 0)
    rows = lin // tw + r0
    cols = lin % tw + c0

    acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    cnt_ref[:] = jnp.zeros(cnt_ref.shape, cnt_ref.dtype)

    for r in range(n_regions):
        sh, sw = boxes_ref[r, 0], boxes_ref[r, 1]
        eh, ew = boxes_ref[r, 2], boxes_ref[r, 3]
        overlaps = ((r0 < eh) & (r0 + th > sh)
                    & (c0 < ew) & (c0 + tw > sw))

        @pl.when(overlaps)
        def _():
            out_r = _attend(q, region_kv[2 * r], region_kv[2 * r + 1],
                            scale=scale, kv_len=kv_len, mm_dtype=mm_dtype)
            m = ((rows >= sh) & (rows < eh)
                 & (cols >= sw) & (cols < ew))
            mf = m.astype(jnp.float32)          # (th*tw, 1)
            acc_ref[:] += mf * out_r
            cnt_ref[:] += mf

    cnt = cnt_ref[:]
    blended = acc_ref[:] / jnp.maximum(cnt, 1.0)
    out = jnp.where(cnt > 0, blended, out_g)
    o_ref[0] = out.reshape(th, tw, d).astype(o_ref.dtype)


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _tile_sizes(h: int, w: int):
    """Tile geometry, chosen per grid size (measured A/B:
    tools/bench_region_kernel.py on v5e, 3 column-strip boxes):

      * whole grid fits one 1024-token tile (res ≤ 32 at 512²) → ONE
        full-grid tile. Fewer programs beat fewer attends here: splitting
        res32 into two 32×16 tiles measured 1.25 ms vs 0.78 single-tile
        (N=1024 keeps full sublanes and the K/V loads amortize).
      * larger grids → TALL-NARROW 64×16 column strips. Region boxes are
        typically column strips (people side by side —
        regionally_sample.sh:66-74 and both bench layouts), so narrow
        tiles overlap fewer regions and `@pl.when` skips more region
        attends: at the 512² res-64 grid, full-width 16×64 tiles overlap
        all 3 boxes (4 attends/tile, 2.61 ms); 64×16 strips average ~1.5
        (2.08 ms). tw=16 keeps the (tw, d) minor block a sublane multiple.

    MOS_REGION_TILE_W overrides the narrow width for A/B."""
    env = os.environ.get('MOS_REGION_TILE_W')
    if env:
        tw = min(w, int(env))
    elif h * w <= 1024:
        tw = w
    else:
        tw = min(w, 16)
    th = max(1, min(h, 1024 // tw))
    return th, tw


def region_cross_attention(q, g_k, g_v, r_k, r_v, boxes_px, hw, kv_len: int,
                           precise: bool = False):
    """Regional cross-attention, minimal-work Pallas path.

    q: (B, N, H, D) with N = h*w; g_k/g_v: (B, Sk, H, D) global-context
    keys/values; r_k/r_v: (R, B, Sk, H, D) per-region keys/values;
    boxes_px: (R, 4) int32 TRACED pixel bounds (sh, sw, eh, ew) at grid
    scale hw=(h, w); kv_len: true key count (Sk may already be padded).
    `precise` keeps matmul inputs in the input dtype (fp32 parity runs);
    the default casts to bf16 like ops/flash_attention.py.
    Returns (B, N, H, D): global attention everywhere, box interiors
    replaced by the overlap-counted blend of region attention (reference
    pipeline_regionally_t2iadapter.py:32-86)."""
    b, n, heads, d = q.shape
    h, w = hw
    assert n == h * w
    nr, sk = r_k.shape[0], r_k.shape[2]
    scale = 1.0 / math.sqrt(d)
    sk_p = max(128, ((sk + 127) // 128) * 128)
    th, tw = _tile_sizes(h, w)
    hp = ((h + th - 1) // th) * th
    wp = ((w + tw - 1) // tw) * tw

    # (B, N, H, D) -> (BH, h_p, w_p, D)
    qf = jnp.swapaxes(q, 1, 2).reshape(b * heads, h, w, d)
    qf = _pad_axis(_pad_axis(qf, hp, 1), wp, 2)

    def kv_bh(x):  # (B, Sk, H, D) -> (BH, Sk_p, D)
        x = jnp.swapaxes(x, 1, 2).reshape(b * heads, sk, d)
        return _pad_axis(x, sk_p, 1)

    gkf, gvf = kv_bh(g_k), kv_bh(g_v)
    region_kv = []
    for i in range(nr):
        region_kv.append(kv_bh(r_k[i]))
        region_kv.append(kv_bh(r_v[i]))

    kv_spec = pl.BlockSpec((1, sk_p, d), lambda i, j, k, bx: (i, 0, 0))
    grid = (b * heads, hp // th, wp // tw)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, kv_len=kv_len,
                          n_regions=nr, th=th, tw=tw,
                          mm_dtype=q.dtype if precise else jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, th, tw, d),
                             lambda i, j, k, bx: (i, j, k, 0)),
                kv_spec, kv_spec,
            ] + [kv_spec] * (2 * nr),
            out_specs=pl.BlockSpec((1, th, tw, d),
                                   lambda i, j, k, bx: (i, j, k, 0)),
            scratch_shapes=[
                pltpu.VMEM((th * tw, d), jnp.float32),
                pltpu.VMEM((th * tw, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * heads, hp, wp, d), q.dtype),
        interpret=_interpret(),
    )(boxes_px.astype(jnp.int32), qf, gkf, gvf, *region_kv)

    out = out[:, :h, :w, :].reshape(b, heads, n, d)
    return jnp.swapaxes(out, 1, 2)


def boxes_to_grid(boxes, h: int, w: int):
    """Normalized (R, 4) float boxes -> int32 pixel bounds at (h, w) with
    the reference's ceil/floor rasterization (…t2iadapter.py:37-39)."""
    scale = jnp.asarray([h, w, h, w], jnp.float32)
    b = boxes * scale
    return jnp.concatenate(
        [jnp.ceil(b[:, :2]), jnp.floor(b[:, 2:])], axis=1).astype(jnp.int32)


def region_attention_supported(heads: int, d: int, sk: int, nr: int) -> bool:
    """Kernel routing guard: per-program VMEM is q/out tiles (~1024xD) +
    (2 + 2R) K/V blocks of 128xD — comfortably small for SD1.x shapes; keep
    a conservative bound anyway."""
    sk_p = max(128, ((sk + 127) // 128) * 128)
    kv_bytes = (2 + 2 * nr) * sk_p * d * 4
    return nr >= 1 and d <= 256 and kv_bytes <= 8 * 1024 * 1024
