"""Pallas spatial-sum kernel for GroupNorm statistics.

Round-3 profiling (tools/profile_sampling.py --target vae): the XLA lowering
of `jnp.sum(x, (1,2), dtype=f32)` + `jnp.sum(x*x, (1,2), dtype=f32)` over
spatially-tiled conv outputs materializes TWO transposed fp32 copies of the
whole activation (58 ms of the 163 ms 512^2 b4 VAE decode — ~20x the
bandwidth floor). This kernel reads x ONCE in its storage dtype and
accumulates per-(batch, channel) fp32 sum and sum-of-squares in VMEM
scratch across row-tile grid steps.

Differentiable via custom_vjp: the backward of (sum, sum x^2) is the
elementwise broadcast g_s + 2*x*g_s2, which XLA fuses fine — only the
forward reduction needed a kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _kernel(x_ref, o_ref, acc_ref, *, n_tiles: int):
    """x (1, BH, W, C); o (1, 2, C) f32; acc (2, C) f32 scratch."""
    t = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)          # (BH, W, C)
    s = xf.sum(axis=0).sum(axis=0)             # (C,)
    s2 = jax.lax.square(xf).sum(axis=0).sum(axis=0)
    part = jnp.stack([s, s2])                  # (2, C)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = part

    @pl.when(t > 0)
    def _():
        acc_ref[:] += part

    @pl.when(t == n_tiles - 1)
    def _():
        o_ref[0] = acc_ref[:]


def _row_block(h: int, w: int, c: int, bytes_per: int) -> int:
    """Largest power-of-two row count dividing h with the block under ~8MB
    (double-buffered under the 100MB scoped limit)."""
    bh = h
    while bh > 8 and bh * w * c * bytes_per > 8 * 1024 * 1024:
        bh //= 2
    while h % bh:
        bh //= 2
    return max(bh, 1)


def _sums_fwd_impl(x):
    b, h, w, c = x.shape
    bh = _row_block(h, w, c, x.dtype.itemsize)
    grid = (b, h // bh)
    out = pl.pallas_call(
        functools.partial(_kernel, n_tiles=h // bh),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((1, bh, w, c), lambda i, t: (i, t, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, t: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x)
    return out[:, 0], out[:, 1]


@jax.custom_vjp
def spatial_sums(x):
    """(B, H, W, C) -> fp32 ((B, C) sum, (B, C) sum-of-squares) over the
    spatial axes, reading x once in its storage dtype."""
    return _sums_fwd_impl(x)


def _fwd(x):
    return _sums_fwd_impl(x), x


def _bwd(x, g):
    gs, gs2 = g
    dx = gs[:, None, None, :] + 2.0 * x.astype(jnp.float32) \
        * gs2[:, None, None, :]
    return (dx.astype(x.dtype),)


spatial_sums.defvjp(_fwd, _bwd)


# ------------------------------------------------------------------- apply
def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, act: str):
    """o = act(x * a + b) with per-(batch, channel) fp32 a/b.
    x/o (1, BH, W, C); a/b (1, 1, C) — the batch row is lifted to a leading
    dim so the block's trailing dims (1, C) equal the array's (TPU block
    shape rule)."""
    dt = x_ref.dtype
    a = a_ref[0, 0].astype(dt)
    b = b_ref[0, 0].astype(dt)
    y = x_ref[0] * a[None, None, :] + b[None, None, :]
    if act == 'silu':
        # silu in f32: Mosaic mis-lowers bf16 logistic here (vector.broadcast
        # f32 scalar into a bf16 vector fails MLIR verification)
        y32 = y.astype(jnp.float32)
        y = (y32 * jax.nn.sigmoid(y32)).astype(dt)
    o_ref[0] = y


def _apply_fwd_impl(x, a, b, act: str):
    bsz, h, w, c = x.shape
    bh = _row_block(h, w, c, x.dtype.itemsize)
    grid = (bsz, h // bh)
    return pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bh, w, c), lambda i, t: (i, t, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, c), lambda i, t: (i, t, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, a[:, None, :], b[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def scale_bias_act(x, a, b, act: str = 'none'):
    """act(x * a + b) with (B, C) fp32 scale/bias broadcast over the spatial
    axes of (B, H, W, C) x — GroupNorm's folded-affine apply pass as one
    Pallas read+write (the XLA lowering re-tiles it through transposing
    elementwise fusions — 32 ms of the b4 512^2 VAE decode)."""
    return _apply_fwd_impl(x, a, b, act)


def _apply_fwd(x, a, b, act):
    return _apply_fwd_impl(x, a, b, act), (x, a, b)


def _apply_bwd(act, res, g):
    x, a, b = res
    dt = x.dtype
    af = a.astype(dt)[:, None, None, :]
    gy = g
    if act == 'silu':
        y = (x * af + b.astype(dt)[:, None, None, :]).astype(jnp.float32)
        sig = jax.nn.sigmoid(y)
        gy = g * (sig * (1.0 + y * (1.0 - sig))).astype(dt)
    dx = gy * af
    da = jnp.sum(gy.astype(jnp.float32) * x.astype(jnp.float32),
                 axis=(1, 2))
    db = jnp.sum(gy, axis=(1, 2), dtype=jnp.float32)
    return dx, da.astype(a.dtype), db.astype(b.dtype)


scale_bias_act.defvjp(_apply_fwd, _apply_bwd)
