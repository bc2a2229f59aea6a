"""Batched host↔device pytree transfer for high-latency device links.

Motivation (measured, r4): this environment reaches the TPU through a
remote tunnel whose per-transfer LATENCY dominates small fetches — pulling
the fusion text-phase grams (538 MB across ~100 leaves) with per-leaf
`np.asarray` took 108 s (~1.1 s/leaf, ~5 MB/s effective), and the fused
checkpoint save paid the same per-leaf tax across ~700 UNet leaves. The
fix is to amortize the round trip: pack many leaves into one flat uint8
buffer ON DEVICE (one jit program per tree structure, persistently
cached), fetch it in a single transfer, and split/view it back on host.

`fetch_tree` replaces `jax.tree.map(np.asarray, tree)` wherever the tree
lives on device. Leaves are grouped into ~chunk_mb packs so one transfer
is large enough to amortize latency but never balloons into a single
multi-GB stream (very large single transfers have stalled this tunnel).
Host-resident leaves pass through untouched, so the function is safe on
mixed trees.

Bit-exactness: packing is `bitcast_convert_type` to uint8 — a pure byte
view, no value conversion in either direction.
"""
from __future__ import annotations

import math
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['fetch_tree']

_PACK_CACHE: dict = {}


def _nbytes(x) -> int:
    return math.prod(x.shape) * x.dtype.itemsize


def _pack_fn(specs):
    """jit program packing leaves with the given (shape, dtype) specs into
    one flat uint8 vector. Cached per spec tuple (and persisted by the XLA
    compilation cache, so a fresh process reloads it instead of
    recompiling)."""
    if specs in _PACK_CACHE:
        return _PACK_CACHE[specs]

    @jax.jit
    def pack(leaves):
        parts = []
        for leaf in leaves:
            if leaf.dtype == jnp.bool_:
                u8 = leaf.astype(jnp.uint8)
            else:
                u8 = jax.lax.bitcast_convert_type(leaf, jnp.uint8)
            parts.append(u8.reshape(-1))
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    _PACK_CACHE[specs] = pack
    return pack


def _unpack_host(buf: np.ndarray, specs) -> List[np.ndarray]:
    out = []
    off = 0
    for shape, dtype in specs:
        dt = np.dtype(dtype)
        n = math.prod(shape) * (1 if dt == np.bool_ else dt.itemsize)
        raw = buf[off:off + n]
        off += n
        if dt == np.bool_:
            out.append(raw.astype(np.bool_).reshape(shape))
        else:
            # copy() realigns the slice so .view() is legal at any offset
            out.append(np.ascontiguousarray(raw).view(dt).reshape(shape))
    return out


def fetch_tree(tree: Any, chunk_mb: int = 64) -> Any:
    """Tree of (device and/or host) arrays → same-structure tree of host
    numpy arrays, using one packed transfer per ~chunk_mb of device data
    instead of one round trip per leaf."""
    leaves, treedef = jax.tree.flatten(tree)
    fetched: List = list(leaves)

    # indices of device-array leaves, in order
    dev_idx = [i for i, leaf in enumerate(leaves)
               if isinstance(leaf, jax.Array)]
    # host leaves: normalize to numpy without a device round trip
    for i, leaf in enumerate(leaves):
        if i not in dev_idx and leaf is not None:
            fetched[i] = np.asarray(leaf)

    chunk_bytes = chunk_mb * (1 << 20)
    group: List[int] = []
    group_bytes = 0

    def flush():
        nonlocal group, group_bytes
        if not group:
            return
        specs = tuple((tuple(leaves[i].shape), np.dtype(leaves[i].dtype))
                      for i in group)
        buf = np.asarray(_pack_fn(specs)([leaves[i] for i in group]))
        for i, arr in zip(group, _unpack_host(buf, specs)):
            fetched[i] = arr
        group, group_bytes = [], 0

    for i in dev_idx:
        b = _nbytes(leaves[i])
        if group and group_bytes + b > chunk_bytes:
            flush()
        group.append(i)
        group_bytes += b
        if group_bytes >= chunk_bytes:
            flush()
    flush()
    return jax.tree.unflatten(treedef, fetched)
