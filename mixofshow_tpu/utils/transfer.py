"""Concurrent host←device pytree fetch for high-latency device links.

Motivation (measured, r4): this environment reaches the TPU through a
remote tunnel with ~0.2–1 s latency PER TRANSFER at ~5–30 MB/s — pulling
the fusion text-phase grams (538 MB across ~100 leaves) with sequential
per-leaf `np.asarray` took 108 s, and the fused-checkpoint save paid the
same per-leaf tax. Sequential fetches serialize that latency; issuing
them from a small thread pool overlaps it (PJRT transfers are
thread-safe and the tunnel multiplexes streams).

A packed-buffer design (one device-side concat program per tree
structure) was built and rejected: each leaf-spec combination is its own
XLA program and cold-compiles through this environment's remote compile
service at minutes per program — slower than the latency it saves.
Threading needs no compiles at all and works for any tree shape.

`fetch_tree` replaces `jax.tree.map(np.asarray, tree)` wherever the tree
may hold device arrays. Host leaves go through `np.asarray` (numpy
arrays pass through zero-copy; python scalars/lists become arrays, same
as the `jax.tree.map` it replaces), so it is safe on mixed trees.
Fetches are bit-exact (`np.asarray` on the device buffer).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any

import jax
import numpy as np

__all__ = ['fetch_tree']


def fetch_tree(tree: Any, workers: int = 8) -> Any:
    """Tree of (device and/or host) arrays → same-structure tree of host
    numpy arrays, fetching device leaves concurrently so per-transfer
    tunnel latency overlaps instead of accumulating per leaf."""
    leaves, treedef = jax.tree.flatten(tree)
    dev_idx = [i for i, leaf in enumerate(leaves)
               if isinstance(leaf, jax.Array)]
    dev_set = set(dev_idx)
    fetched = [leaf if i in dev_set else np.asarray(leaf)
               for i, leaf in enumerate(leaves)]
    if dev_idx:
        if len(dev_idx) == 1:
            fetched[dev_idx[0]] = np.asarray(leaves[dev_idx[0]])
        else:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                for i, arr in zip(dev_idx, pool.map(
                        np.asarray, [leaves[i] for i in dev_idx])):
                    fetched[i] = arr
    return jax.tree.unflatten(treedef, fetched)
