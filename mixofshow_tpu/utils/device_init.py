"""Generate deterministic random-init parameter trees ON DEVICE.

Why: on the remote-TPU link, `device_put` of a host-initialized SD1.5 fp32
tree measures ~10 MB/s — ~340 s for the 3.4 GB UNet alone; the measured
404 s "warm-cache first call" of the benches was entirely this upload
(docs/Performance.md). Generating the same-distribution tree on device
moves zero bytes: the whole tree materializes from one PRNG key in one
jitted program (compile-once, persisted by the XLA cache).

How: run the host init builder under `models.layers.spec_mode()` — the
init primitives (`_uniform_f32`, `init_norm`, `init_embedding`) record
`LeafSpec`s (distribution, shape, dtype) instead of generating values; the
builders are pure compositions of those primitives (checked: no post-hoc
arithmetic on leaves). One jitted program then generates every leaf from
`jax.random.fold_in(key, i)`.

Values are deterministic (threefry is backend-independent) but differ from
the host numpy init — callers that need the host-cached values bit-exact
(e.g. concept-embedding init reads real token rows, torch-mirror parity)
must keep using `initcache.cached_init`. Throughput benches and compile
checks only need shape/dtype-correct, distribution-correct weights.

Reference analogue: none — the reference loads real checkpoints from local
disk (test_edlora.py:24-57); this exists because the TPU sits behind a
tunnel and the benches run on synthetic weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mixofshow_tpu.models.layers import LeafSpec, spec_mode

__all__ = ['device_init']


def device_init(builder, seed: int):
    """Device-resident pytree with the same structure/shapes/dtypes and the
    same per-leaf distributions as `builder()`, generated on device from
    `seed`. `builder` must be an init function composed of the layers.py
    init primitives (init_dense/init_conv2d/init_norm/init_embedding)."""
    with spec_mode():
        spec = builder()
    leaves, treedef = jax.tree.flatten(
        spec, is_leaf=lambda x: isinstance(x, LeafSpec))
    bad = [l for l in leaves if not isinstance(l, LeafSpec)]
    if bad:
        raise ValueError(
            f'builder produced {len(bad)} non-recorded leaves (e.g. '
            f'{bad[0]!r}); device_init requires all leaves to flow through '
            f'the layers.py init primitives')

    def gen(key):
        out = []
        for i, s in enumerate(leaves):
            k = jax.random.fold_in(key, i)
            if s.kind == 'uniform':
                x = jax.random.uniform(k, s.shape, jnp.float32,
                                       -s.param, s.param)
            elif s.kind == 'normal':
                x = s.param * jax.random.normal(k, s.shape, jnp.float32)
            elif s.kind == 'ones':
                x = jnp.ones(s.shape, jnp.float32)
            else:
                x = jnp.zeros(s.shape, jnp.float32)
            out.append(x.astype(s.dtype))
        return out

    vals = jax.jit(gen)(jax.random.key(seed))
    return jax.tree.unflatten(treedef, vals)
