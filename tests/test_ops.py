"""Pallas flash attention (interpret mode on CPU) + ptp attention store."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixofshow_tpu.ops.flash_attention import (flash_attention,
                                               flash_attention_supported)
from mixofshow_tpu.utils.ptp import AttentionStore, aggregate_attention


def _dense(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum('bqhd,bkhd->bhqk', q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(d)
    return jnp.einsum('bhqk,bkhd->bqhd', jax.nn.softmax(logits, -1),
                      v.astype(jnp.float32))


@pytest.mark.parametrize('s,d,h', [(256, 40, 2), (256, 160, 2), (128, 80, 1)])
def test_flash_matches_dense(s, d, h):
    q = jax.random.normal(jax.random.PRNGKey(0), (1, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, s, h, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, s, h, d), jnp.float32)
    out = flash_attention(q, k, v, block_q=64, block_k=64)
    ref = _dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_flash_cross_attention_shape():
    # cross-shape (sk != sq) with compatible block counts
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 2, 40))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 2, 40))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 2, 40))
    out = flash_attention(q, k, v, block_q=64, block_k=64)
    ref = _dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_flash_masked_kv_matches_dense():
    """77 text keys pad to one masked 128-key block — the cross-attention
    fast path (the reference's xformers covers this case too,
    edlora.py:151-153)."""
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 2, 40))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 2, 40))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 2, 40))
    out = flash_attention(q, k, v, block_q=64, block_k=128)
    ref = _dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_flash_masked_kv_gradients():
    """VJP through the masked-K path: padded key columns get zero grads and
    real columns match the dense backward."""
    q = jax.random.normal(jax.random.PRNGKey(3), (1, 128, 1, 40))
    k = jax.random.normal(jax.random.PRNGKey(4), (1, 77, 1, 40))
    v = jax.random.normal(jax.random.PRNGKey(5), (1, 77, 1, 40))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, block_q=64, block_k=128) ** 2).sum()

    def loss_dense(q, k, v):
        return (_dense(q, k, v) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)


def test_flash_supported_rules():
    assert flash_attention_supported(4096, 4096, 40)
    assert flash_attention_supported(1024, 1024, 160)
    assert flash_attention_supported(32768, 1280, 40)    # unaligned large sk
    assert not flash_attention_supported(4096, 77, 40)   # text keys → dense
    assert not flash_attention_supported(64, 64, 40)     # tiny q → dense
    assert flash_attention_supported(32768, 32768, 40)  # regional canvas
    assert not flash_attention_supported(4096, 4096, 512)  # VAE: VMEM cap


def test_attention_store_average():
    store = AttentionStore(training=True)
    # two "steps" of one 8x8-res map (q=64), 2 heads, K=77
    m1 = np.zeros((1, 2, 64, 77), np.float32)
    m2 = np.ones((1, 2, 64, 77), np.float32)
    store.store_step([('down', 0, m1)])
    store.store_step([('down', 0, m2)])
    avg = store.get_average_attention()
    np.testing.assert_allclose(avg['down_cross'][0], 0.5)
    agg = aggregate_attention(store, 8, ('down',))
    assert agg.shape == (8, 8, 77)
    np.testing.assert_allclose(agg, 0.5)
    store.reset()
    assert store.cur_step == 0 and not store.attention_store


def test_flash_attention_gradients_match_dense():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 2, 40))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 2, 40))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 2, 40))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, 64, 64) ** 2).sum()

    def loss_dense(q, k, v):
        return (_dense(q, k, v) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2,
                                   rtol=1e-2)


def test_flash_bhsd_layout_matches():
    """out_layout='bhsd' returns the kernel-native permutation of the same
    values (the per-head to_out contraction path in unet.mh_attention)."""
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 2, 40))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 2, 40))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 2, 40))
    a = flash_attention(q, k, v, 64, 64)
    b = flash_attention(q, k, v, 64, 64, out_layout='bhsd')
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(b, 1, 2)),
                               np.asarray(a), atol=1e-6)
