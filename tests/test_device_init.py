"""utils/device_init: on-device generation of init trees from recorded
LeafSpecs — must match the host init's structure, shapes, dtypes, and
per-leaf distributions (it replaces a measured 384 s fp32 upload through
the remote-TPU tunnel in the benches; docs/Performance.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixofshow_tpu.models import (CLIPTextConfig, UNetConfig, VAEConfig,
                                  init_clip_text, init_unet, init_vae)
from mixofshow_tpu.models.layers import LeafSpec, spec_mode
from mixofshow_tpu.utils.device_init import device_init

U = UNetConfig.tiny()
C = CLIPTextConfig(width=U.cross_attention_dim, layers=2, heads=2,
                   mlp_dim=128, vocab_size=512)
V = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_groups=8)


@pytest.mark.parametrize('builder,host', [
    (lambda: init_unet(0, U), lambda: init_unet(0, U)),
    (lambda: init_vae(2, V), lambda: init_vae(2, V)),
    (lambda: init_clip_text(1, C), lambda: init_clip_text(1, C)),
])
def test_matches_host_structure_shapes_dtypes(builder, host):
    dev = device_init(builder, seed=0)
    ht = host()
    assert jax.tree.structure(dev) == jax.tree.structure(ht)
    for d, h in zip(jax.tree.leaves(dev), jax.tree.leaves(ht)):
        assert d.shape == np.asarray(h).shape
        assert d.dtype == np.asarray(h).dtype


def test_distributions_match_host_init():
    """Uniform leaves respect the kaiming bound, norm leaves are exact
    ones/zeros, embeddings have the 0.02 normal scale."""
    with spec_mode():
        spec = init_unet(0, U)
    dev = device_init(lambda: init_unet(0, U), seed=3)
    specs = jax.tree.leaves(spec, is_leaf=lambda x: isinstance(x, LeafSpec))
    for s, d in zip(specs, jax.tree.leaves(dev)):
        x = np.asarray(d, np.float32)
        if s.kind == 'uniform':
            assert np.abs(x).max() <= s.param + 1e-7
            if x.size > 4000:  # std of U[-b,b] is b/sqrt(3)
                np.testing.assert_allclose(x.std(), s.param / np.sqrt(3),
                                           rtol=0.15)
        elif s.kind == 'ones':
            assert (x == 1.0).all()
        elif s.kind == 'zeros':
            assert (x == 0.0).all()

    emb = device_init(lambda: init_clip_text(1, C), seed=1)
    np.testing.assert_allclose(
        np.asarray(emb['token_embedding']).std(), 0.02, rtol=0.1)


def test_deterministic_across_calls():
    a = device_init(lambda: init_vae(2, V), seed=7)
    b = device_init(lambda: init_vae(2, V), seed=7)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), a, b)
    c = device_init(lambda: init_vae(2, V), seed=8)
    assert not np.allclose(np.asarray(jax.tree.leaves(a)[0]),
                           np.asarray(jax.tree.leaves(c)[0]))


def test_rejects_non_recorded_leaves():
    with pytest.raises(ValueError, match='non-recorded'):
        device_init(lambda: {'w': np.zeros((3,), np.float32)}, seed=0)


def test_device_init_tree_is_functional():
    """A forward pass through device-init params runs and is finite."""
    from mixofshow_tpu.models.unet import unet_apply
    params = device_init(lambda: init_unet(0, U), seed=0)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 16, 77, U.cross_attention_dim))
    out = unet_apply(params, x, jnp.asarray([10.0]), ctx, U)
    out = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(out)).all()
