"""Model zoo: shapes, cross-attention layer order, LoRA threading, VAE."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixofshow_tpu.models import (CLIPTextConfig, UNetConfig, VAEConfig,
                                  clip_text_encode, init_clip_text, init_unet,
                                  init_vae, unet_apply, vae_decode, vae_encode)
from mixofshow_tpu.models import lora as lora_lib
from mixofshow_tpu.models.vae import sample_latents

TINY = UNetConfig.tiny()


@pytest.fixture(scope='module')
def unet_params():
    return init_unet(jax.random.PRNGKey(0), TINY)


def test_unet_cross_layer_count():
    assert UNetConfig.sd15().num_cross_layers == 16
    assert TINY.num_cross_layers == 16  # same topology


def test_unet_forward_shapes(unet_params):
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([10, 500])
    ehs = jnp.zeros((2, 77, TINY.cross_attention_dim))
    out, aux = unet_apply(unet_params, x, t, ehs, TINY)
    assert out.shape == (2, 16, 16, 4)
    assert aux == {}


def test_unet_layerwise_embedding_slices_are_used(unet_params):
    """A (B,16,77,C) layerwise embedding must change the output vs broadcast
    when layers differ — and match when all 16 layers are identical."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.array([100])
    ehs3 = jax.random.normal(jax.random.PRNGKey(2),
                             (1, 77, TINY.cross_attention_dim))
    ehs4_same = jnp.broadcast_to(ehs3[:, None], (1, 16, 77, ehs3.shape[-1]))
    out3, _ = unet_apply(unet_params, x, t, ehs3, TINY)
    out4, _ = unet_apply(unet_params, x, t, ehs4_same, TINY)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out4), atol=1e-5)

    ehs4_diff = ehs4_same.at[:, 7].set(0.0)  # perturb one layer only
    out_diff, _ = unet_apply(unet_params, x, t, ehs4_diff, TINY)
    assert not np.allclose(np.asarray(out3), np.asarray(out_diff), atol=1e-4)


def test_unet_cross_probs_order(unet_params):
    x = jnp.zeros((1, 16, 16, 4))
    ehs = jnp.zeros((1, 77, TINY.cross_attention_dim))
    _, aux = unet_apply(unet_params, x, jnp.array([0]), ehs, TINY,
                        return_cross_probs=True)
    probs = aux['cross_probs']
    assert len(probs) == 16
    places = [p[0] for p in probs]
    idxs = [p[1] for p in probs]
    assert idxs == list(range(16))  # down→mid→up order (edlora.py:187-189)
    assert places == ['down'] * 6 + ['mid'] + ['up'] * 9
    # each map is (B, heads, Q, 77)
    assert probs[0][2].shape[-1] == 77
    np.testing.assert_allclose(np.asarray(probs[0][2].sum(-1)), 1.0, atol=1e-4)


def test_unet_lora_threading(unet_params):
    """Zero-init LoRA changes nothing; nonzero up-matrices change output."""
    lora = lora_lib.init_lora_tree(
        jax.random.PRNGKey(3), unet_params,
        path_filter=lambda p: '/attn1/' in p or '/attn2/' in p, rank=4)
    assert lora_lib.num_lora_leaves(lora) == 32 * 4  # 16 blocks x 2 attns x 4

    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(5), (1, 77, TINY.cross_attention_dim))
    base_out, _ = unet_apply(unet_params, x, jnp.array([5]), ehs, TINY)
    lora_out, _ = unet_apply(unet_params, x, jnp.array([5]), ehs, TINY,
                             lora=lora)
    np.testing.assert_allclose(np.asarray(base_out), np.asarray(lora_out),
                               atol=1e-6)  # up is zero-init

    bumped = jax.tree.map(lambda a: a + 0.05, lora)
    out2, _ = unet_apply(unet_params, x, jnp.array([5]), ehs, TINY, lora=bumped)
    assert not np.allclose(np.asarray(base_out), np.asarray(out2), atol=1e-4)

    # merge-then-apply == apply-with-lora (alpha=1). Exactly equal in f64;
    # fp32 conditioning through 16 norm/softmax blocks amplifies rounding to
    # ~1e-2 on this random-init net, hence the loose tolerance.
    merged = lora_lib.merge_into(unet_params, bumped, alpha=1.0)
    out3, _ = unet_apply(merged, x, jnp.array([5]), ehs, TINY)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out3), atol=2e-2)


def test_unet_adapter_residuals(unet_params):
    x = jnp.zeros((1, 16, 16, 4))
    ehs = jnp.zeros((1, 77, TINY.cross_attention_dim))
    ch = TINY.block_out_channels
    feats = [jnp.ones((1, 16 // (2 ** i), 16 // (2 ** i), ch[i])) * 0.1
             for i in range(4)]
    out, _ = unet_apply(unet_params, x, jnp.array([0]), ehs, TINY)
    out_a, _ = unet_apply(unet_params, x, jnp.array([0]), ehs, TINY,
                          adapter_features=feats)
    assert not np.allclose(np.asarray(out), np.asarray(out_a), atol=1e-4)


def test_unet_remat_matches(unet_params):
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(7), (1, 77, TINY.cross_attention_dim))
    out, _ = unet_apply(unet_params, x, jnp.array([3]), ehs, TINY)
    out_r, _ = unet_apply(unet_params, x, jnp.array([3]), ehs, TINY, remat=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)


# --------------------------------------------------------------------- CLIP
def test_clip_shapes_and_concept_embedding():
    cfg = CLIPTextConfig(width=64, layers=2, heads=2, mlp_dim=128,
                         vocab_size=1000)
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[0, 5, 7, 999] + [999] * 73])
    out = clip_text_encode(params, ids, cfg)
    assert out.shape == (1, 77, 64)

    # concept ids >= vocab_size hit the detached table
    concept = jnp.ones((16, 64)) * 0.3
    ids2 = ids.at[0, 2].set(1000 + 3)
    out2 = clip_text_encode(params, ids2, cfg, concept_embedding=concept)
    assert out2.shape == (1, 77, 64)
    assert not np.allclose(np.asarray(out), np.asarray(out2), atol=1e-4)
    # gradient flows to the concept table
    def loss(c):
        return clip_text_encode(params, ids2, cfg, concept_embedding=c).sum()
    g = jax.grad(loss)(concept)
    assert float(jnp.abs(g[3]).sum()) > 0
    assert float(jnp.abs(g[4]).sum()) == 0  # untouched rows get no grad


def test_clip_causal_mask():
    cfg = CLIPTextConfig(width=32, layers=1, heads=2, mlp_dim=64,
                         vocab_size=100)
    params = init_clip_text(jax.random.PRNGKey(1), cfg)
    ids_a = jnp.array([[1, 2, 3] + [99] * 74])
    ids_b = ids_a.at[0, 40].set(7)  # change a late token
    a = clip_text_encode(params, ids_a, cfg)
    b = clip_text_encode(params, ids_b, cfg)
    # positions before 40 unaffected (causal), position >= 40 affected
    np.testing.assert_allclose(np.asarray(a[0, :40]), np.asarray(b[0, :40]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(a[0, 40]), np.asarray(b[0, 40]),
                           atol=1e-4)


# ---------------------------------------------------------------------- VAE
def test_vae_roundtrip_shapes():
    cfg = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_groups=8)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    mean, logvar = vae_encode(params, img, cfg)
    assert mean.shape == (1, 8, 8, 4) and logvar.shape == (1, 8, 8, 4)
    z = sample_latents(jax.random.PRNGKey(2), mean, logvar)
    rec = vae_decode(params, z, cfg)
    assert rec.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(rec)).all()
