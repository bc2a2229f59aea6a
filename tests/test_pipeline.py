"""EDLoRAPipeline end-to-end on tiny models (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixofshow_tpu.models import (CLIPTextConfig, UNetConfig, VAEConfig,
                                  init_clip_text, init_unet, init_vae)
from mixofshow_tpu.models import lora as lora_lib
from mixofshow_tpu.pipelines import EDLoRAPipeline, bind_concept_prompt, init_concepts
from mixofshow_tpu.text import CLIPTokenizer

U = UNetConfig.tiny()
C = CLIPTextConfig(width=U.cross_attention_dim, layers=2, heads=2,
                   mlp_dim=128, vocab_size=49408)
V = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_groups=8)


@pytest.fixture(scope='module')
def pipe():
    tok = CLIPTokenizer()
    te = init_clip_text(0, C)
    cfg, table = init_concepts(tok, '<potter1> <potter2>', None,
                               np.asarray(te['token_embedding']))
    return EDLoRAPipeline(
        init_unet(1, U), te, init_vae(2, V), tokenizer=tok,
        unet_config=U, text_config=C, vae_config=V,
        new_concept_cfg=cfg, concept_embedding=table,
        dtype=jnp.float32)


def test_bind_concept_prompt():
    cfg = {'<a1> <a2>': {'concept_token_names': [f'<new{i}>' for i in range(16)],
                         'concept_token_ids': list(range(49408, 49424))}}
    out = bind_concept_prompt(['a photo of <a1> <a2>'], cfg)
    assert len(out) == 16
    assert out[0] == 'a photo of <new0>'
    assert out[15] == 'a photo of <new15>'


def test_init_concepts_layout():
    tok = CLIPTokenizer()
    base = np.random.default_rng(0).normal(size=(49408, 64)).astype(np.float32)
    cfg, table = init_concepts(tok, '<a1> <a2>+<b1> <b2>', '<rand-0.017>+<rand-0.02>',
                               base)
    assert table.shape == (32, 64)
    assert cfg['<a1> <a2>']['concept_token_ids'] == list(range(49408, 49424))
    assert cfg['<b1> <b2>']['concept_token_ids'] == list(range(49424, 49440))
    # sigma honored approximately
    assert 0.005 < np.std(table[:16]) < 0.05


def test_pipeline_sampling_shapes(pipe):
    img = pipe('a photo of <potter1> <potter2>', height=64, width=64,
               num_inference_steps=3, seed=0)
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1


def test_pipeline_external_latents_and_determinism(pipe):
    lat = np.random.default_rng(5).normal(size=(1, 4, 8, 8)).astype(np.float32)
    a = pipe('a photo of <potter1> <potter2>', height=64, width=64,
             num_inference_steps=2, latents=lat, output_type='latent')
    b = pipe('a photo of <potter1> <potter2>', height=64, width=64,
             num_inference_steps=2, latents=lat, output_type='latent')
    np.testing.assert_array_equal(a, b)  # same noise -> identical output
    assert a.shape == (1, 8, 8, 4)  # NCHW input accepted, NHWC out


def test_pipeline_guidance_changes_output(pipe):
    lat = np.random.default_rng(7).normal(size=(1, 8, 8, 4)).astype(np.float32)
    kw = dict(height=64, width=64, num_inference_steps=2, latents=lat,
              output_type='latent')
    a = pipe('a photo of <potter1> <potter2>', guidance_scale=7.5, **kw)
    c = pipe('a photo of <potter1> <potter2>', guidance_scale=1.0, **kw)  # no CFG
    assert not np.allclose(a, c, atol=1e-5)


def test_pipeline_lora_alpha_sweep(pipe):
    """Same weights, alpha 0 vs 1 with nonzero LoRA — outputs must differ at
    alpha 1 and match base at alpha 0 (test_edlora.py:89-94 semantics)."""
    lora = lora_lib.init_lora_tree(3, pipe.unet_params,
                                   lambda p: '/attn2/' in p, rank=4)
    lora = jax.tree.map(lambda a: a + 0.03, lora)
    lat = np.random.default_rng(11).normal(size=(1, 8, 8, 4)).astype(np.float32)
    kw = dict(height=64, width=64, num_inference_steps=2, latents=lat,
              output_type='latent')
    base = pipe('a <potter1> <potter2>', **kw)
    pipe.unet_lora, pipe.lora_alpha = lora, 0.0
    a0 = pipe('a <potter1> <potter2>', **kw)
    pipe.unet_lora, pipe.lora_alpha = lora, 1.0
    a1 = pipe('a <potter1> <potter2>', **kw)
    pipe.unet_lora = None
    np.testing.assert_allclose(base, a0, atol=1e-5)
    assert not np.allclose(base, a1, atol=1e-4)


def test_mesh_sharded_sampling_matches_single(pipe):
    """Batch-sharded sampling over the 8-device mesh == single-device."""
    from mixofshow_tpu.parallel import make_mesh
    lat = np.random.default_rng(9).normal(size=(8, 8, 8, 4)).astype(np.float32)
    prompts = ['a photo of <potter1> <potter2>'] * 8
    kw = dict(height=64, width=64, num_inference_steps=2, latents=lat,
              output_type='latent')
    single = pipe(prompts, **kw)
    pipe.mesh = make_mesh(8)
    sharded = pipe(prompts, **kw)
    pipe.mesh = None
    # fp32 reduction-order differences across devices; outputs are O(30)
    np.testing.assert_allclose(single, sharded, rtol=1e-4, atol=1e-3)
