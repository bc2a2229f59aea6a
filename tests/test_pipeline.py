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
               num_inference_steps=3, seed=0, output_type='np')
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_pipeline_attention_controller(pipe):
    """set_controller feeds the AttentionStore during sampling with maps
    whose grouping/shape match the training-capture convention (reference
    pipeline_edlora.py:107,292-295 + edlora.py:193-218)."""
    from mixofshow_tpu.models.unet import cross_layer_query_sizes
    from mixofshow_tpu.utils.ptp import AttentionStore

    store = AttentionStore(training=False, max_size=4)  # tiny UNet: res<=4
    pipe.set_controller(store)
    try:
        img = pipe('a photo of <potter1> <potter2>', height=64, width=64,
                   num_inference_steps=2, seed=0, output_type='np')
    finally:
        pipe.set_controller(None)
    assert np.isfinite(img).all()
    assert store.cur_step == 2
    avg = store.get_average_attention()
    expected = [(p, q) for p, _, q in cross_layer_query_sizes(U, 8, 8)
                if q <= 16]
    got = [(place.split('_')[0], m.shape[-2])
           for place, maps in sorted(avg.items()) for m in maps]
    assert sorted(got) == sorted(expected)
    for maps in avg.values():
        for m in maps:
            # (2B, heads, Q, 77), probabilities sum to 1 over keys
            assert m.shape[0] == 2 and m.shape[1] == U.attention_heads
            assert m.shape[-1] == 77
            np.testing.assert_allclose(m.sum(-1), 1.0, atol=1e-3)


def test_pipeline_callback_and_num_images(pipe):
    """Reference surface: num_images_per_prompt repeats samples; callback is
    invoked per step with host latents (pipeline_edlora.py:201-211)."""
    seen = []
    img = pipe('a photo of <potter1> <potter2>', height=64, width=64,
               num_inference_steps=2, seed=0, num_images_per_prompt=2,
               output_type='np',
               callback=lambda i, t, lat: seen.append((i, t, lat.shape)))
    assert img.shape == (2, 64, 64, 3)
    assert [s[0] for s in seen] == [0, 1]
    assert all(s[2] == (2, 8, 8, 4) for s in seen)


def test_pipeline_prompt_embeds_passthrough(pipe):
    """prompt_embeds bypasses encoding (reference pipeline_edlora.py:201)."""
    emb = pipe.encode_prompt('a photo of <potter1> <potter2>', None, True)
    img_a = pipe(prompt_embeds=emb, height=64, width=64,
                 num_inference_steps=2, seed=3, output_type='np')
    img_b = pipe('a photo of <potter1> <potter2>', height=64, width=64,
                 num_inference_steps=2, seed=3, output_type='np')
    np.testing.assert_allclose(img_a, img_b, atol=1e-5)


@pytest.mark.slow
def test_distributed_validation_pads_batches(tmp_path):
    """visual_validation with a mesh: batches pad to the 'data' axis, padding
    samples are dropped, per-image PNGs land on disk (the reference's
    multi-process validation split, test_edlora.py:24-57)."""
    from mixofshow_tpu.data import PromptDataset
    from mixofshow_tpu.parallel import make_mesh
    from mixofshow_tpu.pipelines.validation import visual_validation

    tok = CLIPTokenizer()
    te = init_clip_text(0, C)
    cfg, table = init_concepts(tok, '<v1> <v2>', None,
                               np.asarray(te['token_embedding']))
    mesh = make_mesh()
    assert mesh.shape['data'] == 8
    pipe_m = EDLoRAPipeline(
        init_unet(1, U), te, init_vae(2, V), tokenizer=tok,
        unet_config=U, text_config=C, vae_config=V,
        new_concept_cfg=cfg, concept_embedding=table,
        dtype=jnp.float32, mesh=mesh)
    ds = PromptDataset({'prompts': ['photo of a <v1> <v2>'],
                        'num_samples_per_prompt': 3,
                        'latent_size': [4, 8, 8]})
    opt = {'val': {'sample': {'num_inference_steps': 2,
                              'guidance_scale': 7.5},
                   'compose_visualize': False},
           'datasets': {'val_vis': {'batch_size_per_gpu': 3}},
           'path': {'visualization': str(tmp_path)}}
    visual_validation(pipe_m, ds, 'test', opt)
    import glob
    pngs = glob.glob(str(tmp_path / 'test' / '*.png'))
    assert len(pngs) == 3  # padding discarded, real samples written


def test_submit_result_matches_call(pipe):
    """Serving path: submit() dispatches without fetching; result() returns
    exactly what the synchronous __call__ produces."""
    lat = np.random.default_rng(13).normal(size=(1, 8, 8, 4)) \
        .astype(np.float32)
    kw = dict(height=64, width=64, num_inference_steps=2, latents=lat)
    sync = pipe('a photo of <potter1> <potter2>', output_type='np', **kw)
    pending = pipe.submit('a photo of <potter1> <potter2>',
                          output_type='np', **kw)
    np.testing.assert_allclose(pending.result(), sync, atol=1e-6)
    # pil variant returns PIL images of the right size
    imgs = pipe.submit('a photo of <potter1> <potter2>',
                       output_type='pil', **kw).result()
    assert len(imgs) == 1 and imgs[0].size == (64, 64)
