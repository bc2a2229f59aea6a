"""Regional pipeline: box masks, region rewrite semantics, adapter weights,
T2I-Adapter shapes, end-to-end sampling."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixofshow_tpu.models import (CLIPTextConfig, UNetConfig, VAEConfig,
                                  init_clip_text, init_unet, init_vae)
from mixofshow_tpu.models.t2i_adapter import (T2IAdapterConfig,
                                              init_t2i_adapter,
                                              pixel_unshuffle,
                                              t2i_adapter_apply)
from mixofshow_tpu.pipelines import RegionallyT2IAdapterPipeline, init_concepts
from mixofshow_tpu.pipelines.pipeline_regional import (_box_mask,
                                                       parse_region_weight_spec)
from mixofshow_tpu.text import CLIPTokenizer

U = UNetConfig.tiny()
C = CLIPTextConfig(width=U.cross_attention_dim, layers=2, heads=2,
                   mlp_dim=128, vocab_size=49408)
V = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_groups=8)


def test_box_mask_rounding():
    m = np.asarray(_box_mask(jnp.asarray([0.25, 0.5, 0.75, 1.0]), 8, 8))
    # ceil(0.25*8)=2, floor(0.75*8)=6, ceil(0.5*8)=4, floor(1.0*8)=8
    assert m[2:6, 4:8].all() and m.sum() == 4 * 4


def test_parse_region_weight_spec():
    wmap = parse_region_weight_spec('[0, 0, 256, 256]-0.5|[256,256,512,512]-2.0',
                                    512, 512, 8, 8, base_weight=1.0)
    assert wmap[0, 0] == 0.5 and wmap[7, 7] == 2.0 and wmap[0, 7] == 1.0


def test_pixel_unshuffle_matches_torch():
    import torch
    x = np.random.default_rng(0).normal(size=(1, 3, 16, 16)).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 8))
    theirs = torch.pixel_unshuffle(torch.from_numpy(x), 8).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), atol=1e-6)


def test_t2i_adapter_shapes():
    cfg = T2IAdapterConfig.tiny()
    params = init_t2i_adapter(0, cfg)
    feats = t2i_adapter_apply(params, jnp.zeros((1, 64, 64, 3)), cfg)
    assert [f.shape for f in feats] == [
        (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128), (1, 1, 1, 128)]


@pytest.fixture(scope='module')
def pipe():
    tok = CLIPTokenizer()
    te = init_clip_text(0, C)
    cfg_a, table_a = init_concepts(tok, '<a1> <a2>', None,
                                   np.asarray(te['token_embedding']))
    # fused checkpoints carry the concept rows inside the expanded table;
    # emulate that by concatenating and enlarging the config vocab
    te = dict(te)
    te['token_embedding'] = jnp.concatenate(
        [jnp.asarray(te['token_embedding']), jnp.asarray(table_a)])
    big_c = dataclasses.replace(C, vocab_size=49408 + 16)
    return RegionallyT2IAdapterPipeline(
        init_unet(1, U), te, init_vae(2, V), tokenizer=tok,
        unet_config=U, text_config=big_c, vae_config=V,
        new_concept_cfg=cfg_a,
        keypose_adapter=init_t2i_adapter(3, T2IAdapterConfig.tiny(3)),
        keypose_config=T2IAdapterConfig.tiny(3),
        sketch_adapter=init_t2i_adapter(4, T2IAdapterConfig.tiny(1)),
        sketch_config=T2IAdapterConfig.tiny(1),
        dtype=jnp.float32)


def _prompt(regions):
    return [('two people near a lake', regions)]


def test_regional_sampling_no_regions(pipe):
    img = pipe(_prompt([]), height=64, width=64, num_inference_steps=2,
               seed=0, output_type='np')
    assert img.shape == (1, 64, 64, 3) and np.isfinite(img).all()


def test_regional_sampling_with_regions_and_adapters(pipe):
    from PIL import Image
    regions = [
        ('a <a1> <a2> person', 'lowres', [0.0, 0.0, 1.0, 0.5]),
        ('a tree', '', [0.0, 0.5, 1.0, 1.0]),
    ]
    keypose = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    img = pipe(_prompt(regions), height=64, width=64, num_inference_steps=2,
               keypose_adapter_input=[keypose], keypose_adaptor_weight=0.8,
               region_keypose_adaptor_weight='[0,0,32,32]-0.5',
               seed=0, output_type='np')
    assert img.shape == (1, 64, 64, 3) and np.isfinite(img).all()


def test_region_rewrite_changes_inside_box_only(pipe):
    """With a half-image box, latents inside the box must differ from the
    no-region run; the pure-context half should stay close at step 1."""
    lat = np.random.default_rng(3).normal(size=(1, 8, 8, 4)).astype(np.float32)
    base = pipe(_prompt([]), height=64, width=64, num_inference_steps=1,
                latents=lat, output_type='latent')
    regions = [('a <a1> <a2> person', '', [0.0, 0.0, 1.0, 0.5])]
    reg = pipe(_prompt(regions), height=64, width=64, num_inference_steps=1,
               latents=lat, output_type='latent')
    # inside (left half) must change
    assert not np.allclose(base[:, :, :4], reg[:, :, :4], atol=1e-4)
    # outside keeps the context attention result, but self-attention/convs
    # propagate some change across the image within one UNet forward — so
    # assert the inside effect dominates rather than exact equality
    d_in = np.abs(base[:, :, :4] - reg[:, :, :4]).mean()
    d_out = np.abs(base[:, :, 4:] - reg[:, :, 4:]).mean()
    assert d_in > d_out


def test_regional_num_images_per_prompt_matches_separate_runs(pipe):
    """Batched sampling (reference num_images_per_prompt surface,
    …t2iadapter.py:316,460) must equal per-image runs on the same latents:
    images are independent rows through every batched op."""
    regions = [('a <a1> <a2> person', 'lowres', [0.0, 0.0, 1.0, 0.5])]
    lat = np.random.default_rng(7).normal(size=(2, 8, 8, 4)).astype(
        np.float32)
    batched = pipe(_prompt(regions), height=64, width=64,
                   num_inference_steps=2, num_images_per_prompt=2,
                   latents=lat, output_type='latent')
    assert batched.shape == (2, 8, 8, 4) and np.isfinite(batched).all()
    for i in range(2):
        single = pipe(_prompt(regions), height=64, width=64,
                      num_inference_steps=2, latents=lat[i:i + 1],
                      output_type='latent')
        np.testing.assert_allclose(batched[i:i + 1], single, atol=2e-4)
    # different noise → different images
    assert not np.allclose(batched[0], batched[1], atol=1e-3)


def test_regional_num_images_with_adapter_and_seeded_noise(pipe):
    from PIL import Image
    regions = [('a <a1> <a2> person', '', [0.0, 0.0, 1.0, 0.5])]
    keypose = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    imgs = pipe(_prompt(regions), height=64, width=64,
                num_inference_steps=1, num_images_per_prompt=3,
                keypose_adapter_input=[keypose], seed=11, output_type='pil')
    assert len(imgs) == 3
    assert all(np.asarray(im).shape == (64, 64, 3) for im in imgs)


def test_regional_submit_matches_call(pipe):
    """submit() defers fetch but must produce identical images."""
    regions = [('a <a1> <a2>', '', [0.0, 0.5, 1.0, 1.0])]
    want = pipe(_prompt(regions), height=64, width=64,
                num_inference_steps=2, seed=4, output_type='np')
    pend = pipe.submit(_prompt(regions), height=64, width=64,
                       num_inference_steps=2, seed=4, output_type='np')
    got = pend.result()
    np.testing.assert_array_equal(want, got)


def test_region_layouts_share_compiled_program(pipe):
    """Same region COUNT, different boxes → no recompile (traced boxes)."""
    lat = np.random.default_rng(5).normal(size=(1, 8, 8, 4)).astype(np.float32)
    r1 = [('a <a1> <a2>', '', [0.0, 0.0, 1.0, 0.5])]
    r2 = [('a <a1> <a2>', '', [0.5, 0.5, 1.0, 1.0])]
    from mixofshow_tpu.pipelines.pipeline_regional import _regional_sample_loop
    before = _regional_sample_loop._cache_size()
    pipe(_prompt(r1), height=64, width=64, num_inference_steps=1,
         latents=lat, output_type='latent')
    mid = _regional_sample_loop._cache_size()
    pipe(_prompt(r2), height=64, width=64, num_inference_steps=1,
         latents=lat, output_type='latent')
    after = _regional_sample_loop._cache_size()
    assert after == mid  # second layout hit the cache


def test_region_kernel_matches_xla_fallback():
    """The Pallas region kernel (interpret mode on CPU) must reproduce the
    XLA full-grid+mask path exactly up to bf16 matmul rounding — attention
    is row-independent, so both equal the reference's sliced-box rewrite."""
    from mixofshow_tpu.pipelines.pipeline_regional import make_region_override
    rng = np.random.default_rng(0)
    heads, d, sk = 2, 16, 77
    c = heads * d
    h = w = 16
    b, n = 2, h * w

    def lin(cin, cout, bias=False):
        p = {'kernel': rng.normal(0, 0.05, (cin, cout)).astype(np.float32)}
        if bias:
            p['bias'] = rng.normal(0, 0.05, (cout,)).astype(np.float32)
        return p

    p = {'to_q': lin(c, c), 'to_k': lin(c, c), 'to_v': lin(c, c),
         'to_out': lin(c, c, bias=True)}
    x = jnp.asarray(rng.normal(0, 1, (b, n, c)), jnp.float32)
    ctx = jnp.asarray(rng.normal(0, 1, (b, sk, c)), jnp.float32)
    regions = [
        (jnp.asarray(rng.normal(0, 1, (b, sk, c)), jnp.float32),
         jnp.asarray([0.0, 0.0, 1.0, 0.5], jnp.float32)),
        (jnp.asarray(rng.normal(0, 1, (b, sk, c)), jnp.float32),
         jnp.asarray([0.25, 0.25, 0.875, 1.0], jnp.float32)),
    ]
    # precise mode (fp32 kernel matmuls): tight equivalence
    o_precise = make_region_override(regions, heads, use_kernel=True,
                                     precise=True)(
        p, x, ctx, 0, 'down', (h, w), None, 1.0)
    o_xla = make_region_override(regions, heads, use_kernel=False)(
        p, x, ctx, 0, 'down', (h, w), None, 1.0)
    np.testing.assert_allclose(np.asarray(o_precise), np.asarray(o_xla),
                               atol=2e-4, rtol=1e-3)
    # default mode (bf16 matmul inputs, the TPU configuration): loose bound
    o_kernel = make_region_override(regions, heads, use_kernel=True)(
        p, x, ctx, 0, 'down', (h, w), None, 1.0)
    np.testing.assert_allclose(np.asarray(o_kernel), np.asarray(o_xla),
                               atol=0.05, rtol=0.05)
    assert not np.allclose(np.asarray(o_kernel), 0.0)


def test_convert_t2i_adapter_original_pth_layout():
    """The original TencentARC flat `.pth` layout (body.{k}.block1…) must
    convert identically to the equivalent diffusers layout
    (adapter.body.{i}.resnets.{j}…)."""
    from mixofshow_tpu.models.t2i_adapter import convert_t2i_adapter
    cfg = T2IAdapterConfig.tiny()  # channels (32,64,128,128), 1 res block
    rng = np.random.default_rng(7)
    r2 = cfg.downscale_factor ** 2

    def w(cout, cin, k):
        return rng.normal(0, 0.02, (cout, cin, k, k)).astype(np.float32)

    orig, diff = {}, {}
    orig['conv_in.weight'] = diff['adapter.conv_in.weight'] = \
        w(cfg.channels[0], cfg.in_channels * r2, 3)
    orig['conv_in.bias'] = diff['adapter.conv_in.bias'] = \
        rng.normal(size=cfg.channels[0]).astype(np.float32)
    cin = cfg.channels[0]
    for i, cout in enumerate(cfg.channels):
        k = i * cfg.num_res_blocks
        if cin != cout:
            orig[f'body.{k}.in_conv.weight'] = \
                diff[f'adapter.body.{i}.in_conv.weight'] = w(cout, cin, 1)
            orig[f'body.{k}.in_conv.bias'] = \
                diff[f'adapter.body.{i}.in_conv.bias'] = \
                rng.normal(size=cout).astype(np.float32)
        for j in range(cfg.num_res_blocks):
            for name, ksz in (('block1', 3), ('block2', 1)):
                orig[f'body.{k + j}.{name}.weight'] = \
                    diff[f'adapter.body.{i}.resnets.{j}.{name}.weight'] = \
                    w(cout, cout, ksz)
                orig[f'body.{k + j}.{name}.bias'] = \
                    diff[f'adapter.body.{i}.resnets.{j}.{name}.bias'] = \
                    rng.normal(size=cout).astype(np.float32)
        cin = cout

    p_orig = convert_t2i_adapter(orig, cfg)
    p_diff = convert_t2i_adapter(diff, cfg)
    jax.tree.map(np.testing.assert_array_equal, p_orig, p_diff)

    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, cfg.in_channels)),
                    jnp.float32)
    feats = t2i_adapter_apply(p_orig, x, cfg)
    assert [f.shape for f in feats] == [
        (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128), (1, 1, 1, 128)]

    with pytest.raises(ValueError):
        convert_t2i_adapter({'body.0.skep.weight': w(32, 32, 1),
                             'body.0.block1.weight': w(32, 32, 3)}, cfg)


def test_encode_region_prompt_batched_equals_per_text(pipe):
    """The single batched CLIP dispatch (all layerwise binds + negatives in
    one (N,77) call) must equal encoding each prompt separately — images
    are independent rows through the text encoder. Guards the r5 encode
    batching (reference per-prompt path …t2iadapter.py:215-299)."""
    from mixofshow_tpu.models.clip import clip_text_encode
    from mixofshow_tpu.pipelines.concepts import bind_concept_prompt

    regions = [('a <a1> <a2> person', 'lowres', [0.0, 0.0, 1.0, 0.5]),
               ('a tree', '', [0.0, 0.5, 1.0, 1.0])]
    pipe._encode_memo = None
    pe, rl = pipe.encode_region_prompt(_prompt(regions), 'bad quality')

    def lw(text):
        ids = jnp.asarray(pipe.tokenizer(
            bind_concept_prompt([text], pipe.new_concept_cfg)))
        e = clip_text_encode(pipe.text_encoder_params, ids, pipe.text_config)
        return e.reshape(1, 16, *e.shape[1:])

    def plain(text):
        ids = jnp.asarray(pipe.tokenizer([text]))
        e = clip_text_encode(pipe.text_encoder_params, ids, pipe.text_config)
        return jnp.broadcast_to(e[:, None], (1, 16, *e.shape[1:]))

    want_ctx = np.concatenate([plain('bad quality'),
                               lw('two people near a lake')])
    np.testing.assert_allclose(np.asarray(pe), want_ctx, atol=2e-5)
    assert len(rl) == 2
    for (embeds, box), (rtext, rneg, rbox) in zip(rl, regions):
        want = np.concatenate([plain(rneg or ''), lw(rtext)])
        np.testing.assert_allclose(np.asarray(embeds), want, atol=2e-5)
        np.testing.assert_allclose(np.asarray(box), rbox)


def test_encode_region_prompt_memo(pipe):
    """Memo: same layout text → identical cached objects (no re-encode);
    any text change or a concept-cfg reset → fresh encode."""
    regions = [('a <a1> <a2> person', '', [0.0, 0.0, 1.0, 0.5])]
    pipe._encode_memo = None
    pe1, rl1 = pipe.encode_region_prompt(_prompt(regions), 'neg')
    pe2, rl2 = pipe.encode_region_prompt(_prompt(regions), 'neg')
    assert pe2 is pe1 and rl2[0][0] is rl1[0][0]  # memo hit

    pe3, _ = pipe.encode_region_prompt(_prompt(regions), 'other neg')
    assert pe3 is not pe1  # text change re-encodes
    # the positive context is unchanged, only the negative rows moved
    np.testing.assert_allclose(np.asarray(pe3[1]), np.asarray(pe1[1]),
                               atol=2e-5)

    pipe.set_new_concept_cfg(pipe.new_concept_cfg)  # cfg reset clears memo
    assert pipe._encode_memo is None
