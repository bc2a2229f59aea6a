"""int8 serving quantization (ops/quant.py) — numerics and routing.

The quantized dense pool is an opt-in serving mode beyond the reference
surface (it samples fp16 — SURVEY.md §6); these tests pin the quantization
math (exactness on representable inputs, error bounds on random ones) and
that the `wq`-presence routing reaches every intended site without
disturbing unquantized paths.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mixofshow_tpu.models import (CLIPTextConfig, UNetConfig, VAEConfig,
                                  init_clip_text, init_unet, init_vae)
from mixofshow_tpu.models.layers import dense
from mixofshow_tpu.models.unet import unet_apply
from mixofshow_tpu.ops.quant import int8_matmul, quantize_dense, quantize_unet

U = UNetConfig.tiny()


def test_int8_matmul_exact_on_representable():
    # integer weights/activations within [-127, 127] survive the round trip
    rng = np.random.default_rng(0)
    x = rng.integers(-50, 50, (4, 8)).astype(np.float32)
    x[:, 0] = 127.0  # pin the per-row absmax so scales are exactly 1
    w = rng.integers(-100, 100, (8, 6)).astype(np.float32)
    w[0, :] = 127.0  # pin the per-column absmax likewise
    q = quantize_dense({'kernel': w})
    out = int8_matmul(jnp.asarray(x), q['wq'], q['wscale'],
                      out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), x @ w, rtol=1e-6)


def test_int8_matmul_error_bound_random():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 96)).astype(np.float32)
    w = rng.normal(size=(96, 80)).astype(np.float32)
    q = quantize_dense({'kernel': w})
    out = np.asarray(int8_matmul(jnp.asarray(x), q['wq'], q['wscale'],
                                 out_dtype=jnp.float32))
    ref = x @ w
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel  # 8-bit symmetric quant: ~1% typical on gaussians


def test_dense_routes_on_wq_and_lora_stays_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    p = {'kernel': rng.normal(size=(16, 8)).astype(np.float32),
         'bias': rng.normal(size=(8,)).astype(np.float32)}
    lora = {'down': rng.normal(size=(16, 2)).astype(np.float32),
            'up': rng.normal(size=(2, 8)).astype(np.float32)}
    base = np.asarray(dense(p, x))
    quant = np.asarray(dense(quantize_dense(p), x))
    assert not np.allclose(base, quant, atol=1e-7)  # int8 path was taken
    assert np.linalg.norm(base - quant) / np.linalg.norm(base) < 0.05
    # the LoRA delta rides on top in full precision: quant(base)+delta
    delta = np.asarray(dense(quantize_dense(p), x, lora=lora, alpha=2.0)) - quant
    ref_delta = 2.0 * np.asarray(x) @ lora['down'] @ lora['up']
    np.testing.assert_allclose(delta, ref_delta, rtol=1e-4, atol=1e-5)


def test_quantize_unet_sites_and_forward():
    params = init_unet(0, U)
    qparams = quantize_unet(params)

    # every transformer dense site carries wq/wscale; nothing else does
    sites = []

    def walk(node, path):
        if isinstance(node, dict):
            if 'wq' in node:
                sites.append(path)
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v, path)
    walk(qparams, ())
    assert sites, 'no quantized sites found'
    for path in sites:
        assert path[-2] in ('attn1', 'attn2', 'ff'), path
        assert path[-1] in ('to_q', 'to_k', 'to_v', 'to_out', 'proj', 'out')
    n_attn = sum(path[-2] in ('attn1', 'attn2') for path in sites)
    n_ff = sum(path[-2] == 'ff' for path in sites)
    # per transformer block: 2 attn x 4 projections + 2 GEGLU linears,
    # across ALL 16 SD1.x transformer layers (down/mid/up lists included)
    from mixofshow_tpu.pipelines.concepts import NUM_CROSS_ATTENTION_LAYERS
    assert n_ff == 2 * NUM_CROSS_ATTENTION_LAYERS
    assert n_attn == 4 * n_ff

    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, 16, 16, 4)).astype(np.float32))
    ctx = jnp.asarray(np.random.default_rng(4).normal(
        size=(1, 77, U.cross_attention_dim)).astype(np.float32))
    t = jnp.asarray([10])
    base = np.asarray(unet_apply(params, x, t, ctx, U)[0])
    quant = np.asarray(unet_apply(qparams, x, t, ctx, U)[0])
    assert np.isfinite(quant).all()
    assert not np.allclose(base, quant, atol=1e-7)
    # random-weight tiny UNet: quantization noise stays small end to end
    rel = np.linalg.norm(base - quant) / np.linalg.norm(base)
    assert rel < 0.08, rel


def test_pipeline_quantized_smoke():
    from mixofshow_tpu.pipelines import EDLoRAPipeline, init_concepts
    from mixofshow_tpu.text import CLIPTokenizer
    C = CLIPTextConfig(width=U.cross_attention_dim, layers=2, heads=2,
                       mlp_dim=128, vocab_size=49408)
    V = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_groups=8)
    tok = CLIPTokenizer()
    te = init_clip_text(0, C)
    cfg, table = init_concepts(tok, '<q1> <q2>', None,
                               np.asarray(te['token_embedding']))
    pipe = EDLoRAPipeline(init_unet(1, U), te, init_vae(2, V), tokenizer=tok,
                          unet_config=U, text_config=C, vae_config=V,
                          new_concept_cfg=cfg, concept_embedding=table,
                          dtype=jnp.float32, quantize='int8')
    img = pipe('a photo of <q1> <q2>', height=64, width=64,
               num_inference_steps=2, seed=0, output_type='np')
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(img).all()
    with pytest.raises(ValueError):
        EDLoRAPipeline(init_unet(1, U), te, init_vae(2, V), tokenizer=tok,
                       unet_config=U, text_config=C, vae_config=V,
                       quantize='int4')


def test_regional_pipeline_quantized_smoke():
    """The regional pipeline shares the wq routing; the region-rewrite
    override path computes its projections through layers.dense and so
    inherits the int8 base matmuls."""
    import dataclasses

    from mixofshow_tpu.models.t2i_adapter import (T2IAdapterConfig,
                                                  init_t2i_adapter)
    from mixofshow_tpu.pipelines import (RegionallyT2IAdapterPipeline,
                                         init_concepts)
    from mixofshow_tpu.text import CLIPTokenizer
    C = CLIPTextConfig(width=U.cross_attention_dim, layers=2, heads=2,
                       mlp_dim=128, vocab_size=49408)
    V = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_groups=8)
    tok = CLIPTokenizer()
    te = init_clip_text(0, C)
    cfg, table = init_concepts(tok, '<r1> <r2>', None,
                               np.asarray(te['token_embedding']))
    te = dict(te)
    te['token_embedding'] = np.concatenate(
        [np.asarray(te['token_embedding']), np.asarray(table)])
    big_c = dataclasses.replace(C, vocab_size=49408 + 16)
    pipe = RegionallyT2IAdapterPipeline(
        init_unet(1, U), te, init_vae(2, V), tokenizer=tok,
        unet_config=U, text_config=big_c, vae_config=V,
        new_concept_cfg=cfg,
        keypose_adapter=init_t2i_adapter(3, T2IAdapterConfig.tiny(3)),
        keypose_config=T2IAdapterConfig.tiny(3),
        dtype=jnp.float32, quantize='int8')
    prompt = [('a scene', [('a <r1> <r2>', 'bad', [0.1, 0.1, 0.9, 0.5])])]
    img = pipe(prompt, keypose_adapter_input=np.zeros((64, 64, 3), np.uint8),
               height=64, width=64, num_inference_steps=2, seed=0,
               output_type='np')
    assert img.shape == (1, 64, 64, 3) and np.isfinite(img).all()


def test_int8_conv_and_conv_mode():
    from mixofshow_tpu.models.layers import conv2d
    from mixofshow_tpu.ops.quant import int8_conv, quantize_conv
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    p = {'kernel': rng.normal(size=(3, 3, 16, 12)).astype(np.float32),
         'bias': rng.normal(size=(12,)).astype(np.float32)}
    base = np.asarray(conv2d(p, x))
    quant = np.asarray(conv2d(quantize_conv(p), x))
    assert not np.allclose(base, quant, atol=1e-7)
    rel = np.linalg.norm(base - quant) / np.linalg.norm(base)
    assert rel < 0.05, rel

    # int8+conv quantizes resnet convs on top of the dense pool
    params = init_unet(0, U)
    q = quantize_unet(params, convs=True)
    convs = []

    def walk(node, path):
        if isinstance(node, dict):
            if 'wq' in node and node['wq'].ndim == 4:
                convs.append(path)
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v, path)
    walk(q, ())
    assert convs and all(p[-1] in ('conv1', 'conv2') for p in convs)
    x = jnp.asarray(np.random.default_rng(6).normal(
        size=(1, 16, 16, 4)).astype(np.float32))
    ctx = jnp.asarray(np.random.default_rng(7).normal(
        size=(1, 77, U.cross_attention_dim)).astype(np.float32))
    out = np.asarray(unet_apply(q, x, jnp.asarray([5]), ctx, U)[0])
    assert np.isfinite(out).all()
