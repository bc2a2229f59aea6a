"""Fusion: anchored solver properties + 4-phase end-to-end on tiny models."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixofshow_tpu.convert.delta_io import save_edlora_delta
from mixofshow_tpu.ops.solve import anchored_spectral_solve, gram, solve_layer_group
from mixofshow_tpu.pipelines.trainer_edlora import EDLoRATrainer, make_optimizer
from mixofshow_tpu.text import CLIPTokenizer
from mixofshow_tpu.zoo import ModelBundle, tiny_configs
from mixofshow_tpu.models import init_clip_text, init_unet, init_vae


# ------------------------------------------------------------------ solver
def test_solver_overdetermined_recovers_target():
    r = np.random.default_rng(0)
    x = r.normal(size=(200, 16)).astype(np.float32)
    wt = r.normal(size=(16, 8)).astype(np.float32)
    w0 = np.zeros((16, 8), np.float32)
    g = x.T @ x
    d = g @ (wt - w0)
    wn = np.asarray(anchored_spectral_solve(
        jnp.asarray(g), jnp.asarray(d), jnp.asarray(w0), jnp.float32(1e-6),
        jnp.float32(1e-6)))
    np.testing.assert_allclose(wn, wt, atol=1e-3)


def test_solver_underdetermined_fits_rowspace_and_anchors():
    """Few constraint rows: solution must satisfy X Wn == X Wt while staying
    anchored to W0 off the row space (the LBFGS-from-W0 limit)."""
    r = np.random.default_rng(1)
    x = r.normal(size=(3, 32)).astype(np.float32)  # rank 3 << 32
    w0 = r.normal(size=(32, 4)).astype(np.float32)
    wt = r.normal(size=(32, 4)).astype(np.float32)
    g = x.T @ x
    d = g @ (wt - w0)
    wn = np.asarray(anchored_spectral_solve(
        jnp.asarray(g), jnp.asarray(d), jnp.asarray(w0), jnp.float32(1e-6),
        jnp.float32(1e-6)))
    np.testing.assert_allclose(x @ wn, x @ wt, atol=2e-2)  # fit on rows
    # off the row space, Wn stays at the anchor: project delta onto the
    # orthogonal complement of rowspace(X)
    q, _ = np.linalg.qr(x.T)  # (32, 3) basis of rowspace
    delta = wn - w0
    off = delta - q @ (q.T @ delta)
    assert np.abs(off).max() < 1e-2


def test_solver_multi_concept_average():
    """Two concepts with identical inputs: solution is the G-weighted
    compromise — with equal G, the plain average of the two targets."""
    r = np.random.default_rng(2)
    x = r.normal(size=(100, 8)).astype(np.float32)
    g = x.T @ x
    wa = r.normal(size=(8, 4)).astype(np.float32)
    wb = r.normal(size=(8, 4)).astype(np.float32)
    d = g @ wa + g @ wb  # w0 = 0 so deltas == targets
    wn = np.asarray(anchored_spectral_solve(
        jnp.asarray(2 * g), jnp.asarray(d), jnp.zeros((8, 4)),
        jnp.float32(1e-6), jnp.float32(1e-6)))
    np.testing.assert_allclose(wn, (wa + wb) / 2, atol=1e-3)


def test_gram_masking():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 5, 4)),
                    jnp.float32)
    mask = jnp.asarray([[1, 1, 0, 0, 0], [1, 0, 0, 0, 0]], jnp.float32)
    g = np.asarray(gram(x, mask))
    xm = np.asarray(x).reshape(10, 4)[np.asarray(mask).reshape(10) > 0]
    np.testing.assert_allclose(g, xm.T @ xm, atol=1e-4)


def test_solve_layer_group_batches_shapes():
    r = np.random.default_rng(4)
    grams, deltas, anchors = [], [], []
    for f, o in [(8, 8), (16, 4), (8, 8)]:
        x = r.normal(size=(50, f)).astype(np.float32)
        w = r.normal(size=(f, o)).astype(np.float32)
        g = x.T @ x
        grams.append(g)
        deltas.append(g @ w)
        anchors.append(np.zeros((f, o), np.float32))
    out = solve_layer_group(grams, deltas, anchors, lam=1e-6)
    assert [o.shape for o in out] == [(8, 8), (16, 4), (8, 8)]


# ------------------------------------------------------- 4-phase end-to-end
FT = {'text_embedding': {'enable_tuning': True, 'lr': 1e-3},
      'text_encoder': {'enable_tuning': True, 'lr': 1e-5,
                       'lora_cfg': {'rank': 4}},
      'unet': {'enable_tuning': True, 'lr': 1e-4,
               'lora_cfg': {'rank': 4}}}


def _make_concept_ckpt(path, token_a, token_b, seed):
    """Train-shaped delta with nonzero LoRA (one noisy step)."""
    ucfg, ccfg, vcfg = tiny_configs()
    tr = EDLoRATrainer(init_unet(seed, ucfg), init_clip_text(seed + 1, ccfg),
                       init_vae(seed + 2, vcfg), tokenizer=CLIPTokenizer(),
                       unet_config=ucfg, text_config=ccfg, vae_config=vcfg,
                       new_concept_token=f'{token_a}+{token_b}',
                       initializer_token='<rand-0.013>+<rand-0.017>',
                       finetune_cfg=FT, compute_dtype=jnp.float32, seed=seed)
    opt = make_optimizer(FT, 10)
    state = tr.init_state(opt)
    # give LoRA ups nonzero values so the delta actually changes weights
    bumped = jax.tree.map(lambda a: a + 0.01, state.trainable)
    import dataclasses
    state = dataclasses.replace(state, trainable=bumped)
    save_edlora_delta(path, tr.delta_state_dict(state))


@pytest.mark.slow
def test_compose_concepts_end_to_end(tmp_path):
    ucfg, ccfg, vcfg = tiny_configs()
    bundle = ModelBundle(
        unet=init_unet(0, ucfg), text_encoder=init_clip_text(1, ccfg),
        vae=init_vae(2, vcfg), tokenizer=CLIPTokenizer(),
        unet_config=ucfg, text_config=ccfg, vae_config=vcfg)

    ck_a = str(tmp_path / 'a.pth')
    ck_b = str(tmp_path / 'b.pth')
    _make_concept_ckpt(ck_a, '<a1>', '<a2>', seed=10)
    _make_concept_ckpt(ck_b, '<b1>', '<b2>', seed=20)
    cfg = [
        {'lora_path': ck_a, 'unet_alpha': 1.0, 'text_encoder_alpha': 1.0,
         'concept_name': '<a1> <a2>'},
        {'lora_path': ck_b, 'unet_alpha': 1.0, 'text_encoder_alpha': 1.0,
         'concept_name': '<b1> <b2>'},
    ]
    cfg_path = tmp_path / 'concepts.json'
    cfg_path.write_text(json.dumps(cfg))

    from mixofshow_tpu.fusion import compose_concepts
    ckpt, new_cfg = compose_concepts(
        str(cfg_path), None, str(tmp_path), suffix='test',
        spatial_steps=2, image_size=64, bundle=bundle)

    assert set(new_cfg) == {'<a1>', '<a2>', '<b1>', '<b2>'}
    assert new_cfg['<a1>']['concept_token_ids'] == list(range(49408, 49424))
    assert new_cfg['<b2>']['concept_token_ids'] == list(range(49456, 49472))
    assert os.path.exists(os.path.join(ckpt, 'new_concept_cfg.json'))
    assert os.path.exists(os.path.join(
        ckpt, 'unet', 'diffusion_pytorch_model.safetensors'))

    # fused checkpoint loads and samples
    from mixofshow_tpu.convert import load_pipeline_params
    from mixofshow_tpu.convert.diffusers_import import (convert_clip_text,
                                                        convert_unet,
                                                        convert_vae,
                                                        load_state_dict,
                                                        _find_weights)
    import dataclasses as dc
    ccfg_big = dc.replace(ccfg, vocab_size=49408 + 64)
    te = convert_clip_text(load_state_dict(
        _find_weights(os.path.join(ckpt, 'text_encoder'))), ccfg_big)
    assert te['token_embedding'].shape[0] == 49408 + 64

    unet = convert_unet(load_state_dict(
        _find_weights(os.path.join(ckpt, 'unet'))), ucfg)
    # fused weights differ from base where LoRA existed
    a = np.asarray(bundle.unet['mid']['attention']['attn2']['to_k']['kernel'])
    b = np.asarray(unet['mid']['attention']['attn2']['to_k']['kernel'])
    assert not np.allclose(a, b, atol=1e-6)

    from mixofshow_tpu.pipelines import EDLoRAPipeline
    tok = CLIPTokenizer()
    tok.add_tokens([f'<new{i}>' for i in range(64)])
    pipe = EDLoRAPipeline(unet, te, convert_vae(load_state_dict(
        _find_weights(os.path.join(ckpt, 'vae'))), vcfg),
        tokenizer=tok, unet_config=ucfg, text_config=ccfg_big,
        vae_config=vcfg, new_concept_cfg=new_cfg, dtype=jnp.float32)
    img = pipe('a photo of <a1> <a2> and <b1> <b2>', height=64, width=64,
               num_inference_steps=2, seed=0, output_type='np')
    assert img.shape == (1, 64, 64, 3) and np.isfinite(img).all()


def test_spatial_phase_covers_ff_and_proj(caplog):
    """Phase 4 must solve the reference's FULL candidate list — ff.net.*,
    proj_in, proj_out included (reference gradient_fusion.py:637-641) — when
    a (reference-trained) delta carries those layers. Exercises the torch-key
    import path, the gram capture points, and the 1x1-conv kernel solve."""
    import logging
    from mixofshow_tpu.convert.diffusers_import import convert_edlora_delta
    from mixofshow_tpu.fusion.gradient_fusion import (merge_new_concepts,
                                                      merge_spatial_attention)

    ucfg, ccfg, vcfg = tiny_configs()
    unet = init_unet(0, ucfg)
    te = init_clip_text(1, ccfg)
    tok = CLIPTokenizer()
    r = np.random.default_rng(5)
    c0 = ucfg.block_out_channels[0]
    inner = 4 * c0
    prefix = 'down_blocks.0.attentions.0'

    def lin_pair(i, o):  # torch Linear LoRA: down (r, in), up (out, r)
        return {'lora_down.weight': 0.1 * r.normal(size=(4, i)).astype('f'),
                'lora_up.weight': 0.1 * r.normal(size=(o, 4)).astype('f')}

    def conv_pair(i, o):  # torch 1x1 Conv2d LoRA: 4-dim weights
        return {'lora_down.weight':
                0.1 * r.normal(size=(4, i, 1, 1)).astype('f'),
                'lora_up.weight':
                0.1 * r.normal(size=(o, 4, 1, 1)).astype('f')}

    unet_delta = {}
    mods = {
        f'{prefix}.transformer_blocks.0.ff.net.0.proj':
            lin_pair(c0, 2 * inner),
        f'{prefix}.transformer_blocks.0.ff.net.2': lin_pair(inner, c0),
        f'{prefix}.proj_in': conv_pair(c0, c0),
        f'{prefix}.proj_out': conv_pair(c0, c0),
        f'{prefix}.transformer_blocks.0.attn1.to_q': lin_pair(c0, c0),
    }
    for mod, pair in mods.items():
        for k, v in pair.items():
            unet_delta[f'{mod}.{k}'] = v
    hidden = np.asarray(te['token_embedding']).shape[1]
    delta = {'params': {
        'new_concept_embedding':
            {'<z1>': 0.01 * r.normal(size=(16, hidden)).astype('f')},
        'text_encoder': {}, 'unet': unet_delta}}

    out = convert_edlora_delta(delta)
    expected_paths = {
        'down_blocks/0/attentions/0/ff/proj',
        'down_blocks/0/attentions/0/ff/out',
        'down_blocks/0/attentions/0/proj_in',
        'down_blocks/0/attentions/0/proj_out',
        'down_blocks/0/attentions/0/attn1/to_q',
    }
    from mixofshow_tpu.models.lora import flatten_lora
    assert set(flatten_lora(out['unet_lora'])) == expected_paths

    parsed = [{'embedding': out['new_concept_embedding'],
               'text_lora': {}, 'unet_crosskv': {},
               'unet_spatial': out['unet_lora']}]
    concept_list = [{'lora_path': 'inline', 'concept_name': '<z1>',
                     'unet_alpha': 1.0}]
    new_cfg, table = merge_new_concepts(parsed, concept_list, tok)
    with caplog.at_level(logging.WARNING, logger='mixofshow_tpu'):
        new_unet, solved = merge_spatial_attention(
            parsed, concept_list, new_cfg, tok, te, ccfg, table, unet, ucfg,
            num_inference_steps=2, record_nums=2,
            image_size=8 * ucfg.sample_size, compute_dtype=jnp.float32)
    assert 'no capture point' not in caplog.text
    assert set(solved) == expected_paths
    from mixofshow_tpu.models.lora import get_path
    for p in expected_paths:
        old = np.asarray(get_path(unet, p)['kernel'])
        new = np.asarray(get_path(new_unet, p)['kernel'])
        assert old.shape == new.shape
        assert not np.allclose(old, new, atol=1e-7), f'{p} not updated'


def test_lbfgs_path_matches_spectral():
    """The iterative LBFGS parity path converges to the exact solve."""
    r = np.random.default_rng(7)
    x = r.normal(size=(100, 16)).astype(np.float32)
    g = x.T @ x
    w0 = r.normal(size=(16, 8)).astype(np.float32)
    wt = r.normal(size=(16, 8)).astype(np.float32)
    d = g @ (wt - w0)
    exact = solve_layer_group([g], [d], [w0], method='exact')[0]
    lbfgs = solve_layer_group([g], [d], [w0], method='lbfgs', iters=100)[0]
    np.testing.assert_allclose(lbfgs, exact, atol=5e-2, rtol=5e-2)
