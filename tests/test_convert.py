"""Checkpoint interop: export→import round trip, ED-LoRA delta mapping."""
import jax
import jax.numpy as jnp
import numpy as np

from mixofshow_tpu.convert.diffusers_export import (export_clip_text,
                                                    export_unet, export_vae,
                                                    save_pipeline_params)
from mixofshow_tpu.convert import (convert_clip_text, convert_edlora_delta,
                                   convert_unet, convert_vae,
                                   load_pipeline_params)
from mixofshow_tpu.models import (CLIPTextConfig, UNetConfig, VAEConfig,
                                  init_clip_text, init_unet, init_vae)
from mixofshow_tpu.models.lora import flatten_lora

TINY_U = UNetConfig.tiny()
TINY_V = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_groups=8)
TINY_C = CLIPTextConfig(width=64, layers=2, heads=2, mlp_dim=128,
                        vocab_size=500)


def _trees_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_unet_roundtrip():
    params = init_unet(0, TINY_U)
    sd = export_unet(params, TINY_U)
    # spot-check canonical diffusers key names and torch shape conventions
    assert 'down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight' in sd
    assert sd['conv_in.weight'].shape == (32, 4, 3, 3)  # OIHW
    assert 'mid_block.attentions.0.proj_in.weight' in sd
    assert 'up_blocks.1.attentions.2.transformer_blocks.0.ff.net.0.proj.bias' in sd
    back = convert_unet(sd, TINY_U)
    _trees_equal(params, back)


def test_vae_roundtrip():
    params = init_vae(0, TINY_V)
    sd = export_vae(params, TINY_V)
    assert 'encoder.mid_block.attentions.0.to_q.weight' in sd
    assert sd['encoder.mid_block.attentions.0.to_q.weight'].ndim == 2
    back = convert_vae(sd, TINY_V)
    _trees_equal(params, back)


def test_clip_roundtrip():
    params = init_clip_text(0, TINY_C)
    sd = export_clip_text(params, TINY_C)
    assert 'text_model.encoder.layers.1.self_attn.q_proj.weight' in sd
    assert sd['text_model.embeddings.token_embedding.weight'].shape == (500, 64)
    back = convert_clip_text(sd, TINY_C)
    _trees_equal(params, back)


def test_save_and_load_pipeline_dir(tmp_path):
    unet = init_unet(0, TINY_U)
    vae = init_vae(1, TINY_V)
    te = init_clip_text(2, TINY_C)
    save_pipeline_params(str(tmp_path), unet=unet, vae=vae, text_encoder=te,
                         new_concept_cfg={'<x>': {'concept_token_ids': [500]}})
    # load back through the directory loader (configs must be passed tiny)
    from mixofshow_tpu.convert.diffusers_import import (_find_weights,
                                                        load_state_dict)
    back = convert_unet(load_state_dict(
        _find_weights(str(tmp_path / 'unet'))), TINY_U)
    _trees_equal(unet, back)
    assert (tmp_path / 'new_concept_cfg.json').exists()


def test_edlora_delta_conversion():
    """Reference-style delta dict keys map to our LoRA tree paths."""
    r = np.random.default_rng(0)
    delta = {'params': {
        'new_concept_embedding': {'<potter1> <potter2>': r.normal(size=(16, 64))},
        'text_encoder': {
            'text_model.encoder.layers.3.self_attn.q_proj.lora_down.weight':
                r.normal(size=(4, 64)),   # torch (rank, in)
            'text_model.encoder.layers.3.self_attn.q_proj.lora_up.weight':
                r.normal(size=(64, 4)),   # torch (out, rank)
        },
        'unet': {
            'down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_k.lora_down.weight':
                r.normal(size=(4, 64)),
            'down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_k.lora_up.weight':
                r.normal(size=(32, 4)),
            'mid_block.attentions.0.transformer_blocks.0.attn1.to_out.0.lora_down.weight':
                r.normal(size=(4, 128)),
            'mid_block.attentions.0.transformer_blocks.0.attn1.to_out.0.lora_up.weight':
                r.normal(size=(128, 4)),
        },
    }}
    out = convert_edlora_delta(delta)
    assert '<potter1> <potter2>' in out['new_concept_embedding']
    assert out['new_concept_embedding']['<potter1> <potter2>'].shape == (16, 64)

    tl = flatten_lora(out['text_lora'])
    assert set(tl) == {'blocks/3/attn/q'}
    assert tl['blocks/3/attn/q']['down'].shape == (64, 4)  # ours (in, rank)
    assert tl['blocks/3/attn/q']['up'].shape == (4, 64)

    ul = flatten_lora(out['unet_lora'])
    assert set(ul) == {'down_blocks/0/attentions/1/attn2/to_k',
                       'mid/attention/attn1/to_out'}
    assert ul['down_blocks/0/attentions/1/attn2/to_k']['down'].shape == (64, 4)
    assert ul['down_blocks/0/attentions/1/attn2/to_k']['up'].shape == (4, 32)


def test_convert_edlora_merge_api():
    """Explicit deploy-time merge (reference convert_edlora_to_diffusers)."""
    from mixofshow_tpu.convert.convert_edlora import convert_edlora
    from mixofshow_tpu.models import lora as lora_lib
    from mixofshow_tpu.text import CLIPTokenizer
    import jax

    te = init_clip_text(0, TINY_C)
    unet = init_unet(1, TINY_U)
    text_lora = lora_lib.init_lora_tree(2, te, lambda p: '/attn/' in p)
    unet_lora = lora_lib.init_lora_tree(3, unet, lambda p: '/attn2/' in p)
    text_lora = jax.tree.map(lambda a: a + 0.02, text_lora)
    delta = {
        'new_concept_embedding': {'<x1>': np.ones((16, TINY_C.width))},
        'text_lora': text_lora, 'unet_lora': unet_lora,
    }
    tok = CLIPTokenizer()
    te2, unet2, cfg, table = convert_edlora(te, unet, tok, delta, alpha=0.7)
    assert cfg['<x1>']['concept_token_ids'][0] == 49408
    assert table.shape == (16, TINY_C.width)
    a = np.asarray(te['blocks'][0]['attn']['q']['kernel'])
    b = np.asarray(te2['blocks'][0]['attn']['q']['kernel'])
    assert not np.allclose(a, b)
    # alpha=0 leaves weights untouched
    te0, unet0, _, _ = convert_edlora(te, unet, CLIPTokenizer(), delta,
                                      alpha=0.0)
    np.testing.assert_array_equal(
        np.asarray(te0['blocks'][0]['attn']['q']['kernel']), a)


def test_train_state_checkpoint_roundtrip(tmp_path):
    from mixofshow_tpu.utils.checkpoint import (load_train_state,
                                                save_train_state)
    from mixofshow_tpu.pipelines.trainer_edlora import (EDLoRATrainer,
                                                        make_optimizer)
    from mixofshow_tpu.text import CLIPTokenizer
    from mixofshow_tpu.models import init_vae
    import jax
    import jax.numpy as jnp

    ft = {'text_embedding': {'enable_tuning': True, 'lr': 1e-3},
          'text_encoder': {'enable_tuning': True, 'lr': 1e-5,
                           'lora_cfg': {'rank': 4}},
          'unet': {'enable_tuning': True, 'lr': 1e-4,
                   'lora_cfg': {'rank': 4}}}
    tr = EDLoRATrainer(init_unet(0, TINY_U), init_clip_text(1, TINY_C),
                       init_vae(2, TINY_V), tokenizer=CLIPTokenizer(),
                       unet_config=TINY_U, text_config=TINY_C,
                       vae_config=TINY_V, new_concept_token='<x1>+<x2>',
                       initializer_token='<rand-0.01>+<rand-0.02>',
                       finetune_cfg=ft, compute_dtype=jnp.float32)
    opt = make_optimizer(ft, 10)
    state = tr.init_state(opt)
    import dataclasses
    state = dataclasses.replace(state, step=jnp.asarray(7, jnp.int32))
    save_train_state(str(tmp_path / 'ck'), state)
    restored = load_train_state(str(tmp_path / 'ck'), tr.init_state(opt))
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.trainable['concept_embedding']),
        np.asarray(state.trainable['concept_embedding']))
