"""Export our param trees → diffusers-layout checkpoints.

Inverse of diffusers_import: lets fused checkpoints produced by this
framework be consumed by diffusers users (the reference saves fused models
with pipe.save_pretrained at gradient_fusion.py:810-813; this is our
equivalent surface). Written as .safetensors via safetensors.numpy — no
torch dependency on the save path.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from mixofshow_tpu.models.clip import CLIPTextConfig
from mixofshow_tpu.models.unet import UNetConfig
from mixofshow_tpu.models.vae import VAEConfig


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _put_lin(sd, key, p):
    sd[f'{key}.weight'] = _np(p['kernel']).T
    if 'bias' in p:
        sd[f'{key}.bias'] = _np(p['bias'])


def _put_conv(sd, key, p):
    sd[f'{key}.weight'] = _np(p['kernel']).transpose(3, 2, 0, 1)
    if 'bias' in p:
        sd[f'{key}.bias'] = _np(p['bias'])


def _put_norm(sd, key, p):
    sd[f'{key}.weight'] = _np(p['scale'])
    sd[f'{key}.bias'] = _np(p['bias'])


# ------------------------------------------------------------------ CLIP
def export_clip_text(params, cfg: CLIPTextConfig = CLIPTextConfig()):
    sd: Dict[str, np.ndarray] = {}
    pre = 'text_model.'
    sd[f'{pre}embeddings.token_embedding.weight'] = _np(params['token_embedding'])
    sd[f'{pre}embeddings.position_embedding.weight'] = _np(params['position_embedding'])
    _put_norm(sd, f'{pre}final_layer_norm', params['final_norm'])
    for i, blk in enumerate(params['blocks']):
        b = f'{pre}encoder.layers.{i}.'
        _put_norm(sd, b + 'layer_norm1', blk['ln1'])
        _put_lin(sd, b + 'self_attn.q_proj', blk['attn']['q'])
        _put_lin(sd, b + 'self_attn.k_proj', blk['attn']['k'])
        _put_lin(sd, b + 'self_attn.v_proj', blk['attn']['v'])
        _put_lin(sd, b + 'self_attn.out_proj', blk['attn']['out'])
        _put_norm(sd, b + 'layer_norm2', blk['ln2'])
        _put_lin(sd, b + 'mlp.fc1', blk['mlp']['fc1'])
        _put_lin(sd, b + 'mlp.fc2', blk['mlp']['fc2'])
    return sd


# ------------------------------------------------------------------- VAE
def _put_vae_resnet(sd, key, p):
    _put_norm(sd, key + '.norm1', p['norm1'])
    _put_conv(sd, key + '.conv1', p['conv1'])
    _put_norm(sd, key + '.norm2', p['norm2'])
    _put_conv(sd, key + '.conv2', p['conv2'])
    if 'shortcut' in p:
        _put_conv(sd, key + '.conv_shortcut', p['shortcut'])


def _put_vae_attn(sd, key, p):
    _put_norm(sd, key + '.group_norm', p['norm'])
    # export in the modern Linear (to_q/.../to_out.0) form
    for ours, theirs in (('q', 'to_q'), ('k', 'to_k'), ('v', 'to_v'),
                         ('proj', 'to_out.0')):
        kern = _np(p[ours]['kernel'])[0, 0]  # (1,1,in,out) -> (in,out)
        sd[f'{key}.{theirs}.weight'] = kern.T
        if 'bias' in p[ours]:
            sd[f'{key}.{theirs}.bias'] = _np(p[ours]['bias'])


def export_vae(params, cfg: VAEConfig = VAEConfig()):
    sd: Dict[str, np.ndarray] = {}
    _put_conv(sd, 'encoder.conv_in', params['encoder']['conv_in'])
    for i, stage in enumerate(params['encoder']['down']):
        for j, r in enumerate(stage['resnets']):
            _put_vae_resnet(sd, f'encoder.down_blocks.{i}.resnets.{j}', r)
        if 'downsample' in stage:
            _put_conv(sd, f'encoder.down_blocks.{i}.downsamplers.0.conv',
                      stage['downsample'])
    _put_vae_resnet(sd, 'encoder.mid_block.resnets.0',
                    params['encoder']['mid']['resnet1'])
    _put_vae_attn(sd, 'encoder.mid_block.attentions.0',
                  params['encoder']['mid']['attn'])
    _put_vae_resnet(sd, 'encoder.mid_block.resnets.1',
                    params['encoder']['mid']['resnet2'])
    _put_norm(sd, 'encoder.conv_norm_out', params['encoder']['norm_out'])
    _put_conv(sd, 'encoder.conv_out', params['encoder']['conv_out'])

    _put_conv(sd, 'decoder.conv_in', params['decoder']['conv_in'])
    _put_vae_resnet(sd, 'decoder.mid_block.resnets.0',
                    params['decoder']['mid']['resnet1'])
    _put_vae_attn(sd, 'decoder.mid_block.attentions.0',
                  params['decoder']['mid']['attn'])
    _put_vae_resnet(sd, 'decoder.mid_block.resnets.1',
                    params['decoder']['mid']['resnet2'])
    for i, stage in enumerate(params['decoder']['up']):
        for j, r in enumerate(stage['resnets']):
            _put_vae_resnet(sd, f'decoder.up_blocks.{i}.resnets.{j}', r)
        if 'upsample' in stage:
            _put_conv(sd, f'decoder.up_blocks.{i}.upsamplers.0.conv',
                      stage['upsample'])
    _put_norm(sd, 'decoder.conv_norm_out', params['decoder']['norm_out'])
    _put_conv(sd, 'decoder.conv_out', params['decoder']['conv_out'])
    _put_conv(sd, 'quant_conv', params['quant_conv'])
    _put_conv(sd, 'post_quant_conv', params['post_quant_conv'])
    return sd


# ------------------------------------------------------------------- UNet
def _put_unet_resnet(sd, key, p):
    _put_norm(sd, key + '.norm1', p['norm1'])
    _put_conv(sd, key + '.conv1', p['conv1'])
    _put_lin(sd, key + '.time_emb_proj', p['time_emb_proj'])
    _put_norm(sd, key + '.norm2', p['norm2'])
    _put_conv(sd, key + '.conv2', p['conv2'])
    if 'shortcut' in p:
        _put_conv(sd, key + '.conv_shortcut', p['shortcut'])


def _put_unet_transformer(sd, key, p):
    t = key + '.transformer_blocks.0'
    _put_norm(sd, key + '.norm', p['norm'])
    _put_conv(sd, key + '.proj_in', p['proj_in'])
    _put_norm(sd, t + '.norm1', p['ln1'])
    for a in ('attn1', 'attn2'):
        _put_lin(sd, f'{t}.{a}.to_q', p[a]['to_q'])
        _put_lin(sd, f'{t}.{a}.to_k', p[a]['to_k'])
        _put_lin(sd, f'{t}.{a}.to_v', p[a]['to_v'])
        _put_lin(sd, f'{t}.{a}.to_out.0', p[a]['to_out'])
    _put_norm(sd, t + '.norm2', p['ln2'])
    _put_norm(sd, t + '.norm3', p['ln3'])
    _put_lin(sd, t + '.ff.net.0.proj', p['ff']['proj'])
    _put_lin(sd, t + '.ff.net.2', p['ff']['out'])
    _put_conv(sd, key + '.proj_out', p['proj_out'])


def export_unet(params, cfg: UNetConfig = UNetConfig()):
    sd: Dict[str, np.ndarray] = {}
    _put_conv(sd, 'conv_in', params['conv_in'])
    _put_lin(sd, 'time_embedding.linear_1', params['time_embedding']['linear_1'])
    _put_lin(sd, 'time_embedding.linear_2', params['time_embedding']['linear_2'])
    for i, block in enumerate(params['down_blocks']):
        for j, r in enumerate(block['resnets']):
            _put_unet_resnet(sd, f'down_blocks.{i}.resnets.{j}', r)
        for j, a in enumerate(block['attentions']):
            _put_unet_transformer(sd, f'down_blocks.{i}.attentions.{j}', a)
        if 'downsample' in block:
            _put_conv(sd, f'down_blocks.{i}.downsamplers.0.conv',
                      block['downsample'])
    _put_unet_resnet(sd, 'mid_block.resnets.0', params['mid']['resnet1'])
    _put_unet_transformer(sd, 'mid_block.attentions.0',
                          params['mid']['attention'])
    _put_unet_resnet(sd, 'mid_block.resnets.1', params['mid']['resnet2'])
    for i, block in enumerate(params['up_blocks']):
        for j, r in enumerate(block['resnets']):
            _put_unet_resnet(sd, f'up_blocks.{i}.resnets.{j}', r)
        for j, a in enumerate(block['attentions']):
            _put_unet_transformer(sd, f'up_blocks.{i}.attentions.{j}', a)
        if 'upsample' in block:
            _put_conv(sd, f'up_blocks.{i}.upsamplers.0.conv',
                      block['upsample'])
    _put_norm(sd, 'conv_norm_out', params['norm_out'])
    _put_conv(sd, 'conv_out', params['conv_out'])
    return sd


# ------------------------------------------------------------- directory IO
def save_pipeline_params(root: str, unet=None, vae=None, text_encoder=None,
                         configs=None, new_concept_cfg=None):
    """Write a diffusers-layout directory (safetensors) + new_concept_cfg.json
    sidecar — the artifact set the reference's regional sampler reloads
    (regionally_controlable_sampling.py:57-60)."""
    from safetensors.numpy import save_file

    from mixofshow_tpu.utils.transfer import fetch_tree

    # Concurrent fetch instead of sequential per-leaf round trips:
    # device-resident leaves (e.g. the fusion-solved kernels) otherwise
    # serialize the tunnel's per-transfer latency (utils/transfer.py).
    unet = fetch_tree(unet) if unet is not None else None
    vae = fetch_tree(vae) if vae is not None else None
    text_encoder = (fetch_tree(text_encoder)
                    if text_encoder is not None else None)
    os.makedirs(root, exist_ok=True)
    if unet is not None:
        d = os.path.join(root, 'unet')
        os.makedirs(d, exist_ok=True)
        save_file({k: np.ascontiguousarray(v) for k, v in
                   export_unet(unet).items()},
                  os.path.join(d, 'diffusion_pytorch_model.safetensors'))
    if vae is not None:
        d = os.path.join(root, 'vae')
        os.makedirs(d, exist_ok=True)
        save_file({k: np.ascontiguousarray(v) for k, v in
                   export_vae(vae).items()},
                  os.path.join(d, 'diffusion_pytorch_model.safetensors'))
    if text_encoder is not None:
        d = os.path.join(root, 'text_encoder')
        os.makedirs(d, exist_ok=True)
        save_file({k: np.ascontiguousarray(v) for k, v in
                   export_clip_text(text_encoder).items()},
                  os.path.join(d, 'model.safetensors'))
    if new_concept_cfg is not None:
        with open(os.path.join(root, 'new_concept_cfg.json'), 'w') as f:
            json.dump(new_concept_cfg, f, indent=2)
