"""Import diffusers / transformers / reference-ED-LoRA checkpoints → pytrees.

Interop layer so a user of the reference can bring their existing artifacts:
  * SD1.x base checkpoints in diffusers directory layout (what the reference
    loads at trainer_edlora.py:38-41) → our functional param trees;
  * reference-trained ED-LoRA delta `.pth` files (structure written by
    trainer_edlora.py:362-379: new_concept_embedding / text_encoder / unet
    LoRA pairs) → our concept table + LoRA pytrees.

Convention changes handled here (and nowhere else):
  torch Linear weight (out,in)  -> kernel (in,out)       [transpose]
  torch Conv2d weight (o,i,h,w) -> kernel (h,w,i,o) HWIO [transpose 2,3,1,0]
  norm weight/bias              -> scale/bias
  NCHW activations              -> NHWC (callers' concern)

Loading is torch-free when checkpoints are .safetensors (safetensors.numpy);
.bin/.pth fall back to torch.load on CPU. Everything returns numpy arrays —
device placement/sharding happens at jit boundaries.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from mixofshow_tpu.models.clip import CLIPTextConfig
from mixofshow_tpu.models.unet import UNetConfig
from mixofshow_tpu.models.vae import VAEConfig


# ------------------------------------------------------------------ raw load
def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (cpu); .float() upcasts bf16/fp16 storage losslessly
    return t.detach().cpu().numpy() if hasattr(t, 'detach') else np.asarray(t)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load one weights file (.safetensors preferred, else torch pickle)."""
    if path.endswith('.safetensors'):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(sd, dict) and 'state_dict' in sd:
        sd = sd['state_dict']
    return {k: _to_numpy(v) for k, v in sd.items()}


def _find_weights(subdir: str) -> Optional[str]:
    if not os.path.isdir(subdir):
        return None
    for name in ('diffusion_pytorch_model.safetensors', 'model.safetensors',
                 'diffusion_pytorch_model.bin', 'pytorch_model.bin'):
        p = os.path.join(subdir, name)
        if os.path.exists(p):
            return p
    return None


# ------------------------------------------------------------- leaf mappers
def _lin(sd, key):
    p = {'kernel': _to_numpy(sd[f'{key}.weight']).T}
    if f'{key}.bias' in sd:
        p['bias'] = _to_numpy(sd[f'{key}.bias'])
    return p


def _conv(sd, key):
    p = {'kernel': _to_numpy(sd[f'{key}.weight']).transpose(2, 3, 1, 0)}
    if f'{key}.bias' in sd:
        p['bias'] = _to_numpy(sd[f'{key}.bias'])
    return p


def _norm(sd, key):
    return {'scale': _to_numpy(sd[f'{key}.weight']),
            'bias': _to_numpy(sd[f'{key}.bias'])}


def _conv1x1_from_any(sd, key):
    """VAE attention projections appear as Linear (new) or 1x1 conv (old)."""
    w = _to_numpy(sd[f'{key}.weight'])
    if w.ndim == 2:  # Linear (out,in) -> (1,1,in,out)
        kern = w.T[None, None]
    else:
        kern = w.transpose(2, 3, 1, 0)
    p = {'kernel': kern}
    if f'{key}.bias' in sd:
        p['bias'] = _to_numpy(sd[f'{key}.bias'])
    return p


# ------------------------------------------------------------------ CLIP
def convert_clip_text(sd: Dict[str, np.ndarray],
                      cfg: CLIPTextConfig = CLIPTextConfig()):
    pre = 'text_model.'
    params = {
        'token_embedding': _to_numpy(sd[f'{pre}embeddings.token_embedding.weight']),
        'position_embedding': _to_numpy(sd[f'{pre}embeddings.position_embedding.weight']),
        'final_norm': _norm(sd, f'{pre}final_layer_norm'),
        'blocks': [],
    }
    for i in range(cfg.layers):
        b = f'{pre}encoder.layers.{i}.'
        params['blocks'].append({
            'ln1': _norm(sd, b + 'layer_norm1'),
            'attn': {
                'q': _lin(sd, b + 'self_attn.q_proj'),
                'k': _lin(sd, b + 'self_attn.k_proj'),
                'v': _lin(sd, b + 'self_attn.v_proj'),
                'out': _lin(sd, b + 'self_attn.out_proj'),
            },
            'ln2': _norm(sd, b + 'layer_norm2'),
            'mlp': {'fc1': _lin(sd, b + 'mlp.fc1'),
                    'fc2': _lin(sd, b + 'mlp.fc2')},
        })
    return params


# ------------------------------------------------------------------- VAE
def _vae_resnet(sd, key):
    p = {'norm1': _norm(sd, key + '.norm1'), 'conv1': _conv(sd, key + '.conv1'),
         'norm2': _norm(sd, key + '.norm2'), 'conv2': _conv(sd, key + '.conv2')}
    if key + '.conv_shortcut.weight' in sd:
        p['shortcut'] = _conv(sd, key + '.conv_shortcut')
    return p


def _vae_attn(sd, key):
    new = key + '.to_q.weight' in sd
    names = (('to_q', 'to_k', 'to_v', 'to_out.0') if new else
             ('query', 'key', 'value', 'proj_attn'))
    gn = 'group_norm' if f'{key}.group_norm.weight' in sd else 'norm'
    return {
        'norm': _norm(sd, f'{key}.{gn}'),
        'q': _conv1x1_from_any(sd, f'{key}.{names[0]}'),
        'k': _conv1x1_from_any(sd, f'{key}.{names[1]}'),
        'v': _conv1x1_from_any(sd, f'{key}.{names[2]}'),
        'proj': _conv1x1_from_any(sd, f'{key}.{names[3]}'),
    }


def convert_vae(sd: Dict[str, np.ndarray], cfg: VAEConfig = VAEConfig()):
    n = len(cfg.block_out_channels)
    enc = {'conv_in': _conv(sd, 'encoder.conv_in'), 'down': []}
    for i in range(n):
        stage = {'resnets': [
            _vae_resnet(sd, f'encoder.down_blocks.{i}.resnets.{j}')
            for j in range(cfg.layers_per_block)]}
        if i < n - 1:
            stage['downsample'] = _conv(
                sd, f'encoder.down_blocks.{i}.downsamplers.0.conv')
        enc['down'].append(stage)
    enc['mid'] = {
        'resnet1': _vae_resnet(sd, 'encoder.mid_block.resnets.0'),
        'attn': _vae_attn(sd, 'encoder.mid_block.attentions.0'),
        'resnet2': _vae_resnet(sd, 'encoder.mid_block.resnets.1'),
    }
    enc['norm_out'] = _norm(sd, 'encoder.conv_norm_out')
    enc['conv_out'] = _conv(sd, 'encoder.conv_out')

    dec = {'conv_in': _conv(sd, 'decoder.conv_in'), 'up': []}
    dec['mid'] = {
        'resnet1': _vae_resnet(sd, 'decoder.mid_block.resnets.0'),
        'attn': _vae_attn(sd, 'decoder.mid_block.attentions.0'),
        'resnet2': _vae_resnet(sd, 'decoder.mid_block.resnets.1'),
    }
    for i in range(n):
        stage = {'resnets': [
            _vae_resnet(sd, f'decoder.up_blocks.{i}.resnets.{j}')
            for j in range(cfg.layers_per_block + 1)]}
        if i < n - 1:
            stage['upsample'] = _conv(
                sd, f'decoder.up_blocks.{i}.upsamplers.0.conv')
        dec['up'].append(stage)
    dec['norm_out'] = _norm(sd, 'decoder.conv_norm_out')
    dec['conv_out'] = _conv(sd, 'decoder.conv_out')

    return {'encoder': enc, 'decoder': dec,
            'quant_conv': _conv(sd, 'quant_conv'),
            'post_quant_conv': _conv(sd, 'post_quant_conv')}


# ------------------------------------------------------------------- UNet
def _unet_resnet(sd, key):
    p = {'norm1': _norm(sd, key + '.norm1'), 'conv1': _conv(sd, key + '.conv1'),
         'time_emb_proj': _lin(sd, key + '.time_emb_proj'),
         'norm2': _norm(sd, key + '.norm2'), 'conv2': _conv(sd, key + '.conv2')}
    if key + '.conv_shortcut.weight' in sd:
        p['shortcut'] = _conv(sd, key + '.conv_shortcut')
    return p


def _unet_attention(sd, key):
    return {'to_q': _lin(sd, key + '.to_q'), 'to_k': _lin(sd, key + '.to_k'),
            'to_v': _lin(sd, key + '.to_v'),
            'to_out': _lin(sd, key + '.to_out.0')}


def _unet_transformer(sd, key):
    t = key + '.transformer_blocks.0'
    return {
        'norm': _norm(sd, key + '.norm'),
        'proj_in': _conv(sd, key + '.proj_in'),
        'ln1': _norm(sd, t + '.norm1'),
        'attn1': _unet_attention(sd, t + '.attn1'),
        'ln2': _norm(sd, t + '.norm2'),
        'attn2': _unet_attention(sd, t + '.attn2'),
        'ln3': _norm(sd, t + '.norm3'),
        'ff': {'proj': _lin(sd, t + '.ff.net.0.proj'),
               'out': _lin(sd, t + '.ff.net.2')},
        'proj_out': _conv(sd, key + '.proj_out'),
    }


def convert_unet(sd: Dict[str, np.ndarray], cfg: UNetConfig = UNetConfig()):
    n = len(cfg.block_out_channels)
    params = {
        'conv_in': _conv(sd, 'conv_in'),
        'time_embedding': {'linear_1': _lin(sd, 'time_embedding.linear_1'),
                           'linear_2': _lin(sd, 'time_embedding.linear_2')},
        'down_blocks': [], 'up_blocks': [],
        'mid': {
            'resnet1': _unet_resnet(sd, 'mid_block.resnets.0'),
            'attention': _unet_transformer(sd, 'mid_block.attentions.0'),
            'resnet2': _unet_resnet(sd, 'mid_block.resnets.1'),
        },
        'norm_out': _norm(sd, 'conv_norm_out'),
        'conv_out': _conv(sd, 'conv_out'),
    }
    for i, has_cross in enumerate(cfg.down_cross):
        block = {'resnets': [
            _unet_resnet(sd, f'down_blocks.{i}.resnets.{j}')
            for j in range(cfg.layers_per_block)]}
        block['attentions'] = [
            _unet_transformer(sd, f'down_blocks.{i}.attentions.{j}')
            for j in range(cfg.layers_per_block)] if has_cross else []
        if i < n - 1:
            block['downsample'] = _conv(
                sd, f'down_blocks.{i}.downsamplers.0.conv')
        params['down_blocks'].append(block)
    for i, has_cross in enumerate(cfg.up_cross):
        block = {'resnets': [
            _unet_resnet(sd, f'up_blocks.{i}.resnets.{j}')
            for j in range(cfg.layers_per_block + 1)]}
        block['attentions'] = [
            _unet_transformer(sd, f'up_blocks.{i}.attentions.{j}')
            for j in range(cfg.layers_per_block + 1)] if has_cross else []
        if i < n - 1:
            block['upsample'] = _conv(sd, f'up_blocks.{i}.upsamplers.0.conv')
        params['up_blocks'].append(block)
    return params


# ------------------------------------------------------- full pipeline dirs
def load_pipeline_params(root: str):
    """Load a diffusers SD1.x checkpoint directory into our param trees.

    Returns dict(unet=, vae=, text_encoder=, configs=...). Mirrors the
    from_pretrained calls at reference trainer_edlora.py:38-41."""
    out = {}
    unet_path = _find_weights(os.path.join(root, 'unet'))
    vae_path = _find_weights(os.path.join(root, 'vae'))
    te_path = _find_weights(os.path.join(root, 'text_encoder'))
    ucfg, vcfg, ccfg = UNetConfig(), VAEConfig(), CLIPTextConfig()
    pred_type = 'epsilon'
    sched_cfg = os.path.join(root, 'scheduler', 'scheduler_config.json')
    if os.path.exists(sched_cfg):
        with open(sched_cfg) as f:
            pred_type = json.load(f).get('prediction_type', 'epsilon')
    if unet_path:
        out['unet'] = convert_unet(load_state_dict(unet_path), ucfg)
    if vae_path:
        out['vae'] = convert_vae(load_state_dict(vae_path), vcfg)
    if te_path:
        out['text_encoder'] = convert_clip_text(load_state_dict(te_path), ccfg)
    out['configs'] = {'unet': ucfg, 'vae': vcfg, 'text_encoder': ccfg,
                      'prediction_type': pred_type}
    return out


# ----------------------------------------------------- reference ED-LoRA pth
def _torch_module_path_to_ours(name: str) -> Optional[List[str]]:
    """Map a reference LoRA module path to our tree path.

    e.g. 'down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_k'
       -> ['down_blocks','0','attentions','1','attn2','to_k']
         'mid_block.attentions.0.transformer_blocks.0.attn1.to_q'
       -> ['mid','attention','attn1','to_q']
         'up_blocks.1.attentions.0.transformer_blocks.0.ff.net.0.proj'
       -> ['up_blocks','1','attentions','0','ff','proj']
         'down_blocks.0.attentions.1.proj_in'   (1x1 conv on the
       Transformer2DModel itself, fusion's phase-4 candidate list —
       reference gradient_fusion.py:637-641)
       -> ['down_blocks','0','attentions','1','proj_in']
         'text_model.encoder.layers.3.self_attn.q_proj'
       -> ['blocks','3','attn','q']
    """
    parts = name.split('.')
    if parts[0] == 'text_model':
        # text_model.encoder.layers.{i}.self_attn.{x}_proj
        i = parts[3]
        proj = parts[5].replace('_proj', '')
        return ['blocks', i, 'attn', {'q': 'q', 'k': 'k', 'v': 'v',
                                      'out': 'out'}[proj]]
    if parts[0] == 'mid_block':
        base, rest = ['mid', 'attention'], parts[3:]
    elif parts[0] in ('down_blocks', 'up_blocks'):
        base, rest = [parts[0], parts[1], 'attentions', parts[3]], parts[4:]
    else:
        return None
    # rest: 'proj_in'/'proj_out' directly, or 'transformer_blocks.0.<inner>'
    if rest[:1] in (['proj_in'], ['proj_out']):
        return base + [rest[0]]
    if rest[:2] != ['transformer_blocks', '0']:
        return None
    return base + _map_inner(rest[2:])


def _map_inner(inner: List[str]) -> List[str]:
    # 'to_out.0' -> 'to_out'; 'ff.net.0.proj' -> 'ff/proj'; 'ff.net.2' ->
    # 'ff/out' (diffusers FeedForward: net.0 = GEGLU, net.2 = out Linear)
    if inner[:2] == ['ff', 'net']:
        return ['ff', 'out' if inner[2] == '2' else 'proj']
    return [p for p in inner if p != '0']


def convert_edlora_delta(delta) -> Dict:
    """Reference ED-LoRA `.pth` → our delta dict.

    Input: the dict saved at train_edlora.py:171 — either the raw
    delta_state_dict or {'params': ...} wrapping. Output:
      {'new_concept_embedding': {concept: (16, 768) np},
       'text_lora': lora tree for our CLIP,
       'unet_lora': lora tree for our UNet}
    LoRA matrices transpose to our (in,r)/(r,out) convention."""
    if 'params' in delta and isinstance(delta['params'], dict):
        delta = delta['params']
    out = {'new_concept_embedding': {}, 'text_lora': {}, 'unet_lora': {}}
    for concept, emb in delta.get('new_concept_embedding', {}).items():
        out['new_concept_embedding'][concept] = _to_numpy(emb)

    from mixofshow_tpu.models.lora import set_path

    for src_key, tree_key in (('text_encoder', 'text_lora'),
                              ('unet', 'unet_lora')):
        pairs: Dict[str, Dict[str, np.ndarray]] = {}
        for k, v in delta.get(src_key, {}).items():
            # '...<module>.lora_down.weight' / '...<module>.lora_up.weight'
            if k.endswith('.lora_down.weight'):
                mod, which = k[:-len('.lora_down.weight')], 'down'
            elif k.endswith('.lora_up.weight'):
                mod, which = k[:-len('.lora_up.weight')], 'up'
            else:
                continue
            w = _to_numpy(v)
            if w.ndim == 4:  # 1x1 conv lora (o,i,1,1) -> (i,o)
                w = w[:, :, 0, 0]
            pairs.setdefault(mod, {})[which] = w.T  # torch (out,in) -> (in,out)
        for mod, dw in pairs.items():
            path = _torch_module_path_to_ours(mod)
            if path is None or set(dw) != {'down', 'up'}:
                continue
            set_path(out[tree_key], '/'.join(path), dw)
    return out
