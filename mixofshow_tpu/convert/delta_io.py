"""ED-LoRA delta checkpoint I/O in the reference's on-disk format.

The reference saves {'params': {new_concept_embedding, text_encoder, unet}}
via torch.save (train_edlora.py:165-171, structure trainer_edlora.py:362-379).
Writing the same format keeps checkpoints interchangeable in BOTH directions:
reference-trained deltas load here (convert_edlora_delta), and deltas trained
here load in the reference / merge with its convert_edlora.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from mixofshow_tpu.models.lora import flatten_lora, set_path


def _ours_to_torch_module(path: str) -> str:
    """Inverse of diffusers_import._torch_module_path_to_ours."""
    parts = path.split('/')
    if parts[0] == 'blocks':
        proj = {'q': 'q_proj', 'k': 'k_proj', 'v': 'v_proj',
                'out': 'out_proj'}[parts[3]]
        return f'text_model.encoder.layers.{parts[1]}.self_attn.{proj}'
    if parts[0] == 'mid':
        base, inner = 'mid_block.attentions.0', parts[2:]
    else:
        # down_blocks/up_blocks: ['down_blocks', i, 'attentions', j, ...]
        base, inner = f'{parts[0]}.{parts[1]}.attentions.{parts[3]}', parts[4:]
    if inner[0] in ('proj_in', 'proj_out'):  # convs on Transformer2DModel
        return f'{base}.{inner[0]}'
    if inner[0] == 'ff':  # diffusers FeedForward: net.0 = GEGLU, net.2 = out
        leaf = 'ff.net.0.proj' if inner[1] == 'proj' else 'ff.net.2'
    else:
        leaf = f"{inner[0]}.{'to_out.0' if inner[1] == 'to_out' else inner[1]}"
    return f'{base}.transformer_blocks.0.{leaf}'


def export_edlora_delta(delta: Dict) -> Dict:
    """Our delta dict → reference-format state dict (numpy leaves).

    Input: {'new_concept_embedding': {name: (L, C)}, 'text_lora': tree,
    'unet_lora': tree} (EDLoRATrainer.delta_state_dict output)."""
    out = {'new_concept_embedding': {}, 'text_encoder': {}, 'unet': {}}
    for name, emb in delta['new_concept_embedding'].items():
        out['new_concept_embedding'][name] = np.asarray(emb)
    for tree_key, dst in (('text_lora', 'text_encoder'), ('unet_lora', 'unet')):
        for path, leaf in flatten_lora(delta.get(tree_key, {})).items():
            mod = _ours_to_torch_module(path)
            # ours (in, r)/(r, out) -> torch (r, in)/(out, r)
            out[dst][f'{mod}.lora_down.weight'] = np.asarray(leaf['down']).T
            out[dst][f'{mod}.lora_up.weight'] = np.asarray(leaf['up']).T
    return out


def save_edlora_delta(path: str, delta: Dict):
    """torch.save in the reference layout; .npz fallback without torch."""
    payload = {'params': export_edlora_delta(delta)}
    try:
        import torch
        torch_payload = {'params': {
            group: {k: torch.from_numpy(np.array(v, copy=True))
                    for k, v in d.items()}
            for group, d in payload['params'].items()}}
        torch.save(torch_payload, path)
    except ImportError:
        flat = {}
        for group, d in payload['params'].items():
            for k, v in d.items():
                flat[f'{group}|{k}'] = np.asarray(v)
        np.savez(path + '.npz', **flat)


def load_edlora_delta(path: str) -> Dict:
    """Load a reference-format .pth (or our .npz fallback) into the
    convert_edlora_delta input shape."""
    if path.endswith('.npz'):
        data = np.load(path)
        out: Dict = {'new_concept_embedding': {}, 'text_encoder': {},
                     'unet': {}}
        for k in data.files:
            group, key = k.split('|', 1)
            out[group][key] = data[k]
        return {'params': out}
    import torch
    return torch.load(path, map_location='cpu', weights_only=False)
