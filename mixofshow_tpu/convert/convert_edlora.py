"""Fold a trained ED-LoRA delta into base weights for deployment.

Equivalent of the reference `convert_edlora`
(mixofshow/utils/convert_edlora_to_diffusers.py:79-99): register the
concept tokens, install the trained embeddings, and merge every LoRA pair
into the dense weights at strength `alpha` (W += alpha * up@down, :64-73).

Here merging is one functional pass per tree (models/lora.merge_into) and
the concept embeddings stay in a standalone table (models/clip.embed_tokens)
— callers can also skip merging entirely and sample with unmerged LoRA
(EDLoRAPipeline supports both; the alpha sweep path never merges)."""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from mixofshow_tpu.models.lora import merge_into
from mixofshow_tpu.pipelines.concepts import NUM_CROSS_ATTENTION_LAYERS


def convert_edlora(text_encoder_params, unet_params, tokenizer, delta: Dict,
                   enable_edlora: bool = True, alpha: float = 1.0
                   ) -> Tuple[Dict, Dict, Dict, np.ndarray]:
    """delta: output of convert_edlora_delta (new_concept_embedding /
    text_lora / unet_lora). Returns (text_params, unet_params,
    new_concept_cfg, concept_table)."""
    n_layers = NUM_CROSS_ATTENTION_LAYERS if enable_edlora else 1
    new_concept_cfg: Dict = {}
    rows = []
    start = len(tokenizer.added_tokens)
    for concept_name, emb in delta.get('new_concept_embedding', {}).items():
        names = [f'<new{start + L}>' for L in range(n_layers)]
        added = tokenizer.add_tokens(names)
        assert added == n_layers, f'tokens already present for {concept_name}'
        ids = [tokenizer.convert_tokens_to_ids(n) for n in names]
        rows.append(np.asarray(emb, np.float32).reshape(n_layers, -1))
        new_concept_cfg[concept_name] = {
            'concept_token_ids': ids, 'concept_token_names': names}
        start += n_layers
    table = np.concatenate(rows, 0) if rows else np.zeros((0, 768),
                                                          np.float32)
    text_merged = merge_into(text_encoder_params, delta.get('text_lora', {}),
                             alpha) if delta.get('text_lora') else \
        text_encoder_params
    unet_merged = merge_into(unet_params, delta.get('unet_lora', {}),
                             alpha) if delta.get('unet_lora') else unet_params
    return text_merged, unet_merged, new_concept_cfg, table
