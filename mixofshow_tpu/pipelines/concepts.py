"""ED-LoRA concept-token machinery.

The core ED-LoRA idea (reference: NeurIPS'23 Mix-of-Show): each concept gets
*16 per-cross-attention-layer embeddings* instead of one. Prompts mentioning
the concept are expanded into 16 layer-specific variants whose encodings feed
the UNet as a (B, 16, 77, C) layerwise tensor (reference
pipeline_edlora.py:18-29, trainer_edlora.py:144-194).

TPU-first design: concept embeddings live in a standalone `(num_tokens, C)`
table separate from the frozen vocab table (see models/clip.embed_tokens), so
"resize the embedding matrix, snapshot it, restore non-concept rows each
step" (reference train_edlora.py:103,135-136) is structurally unnecessary.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from mixofshow_tpu.text.tokenizer import CLIPTokenizer

NUM_CROSS_ATTENTION_LAYERS = 16


def bind_concept_prompt(prompts: Union[str, Sequence[str]],
                        new_concept_cfg: Dict) -> List[str]:
    """Expand each prompt into 16 per-layer variants, substituting each
    concept name with that layer's token names (pipeline_edlora.py:18-29)."""
    if isinstance(prompts, str):
        prompts = [prompts]
    out: List[str] = []
    for prompt in prompts:
        layer_prompts = [prompt] * NUM_CROSS_ATTENTION_LAYERS
        for concept_name, cfg in new_concept_cfg.items():
            layer_prompts = [
                p.replace(concept_name, layer_name)
                for p, layer_name in zip(layer_prompts,
                                         cfg['concept_token_names'])
            ]
        out.extend(layer_prompts)
    return out


def init_concepts(tokenizer: CLIPTokenizer,
                  new_concept_token: str,
                  initializer_token: Optional[str],
                  base_embedding: np.ndarray,
                  enable_edlora: bool = True,
                  rng: Optional[np.random.Generator] = None,
                  encode_init_token=None) -> Tuple[Dict, np.ndarray]:
    """Register concept tokens and build the initial concept-embedding table.

    Mirrors trainer_edlora.py:144-194: concepts split on '+', each getting 16
    tokens `<new{idx*16+layer}>` (1 when not edlora); rows initialized either
    from an existing token's embedding or `<rand-σ>` gaussian noise.

    Each concept's token names are composed per layer: for ED-LoRA, layer L of
    concept "<a1> <a2>" becomes token names substituted as a unit — the
    reference substitutes the *full concept string* with one `<newK>` per
    layer, and so do we.

    Returns (new_concept_cfg, concept_embedding (total_new_tokens, C)).
    `concept_embedding[token_id - vocab_size]` is the row for `token_id`.
    """
    rng = rng or np.random.default_rng(0)
    concepts = new_concept_token.split('+')
    if initializer_token is None:
        init_tokens = ['<rand-0.017>'] * len(concepts)
    else:
        init_tokens = initializer_token.split('+')
    assert len(concepts) == len(init_tokens), \
        'concept token should match init token.'

    dim = base_embedding.shape[1]
    new_concept_cfg: Dict = {}
    rows: List[np.ndarray] = []
    n_layers = NUM_CROSS_ATTENTION_LAYERS if enable_edlora else 1

    for idx, (concept_name, init_token) in enumerate(zip(concepts,
                                                         init_tokens)):
        names = [f'<new{idx * n_layers + layer}>' for layer in range(n_layers)]
        added = tokenizer.add_tokens(names)
        assert added == len(names), 'some token is already in tokenizer'
        ids = [tokenizer.convert_tokens_to_ids(n) for n in names]

        m = re.findall(r'<rand-(.*)>', init_token)
        if m:
            init_feature = rng.normal(0.0, 1.0, (dim,)) * float(m[0])
        else:
            if encode_init_token is not None:
                token_ids = encode_init_token(init_token)
            else:
                token_ids = tokenizer.encode(init_token,
                                             add_special_tokens=False)
            if len(token_ids) > 1:
                raise ValueError(
                    'The initializer token must be a single existing token.')
            init_feature = np.asarray(base_embedding[token_ids[0]])
        rows.extend([init_feature.copy() for _ in ids])

        new_concept_cfg[concept_name] = {
            'concept_token_ids': ids,
            'concept_token_names': names,
        }

    table = np.stack(rows).astype(np.float32) if rows else \
        np.zeros((0, dim), np.float32)
    return new_concept_cfg, table


def all_concept_token_ids(new_concept_cfg: Dict) -> List[int]:
    """Flattened token ids of every concept (trainer_edlora.py:196-200)."""
    ids: List[int] = []
    for cfg in new_concept_cfg.values():
        ids.extend(cfg['concept_token_ids'])
    return ids
