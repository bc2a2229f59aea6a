"""Gradient fusion: merge N concept ED-LoRAs into one base checkpoint.

TPU-native rebuild of the reference center-node fusion
(gradient_fusion.py:750-813), same four phases in the same order — each
phase's feature capture uses the previous phases' merged weights:

  1. concept embeddings  → one concatenated concept table + new_concept_cfg
     (reference merge_new_concepts_, :217-267)
  2. text encoder        → anchored least-squares per attention linear
     (reference merge_text_encoder, :460-576)
  3. UNet cross-KV       → per-layer fit on that layer's concept text
     features (reference merge_kv_in_cross_attention, :325-457)
  4. UNet spatial attn   → fit on activations captured during a 20-step
     denoise per concept (reference merge_spatial_attention, :627-747)

Architectural differences (see ops/solve.py for the math):
  * no forward hooks and no feature storage — capture passes emit input
    GRAM matrices as functional aux outputs; targets are G @ Wm since every
    target is the concept-merged layer applied to the same inputs;
  * no per-layer LBFGS — one batched spectral solve per phase (the exact
    optimum the reference's 500/50 LBFGS iterations approximate);
  * no in-place model surgery — concept LoRAs are applied *unmerged* during
    capture (mathematically identical to weight folding), and phase outputs
    are functional param-tree updates.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mixofshow_tpu.convert.delta_io import load_edlora_delta
from mixofshow_tpu.convert.diffusers_import import convert_edlora_delta
from mixofshow_tpu.diffusion import DPMSolverMultistep
from mixofshow_tpu.models.clip import clip_text_encode
from mixofshow_tpu.models.lora import flatten_lora, get_path, set_path
from mixofshow_tpu.models.unet import cross_layer_paths, unet_apply
from mixofshow_tpu.ops.solve import gram, solve_layer_group
from mixofshow_tpu.pipelines.concepts import (NUM_CROSS_ATTENTION_LAYERS,
                                              bind_concept_prompt)
from mixofshow_tpu.text.tokenizer import EOS_TOKEN_ID

logger = logging.getLogger('mixofshow_tpu')

TEMPLATE_SIMPLE = 'photo of a {}'


# --------------------------------------------------------------- parsing
def parse_new_concepts(concept_cfg: str):
    """Load every concept's delta checkpoint, split the UNet LoRA into
    cross-KV vs spatial groups (reference parse_new_concepts,
    gradient_fusion.py:270-322; KV match = attn2.to_k/to_v :296)."""
    with open(concept_cfg) as f:
        concept_list = json.load(f)

    parsed = []
    for concept in concept_list:
        delta = convert_edlora_delta(load_edlora_delta(concept['lora_path']))
        crosskv: Dict = {}
        spatial: Dict = {}
        for path, leaf in flatten_lora(delta['unet_lora']).items():
            target = crosskv if ('/attn2/to_k' in path or
                                 '/attn2/to_v' in path) else spatial
            set_path(target, path, leaf)
        parsed.append({
            'embedding': delta['new_concept_embedding'],
            'text_lora': delta['text_lora'],
            'unet_crosskv': crosskv,
            'unet_spatial': spatial,
        })
    return parsed, concept_list


def merge_new_concepts(parsed, concept_list, tokenizer):
    """Phase 1: register all concept tokens, build the combined table
    (reference merge_new_concepts_, gradient_fusion.py:217-267)."""
    new_concept_cfg: Dict = {}
    rows: List[np.ndarray] = []
    start_idx = 0
    vocab = tokenizer.vocab_size
    for data, concept in zip(parsed, concept_list):
        for concept_name in concept['concept_name'].split(' '):
            if not concept_name.startswith('<'):
                continue
            assert concept_name in data['embedding'], (
                f'concept {concept_name} not found in its lora checkpoint')
            names = [f'<new{start_idx + L}>'
                     for L in range(NUM_CROSS_ATTENTION_LAYERS)]
            added = tokenizer.add_tokens(names)
            assert added == NUM_CROSS_ATTENTION_LAYERS
            ids = [tokenizer.convert_tokens_to_ids(n) for n in names]
            emb = np.asarray(data['embedding'][concept_name], np.float32)
            rows.append(emb)
            new_concept_cfg[concept_name] = {
                'concept_token_ids': ids, 'concept_token_names': names}
            logger.info('concept %s bound to token ids [%d, %d]',
                        concept_name, min(ids), max(ids))
            start_idx += NUM_CROSS_ATTENTION_LAYERS
    table = np.concatenate(rows, 0) if rows else np.zeros((0, 768), np.float32)
    return new_concept_cfg, table


# ----------------------------------------------------------- phase 2: text
def _lora_delta(lora_leaf, alpha: float):
    """alpha * down@up — the (in, out) weight delta of one LoRA leaf, or
    None when the concept has no adapter on this layer (the solve then pulls
    that layer toward the anchor, same as the reference's skip at
    gradient_fusion.py:128). Computed ON DEVICE from the tiny rank-r
    factors ((F, r) + (r, O) uploads are KBs; materializing the (F, O)
    product host-side and uploading it would pay the tunnel's per-transfer
    latency on MBs instead)."""
    if lora_leaf is None:
        return None
    d = jnp.asarray(lora_leaf['down'], jnp.float32)
    u = jnp.asarray(lora_leaf['up'], jnp.float32)
    # Precision pin: TPU fp32 matmuls default to bf16-input passes (~1e-3
    # relative error); these products feed an eigh solve with rank_tol=1e-6,
    # so they must be exact fp32 like the host-numpy path they replaced
    # (ADVICE r4 medium).
    return alpha * jnp.matmul(d, u, precision=jax.lax.Precision.HIGHEST)


_CLIP_POINT = {'q': 'qkv', 'k': 'qkv', 'v': 'qkv', 'out': 'out'}


def merge_text_encoder(parsed, concept_list, new_concept_cfg, tokenizer,
                       text_params, concept_table, text_config,
                       lam: float = 1e-4, method: str = 'exact',
                       iters: int = 500):
    """Phase 2 (reference gradient_fusion.py:460-576): for each concept,
    capture input grams of every LoRA'd linear while encoding that concept's
    bound prompts through the concept-LoRA'd text encoder; solve each layer
    against the concept-merged weights."""
    layer_paths = sorted({p for data in parsed
                          for p in flatten_lora(data['text_lora'])})
    if not layer_paths:
        return text_params, {}
    logger.info('text_encoder: %d linear layers to optimize',
                len(layer_paths))

    encode = jax.jit(lambda tp, table, lora, alpha, ids, mask:
                     clip_text_encode(
                         tp, ids, text_config, concept_embedding=table,
                         lora=lora, lora_alpha=alpha, capture_grams=True,
                         token_mask=mask))

    g_sums = {p: None for p in layer_paths}
    d_sums = {p: None for p in layer_paths}

    for data, concept in zip(parsed, concept_list):
        prompts = [TEMPLATE_SIMPLE.format(concept['concept_name']),
                   concept['concept_name']]
        bound = bind_concept_prompt(prompts, new_concept_cfg)
        ids = tokenizer(bound)
        # valid tokens: up to and including the first eos (the reference
        # tokenizes with do_not_pad — gradient_fusion.py:188-195)
        first_eos = (ids == EOS_TOKEN_ID).argmax(axis=1)
        mask = np.arange(ids.shape[1])[None, :] <= first_eos[:, None]
        alpha = float(concept.get('text_encoder_alpha', 1.0))
        _, grams_per_block = encode(text_params, jnp.asarray(concept_table),
                                    data['text_lora'] or None,
                                    jnp.float32(alpha),
                                    jnp.asarray(ids), jnp.asarray(mask))
        lora_flat = flatten_lora(data['text_lora'])
        for path in layer_paths:
            _, blk, _, proj = path.split('/')
            # grams stay ON DEVICE end to end: per-leaf fetches over the
            # remote-TPU tunnel cost ~1 s latency each (~5 MB/s effective —
            # this loop's np.asarray fetches alone measured 108 s, r4)
            g = grams_per_block[int(blk)][_CLIP_POINT[proj]]
            g_sums[path] = g if g_sums[path] is None else g_sums[path] + g
            dm = _lora_delta(lora_flat.get(path), alpha)
            if dm is not None:
                d = jnp.matmul(g, dm, precision=jax.lax.Precision.HIGHEST)
                d_sums[path] = d if d_sums[path] is None else d_sums[path] + d

    anchors = [get_path(text_params, p)['kernel'] for p in layer_paths]
    deltas = [d_sums[p] if d_sums[p] is not None else
              np.zeros(anchors[i].shape, np.float32)
              for i, p in enumerate(layer_paths)]
    solved, residuals = solve_layer_group(
        [g_sums[p] for p in layer_paths], deltas, anchors, lam=lam,
        method=method, iters=iters, device_out=True, with_residuals=True)
    new_params = _apply_kernels(text_params, dict(zip(layer_paths, solved)))
    _log_residuals('text_encoder', layer_paths, residuals)
    return new_params, dict(zip(layer_paths, solved))


# ------------------------------------------------------- phase 3: cross-KV
def category_embedding(text_params, text_config, concept_table, ids_row,
                       eos_inclusive: bool = True):
    """Final hidden states at positions with token id >= eos (concept tokens
    + the first eos), matching reference get_text_feature
    'category_embedding' (gradient_fusion.py:183-204, >= 49407 includes the
    end token)."""
    ids = np.asarray(ids_row)[None]
    emb = np.asarray(clip_text_encode(
        text_params, jnp.asarray(ids), text_config,
        concept_embedding=jnp.asarray(concept_table)))[0]
    first_eos = int((ids[0] == EOS_TOKEN_ID).argmax())
    sel = [i for i in range(first_eos + 1) if ids[0][i] >= EOS_TOKEN_ID]
    return emb[sel]


def merge_kv_in_cross_attention(parsed, concept_list, new_concept_cfg,
                                tokenizer, text_params, text_config,
                                concept_table, unet_params, unet_config,
                                lam: float = 1e-4, method: str = 'exact',
                                iters: int = 500):
    """Phase 3 (reference gradient_fusion.py:325-457): 32 to_k/to_v layers in
    down→mid→up order; per layer, K = that layer's concept text features
    (computed with the phase-2-merged text encoder), target = concept-merged
    KV applied to K."""
    prefixes = cross_layer_paths(unet_config)
    kv_paths: List[Tuple[int, str]] = []
    for layer_idx, prefix in enumerate(prefixes):
        kv_paths.append((layer_idx, f'{prefix}/attn2/to_k'))
        kv_paths.append((layer_idx, f'{prefix}/attn2/to_v'))
    logger.info('unet: %d cross-KV linear layers to optimize', len(kv_paths))

    g_sums = {p: None for _, p in kv_paths}
    d_sums = {p: None for _, p in kv_paths}

    encode_all = jax.jit(lambda tp, table, ids: clip_text_encode(
        tp, ids, text_config, concept_embedding=table))

    for data, concept in zip(parsed, concept_list):
        if not data['unet_crosskv']:
            continue
        prompts = [TEMPLATE_SIMPLE.format(concept['concept_name']),
                   concept['concept_name']]
        bound = bind_concept_prompt(prompts, new_concept_cfg)  # 2*16 prompts
        ids = tokenizer(bound)
        alpha = float(concept.get('unet_alpha', 1.0))
        lora_flat = flatten_lora(data['unet_crosskv'])
        # ONE jitted encoder pass over all 32 layer-prompts; category rows
        # (token id >= eos up to and including the first eos,
        # gradient_fusion.py:183-204) selected host-side per layer
        emb_all = np.asarray(encode_all(text_params,
                                        jnp.asarray(concept_table),
                                        jnp.asarray(ids)))
        feats = {}
        for layer_idx in range(NUM_CROSS_ATTENTION_LAYERS):
            rows = []
            for j in range(len(prompts)):
                r = j * NUM_CROSS_ATTENTION_LAYERS + layer_idx
                first_eos = int((ids[r] == EOS_TOKEN_ID).argmax())
                sel = [i for i in range(first_eos + 1)
                       if ids[r][i] >= EOS_TOKEN_ID]
                rows.append(emb_all[r][sel])
            feats[layer_idx] = np.concatenate(rows, 0).astype(np.float32)
        for layer_idx, path in kv_paths:
            # tiny (rows, 768) upload; gram on device so the solve inputs
            # never round-trip the tunnel
            ku = jnp.asarray(feats[layer_idx])
            g = jnp.matmul(ku.T, ku, precision=jax.lax.Precision.HIGHEST)
            g_sums[path] = g if g_sums[path] is None else g_sums[path] + g
            dm = _lora_delta(lora_flat.get(path), alpha)
            if dm is not None:
                d = jnp.matmul(g, dm, precision=jax.lax.Precision.HIGHEST)
                d_sums[path] = d if d_sums[path] is None else d_sums[path] + d

    active = [p for _, p in kv_paths if g_sums[p] is not None]
    if not active:
        return unet_params, {}
    anchors = [get_path(unet_params, p)['kernel'] for p in active]
    deltas = [d_sums[p] if d_sums[p] is not None
              else np.zeros(a.shape, np.float32)
              for p, a in zip(active, anchors)]
    solved, residuals = solve_layer_group(
        [g_sums[p] for p in active], deltas, anchors, lam=lam,
        device_out=True, with_residuals=True)
    new_params = _apply_kernels(unet_params, dict(zip(active, solved)))
    _log_residuals('unet cross-KV', active, residuals)
    return new_params, dict(zip(active, solved))


# ------------------------------------------------------ phase 4: spatial
# leaf (relative to the transformer-block prefix) -> UNet gram capture point.
# Full reference candidate coverage (gradient_fusion.py:637-641: attn2
# q/out, attn1.*, ff.net.0.proj / ff.net.2, proj_in / proj_out).
_UNET_POINT = {'attn1/to_q': 'attn1_qkv', 'attn1/to_k': 'attn1_qkv',
               'attn1/to_v': 'attn1_qkv', 'attn1/to_out': 'attn1_out',
               'attn2/to_q': 'attn2_q', 'attn2/to_out': 'attn2_out',
               'ff/proj': 'ff_in', 'ff/out': 'ff_out',
               'proj_in': 'proj_in', 'proj_out': 'proj_out'}


def _split_spatial_path(path: str, prefix_to_idx):
    """'down_blocks/0/attentions/1/attn1/to_q' -> (layer_idx, 'attn1/to_q');
    single-segment leaves (proj_in/proj_out) split one level up."""
    if path.endswith(('proj_in', 'proj_out')):
        prefix, leaf = path.rsplit('/', 1)
    else:
        prefix = path.rsplit('/', 2)[0]
        leaf = '/'.join(path.split('/')[-2:])
    return prefix_to_idx.get(prefix), leaf


def merge_spatial_attention(parsed, concept_list, new_concept_cfg, tokenizer,
                            text_params, text_config, concept_table,
                            unet_params, unet_config, scheduler=None,
                            num_inference_steps: int = 20,
                            record_nums: int = 20, image_size: int = 512,
                            seed: int = 0, lam: float = 1e-4,
                            method: str = 'exact', iters: int = 50,
                            compute_dtype=jnp.bfloat16):
    """Phase 4 (reference gradient_fusion.py:627-747): per concept, run a
    20-step denoise of 'photo of a <concept>' with the concept's spatial
    LoRA applied, accumulating input grams of the spatial linears at the
    recorded timesteps inside the scan; solve anchored at the (phase-3
    updated) weights."""
    layer_paths = sorted({p for data in parsed
                          for p in flatten_lora(data['unet_spatial'])})
    if not layer_paths:
        return unet_params, {}
    logger.info('unet: %d spatial linear layers to optimize',
                len(layer_paths))

    prefixes = cross_layer_paths(unet_config)
    prefix_to_idx = {p: i for i, p in enumerate(prefixes)}
    # capture only the gram points some delta actually carries (ff grams are
    # (4c, 4c) — expensive to emit when no ff layer needs solving)
    needed_points = tuple(sorted({
        _UNET_POINT[leaf]
        for _, leaf in (_split_spatial_path(p, prefix_to_idx)
                        for p in layer_paths)
        if leaf in _UNET_POINT}))
    scheduler = scheduler or DPMSolverMultistep.create()
    coeffs = scheduler.step_coeffs(num_inference_steps)
    n = num_inference_steps
    stride = max(n // record_nums, 1)
    record = np.zeros((n,), np.float32)
    record[np.arange(0, n, stride)[:record_nums]] = 1.0

    lat = image_size // 8
    unet_c = jax.tree.map(
        lambda x: jnp.asarray(x).astype(compute_dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        unet_params)

    @jax.jit
    def capture_run(unet_c, lora, alpha, embeds, latents, rec):
        # unet params are a traced ARGUMENT (closure constants of this size
        # would embed gigabytes in the HLO)
        def body(carry, i):
            sample, m_prev, gsum = carry
            eps, aux = unet_apply(unet_c, sample.astype(compute_dtype),
                                  jnp.broadcast_to(coeffs.timestep[i], (1,)),
                                  embeds, unet_config, lora=lora,
                                  lora_alpha=alpha,
                                  capture_grams=needed_points)
            w = rec[i]
            gsum = jax.tree.map(lambda a, g: a + w * g, gsum, aux['grams'])
            new_sample, m0 = scheduler.step(sample, m_prev, eps.astype(
                jnp.float32), coeffs, i)
            return (new_sample, m0, gsum), None

        eps0, aux0 = unet_apply(unet_c, jnp.zeros((1, lat, lat, 4),
                                                  compute_dtype),
                                jnp.zeros((1,), jnp.int32), embeds,
                                unet_config, lora=lora, lora_alpha=alpha,
                                capture_grams=needed_points)
        gsum0 = jax.tree.map(jnp.zeros_like, aux0['grams'])
        (final, _, gsum), _ = jax.lax.scan(
            body, (latents, jnp.zeros_like(latents), gsum0), jnp.arange(n))
        return gsum

    g_sums = {p: None for p in layer_paths}
    d_sums = {p: None for p in layer_paths}

    for ci, (data, concept) in enumerate(zip(parsed, concept_list)):
        if not data['unet_spatial']:
            continue
        prompt = TEMPLATE_SIMPLE.format(concept['concept_name'])
        bound = bind_concept_prompt([prompt], new_concept_cfg)
        ids = jnp.asarray(tokenizer(bound))
        embeds = clip_text_encode(text_params, ids, text_config,
                                  concept_embedding=jnp.asarray(concept_table))
        embeds = embeds.reshape(1, NUM_CROSS_ATTENTION_LAYERS,
                                *embeds.shape[1:]).astype(compute_dtype)
        latents = jax.random.normal(jax.random.PRNGKey(seed + ci),
                                    (1, lat, lat, 4), jnp.float32)
        alpha = float(concept.get('unet_alpha', 1.0))
        grams = capture_run(unet_c, data['unet_spatial'] or None,
                            jnp.asarray(alpha, compute_dtype), embeds,
                            latents, jnp.asarray(record))
        # grams stay ON DEVICE: this tree is multi-GB (ff grams are
        # (4c, 4c)) and per-leaf tunnel fetches run at ~5 MB/s (r4)

        lora_flat = flatten_lora(data['unet_spatial'])
        for path in layer_paths:
            layer_idx, leaf = _split_spatial_path(path, prefix_to_idx)
            point = _UNET_POINT.get(leaf)
            if layer_idx is None or point is None:
                logger.warning('no capture point for %s — skipped', path)
                continue
            g = grams[layer_idx][point]
            g_sums[path] = g if g_sums[path] is None else g_sums[path] + g
            dm = _lora_delta(lora_flat.get(path), alpha)
            if dm is not None:
                d = jnp.matmul(g, dm, precision=jax.lax.Precision.HIGHEST)
                d_sums[path] = d if d_sums[path] is None else d_sums[path] + d

    active = [p for p in layer_paths if g_sums[p] is not None]
    # 1x1-conv kernels (proj_in/proj_out) solve as their (in, out) matrix;
    # _apply_kernels restores the original (1, 1, in, out) shape
    anchors = [get_path(unet_params, p)['kernel'] for p in active]
    anchors = [a.reshape(-1, a.shape[-1]) for a in anchors]
    deltas = [d_sums[p] if d_sums[p] is not None
              else np.zeros(a.shape, np.float32)
              for p, a in zip(active, anchors)]
    solved, residuals = solve_layer_group(
        [g_sums[p] for p in active], deltas, anchors, lam=lam,
        device_out=True, with_residuals=True)
    new_params = _apply_kernels(unet_params, dict(zip(active, solved)))
    _log_residuals('unet spatial', active, residuals)
    return new_params, dict(zip(active, solved))


# ------------------------------------------------------------------ shared
def _apply_kernels(params, kernels: Dict[str, np.ndarray]):
    """Functional update: replace `kernel` leaves at the given paths."""
    def deep_copy(node):
        if isinstance(node, dict):
            return {k: deep_copy(v) for k, v in node.items()}
        if isinstance(node, list):
            return [deep_copy(v) for v in node]
        return node

    new = deep_copy(params)
    for path, kern in kernels.items():
        leaf = get_path(new, path)
        old = leaf['kernel']  # shape/dtype only — no host fetch
        leaf['kernel'] = jnp.asarray(kern.reshape(old.shape), old.dtype)
    return new


def _log_residuals(tag: str, paths, residuals):
    """Per-layer fit residual Σ_c‖X_c(Wn − Wm_c)‖² up to the Wn-independent
    constant — the optimization diagnostic the reference logs after LBFGS
    (gradient_fusion.py:87-95). Values come from solve_layer_group
    (with_residuals=True), computed while its stacked group buffers are
    live so the multi-GB spatial grams/deltas are never re-stacked."""
    for path, r in zip(paths, residuals):
        logger.info('%s %s: residual(core)=%.3e', tag, path, r)


# ------------------------------------------------------------------ driver
def compose_concepts(concept_cfg: str, pretrained_path: str, save_path: str,
                     suffix: str = 'base',
                     optimize_textenc_iters: int = 500,
                     optimize_unet_iters: int = 50,
                     lam_text: float = 1e-4, lam_unet: float = 1e-4,
                     spatial_steps: int = 20, image_size: int = 512,
                     seed: int = 0, bundle=None, solver: str = 'exact'):
    """Full 4-phase fusion; writes a diffusers-layout checkpoint +
    new_concept_cfg.json (reference compose_concepts,
    gradient_fusion.py:750-813). With solver='exact' (default) the batched
    spectral solve replaces iteration counts; solver='lbfgs' runs the
    iterative parity path with the reference's per-phase iteration budgets
    (fuse.sh:8-9)."""
    import time as _time
    t0 = _time.time()

    def _mark(msg):
        logger.info('%s [t+%.1fs]', msg, _time.time() - t0)

    if bundle is None:
        from mixofshow_tpu.zoo import load_models
        bundle = load_models(pretrained_path, seed=seed)

    _mark('------Step 1/2: load base + concept checkpoints------')
    parsed, concept_list = parse_new_concepts(concept_cfg)

    _mark('------Step 3: merge token embedding------')
    new_concept_cfg, concept_table = merge_new_concepts(
        parsed, concept_list, bundle.tokenizer)

    _mark('------Step 4: merge text encoder------')
    text_params, _ = merge_text_encoder(
        parsed, concept_list, new_concept_cfg, bundle.tokenizer,
        bundle.text_encoder, concept_table, bundle.text_config, lam=lam_text,
        method=solver, iters=optimize_textenc_iters)

    _mark('------Step 5: merge kv of cross-attention in unet------')
    unet_params, _ = merge_kv_in_cross_attention(
        parsed, concept_list, new_concept_cfg, bundle.tokenizer, text_params,
        bundle.text_config, concept_table, bundle.unet, bundle.unet_config,
        lam=lam_text, method=solver, iters=optimize_textenc_iters)

    _mark('------Step 6: merge spatial attention in unet------')
    unet_params, _ = merge_spatial_attention(
        parsed, concept_list, new_concept_cfg, bundle.tokenizer, text_params,
        bundle.text_config, concept_table, unet_params, bundle.unet_config,
        num_inference_steps=spatial_steps, record_nums=spatial_steps,
        image_size=image_size, seed=seed, lam=lam_unet,
        method=solver, iters=optimize_unet_iters)

    ckpt_path = os.path.join(save_path, f'combined_model_{suffix}')
    _mark(f'saving fused checkpoint to {ckpt_path}')
    # append concept rows to the token embedding so the saved text encoder is
    # a plain (expanded-vocab) diffusers checkpoint (reference relies on the
    # resized embedding being inside the saved pipe, gradient_fusion.py:230)
    text_out = dict(text_params)
    text_out['token_embedding'] = jnp.concatenate(
        [jnp.asarray(text_params['token_embedding']),
         jnp.asarray(concept_table,
                     jnp.asarray(text_params['token_embedding']).dtype)])
    from mixofshow_tpu.convert.diffusers_export import save_pipeline_params
    save_pipeline_params(ckpt_path, unet=unet_params, vae=bundle.vae,
                         text_encoder=text_out,
                         new_concept_cfg=new_concept_cfg)
    _mark('fused checkpoint saved')
    return ckpt_path, new_concept_cfg
