"""EDLoRAPipeline: single/multi-concept text-to-image sampling, jit-compiled.

TPU-native equivalent of the reference `EDLoRAPipeline`
(mixofshow/pipelines/pipeline_edlora.py:32-322). Public surface mirrors the
reference __call__ (prompt, height, width, num_inference_steps,
guidance_scale, negative_prompt, latents, output_type), but the architecture
is jit-first:

  * prompt expansion + tokenization on host → one (16B, 77) int32 batch;
  * the entire CFG denoise loop is ONE compiled function: `lax.scan` over
    the DPM-Solver++ coefficient tables, batched [uncond; cond] UNet call
    per step (reference loops 50 Python iterations over `unet(...)` —
    pipeline_edlora.py:271-295);
  * weights flow in as arguments (donate-able), so alpha sweeps / checkpoint
    reloads don't recompile;
  * compute dtype bf16 by default, fp32 latents in the solver update.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from mixofshow_tpu.diffusion import DPMSolverMultistep
from mixofshow_tpu.models.clip import CLIPTextConfig, clip_text_encode
from mixofshow_tpu.models.layers import cast_floats, to_device
from mixofshow_tpu.models.unet import UNetConfig, unet_apply
from mixofshow_tpu.models.vae import VAEConfig, vae_decode
from mixofshow_tpu.pipelines.concepts import (NUM_CROSS_ATTENTION_LAYERS,
                                              bind_concept_prompt)
from mixofshow_tpu.text.tokenizer import CLIPTokenizer


@functools.partial(jax.jit, static_argnames=('ccfg',))
def _encode_ids(te_params, ids, concept_embedding, ccfg, lora=None,
                lora_alpha=1.0):
    return clip_text_encode(te_params, ids, ccfg,
                            concept_embedding=concept_embedding,
                            lora=lora, lora_alpha=lora_alpha)


@functools.partial(
    jax.jit,
    static_argnames=('ucfg', 'use_cfg'),
    donate_argnames=('latents',))
def _sample_loop(unet_params, lora, lora_alpha, prompt_embeds, latents,
                 guidance_scale, coeffs, ucfg: UNetConfig,
                 solver: DPMSolverMultistep, use_cfg: bool):
    """Full denoise loop as one scan. prompt_embeds: (2B or B, 16, 77, C)."""
    def body(carry, i):
        sample, m_prev = carry
        latent_in = jnp.concatenate([sample, sample]) if use_cfg else sample
        t = coeffs.timestep[i]
        eps, _ = unet_apply(unet_params, latent_in,
                            jnp.broadcast_to(t, (latent_in.shape[0],)),
                            prompt_embeds, ucfg, lora=lora,
                            lora_alpha=lora_alpha)
        if use_cfg:
            eps_u, eps_c = jnp.split(eps, 2)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        new_sample, m0 = solver.step(sample, m_prev, eps, coeffs, i)
        return (new_sample, m0), None

    n = coeffs.timestep.shape[0]
    (final, _), _ = jax.lax.scan(
        body, (latents, jnp.zeros_like(latents)), jnp.arange(n))
    return final


@functools.partial(jax.jit, static_argnames=('vcfg',))
def _decode(vae_params, latents, vcfg: VAEConfig):
    img = vae_decode(vae_params, latents / vcfg.scaling_factor, vcfg)
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


class EDLoRAPipeline:
    """Sampling pipeline over functional param trees.

    Construction mirrors what `EDLoRAPipeline.from_pretrained` + merge gives
    the reference (test_edlora.py:91-94): pass base (or delta-merged) params.
    Unmerged LoRA can also be supplied (`lora=`, `lora_alpha=`) — sampling
    applies it on the fly, which is how alpha sweeps avoid re-merging."""

    def __init__(self, unet_params, text_encoder_params, vae_params,
                 tokenizer: Optional[CLIPTokenizer] = None,
                 unet_config: UNetConfig = UNetConfig(),
                 text_config: CLIPTextConfig = CLIPTextConfig(),
                 vae_config: VAEConfig = VAEConfig(),
                 scheduler: Optional[DPMSolverMultistep] = None,
                 new_concept_cfg: Optional[Dict] = None,
                 concept_embedding=None,
                 unet_lora=None, text_lora=None, lora_alpha: float = 1.0,
                 mesh=None,
                 dtype=jnp.bfloat16):
        # mesh: optional jax.sharding.Mesh — sampling batches are sharded
        # over its 'data' axis (params replicated), so validation sweeps
        # scale across chips (the reference distributes validation via
        # accelerate processes, test_edlora.py:24-57).
        self.mesh = mesh
        self.dtype = dtype
        # pin weights on device once (host leaves would re-transfer per call)
        self.unet_params = to_device(cast_floats(unet_params, dtype))
        self.text_encoder_params = to_device(
            cast_floats(text_encoder_params, dtype))
        self.vae_params = to_device(cast_floats(vae_params, dtype))
        self.tokenizer = tokenizer or CLIPTokenizer()
        self.unet_config = unet_config
        self.text_config = text_config
        self.vae_config = vae_config
        self.scheduler = scheduler or DPMSolverMultistep.create()
        self.new_concept_cfg = new_concept_cfg
        self.concept_embedding = (None if concept_embedding is None else
                                  jnp.asarray(concept_embedding, dtype))
        self.unet_lora = None if unet_lora is None else \
            to_device(cast_floats(unet_lora, dtype))
        self.text_lora = None if text_lora is None else \
            to_device(cast_floats(text_lora, dtype))
        self.lora_alpha = lora_alpha

    def set_new_concept_cfg(self, new_concept_cfg: Optional[Dict] = None):
        self.new_concept_cfg = new_concept_cfg

    # ------------------------------------------------------------ encoding
    def encode_prompt(self, prompt: Union[str, Sequence[str]],
                      negative_prompt: Optional[Union[str, Sequence[str]]] = None,
                      do_cfg: bool = True) -> jnp.ndarray:
        """(2B or B, 16, 77, C) prompt embeddings, [uncond; cond] order
        (reference pipeline_edlora.py:111-190)."""
        assert self.new_concept_cfg is not None, 'set_new_concept_cfg first'
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        b = len(prompts)
        expanded = bind_concept_prompt(prompts, self.new_concept_cfg)
        ids = jnp.asarray(self.tokenizer(expanded))
        emb = _encode_ids(self.text_encoder_params, ids,
                          self.concept_embedding, self.text_config,
                          self.text_lora,
                          jnp.asarray(self.lora_alpha, jnp.float32))
        emb = emb.reshape(b, NUM_CROSS_ATTENTION_LAYERS, *emb.shape[1:])
        if not do_cfg:
            return emb
        if negative_prompt is None:
            neg = [''] * b
        elif isinstance(negative_prompt, str):
            neg = [negative_prompt] * b
        else:
            neg = list(negative_prompt)
            assert len(neg) == b, 'negative_prompt batch mismatch'
        nids = jnp.asarray(self.tokenizer(neg))
        nemb = _encode_ids(self.text_encoder_params, nids,
                           self.concept_embedding, self.text_config,
                           self.text_lora,
                           jnp.asarray(self.lora_alpha, jnp.float32))
        nemb = jnp.broadcast_to(
            nemb[:, None], (b, NUM_CROSS_ATTENTION_LAYERS, *nemb.shape[1:]))
        return jnp.concatenate([nemb, emb])

    # ------------------------------------------------------------ sampling
    def __call__(self,
                 prompt: Union[str, Sequence[str]] = None,
                 height: int = 512,
                 width: int = 512,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 7.5,
                 negative_prompt: Optional[Union[str, Sequence[str]]] = None,
                 latents: Optional[np.ndarray] = None,
                 seed: int = 0,
                 output_type: str = 'np'):
        """Sample images. Returns (B, H, W, 3) float np array in [0,1]
        ('np'), uint8 PIL list ('pil'), or raw latents ('latent').

        `latents` accepts externally supplied noise — NCHW (B,4,h,w) like the
        reference (pipeline_edlora.py:204) or NHWC — which is the fp32-parity
        path (SURVEY.md §7)."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        b = len(prompts)
        do_cfg = guidance_scale > 1.0
        embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)

        h, w = height // 8, width // 8
        if latents is None:
            lat = jax.random.normal(jax.random.PRNGKey(seed), (b, h, w, 4),
                                    jnp.float32)
        else:
            lat = jnp.asarray(latents, jnp.float32)
            if lat.ndim == 4 and lat.shape[1] == 4 and lat.shape[-1] != 4:
                lat = jnp.transpose(lat, (0, 2, 3, 1))  # NCHW -> NHWC
        lat = lat * self.scheduler.init_noise_sigma()

        if self.mesh is not None:
            from mixofshow_tpu.parallel import batch_sharding
            sh = batch_sharding(self.mesh)
            lat = jax.device_put(lat, sh)
            # embeds are [uncond; cond] along axis 0 — shard each half so a
            # device keeps its samples' uncond+cond pair together
            if embeds.shape[0] == 2 * b:
                neg, pos = jnp.split(embeds, 2)
                embeds = jnp.concatenate([jax.device_put(neg, sh),
                                          jax.device_put(pos, sh)])
            else:
                embeds = jax.device_put(embeds, sh)

        coeffs = self.scheduler.step_coeffs(num_inference_steps)
        final = _sample_loop(self.unet_params, self.unet_lora,
                             jnp.asarray(self.lora_alpha, self.dtype),
                             embeds.astype(self.dtype), lat,
                             jnp.float32(guidance_scale), coeffs,
                             self.unet_config, self.scheduler, do_cfg)
        if output_type == 'latent':
            return np.asarray(final)
        img = _decode(self.vae_params, final.astype(self.dtype),
                      self.vae_config)
        img = np.asarray(img.astype(jnp.float32))
        if output_type == 'pil':
            from PIL import Image
            return [Image.fromarray((x * 255).round().astype(np.uint8))
                    for x in img]
        return img
