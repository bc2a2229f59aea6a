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

# Attention-processor routing for the sampling path. Default 'packed'
# (MOS_FUSE_ATTENTION=2): long-context self-attention runs through
# ops/fused_attention.attention_packed — full-width XLA projections
# against zero-padded weights + the packed flash kernel slicing
# 128-aligned head columns — measured 1.146 -> 1.152 img/s serial and
# 1.223 -> 1.240 pipelined end-to-end on v5e (docs/Performance.md r3).
# '1' = the whole-processor attention_block kernel: measured SLOWER on
# every UNet shape (padding flops at d=40 equal the layout tax it dodges;
# end-to-end 0.94 img/s) — kept for measurement. '0' = plain mh_attention.
import os as _os
FUSE_ATTENTION = {'0': False, '1': True, '2': 'packed',
                  'packed': 'packed'}.get(
    _os.environ.get('MOS_FUSE_ATTENTION', '2'), False)

# Hoist the 32 cross-attention K/V text projections out of the denoise scan
# (they are loop-invariant: the text context never changes across steps, and
# XLA's while-loop LICM does not lift them). Costs ~60 MB HBM at CFG b8.
# MOS_HOIST_CROSS_KV=0 restores the in-scan projections for A/B.
HOIST_CROSS_KV = _os.environ.get('MOS_HOIST_CROSS_KV', '1') != '0'


@functools.partial(jax.jit, static_argnames=('ccfg',))
def _encode_ids(te_params, ids, concept_embedding, ccfg, lora=None,
                lora_alpha=1.0):
    return clip_text_encode(te_params, ids, ccfg,
                            concept_embedding=concept_embedding,
                            lora=lora, lora_alpha=lora_alpha)


@functools.partial(
    jax.jit,
    static_argnames=('ucfg', 'use_cfg', 'capture_sizes'),
    donate_argnames=('latents',))
def _sample_loop(unet_params, lora, lora_alpha, prompt_embeds, latents,
                 guidance_scale, coeffs, ucfg: UNetConfig,
                 solver: DPMSolverMultistep, use_cfg: bool,
                 capture_sizes=()):
    """Full denoise loop as one scan. prompt_embeds: (2B or B, 16, 77, C).

    `capture_sizes` — static ((place, layer_idx, q_len), ...) — turns on the
    attention-controller path: those layers' cross-attention probabilities
    are SUMMED over steps inside the scan carry (constant memory) and
    returned for the host-side AttentionStore (replaces the reference's
    controller processor + per-step callback,
    pipeline_edlora.py:107,292-295 / edlora.py:193-218)."""
    capture = {(place, idx): q for place, idx, q in capture_sizes}

    ckv = None
    if HOIST_CROSS_KV:
        from mixofshow_tpu.models.unet import cross_attention_kv
        # evaluated once per sampling call: this sits outside the scanned
        # body, so the while loop closes over the 32 projected K/V tensors
        # as loop invariants instead of recomputing them every step
        ckv = cross_attention_kv(unet_params, prompt_embeds, ucfg,
                                 lora=lora, alpha=lora_alpha)

    def body(carry, i):
        sample, m_prev, psum = carry
        latent_in = jnp.concatenate([sample, sample]) if use_cfg else sample
        # the scan carries fp32 latents (solver accuracy) but the UNet must
        # run in the COMPUTE dtype — unet_apply keys its internal dtype off
        # the sample, and an fp32 UNet eval measures 3.4x slower than bf16
        # on v5e (75.4 vs 22.3 ms at CFG-b8)
        latent_in = latent_in.astype(prompt_embeds.dtype)
        t = coeffs.timestep[i]
        eps, aux = unet_apply(unet_params, latent_in,
                              jnp.broadcast_to(t, (latent_in.shape[0],)),
                              prompt_embeds, ucfg, lora=lora,
                              lora_alpha=lora_alpha,
                              return_cross_probs=bool(capture),
                              fuse_attention=FUSE_ATTENTION,
                              cross_kv=ckv)
        eps = eps.astype(jnp.float32)
        if capture:
            for place, idx, probs in aux['cross_probs']:
                if (place, idx) in psum:
                    psum[(place, idx)] = psum[(place, idx)] \
                        + probs.astype(jnp.float32)
        if use_cfg:
            eps_u, eps_c = jnp.split(eps, 2)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        new_sample, m0 = solver.step(sample, m_prev, eps, coeffs, i)
        return (new_sample, m0, psum), None

    bsz = prompt_embeds.shape[0]
    klen = prompt_embeds.shape[-2]
    psum0 = {(place, idx): jnp.zeros((bsz, ucfg.attention_heads, q, klen),
                                     jnp.float32)
             for place, idx, q in capture_sizes}
    n = coeffs.timestep.shape[0]
    (final, _, psum), _ = jax.lax.scan(
        body, (latents, jnp.zeros_like(latents), psum0), jnp.arange(n),
        unroll=2 if n % 2 == 0 else 1)
    return final, psum


@functools.partial(
    jax.jit, static_argnames=('ucfg', 'use_cfg', 'capture_sizes'))
def _single_step(unet_params, lora, lora_alpha, prompt_embeds, sample,
                 m_prev, guidance_scale, coeffs, i, ucfg: UNetConfig,
                 solver: DPMSolverMultistep, use_cfg: bool,
                 capture_sizes=()):
    """One denoise step (the callback path — per-step host control like the
    reference's Python loop, pipeline_edlora.py:271-295)."""
    capture = {(place, idx) for place, idx, _ in capture_sizes}
    latent_in = jnp.concatenate([sample, sample]) if use_cfg else sample
    latent_in = latent_in.astype(prompt_embeds.dtype)  # bf16 UNet, fp32 solver
    t = coeffs.timestep[i]
    eps, aux = unet_apply(unet_params, latent_in,
                          jnp.broadcast_to(t, (latent_in.shape[0],)),
                          prompt_embeds, ucfg, lora=lora,
                          lora_alpha=lora_alpha,
                          return_cross_probs=bool(capture),
                          fuse_attention=FUSE_ATTENTION)
    eps = eps.astype(jnp.float32)
    probs = {(place, idx): p.astype(jnp.float32)
             for place, idx, p in aux.get('cross_probs', [])
             if (place, idx) in capture}
    if use_cfg:
        eps_u, eps_c = jnp.split(eps, 2)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
    new_sample, m0 = solver.step(sample, m_prev, eps, coeffs, i)
    return new_sample, m0, probs


@functools.partial(jax.jit, static_argnames=('vcfg', 'dtype'))
def _decode(vae_params, latents, vcfg: VAEConfig, dtype=None):
    # cast INSIDE the jit: an eager astype is a separate dispatch (a full
    # round trip on remote-device links)
    if dtype is not None:
        latents = latents.astype(dtype)
    img = vae_decode(vae_params, latents / vcfg.scaling_factor, vcfg)
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=('vcfg', 'dtype'))
def _decode_uint8(vae_params, latents, vcfg: VAEConfig, dtype=None):
    """Decode straight to uint8 pixels ON DEVICE — the PIL path ends in
    uint8 anyway (reference numpy_to_pil), and fetching uint8 moves 4x
    fewer bytes across the host link."""
    img = _decode.__wrapped__(vae_params, latents, vcfg,
                              dtype).astype(jnp.float32)
    return jnp.round(img * 255.0).astype(jnp.uint8)


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
                 dtype=jnp.bfloat16,
                 quantize: Optional[str] = None):
        # mesh: optional jax.sharding.Mesh — sampling batches are sharded
        # over its 'data' axis (params replicated), so validation sweeps
        # scale across chips (the reference distributes validation via
        # accelerate processes, test_edlora.py:24-57).
        self.mesh = mesh
        self.dtype = dtype
        # pin weights on device once (host leaves would re-transfer per call)
        unet_params = cast_floats(unet_params, dtype)
        if quantize in ('int8', 'int8+conv'):
            # opt-in int8 serving mode: transformer dense pool runs on the
            # MXU's 2x int8 path (ops/quant.py); beyond the reference's
            # surface, so never a default.
            from mixofshow_tpu.ops.quant import quantize_unet
            unet_params = quantize_unet(unet_params,
                                        convs=(quantize == 'int8+conv'))
        elif quantize is not None:
            raise ValueError(f'unknown quantize mode: {quantize!r}')
        self.unet_params = to_device(unet_params)
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
        self.controller = None

    def set_new_concept_cfg(self, new_concept_cfg: Optional[Dict] = None):
        self.new_concept_cfg = new_concept_cfg

    def set_controller(self, controller):
        """Attach an attention controller (utils.ptp.AttentionStore) fed with
        cross-attention maps captured during sampling — the reference's
        set_controller + EDLoRA_Control_AttnProcessor path
        (pipeline_edlora.py:107, edlora.py:193-218). Maps larger than the
        controller's max_size**2 queries are never materialized (the
        reference's <=32^2 inference store, ptp_util.py:74-77). Pass None to
        detach."""
        self.controller = controller

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

    def _stepwise_loop(self, embeds, lat, guidance_scale, coeffs, do_cfg,
                       capture_sizes, callback, callback_steps):
        """Python-loop sampling for per-step host callbacks (reference
        pipeline_edlora.py:292-295: `callback(i, t, latents)` +
        `controller.step_callback`). One jitted step, reused across i."""
        n = int(coeffs.timestep.shape[0])
        sample, m_prev = lat, jnp.zeros_like(lat)
        psum = {}
        alpha = jnp.asarray(self.lora_alpha, self.dtype)
        embeds = embeds.astype(self.dtype)
        for i in range(n):
            sample, m_prev, probs = _single_step(
                self.unet_params, self.unet_lora, alpha, embeds, sample,
                m_prev, jnp.float32(guidance_scale), coeffs, jnp.int32(i),
                self.unet_config, self.scheduler, do_cfg, capture_sizes)
            for key, p in probs.items():
                psum[key] = p if key not in psum else psum[key] + p
            if self.controller is not None and \
                    hasattr(self.controller, 'step_callback'):
                stepped = self.controller.step_callback(np.asarray(sample))
                if stepped is not None:
                    sample = jnp.asarray(stepped, sample.dtype)
            if callback is not None and i % callback_steps == 0:
                callback(i, int(coeffs.timestep[i]), np.asarray(sample))
        return sample, psum

    # ------------------------------------------------------------ sampling
    def __call__(self,
                 prompt: Union[str, Sequence[str]] = None,
                 height: int = 512,
                 width: int = 512,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 7.5,
                 negative_prompt: Optional[Union[str, Sequence[str]]] = None,
                 num_images_per_prompt: int = 1,
                 latents: Optional[np.ndarray] = None,
                 prompt_embeds: Optional[jnp.ndarray] = None,
                 callback=None,
                 callback_steps: int = 1,
                 seed: int = 0,
                 output_type: str = 'pil'):
        """Sample images. Returns a uint8 PIL list ('pil', the default —
        matching the reference surface, pipeline_edlora.py:207), a
        (B, H, W, 3) float np array in [0,1] ('np'), or raw latents
        ('latent'). 'pil' is also the fast fetch path: pixels are uint8 on
        device, so the host transfer is 4x smaller than 'np'.

        `latents` accepts externally supplied noise — NCHW (B,4,h,w) like the
        reference (pipeline_edlora.py:204) or NHWC — which is the fp32-parity
        path (SURVEY.md §7). `prompt_embeds` bypasses encoding with
        pre-computed (2B or B, 16, 77, C) embeddings; `callback(i, t,
        latents_nhwc)` is invoked every `callback_steps` steps (this takes
        the stepwise path — one jitted step per call instead of one scan —
        mirroring reference pipeline_edlora.py:201-211,292-295)."""
        if prompt_embeds is not None:
            embeds = jnp.asarray(prompt_embeds)
            do_cfg = guidance_scale > 1.0
            b = embeds.shape[0] // 2 if do_cfg else embeds.shape[0]
        else:
            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            b = len(prompts)
            do_cfg = guidance_scale > 1.0
            embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        if num_images_per_prompt > 1:
            # group repeats per prompt (reference repeat_interleave-style,
            # pipeline_edlora.py:146-150), keeping [uncond; cond] halves
            n = num_images_per_prompt
            if do_cfg:
                neg, pos = jnp.split(embeds, 2)
                embeds = jnp.concatenate([jnp.repeat(neg, n, axis=0),
                                          jnp.repeat(pos, n, axis=0)])
            else:
                embeds = jnp.repeat(embeds, n, axis=0)
            b = b * n

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
        capture_sizes = ()
        if self.controller is not None:
            from mixofshow_tpu.models.unet import cross_layer_query_sizes
            capture_sizes = tuple(
                (place, idx, q)
                for place, idx, q in cross_layer_query_sizes(
                    self.unet_config, h, w)
                if q <= self.controller.max_size ** 2)
        if callback is not None:
            final, psum = self._stepwise_loop(
                embeds, lat, guidance_scale, coeffs, do_cfg, capture_sizes,
                callback, callback_steps)
        else:
            final, psum = _sample_loop(
                self.unet_params, self.unet_lora,
                jnp.asarray(self.lora_alpha, self.dtype),
                embeds.astype(self.dtype), lat,
                jnp.float32(guidance_scale), coeffs,
                self.unet_config, self.scheduler, do_cfg, capture_sizes)
        if self.controller is not None:
            self.controller.store_summed(
                [(place, idx, np.asarray(m))
                 for (place, idx), m in sorted(psum.items())],
                num_inference_steps)
        if output_type.startswith('_defer:'):
            return self._materialize(final, output_type[7:], fetch=False)
        return self._materialize(final, output_type, fetch=True)

    def _materialize(self, final, output_type: str, fetch: bool):
        """Decode latents per output_type. With fetch=False everything stays
        dispatched on device (async) — `PendingSample.result` fetches."""
        if output_type == 'latent':
            return np.asarray(final) if fetch else final
        if output_type == 'pil':
            pixels = _decode_uint8(self.vae_params, final, self.vae_config,
                                   dtype=self.dtype)
            if not fetch:
                return pixels
            from PIL import Image
            return [Image.fromarray(x) for x in np.asarray(pixels)]
        img = _decode(self.vae_params, final, self.vae_config,
                      dtype=self.dtype)
        return np.asarray(img).astype(np.float32) if fetch else img

    def submit(self, *args, output_type: str = 'pil', **kwargs
               ) -> 'PendingSample':
        """Serving-throughput entry point: dispatch the full sampling
        program (encode → scan denoise → decode) WITHOUT fetching results.

        JAX dispatch is asynchronous, so the host returns as soon as the
        work is enqueued; calling `submit` for the next batch while the
        previous `PendingSample.result()` is outstanding overlaps host-side
        tokenization/PIL/fetch with device compute — the deployment pattern
        for a sampling service (device-side work stays strictly serial).
        Not available together with `callback`/controller paths (those are
        host-synchronous by design)."""
        assert self.controller is None, 'submit() with a controller is ' \
            'host-synchronous — use __call__'
        assert kwargs.get('callback') is None
        dev = self.__call__(*args, output_type='_defer:' + output_type,
                            **kwargs)
        return PendingSample(dev, output_type)


class PendingSample:
    """Handle for a dispatched-but-unfetched sampling batch
    (`EDLoRAPipeline.submit`). All device work (denoise scan + decode) is
    already enqueued; `result()` only transfers and wraps."""

    def __init__(self, device_out, output_type: str):
        self._dev = device_out
        self._output_type = output_type

    def result(self):
        if self._output_type == 'pil':
            from PIL import Image
            return [Image.fromarray(x) for x in np.asarray(self._dev)]
        if self._output_type == 'latent':
            return np.asarray(self._dev)
        return np.asarray(self._dev).astype(np.float32)
