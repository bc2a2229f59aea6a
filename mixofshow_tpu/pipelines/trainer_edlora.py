"""ED-LoRA trainer: masked diffusion loss + attention regularization, jit-first.

TPU-native equivalent of the reference `EDLoRATrainer`
(mixofshow/pipelines/trainer_edlora.py:20-379) and the train loop
(train_edlora.py:105-158). Architectural differences (SURVEY.md §7):

  * the trainable state is its own pytree {concept_embedding, text_lora,
    unet_lora}; base weights are frozen closure constants — no
    requires_grad bookkeeping or row-restore tricks;
  * embedding freezing (train_edlora.py:141-143: permanently stop embedding
    updates once mean concept-row norm >= threshold) is a boolean in the
    train state that zeroes the embedding update — same semantics, no
    snapshot/copy;
  * attention maps for the regularizer are functional aux outputs of the
    UNet (vs the reference's AttentionStore controller hooks,
    ptp_util.py:22-101);
  * the whole step (loss, backward, optimizer, freeze logic) is ONE compiled
    function, data-parallel over the mesh's 'data' axis; XLA emits the
    gradient all-reduce (the reference's accelerate DDP sync,
    train_edlora.py:128).

Batches are fully tensorized host-side by the data pipeline: prompts arrive
as pre-bound (B, 16, 77) token ids and concept-token positions — string work
never crosses the jit boundary.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mixofshow_tpu.diffusion.ddpm import DDPMSchedule, make_ddpm_schedule
from mixofshow_tpu.models.clip import CLIPTextConfig, clip_text_encode
from mixofshow_tpu.models.lora import init_lora_tree, num_lora_leaves
from mixofshow_tpu.models.unet import UNetConfig, unet_apply
from mixofshow_tpu.models.vae import VAEConfig, sample_latents, vae_encode
from mixofshow_tpu.pipelines.concepts import (NUM_CROSS_ATTENTION_LAYERS,
                                              all_concept_token_ids,
                                              init_concepts)
from mixofshow_tpu.text.tokenizer import CLIPTokenizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    trainable: Any
    opt_state: Any
    step: jnp.ndarray
    emb_frozen: jnp.ndarray  # bool scalar — sticky freeze flag


def make_optimizer(finetune_cfg: Dict, total_steps: int,
                   optim_cfg: Optional[Dict] = None,
                   grad_accum: int = 1) -> optax.GradientTransformation:
    """Three AdamW groups with independent lrs + shared linear-decay schedule
    (reference train_edlora.py:57,85-90; group lrs from finetune_cfg).

    grad_accum > 1 wraps the whole transform in optax.MultiSteps — gradients
    average over k micro-steps before one optimizer update (the reference's
    accelerate.accumulate, train_edlora.py:106)."""
    optim_cfg = optim_cfg or {}
    wd = float(optim_cfg.get('weight_decay', 0.01))
    b1, b2 = optim_cfg.get('betas', (0.9, 0.999))

    def adamw(lr, group_wd=None):
        sched = optax.linear_schedule(float(lr), 0.0, total_steps)
        return optax.adamw(sched, b1=b1, b2=b2,
                           weight_decay=wd if group_wd is None else group_wd)

    emb_cfg = finetune_cfg.get('text_embedding', {})
    text_cfg = finetune_cfg.get('text_encoder', {})
    unet_cfg = finetune_cfg.get('unet', {})
    transforms = {
        'emb': adamw(emb_cfg.get('lr', 1e-3), emb_cfg.get('weight_decay')),
        'text': adamw(text_cfg.get('lr', 1e-5)),
        'unet': adamw(unet_cfg.get('lr', 1e-4)),
    }

    def labeler(params):
        return {
            'concept_embedding': 'emb',
            'text_lora': jax.tree.map(lambda _: 'text', params['text_lora']),
            'unet_lora': jax.tree.map(lambda _: 'unet', params['unet_lora']),
        }

    tx = optax.multi_transform(transforms, param_labels=labeler)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def attn_reg_loss(cross_probs, masks, concept_pos, concept_pos_mask,
                  attn_reg_weight: float, reg_full_identity: bool,
                  latent_hw: Tuple[int, int]):
    """Cross-attention regularizer (reference trainer_edlora.py:263-313).

    cross_probs: list of (place, layer_idx, probs (B, heads, Q, 77)).
    masks: (B, h, w, 1) latent-resolution instance masks.
    concept_pos: (B, 2) int token positions — [adjective, subject], matching
    the reference's new_token_pos ordering; concept_pos_mask marks validity.

    Groups maps by spatial resolution (h/{1,2,4,8}), averages heads+layers,
    normalizes each concept map by its global max, then penalizes
    probability mass outside the instance mask (adjective always;
    subject either full-mask MSE or outside-mass, trainer_edlora.py:305-310).
    """
    h0, w0 = latent_hw
    b = masks.shape[0]
    groups: Dict[int, list] = {}
    for _, _, probs in cross_probs:
        q = probs.shape[2]
        # spatial dims at this layer: (h0/s, w0/s) with q = h0*w0/s^2
        s = int(round((h0 * w0 / q) ** 0.5))
        groups.setdefault(s, []).append(probs)

    total = jnp.float32(0.0)
    for s, plist in sorted(groups.items()):
        h, w = h0 // s, w0 // s
        cat = jnp.concatenate(plist, axis=1)   # heads*layers on axis 1
        amap = cat.mean(axis=1).reshape(b, h, w, cat.shape[-1])
        amap = amap.astype(jnp.float32)
        # concept columns (B, h, w, 2) — pre-sliced inside the UNet when
        # prob_columns was passed (last dim == K), else gathered here; zero
        # out padded positions (concept_pos_mask marks which of
        # [adjective, subject] were found — padded entries index position 0,
        # the BOS column, which must not enter the normalization or penalty)
        if amap.shape[-1] == concept_pos.shape[-1]:
            sel = amap
        else:
            sel = jnp.take_along_axis(
                amap, concept_pos[:, None, None, :], axis=-1)
        if concept_pos_mask is not None:
            sel = sel * concept_pos_mask[:, None, None, :]
            v_adj = concept_pos_mask[:, 0]
            v_subj = concept_pos_mask[:, 1]
        else:
            v_adj = v_subj = jnp.ones((b,), jnp.float32)
        map_adj, map_subj = sel[..., 0], sel[..., 1]
        map_subj = map_subj / (map_subj.max() + 1e-12)
        map_adj = map_adj / (map_adj.max() + 1e-12)

        gt = jax.image.resize(masks.astype(jnp.float32), (b, h, w, 1),
                              method='nearest')[..., 0]
        outside = 1.0 - gt
        n_out = outside.sum()
        safe_out = jnp.maximum(n_out, 1.0)

        if reg_full_identity:
            per = ((map_subj - gt) ** 2).mean(axis=(1, 2))  # (B,)
            loss_subj = (per * v_subj).sum() / jnp.maximum(v_subj.sum(), 1.0)
        else:
            loss_subj = (map_subj * outside).sum() / safe_out
        loss_adj = (map_adj * outside).sum() / safe_out
        valid = (n_out > 0).astype(jnp.float32)  # NaN guard (ref :257)
        total = total + attn_reg_weight * valid * (loss_subj + loss_adj)
    return total


class EDLoRATrainer:
    """Builds the trainable state and the compiled train step.

    Frozen base params flow through the compiled step as ARGUMENTS (see
    `frozen_params`) — never as closure constants, which would embed
    gigabytes into the HLO; cfg mirrors the reference YAML `models:`
    section."""

    def __init__(self,
                 unet_params, text_encoder_params, vae_params,
                 tokenizer: Optional[CLIPTokenizer] = None,
                 unet_config: UNetConfig = UNetConfig(),
                 text_config: CLIPTextConfig = CLIPTextConfig(),
                 vae_config: VAEConfig = VAEConfig(),
                 scheduler: Optional[DDPMSchedule] = None,
                 new_concept_token: str = '<new1_1>+<new1_2>',
                 initializer_token: Optional[str] = None,
                 enable_edlora: bool = True,
                 finetune_cfg: Optional[Dict] = None,
                 noise_offset: Optional[float] = None,
                 attn_reg_weight: Optional[float] = None,
                 reg_full_identity: bool = True,
                 use_mask_loss: bool = True,
                 gradient_checkpoint: bool = False,
                 emb_norm_threshold: float = 0.55,
                 seed: int = 0,
                 compute_dtype=jnp.bfloat16):
        self.unet_params = unet_params
        self.text_encoder_params = text_encoder_params
        self.vae_params = vae_params
        self.tokenizer = tokenizer or CLIPTokenizer()
        self.unet_config = unet_config
        self.text_config = text_config
        self.vae_config = vae_config
        self.scheduler = scheduler or make_ddpm_schedule()
        self.enable_edlora = enable_edlora
        self.noise_offset = noise_offset
        self.attn_reg_weight = attn_reg_weight
        self.reg_full_identity = reg_full_identity
        self.use_mask_loss = use_mask_loss
        self.gradient_checkpoint = gradient_checkpoint
        self.emb_norm_threshold = emb_norm_threshold
        self.compute_dtype = compute_dtype
        self.finetune_cfg = finetune_cfg or {}

        rng = np.random.default_rng(seed)
        self.new_concept_cfg, concept_table = init_concepts(
            self.tokenizer, new_concept_token, initializer_token,
            np.asarray(text_encoder_params['token_embedding']),
            enable_edlora=enable_edlora, rng=rng)

        # LoRA trees per finetune_cfg 'where' filters
        text_lora: Dict = {}
        if self.finetune_cfg.get('text_encoder', {}).get('enable_tuning'):
            lcfg = self.finetune_cfg['text_encoder'].get('lora_cfg', {})
            # where=CLIPAttention → the attention q/k/v/out linears
            text_lora = init_lora_tree(
                rng, text_encoder_params,
                path_filter=lambda p: '/attn/' in p,
                rank=int(lcfg.get('rank', 4)))
        unet_lora: Dict = {}
        if self.finetune_cfg.get('unet', {}).get('enable_tuning'):
            lcfg = self.finetune_cfg['unet'].get('lora_cfg', {})
            # where=Attention → attn1+attn2 to_q/to_k/to_v/to_out
            unet_lora = init_lora_tree(
                rng, unet_params,
                path_filter=lambda p: '/attn1/' in p or '/attn2/' in p,
                rank=int(lcfg.get('rank', 4)))
        self.lora_alpha = float(
            self.finetune_cfg.get('unet', {}).get('lora_cfg', {})
            .get('alpha', 1.0))

        self.trainable_init = {
            'concept_embedding': jnp.asarray(concept_table),
            'text_lora': text_lora,
            'unet_lora': unet_lora,
        }
        self.num_text_loras = num_lora_leaves(text_lora)
        self.num_unet_loras = num_lora_leaves(unet_lora)
        self.concept_token_ids = all_concept_token_ids(self.new_concept_cfg)

    @property
    def frozen_params(self):
        """The non-trainable model weights, passed to the compiled step
        (device-pinned once — host leaves would re-transfer every step)."""
        if getattr(self, '_frozen_device', None) is None:
            import jax as _jax
            tree = {'unet': self.unet_params,
                    'text_encoder': self.text_encoder_params,
                    'vae': self.vae_params}
            # First access can happen INSIDE a trace (loss_fn's
            # `frozen or self.frozen_params` fallback under jit/grad):
            # device_put then yields tracers, which must not be cached —
            # they'd escape the trace and poison every later call. Return
            # the host tree (becomes compile-time constants, fine for the
            # small-model paths that omit `frozen`) and cache nothing.
            if any(isinstance(x, _jax.core.Tracer)
                   for x in _jax.tree.leaves(tree)):
                return tree
            from mixofshow_tpu.models.layers import to_device
            placed = to_device(tree)
            if any(isinstance(x, _jax.core.Tracer)
                   for x in _jax.tree.leaves(placed)):
                return tree
            self._frozen_device = placed
        return self._frozen_device

    # -------------------------------------------------------------- states
    def init_state(self, optimizer: optax.GradientTransformation) -> TrainState:
        # one batched host->device transfer, then fresh on-device copies:
        # the train step donates its input state, and donated buffers must
        # not alias self.trainable_init
        on_device = jax.device_put(self.trainable_init)
        trainable = jax.tree.map(lambda x: jnp.array(x, copy=True), on_device)
        return TrainState(
            trainable=trainable,
            opt_state=optimizer.init(trainable),
            step=jnp.zeros((), jnp.int32),
            emb_frozen=jnp.zeros((), bool),
        )

    # ---------------------------------------------------------------- loss
    def loss_fn(self, trainable, rng, batch, frozen=None):
        """Diffusion MSE (masked) + attention regularization.

        batch: images (B,H,W,3) in [-1,1]; text_ids (B,16,77) pre-bound;
        masks (B,h,w,1) latent-res; img_masks (B,H,W,1);
        concept_pos (B,2) + concept_pos_mask (B,2).
        `frozen`: the frozen_params dict (traced args under jit; defaults to
        the trainer's own trees for direct eager use).
        Mirrors reference trainer_edlora.py:202-261."""
        frozen = frozen or self.frozen_params
        cdt = self.compute_dtype
        images = batch['images'].astype(cdt)
        b = images.shape[0]
        k_vae, k_noise, k_off, k_t = jax.random.split(rng, 4)

        mean, logvar = vae_encode(frozen['vae'], images, self.vae_config)
        latents = sample_latents(k_vae, mean.astype(jnp.float32),
                                 logvar.astype(jnp.float32))
        latents = latents * self.vae_config.scaling_factor
        latents = jax.lax.stop_gradient(latents)

        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        if self.noise_offset is not None:
            noise = noise + self.noise_offset * jax.random.normal(
                k_off, (b, 1, 1, latents.shape[-1]), jnp.float32)
        t = jax.random.randint(k_t, (b,), 0,
                               self.scheduler.num_train_timesteps)
        noisy = self.scheduler.add_noise(latents, noise, t)

        ids = batch['text_ids']
        if self.enable_edlora:
            flat_ids = ids.reshape(b * NUM_CROSS_ATTENTION_LAYERS, -1)
        else:
            flat_ids = ids.reshape(b, -1)
        ehs = clip_text_encode(
            frozen['text_encoder'], flat_ids, self.text_config,
            concept_embedding=trainable['concept_embedding'],
            lora=trainable['text_lora'] or None,
            lora_alpha=self.lora_alpha, dtype=cdt)
        if self.enable_edlora:
            ehs = ehs.reshape(b, NUM_CROSS_ATTENTION_LAYERS, *ehs.shape[1:])

        want_probs = self.attn_reg_weight is not None
        pred, aux = unet_apply(
            frozen['unet'], noisy.astype(cdt), t, ehs, self.unet_config,
            lora=trainable['unet_lora'] or None, lora_alpha=self.lora_alpha,
            return_cross_probs=want_probs,
            prob_columns=batch['concept_pos'] if want_probs else None,
            remat=self.gradient_checkpoint)

        target = self.scheduler.target(latents, noise, t)
        loss_mask = (batch['masks'] if self.use_mask_loss
                     else batch['img_masks']).astype(jnp.float32)
        if loss_mask.shape[1] != pred.shape[1]:
            loss_mask = jax.image.resize(
                loss_mask, (b, pred.shape[1], pred.shape[2], 1), 'nearest')
        se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        per = (se * loss_mask).sum((1, 2, 3)) / \
            jnp.maximum(loss_mask.sum((1, 2, 3)), 1.0)
        loss = per.mean()
        loss_dict = {'loss': loss}

        if want_probs:
            reg = attn_reg_loss(
                aux['cross_probs'], batch['masks'], batch['concept_pos'],
                batch.get('concept_pos_mask'),
                self.attn_reg_weight, self.reg_full_identity,
                (pred.shape[1], pred.shape[2]))
            loss = loss + reg
            loss_dict['loss_attn_reg'] = reg
        return loss, loss_dict

    # ----------------------------------------------------------- train step
    def make_train_step(self, optimizer: optax.GradientTransformation):
        """One compiled step: grad → optax update → sticky embedding freeze.
        Data-parallel under pjit: shard batch leading axis over 'data'.

        The returned step takes (state, batch, rng, frozen=None); pass
        trainer.frozen_params explicitly for large models so base weights
        are traced arguments, not embedded constants."""

        def train_step(state: TrainState, batch, rng, frozen=None):
            (loss, loss_dict), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(state.trainable, rng, batch,
                                            frozen)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.trainable)
            # permanently freeze concept embedding once norm hits threshold
            # (reference train_edlora.py:135-143)
            frz = state.emb_frozen
            updates = dict(updates)
            updates['concept_embedding'] = jnp.where(
                frz, 0.0, updates['concept_embedding'])
            trainable = optax.apply_updates(state.trainable, updates)
            norm_mean = jnp.linalg.norm(
                trainable['concept_embedding'], axis=-1).mean()
            loss_dict['Norm_mean'] = norm_mean
            new_frz = jnp.logical_or(frz,
                                     norm_mean >= self.emb_norm_threshold)
            new_state = TrainState(trainable=trainable, opt_state=opt_state,
                                   step=state.step + 1, emb_frozen=new_frz)
            return new_state, loss_dict

        return jax.jit(train_step, donate_argnums=(0,))

    # -------------------------------------------------------------- deltas
    def delta_state_dict(self, state: TrainState) -> Dict:
        """Checkpoint payload: concept embeddings + LoRA trees
        (reference trainer_edlora.py:362-379 saves the same three groups)."""
        emb = np.asarray(state.trainable['concept_embedding'])
        per_concept = {}
        vocab = self.text_config.vocab_size
        for name, cfg in self.new_concept_cfg.items():
            rows = [tid - vocab for tid in cfg['concept_token_ids']]
            per_concept[name] = emb[rows]
        return {
            'new_concept_embedding': per_concept,
            'text_lora': jax.tree.map(np.asarray, state.trainable['text_lora']),
            'unet_lora': jax.tree.map(np.asarray, state.trainable['unet_lora']),
            'new_concept_cfg': self.new_concept_cfg,
        }

    def load_delta_state_dict(self, state: TrainState, delta: Dict) -> TrainState:
        """Resume path (reference trainer_edlora.py:315-360)."""
        emb = np.asarray(state.trainable['concept_embedding']).copy()
        vocab = self.text_config.vocab_size
        for name, cfg in self.new_concept_cfg.items():
            if name in delta.get('new_concept_embedding', {}):
                rows = [tid - vocab for tid in cfg['concept_token_ids']]
                emb[rows] = delta['new_concept_embedding'][name]
        trainable = dict(state.trainable)
        trainable['concept_embedding'] = jnp.asarray(emb)
        for key in ('text_lora', 'unet_lora'):
            if delta.get(key):
                trainable[key] = jax.tree.map(
                    lambda _, new: jnp.asarray(new), trainable[key],
                    delta[key])
        return dataclasses.replace(state, trainable=trainable)
