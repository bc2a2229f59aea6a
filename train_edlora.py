#!/usr/bin/env python
"""Single-concept ED-LoRA tuning CLI.

Drop-in surface for the reference `train_edlora.py` (`python train_edlora.py
-opt options/train/EDLoRA/....yml`) rebuilt TPU-first: one compiled
data-parallel train step over a jax.sharding.Mesh (XLA emits the gradient
all-reduce the reference gets from accelerate/DDP, train_edlora.py:70,128),
host-threaded data pipeline, reference-format delta checkpoints, and
fixed-latent validation grids at each alpha.
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mixofshow_tpu.convert.delta_io import save_edlora_delta
from mixofshow_tpu.data import DataLoader, LoraDataset, PromptDataset, TrainBatcher
from mixofshow_tpu.data.loader import default_collate
from mixofshow_tpu.diffusion import DPMSolverMultistep
from mixofshow_tpu.parallel import make_mesh, shard_batch
from mixofshow_tpu.pipelines import EDLoRAPipeline
from mixofshow_tpu.pipelines.trainer_edlora import EDLoRATrainer, make_optimizer
from mixofshow_tpu.pipelines.validation import visual_validation
from mixofshow_tpu.utils.logging_utils import (MessageLogger, reduce_loss_dict,
                                               set_path_logger)
from mixofshow_tpu.utils.options import (dict2str, load_options,
                                         set_manual_seed)
from mixofshow_tpu.zoo import load_models


def build_trainer(opt, bundle, compute_dtype):
    mcfg = dict(opt['models'])
    mcfg.pop('pretrained_path', None)
    mcfg.pop('enable_xformers', None)  # attention impl is config-free here
    return EDLoRATrainer(
        bundle.unet, bundle.text_encoder, bundle.vae,
        tokenizer=bundle.tokenizer,
        unet_config=bundle.unet_config, text_config=bundle.text_config,
        vae_config=bundle.vae_config,
        new_concept_token=mcfg['new_concept_token'],
        initializer_token=mcfg.get('initializer_token'),
        enable_edlora=mcfg.get('enable_edlora', True),
        finetune_cfg=mcfg.get('finetune_cfg'),
        noise_offset=mcfg.get('noise_offset'),
        attn_reg_weight=mcfg.get('attn_reg_weight'),
        reg_full_identity=mcfg.get('reg_full_identity', True),
        use_mask_loss=mcfg.get('use_mask_loss', True),
        gradient_checkpoint=mcfg.get('gradient_checkpoint', False),
        emb_norm_threshold=float(opt['train'].get('emb_norm_threshold', 0.55)),
        seed=opt.get('manual_seed', 0),
        compute_dtype=compute_dtype)


def save_and_validation(opt, trainer, bundle, state, val_dataset, tag,
                        logger, mesh=None):
    lora_type = 'edlora' if opt['models'].get('enable_edlora', True) else 'lora'
    save_path = os.path.join(opt['path']['models'],
                             f'{lora_type}_model-{tag}.pth')
    delta = trainer.delta_state_dict(state)
    save_edlora_delta(save_path, delta)
    logger.info(f'Save state to {save_path}')
    # full-state checkpoint for exact resume (capability the reference lacks)
    from mixofshow_tpu.utils.checkpoint import save_train_state
    save_train_state(os.path.join(opt['path']['models'],
                                  f'train_state-{tag}'), state)

    if not opt['val'].get('val_during_save'):
        return
    concept_table = np.concatenate(
        [delta['new_concept_embedding'][name]
         for name in trainer.new_concept_cfg], axis=0)
    for alpha in opt['val'].get('alpha_list', [1.0]):
        logger.info(f'validation at alpha={alpha}')
        pipe = EDLoRAPipeline(
            bundle.unet, bundle.text_encoder, bundle.vae,
            tokenizer=bundle.tokenizer, unet_config=bundle.unet_config,
            text_config=bundle.text_config, vae_config=bundle.vae_config,
            scheduler=DPMSolverMultistep.create(
                prediction_type=bundle.prediction_type),
            new_concept_cfg=trainer.new_concept_cfg,
            concept_embedding=concept_table,
            unet_lora=state.trainable['unet_lora'] or None,
            text_lora=state.trainable['text_lora'] or None,
            lora_alpha=float(alpha),
            mesh=mesh if mesh is not None and
            mesh.shape['data'] > 1 else None)
        visual_validation(pipe, val_dataset,
                          f'Iters-{tag}_Alpha-{alpha}', opt)


def train(args):
    opt = load_options(args.opt)
    if opt.get('manual_seed') is not None:
        set_manual_seed(opt['manual_seed'])

    logger = set_path_logger(opt, args.opt, is_train=True)
    logger.info(dict2str(opt))
    logger.info(f'devices: {jax.devices()}')

    from mixofshow_tpu.utils.options import resolve_compute_dtype
    compute_dtype = resolve_compute_dtype(opt)
    bundle = load_models(opt['models'].get('pretrained_path'),
                         seed=opt.get('manual_seed', 0))
    trainer = build_trainer(opt, bundle, compute_dtype)

    # data
    trainset_cfg = opt['datasets']['train']
    train_dataset = LoraDataset(trainset_cfg)
    batcher = TrainBatcher(trainer.tokenizer, trainer.new_concept_cfg,
                           enable_edlora=trainer.enable_edlora)
    mesh = make_mesh()
    n_data = mesh.shape['data']
    batch_size = trainset_cfg['batch_size_per_gpu'] * n_data
    train_loader = DataLoader(
        train_dataset, batch_size=batch_size, shuffle=True, drop_last=True,
        seed=opt.get('manual_seed', 0),
        collate_fn=lambda items: batcher(default_collate(items)))
    val_dataset = PromptDataset(opt['datasets']['val_vis'])

    accum = opt.get('gradient_accumulation_steps', 1)
    total_iter = int(len(train_dataset) / (batch_size * accum))
    opt['train']['total_iter'] = total_iter
    logger.info('***** Running training *****')
    logger.info(f'  Num examples = {len(train_dataset)}')
    logger.info(f'  Total train batch size = {batch_size * accum}')
    logger.info(f'  Total optimization steps = {total_iter}')
    logger.info(f'  Text-encoder LoRAs = {trainer.num_text_loras}, '
                f'UNet LoRAs = {trainer.num_unet_loras}')

    optimizer = make_optimizer(trainer.finetune_cfg, total_iter,
                               opt['train'].get('optim_g'), grad_accum=accum)
    state = trainer.init_state(optimizer)
    if args.resume:
        from mixofshow_tpu.utils.checkpoint import load_train_state
        resume_path = args.resume
        # launching with the same experiment name archives the previous dir;
        # follow the checkpoint into its archived location
        archived = opt['path'].get('archived_root')
        exp_root = opt['path']['experiments_root']
        if archived and not os.path.exists(resume_path) and \
                os.path.abspath(resume_path).startswith(
                    os.path.abspath(exp_root)):
            resume_path = os.path.abspath(resume_path).replace(
                os.path.abspath(exp_root), archived, 1)
        state = load_train_state(resume_path, state)
        logger.info(f'resumed from {resume_path} at step {int(state.step)}')
    step_fn = trainer.make_train_step(optimizer)
    msg_logger = MessageLogger(opt, 1)

    lrs_cfg = [
        float(trainer.finetune_cfg.get('text_embedding', {}).get('lr', 1e-3)),
        float(trainer.finetune_cfg.get('text_encoder', {}).get('lr', 1e-5)),
        float(trainer.finetune_cfg.get('unet', {}).get('lr', 1e-4)),
    ]
    print_freq = opt.get('logger', {}).get('print_freq', 10)
    save_freq = int(opt.get('logger', {}).get('save_checkpoint_freq', 1e10))
    rng = jax.random.PRNGKey(opt.get('manual_seed', 0))

    # state.step counts micro-steps; optimizer updates apply every `accum`
    global_step = int(state.step) // accum
    yielder = train_loader.infinite()
    while global_step < total_iter:
        for _ in range(accum):
            batch = next(yielder)
            batch = shard_batch(mesh, batch)
            rng, step_rng = jax.random.split(rng)
            state, loss_dict = step_fn(state, batch, step_rng,
                                        trainer.frozen_params)
        global_step += 1

        if global_step % print_freq == 0:
            decay = max(0.0, 1.0 - global_step / total_iter)
            log_vars = {'iter': global_step,
                        'lrs': [lr * decay for lr in lrs_cfg]}
            log_vars.update(reduce_loss_dict(loss_dict))
            msg_logger(log_vars)

        if global_step % save_freq == 0:
            save_and_validation(opt, trainer, bundle, state, val_dataset,
                                global_step, logger, mesh=mesh)

    save_and_validation(opt, trainer, bundle, state, val_dataset, 'latest',
                        logger, mesh=mesh)
    logger.info('training done.')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True)
    parser.add_argument('--resume', type=str, default=None,
                        help='train_state checkpoint dir to resume from')
    args = parser.parse_args()
    train(args)
