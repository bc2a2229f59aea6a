"""Validation sampling: fixed-latent prompt sweeps + composed grids.

Behavioral equivalent of the reference `visual_validation`
(test_edlora.py:24-57) + `save_and_validation` (train_edlora.py:165-189):
sample every validation prompt with its deterministic per-index latent at
each LoRA alpha, write per-image PNGs, compose a labelled grid.

TPU-first: alphas reuse ONE compiled sampling program — alpha rides in as a
traced scalar on unmerged LoRA (the reference re-builds and re-merges an
fp16 pipeline per alpha, test_edlora.py:91-94)."""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from mixofshow_tpu.data.loader import DataLoader, default_collate
from mixofshow_tpu.pipelines.pipeline_edlora import EDLoRAPipeline
from mixofshow_tpu.utils.options import NEGATIVE_PROMPT
from mixofshow_tpu.utils.vis import (array_to_pil, compose_visualize,
                                     pil_imwrite, safe_filename)


def visual_validation(pipe: EDLoRAPipeline, val_dataset, suffix: str,
                      opt: Dict):
    """Sample every (prompt, index) pair and write PNGs + composed grid."""
    sample_cfg = opt['val'].get('sample', {})
    steps = sample_cfg.get('num_inference_steps', 50)
    guidance = sample_cfg.get('guidance_scale', 7.5)
    batch_size = opt['datasets']['val_vis'].get('batch_size_per_gpu', 4)
    vis_dir = os.path.join(opt['path']['visualization'], suffix)

    # distributed validation: with a mesh on the pipe, pad each batch to a
    # multiple of the 'data' axis so samples spread across chips (the
    # reference splits validation across accelerate processes,
    # test_edlora.py:24-57; here XLA shards one program instead)
    n_data = pipe.mesh.shape['data'] if pipe.mesh is not None else 1
    if n_data > 1 and batch_size % n_data:
        batch_size = -(-batch_size // n_data) * n_data

    loader = DataLoader(val_dataset, batch_size=batch_size, shuffle=False,
                        drop_last=False, collate_fn=default_collate)

    def _drain(pending_item):
        """Fetch one dispatched batch and write its PNGs (all host work)."""
        handle, batch, n_real = pending_item
        images = handle.result()[:n_real]
        for img, prompt, idx in zip(images, batch['prompts'],
                                    batch['indices']):
            name = (f'{safe_filename(prompt)}---G_{guidance}_S_{steps}---'
                    f'{int(idx):02d}.png')
            pil_imwrite(array_to_pil(img), os.path.join(vis_dir, name))

    # 1-deep pipelined sweep: dispatch batch i+1 before fetching batch i, so
    # host work (tokenization of the next batch, pixel fetch over the
    # tunnel, PIL encode) overlaps device compute — the serving pattern
    # (`submit`) applied to the validation sweep, which otherwise pays
    # ~0.3-0.4 s/batch of exposed host time on the blocking path. The
    # reference hides the same cost by distributing validation across
    # accelerate processes (test_edlora.py:24-57).
    pending = None
    for batch in loader:
        latents = np.stack(batch['latents']) if isinstance(
            batch['latents'], list) else batch['latents']
        prompts = list(batch['prompts'])
        n_real = len(prompts)
        if n_data > 1 and n_real % n_data:
            pad = -(-n_real // n_data) * n_data - n_real
            prompts = prompts + [prompts[-1]] * pad
            latents = np.concatenate(
                [latents, np.repeat(latents[-1:], pad, axis=0)])
        handle = pipe.submit(prompts,
                             height=latents.shape[-2] * 8,
                             width=latents.shape[-1] * 8,
                             num_inference_steps=steps,
                             guidance_scale=guidance,
                             negative_prompt=[NEGATIVE_PROMPT] * len(prompts),
                             latents=latents, output_type='np')
        if pending is not None:
            _drain(pending)
        pending = (handle, batch, n_real)
    if pending is not None:
        _drain(pending)

    if opt['val'].get('compose_visualize'):
        return compose_visualize(vis_dir)
    return vis_dir
