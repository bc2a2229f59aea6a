"""Full train-state checkpointing (orbax) — resume capability.

The reference cannot resume training: it saves delta-only .pth with no
optimizer/scheduler state (SURVEY.md §5 'Checkpoint / resume'). Here the
complete TrainState (trainable params + optimizer moments + step +
embedding-freeze flag) round-trips through orbax, so interrupted tuning
continues bit-exactly.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def save_train_state(path: str, state) -> str:
    """Write the TrainState pytree; returns the checkpoint path."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        'trainable': state.trainable,
        'opt_state': state.opt_state,
        'step': state.step,
        'emb_frozen': state.emb_frozen,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_train_state(path: str, template_state):
    """Restore into the structure of `template_state` (from
    trainer.init_state) — shapes/dtypes must match the saved run."""
    import orbax.checkpoint as ocp
    import dataclasses
    ckptr = ocp.StandardCheckpointer()
    template = {
        'trainable': template_state.trainable,
        'opt_state': template_state.opt_state,
        'step': template_state.step,
        'emb_frozen': template_state.emb_frozen,
    }
    restored = ckptr.restore(os.path.abspath(path), template)
    return dataclasses.replace(
        template_state,
        trainable=restored['trainable'],
        opt_state=restored['opt_state'],
        step=restored['step'],
        emb_frozen=restored['emb_frozen'])
