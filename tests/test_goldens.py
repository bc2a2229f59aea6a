"""Golden end-to-end regressions (SURVEY.md §4 recommendation (b)).

Frozen fp32 outputs of the deterministic tiny-model workflows on the CPU
backend, committed under tests/goldens/. These catch silent numeric drift
anywhere in the stack (tokenizer → concept binding → CLIP → scan denoise →
VAE) that the structural/parity tests can't see — a refactor that changes
results changes these files, which is exactly the review signal we want.

Regenerate deliberately with: python tools/gen_goldens.py
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')


def _load(name):
    path = os.path.join(GOLDEN_DIR, name + '.npy')
    if not os.path.exists(path):
        pytest.skip(f'golden {name} missing — run tools/gen_goldens.py')
    return np.load(path)


def test_edlora_sampling_golden():
    from tools.gen_goldens import edlora_sample
    got = edlora_sample()
    np.testing.assert_allclose(got, _load('edlora_sample'), atol=2e-3,
                               err_msg='end-to-end sampling drifted')


def test_edlora_lora_alpha_golden():
    from tools.gen_goldens import edlora_sample_with_lora
    got = edlora_sample_with_lora()
    np.testing.assert_allclose(got, _load('edlora_sample_lora'), atol=2e-3,
                               err_msg='LoRA-applied sampling drifted')


def test_regional_sampling_golden():
    from tools.gen_goldens import regional_sample
    got = regional_sample()
    np.testing.assert_allclose(got, _load('regional_sample'), atol=2e-3,
                               err_msg='regional sampling drifted')


def test_train_losses_golden():
    from tools.gen_goldens import train_losses
    got = train_losses()
    np.testing.assert_allclose(got, _load('train_losses'), atol=1e-3,
                               err_msg='train-step loss trajectory drifted')
