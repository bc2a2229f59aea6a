"""tools/parity_check.py: the one-command real-weights parity harness.

No SD weights exist in this environment, so the harness is exercised on
deterministic tiny models: the protocol, naming contract, emit format,
comparison math, report shape, and exit codes are what these tests pin
down — the day real checkpoints appear, parity is one command
(reference protocol: test_edlora.py:24-57)."""
import json
import sys

import numpy as np
import pytest

sys.path.insert(0, 'tools')
import parity_check  # noqa: E402


def _run(capsys, argv):
    rc = parity_check.main(argv)
    out = capsys.readouterr().out
    return rc, json.loads(out[out.index('{'):])


BASE = ['--pretrained', 'random:tiny', '--steps', '2', '--guidance', '4.0',
        '--height', '64', '--width', '64', '--batch', '2']


def test_emit_then_compare_self_consistent(tmp_path, capsys):
    """Two independent invocations on the same deterministic checkpoint:
    emit, then compare — bitwise-equal outputs, all pass, exit 0."""
    emit = str(tmp_path / 'ours')
    rc, rep = _run(capsys, BASE + [
        '--prompts', 'a photo of a dog', 'a castle', '--emit', emit])
    assert rc == 0
    assert [e['emitted'] for e in rep['images']] == [True, True]
    # protocol naming contract (shared with visual_validation / reference)
    assert rep['images'][0]['name'] == 'a_photo_of_a_dog---G_4.0_S_2---01'
    arr = np.load(tmp_path / 'ours' / (rep['images'][0]['name'] + '.npy'))
    assert arr.shape == (64, 64, 3) and arr.dtype == np.float32
    assert (tmp_path / 'ours' /
            (rep['images'][1]['name'] + '.png')).exists()

    rc2, rep2 = _run(capsys, BASE + [
        '--prompts', 'a photo of a dog', 'a castle', '--ref-dir', emit])
    assert rc2 == 0
    assert rep2['summary'] == {'pass': 2, 'fail': 0, 'all_pass': True}
    for e in rep2['images']:
        assert e['compared'] and e['pass'] and e['ref_format'] == 'npy'
        assert e['max_abs'] == 0.0 and e['psnr_db'] == 99.0
    assert 'device_kind' in rep2 and 'jax_version' in rep2


def test_mismatch_detected_and_png_fallback(tmp_path, capsys):
    """A perturbed stored reference fails the gates (exit 1); an 8-bit PNG
    reference is accepted with the quantization-widened mean gate."""
    emit = str(tmp_path / 'ref')
    rc, rep = _run(capsys, BASE + ['--prompts', 'a castle', '--emit', emit])
    name = rep['images'][0]['name']

    # png-only reference: drop the npy so comparison takes the png path
    (tmp_path / 'ref' / (name + '.npy')).unlink()
    rc2, rep2 = _run(capsys, BASE + ['--prompts', 'a castle',
                                     '--ref-dir', emit])
    assert rc2 == 0 and rep2['images'][0]['ref_format'] == 'png'
    assert rep2['images'][0]['max_abs'] <= 1 / 255 + 1e-6

    # perturb beyond tolerance -> fail, exit 1
    arr = np.asarray(
        parity_check._load_ref(str(tmp_path / 'ref' / name))[0])
    np.save(tmp_path / 'ref' / (name + '.npy'),
            np.clip(arr + 0.3, 0, 1).astype(np.float32))
    rc3, rep3 = _run(capsys, BASE + ['--prompts', 'a castle',
                                     '--ref-dir', emit])
    assert rc3 == 1 and not rep3['images'][0]['pass']
    assert not rep3['summary']['all_pass']

    # missing reference output -> counted as failure with a reason
    rc4, rep4 = _run(capsys, BASE + ['--prompts', 'another prompt',
                                     '--ref-dir', emit])
    assert rc4 == 1 and rep4['images'][0]['error'] == \
        'no reference output found'


@pytest.mark.slow
def test_delta_mode_applies_lora_and_concepts(tmp_path, capsys):
    """--delta: a reference-format ED-LoRA .pth saved by the trainer loads
    through the importer, registers its concepts, and changes the output
    vs the base checkpoint (alpha=0 matches the base)."""
    import jax
    import jax.numpy as jnp

    from mixofshow_tpu.convert.delta_io import save_edlora_delta
    from mixofshow_tpu.models import init_clip_text, init_unet, init_vae
    from mixofshow_tpu.pipelines.trainer_edlora import (EDLoRATrainer,
                                                        make_optimizer)
    from mixofshow_tpu.text import CLIPTokenizer
    from mixofshow_tpu.zoo import tiny_configs

    ucfg, ccfg, vcfg = tiny_configs()
    ft = {'text_embedding': {'enable_tuning': True, 'lr': 1e-3},
          'text_encoder': {'enable_tuning': True, 'lr': 1e-5,
                           'lora_cfg': {'rank': 4}},
          'unet': {'enable_tuning': True, 'lr': 1e-4,
                   'lora_cfg': {'rank': 4}}}
    # the same random:tiny base weights parity_check's load_models builds
    trainer = EDLoRATrainer(
        init_unet(0, ucfg), init_clip_text(1, ccfg), init_vae(2, vcfg),
        tokenizer=CLIPTokenizer(), unet_config=ucfg, text_config=ccfg,
        vae_config=vcfg, new_concept_token='<pet1>+<pet2>',
        initializer_token='<rand-0.013>+<rand-0.017>', finetune_cfg=ft,
        compute_dtype=jnp.float32)
    opt = make_optimizer(ft, total_steps=4)
    state = trainer.init_state(opt)
    step = trainer.make_train_step(opt)
    rng = np.random.default_rng(0)
    # one real step so LoRA weights are non-zero
    from mixofshow_tpu.pipelines.concepts import bind_concept_prompt
    bound = bind_concept_prompt(['a photo of <pet1> <pet2>'],
                                trainer.new_concept_cfg)
    ids = trainer.tokenizer(bound).reshape(1, 16, 77)
    row = ids[0, 0]
    pos = [i for i, t in enumerate(row) if t in trainer.concept_token_ids]
    batch = {
        'images': np.asarray(rng.normal(size=(1, 64, 64, 3)), np.float32),
        'text_ids': ids.astype(np.int32),
        'masks': np.ones((1, 8, 8, 1), np.float32),
        'img_masks': np.ones((1, 64, 64, 1), np.float32),
        'concept_pos': np.asarray([pos], np.int32),
        'concept_pos_mask': np.ones((1, len(pos)), np.float32),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(0),
                    trainer.frozen_params)
    delta_path = str(tmp_path / 'edlora_model-latest.pth')
    save_edlora_delta(delta_path, trainer.delta_state_dict(state))

    args = ['--pretrained', 'random:tiny', '--delta', delta_path,
            '--steps', '2', '--guidance', '4.0', '--height', '64',
            '--width', '64', '--prompts', 'a photo of <pet1> <pet2>']
    base_dir = str(tmp_path / 'alpha0')
    rc, rep = _run(capsys, args + ['--alpha', '0.0', '--emit', base_dir])
    assert rc == 0
    rc1, rep1 = _run(capsys, args + ['--alpha', '1.0', '--emit',
                                     str(tmp_path / 'alpha1'),
                                     '--ref-dir', base_dir])
    assert rep1['images'][0]['compared']
    # trained LoRA at alpha 1 must move the output away from alpha 0
    assert rep1['images'][0]['max_abs'] > 0
