"""End-to-end CLI chain on tiny models: train → test → fuse → regional.

Drives the four public entry points exactly as a user would (subprocesses),
on CPU with random-init tiny models — the full reference workflow
(SURVEY.md §3 call stacks) in one sitting.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMOKE_YML = """
name: e2e_tiny
manual_seed: 0
mixed_precision: bf16
gradient_accumulation_steps: 1
datasets:
  train:
    name: LoraDataset
    concept_list: concept.json
    use_caption: true
    use_mask: true
    instance_transform:
      - {{ type: HumanResizeCropFinalV3, size: 64, crop_p: 0.5 }}
      - {{ type: ToTensor }}
      - {{ type: Normalize, mean: [ 0.5 ], std: [ 0.5 ] }}
      - {{ type: EnhanceText, enhance_type: human }}
    replace_mapping:
      <TOK>: <a1> <a2>
    batch_size_per_gpu: 2
    dataset_enlarge_ratio: 2
  val_vis:
    name: PromptDataset
    prompts: prompts.txt
    num_samples_per_prompt: 1
    latent_size: [ 4,8,8 ]
    replace_mapping:
      <TOK>: <a1> <a2>
    batch_size_per_gpu: 2
models:
  pretrained_path: random:tiny
  enable_edlora: true
  finetune_cfg:
    text_embedding: {{ enable_tuning: true, lr: !!float 1e-3 }}
    text_encoder:
      enable_tuning: true
      lora_cfg: {{ rank: 4, alpha: 1.0, where: CLIPAttention }}
      lr: !!float 1e-5
    unet:
      enable_tuning: true
      lora_cfg: {{ rank: 4, alpha: 1.0, where: Attention }}
      lr: !!float 1e-4
  new_concept_token: <a1>+<a2>
  initializer_token: <rand-0.013>+<rand-0.017>
  noise_offset: 0.01
  use_mask_loss: true
train:
  optim_g: {{ type: AdamW, lr: !!float 0.0, weight_decay: 0.01, betas: [0.9, 0.999] }}
  emb_norm_threshold: !!float 5.5e-1
val:
  val_during_save: {val_during_save}
  compose_visualize: true
  alpha_list: [1.0]
  sample: {{ num_inference_steps: 2, guidance_scale: 7.5 }}
logger:
  print_freq: 2
  save_checkpoint_freq: 10000
"""


def run_cli(script, args, cwd):
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               PYTHONPATH=REPO + os.pathsep + os.environ.get('PYTHONPATH', ''))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys, runpy; sys.argv=[%r]+%r;"
        "runpy.run_path(%r, run_name='__main__')"
        % (script, args, os.path.join(REPO, script)))
    r = subprocess.run([sys.executable, '-c', code], cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, f'{script} failed:\n{r.stdout}\n{r.stderr}'
    return r


@pytest.mark.slow
def test_full_cli_chain(tmp_path):
    # --- assets
    img_dir = tmp_path / 'img'
    mask_dir = tmp_path / 'mask'
    cap_dir = tmp_path / 'cap'
    for d in (img_dir, mask_dir, cap_dir):
        d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (96, 80, 3),
                                     dtype=np.uint8)).save(img_dir / f'{i}.jpg')
        m = np.zeros((96, 80), np.uint8)
        m[20:70, 15:65] = 255
        Image.fromarray(m).save(mask_dir / f'{i}.png')
        (cap_dir / f'{i}.txt').write_text('<TOK>, test scene\n')
    (tmp_path / 'concept.json').write_text(json.dumps([{
        'instance_prompt': '<TOK>', 'instance_data_dir': str(img_dir),
        'caption_dir': str(cap_dir), 'mask_dir': str(mask_dir)}]))
    (tmp_path / 'prompts.txt').write_text('a photo of <TOK>\n')
    (tmp_path / 'train.yml').write_text(
        SMOKE_YML.format(val_during_save='false'))

    # --- 1. train
    run_cli('train_edlora.py', ['-opt', 'train.yml'], str(tmp_path))
    delta = tmp_path / 'experiments/e2e_tiny/models/edlora_model-latest.pth'
    assert delta.exists()

    # --- 2. checkpoint validation sweep
    (tmp_path / 'test.yml').write_text(f"""
name: e2e_tiny_test
manual_seed: 0
datasets:
  val_vis:
    name: PromptDataset
    prompts: prompts.txt
    num_samples_per_prompt: 1
    latent_size: [ 4,8,8 ]
    replace_mapping:
      <TOK>: <a1> <a2>
    batch_size_per_gpu: 2
models:
  pretrained_path: random:tiny
  enable_edlora: true
  new_concept_token: <a1>+<a2>
path:
  lora_path: {delta}
val:
  alpha_list: [0, 1.0]
  compose_visualize: true
  sample: {{ num_inference_steps: 2, guidance_scale: 7.5 }}
""")
    run_cli('test_edlora.py', ['-opt', 'test.yml'], str(tmp_path))
    assert (tmp_path / 'results/e2e_tiny_test/visualization/'
            'Alpha-1.0---composed.jpg').exists()

    # --- 3. fuse
    (tmp_path / 'fuse.json').write_text(json.dumps([{
        'lora_path': str(delta), 'unet_alpha': 1.0,
        'text_encoder_alpha': 1.0, 'concept_name': '<a1> <a2>'}]))
    run_cli('gradient_fusion.py',
            ['--concept_cfg', 'fuse.json', '--save_path', 'fused',
             '--pretrained_models', 'random:tiny', '--suffix', 'e2e',
             '--spatial_steps', '2', '--image_size', '64'], str(tmp_path))
    fused = tmp_path / 'fused/combined_model_e2e'
    assert (fused / 'new_concept_cfg.json').exists()

    # --- 4. regional sampling from the fused checkpoint
    run_cli('regionally_controlable_sampling.py',
            ['--pretrained_model', str(fused), '--model_size', 'tiny',
             '--height', '64', '--width', '64', '--num_inference_steps', '2',
             '--prompt', 'two friends', '--negative_prompt', 'low quality',
             '--prompt_rewrite',
             '[a <a1> <a2>]-*-[bad]-*-[0,0,64,32]|[a rock]-*-[]-*-[0,32,64,64]',
             '--save_dir', 'regional', '--seed', '3', '--suffix', 'e2e'],
            str(tmp_path))
    pngs = list((tmp_path / 'regional/seed_3').glob('*.png'))
    assert len(pngs) == 1
    assert Image.open(pngs[0]).size == (64, 64)

    # --- 5. regional with BOTH adapter conditions active (the reference
    # demo drives keypose + sketch together, reference
    # regionally_controlable_sampling.py:62-63) and a batched
    # num_images_per_prompt>1 — asserts N distinct output PNGs
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
        tmp_path / 'pose.png')
    Image.fromarray(np.zeros((64, 64), np.uint8)).save(
        tmp_path / 'sketch.png')
    run_cli('regionally_controlable_sampling.py',
            ['--pretrained_model', str(fused), '--model_size', 'tiny',
             '--num_inference_steps', '2',
             '--keypose_condition', 'pose.png',
             '--keypose_adaptor_weight', '0.8',
             '--sketch_condition', 'sketch.png',
             '--sketch_adaptor_weight', '0.6',
             '--region_sketch_adaptor_weight', '[0,0,32,32]-0.5',
             '--num_images_per_prompt', '2',
             '--prompt', 'two friends', '--negative_prompt', 'low quality',
             '--prompt_rewrite',
             '[a <a1> <a2>]-*-[bad]-*-[0,0,64,32]|[a rock]-*-[]-*-[0,32,64,64]',
             '--save_dir', 'regional', '--seed', '4', '--suffix', 'e2e'],
            str(tmp_path))
    pngs = sorted((tmp_path / 'regional/seed_4').glob('*.png'))
    assert len(pngs) == 2
    a, b = (np.asarray(Image.open(p), np.int32) for p in pngs)
    assert a.shape == (64, 64, 3)
    assert not np.array_equal(a, b)  # different noise per image
