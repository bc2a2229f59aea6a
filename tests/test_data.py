"""Data pipeline: transforms, dataset, loader, batcher tensorization."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from mixofshow_tpu.data import (DataLoader, LoraDataset, PromptDataset,
                                TrainBatcher, build_transform)
from mixofshow_tpu.data.loader import default_collate
from mixofshow_tpu.data.pil_transform import PairCompose
from mixofshow_tpu.pipelines.concepts import init_concepts
from mixofshow_tpu.text import CLIPTokenizer


@pytest.fixture(scope='module')
def concept_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('concept')
    img_dir = root / 'img'
    mask_dir = root / 'mask'
    cap_dir = root / 'caption'
    for d in (img_dir, mask_dir, cap_dir):
        d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (200 + 40 * i, 160, 3),
                                     dtype=np.uint8)).save(img_dir / f'{i}.jpg')
        m = np.zeros((200 + 40 * i, 160), np.uint8)
        m[40:160, 30:120] = 255
        Image.fromarray(m).save(mask_dir / f'{i}.png')
        (cap_dir / f'{i}.txt').write_text(f'<TOK>, image number {i}, on grass\n')
    cfg = [{
        'instance_prompt': '<TOK>',
        'instance_data_dir': str(img_dir),
        'caption_dir': str(cap_dir),
        'mask_dir': str(mask_dir),
    }]
    cfg_path = root / 'concept.json'
    cfg_path.write_text(json.dumps(cfg))
    return str(cfg_path)


TRANSFORMS = [
    {'type': 'HumanResizeCropFinalV3', 'size': 64, 'crop_p': 0.5},
    {'type': 'ToTensor'},
    {'type': 'Normalize', 'mean': [0.5], 'std': [0.5]},
    {'type': 'ShuffleCaption', 'keep_token_num': 1},
    {'type': 'EnhanceText', 'enhance_type': 'human'},
]


def test_transform_pipeline_shapes():
    t = PairCompose([build_transform(o) for o in TRANSFORMS])
    img = Image.fromarray(np.zeros((100, 80, 3), np.uint8))
    mask = Image.fromarray(np.full((100, 80), 255, np.uint8))
    out, extra = t(img, prompts='<a1> <a2>, extra tag', mask=mask)
    assert out.shape == (64, 64, 3) and out.dtype == np.float32
    assert out.min() >= -1 and out.max() <= 1
    assert extra['mask'].shape == (8, 8)
    assert extra['img_mask'].shape == (8, 8)
    assert '<a1> <a2>' in extra['prompts']


def test_lora_dataset_and_loader(concept_dir):
    ds = LoraDataset({
        'concept_list': concept_dir,
        'use_caption': True,
        'use_mask': True,
        'replace_mapping': {'<TOK>': '<a1> <a2>'},
        'instance_transform': TRANSFORMS,
        'dataset_enlarge_ratio': 10,
    })
    assert len(ds) == 30
    ex = ds[0]
    assert ex['images'].shape == (64, 64, 3)
    assert ex['masks'].shape == (8, 8, 1)
    assert ex['img_masks'].shape == (8, 8, 1)
    assert '<a1> <a2>' in ex['prompts']

    tok = CLIPTokenizer()
    base = np.zeros((49408, 32), np.float32)
    cfg, _ = init_concepts(tok, '<a1>+<a2>', None, base)
    batcher = TrainBatcher(tok, cfg)
    loader = DataLoader(ds, batch_size=2, seed=0,
                        collate_fn=lambda items: batcher(default_collate(items)))
    assert len(loader) == 15
    batch = next(iter(loader))
    assert batch['images'].shape == (2, 64, 64, 3)
    assert batch['text_ids'].shape == (2, 16, 77)
    assert batch['masks'].shape == (2, 8, 8, 1)
    assert batch['concept_pos'].shape == (2, 2)
    assert batch['concept_pos_mask'].sum() == 4  # both tokens found, both rows
    # the layerwise ids really differ between layers (different <newK>)
    assert not np.array_equal(batch['text_ids'][0, 0], batch['text_ids'][0, 1])


def test_prompt_dataset(tmp_path):
    pfile = tmp_path / 'prompts.txt'
    pfile.write_text('a photo of <TOK> at the beach\n\na <TOK> portrait\n')
    ds = PromptDataset({
        'prompts': str(pfile),
        'num_samples_per_prompt': 2,
        'latent_size': [4, 8, 8],
        'replace_mapping': {'<TOK>': '<a1> <a2>'},
    })
    assert len(ds) == 4
    a, b = ds[0], ds[1]
    assert a['prompts'] == 'a photo of <a1> <a2> at the beach'
    assert a['latents'].shape == (4, 8, 8)
    # same index -> same latent across prompts; different index differs
    same_idx = [ex for ex in (ds[i] for i in range(4)) if ex['indices'] == 1]
    np.testing.assert_array_equal(same_idx[0]['latents'],
                                  same_idx[1]['latents'])
    diff = [ex for ex in (ds[i] for i in range(4)) if ex['indices'] == 2]
    assert not np.array_equal(same_idx[0]['latents'], diff[0]['latents'])


def test_asset_configs_parse():
    """Every shipped train/test YAML parses through load_options with the
    schema train_edlora.py consumes, and its data cfg / prompt files exist
    (reference asset categories: options/train/EDLoRA/{real,anime}/**,
    datasets/** — /root/reference/options, /root/reference/datasets)."""
    import glob
    import json
    import os

    from mixofshow_tpu.utils.options import load_options

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_ymls = glob.glob(os.path.join(root, 'options/train/EDLoRA/*/*.yml'))
    test_ymls = glob.glob(os.path.join(root, 'options/test/EDLoRA/*/*.yml'))
    cats = {p.split(os.sep)[-2] for p in train_ymls}
    assert {'real', 'anime'} <= cats, f'missing categories: {cats}'
    assert len(train_ymls) >= 6 and len(test_ymls) >= 6
    for yml in train_ymls:
        opt = load_options(yml)
        ft = opt['models']['finetune_cfg']
        assert ft['unet']['lora_cfg']['rank'] == 4
        assert opt['models']['new_concept_token'].count('+') == 1
        ds = opt['datasets']['train']
        cfg_path = os.path.join(root, ds['concept_list'])
        assert os.path.exists(cfg_path), cfg_path
        with open(cfg_path) as f:
            concept = json.load(f)
        assert concept[0]['instance_prompt'] == '<TOK>'
        prompts = os.path.join(root, opt['datasets']['val_vis']['prompts'])
        assert os.path.exists(prompts), prompts
    for yml in test_ymls:
        opt = load_options(yml)
        assert 'alpha_list' in opt['val']
    # fusion cfgs parse and spatial-condition region files exist
    for fcfg in glob.glob(os.path.join(
            root, 'datasets/data_cfgs/multi-concept/*/*.json')):
        with open(fcfg) as f:
            entries = json.load(f)
        assert all('concept_name' in e and 'lora_path' in e for e in entries)
    # every reference spatial-condition CATEGORY has a counterpart
    # (/root/reference/datasets/validation_spatial_condition/**): 3-region
    # and 5-region multi-character demos (real+anime), 2x canvases,
    # characters-objects mixes, multi-objects sketch demos
    spat = os.path.join(root, 'datasets/validation_spatial_condition')
    for cat in ('multi-characters/real_pose', 'multi-characters/anime_pose',
                'multi-characters/real_pose_2x',
                'multi-characters/anime_pose_2x', 'characters-objects',
                'multi-objects'):
        files = glob.glob(os.path.join(spat, cat, '*.txt'))
        assert files, f'no region files in {cat}'
    region_files = glob.glob(os.path.join(spat, '*', '*.txt')) + \
        glob.glob(os.path.join(spat, '*', '*', '*.txt'))
    assert len(region_files) >= 10
    five = False
    for rf in region_files:
        txt = open(rf).read()
        assert "box1='[" in txt and "char1='" in txt
        name = os.path.basename(rf)[:-4]
        d = os.path.dirname(rf)
        conds = [p for p in glob.glob(os.path.join(d, name + '_*'))
                 if p.endswith(('.png', '.jpg'))]
        assert conds, f'no condition image for {rf}'
        five = five or "box5='[" in txt
    assert five, 'no 5-region demo (reference anime_pose 5-character demo)'
    # scene + object categories ship data cfgs like the reference
    assert glob.glob(os.path.join(
        root, 'datasets/data_cfgs/single-concept/scenes/real/*.json'))
    assert len(glob.glob(os.path.join(
        root, 'datasets/data_cfgs/single-concept/objects/real/*.json'))) >= 12


def test_mixed_precision_policy():
    """The reference's fp16 setting maps to bf16 on TPU (documented policy,
    docs/Parity.md); fp32/no stay float32 — the dtype every parity test
    runs."""
    import jax.numpy as jnp

    from mixofshow_tpu.utils.options import resolve_compute_dtype

    assert resolve_compute_dtype({'mixed_precision': 'fp16'}) == jnp.bfloat16
    assert resolve_compute_dtype({'mixed_precision': 'bf16'}) == jnp.bfloat16
    assert resolve_compute_dtype({'mixed_precision': 'no'}) == jnp.float32
    assert resolve_compute_dtype({'mixed_precision': 'fp32'}) == jnp.float32
    assert resolve_compute_dtype({}) == jnp.bfloat16
