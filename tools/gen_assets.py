#!/usr/bin/env python
"""Generate the options/ + datasets/ asset tree.

Mirrors the reference's asset CATEGORIES (options/train|test/EDLoRA/{real,
anime}, datasets/data_cfgs/{single,multi}-concept/..., validation/benchmark
prompt suites, spatial-condition region files — /root/reference/options/**,
/root/reference/datasets/**) with this framework's schema. Prompt texts are
original; spatial-condition images are synthetic placeholders (stick-figure
keypose + box sketch) so the regional CLI runs end-to-end without shipping
the reference's photos. Idempotent: re-run after schema changes.
"""
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHARACTERS = {
    # reference: datasets/data_cfgs/MixofShow/single-concept/characters/**
    'real': [('potter', 'man'), ('hermione', 'woman'), ('thanos', 'man'),
             ('batman', 'man'), ('ironman', 'man')],
    'anime': [('hina', 'girl'), ('kaori', 'girl'), ('tezuka', 'boy'),
              ('mitsuha', 'girl'), ('goku', 'boy')],
}
# reference objects/real: dogA/dogB/catA/vase/chair/table/carA/sailboat +
# B2/f35 (airplanes), porsche_356a, yacht
OBJECTS = ['dogA', 'dogB', 'catA', 'vase', 'chair', 'table', 'carA',
           'sailboat', 'B2', 'f35', 'porsche', 'yacht']
OBJ_CLASS = {'dogA': 'dog', 'dogB': 'dog', 'catA': 'cat', 'vase': 'vase',
             'chair': 'chair', 'table': 'table', 'carA': 'car',
             'sailboat': 'boat', 'B2': 'airplane', 'f35': 'airplane',
             'porsche': 'car', 'yacht': 'boat'}
# reference scenes/real: pyramid, wululu
SCENES = ['pyramid', 'wululu']


def w(path, text):
    path = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        f.write(text if text.endswith('\n') else text + '\n')


# ------------------------------------------------------------- data cfgs
def data_cfg(kind, cat, name):
    base = f'datasets/data/{kind}/{cat}/{name}' if cat else \
        f'datasets/data/{kind}/{name}'
    return json.dumps([{
        'instance_prompt': '<TOK>',
        'instance_data_dir': f'{base}/image',
        'caption_dir': f'{base}/caption',
        'mask_dir': f'{base}/mask',
    }], indent=4)


def gen_data_cfgs():
    for cat, names in CHARACTERS.items():
        for name, _ in names:
            w(f'datasets/data_cfgs/single-concept/characters/{cat}/{name}.json',
              data_cfg('characters', cat, name))
    for name in OBJECTS:
        w(f'datasets/data_cfgs/single-concept/objects/real/{name}.json',
          data_cfg('objects', 'real', name))
    for name in SCENES:
        w(f'datasets/data_cfgs/single-concept/scenes/real/{name}.json',
          data_cfg('scenes', 'real', name))
    # multi-concept fusion cfgs (consumed by gradient_fusion.py -concept_cfg)
    def fusion_entry(name):
        return {
            'lora_path': f'experiments/{name}/models/edlora_model-latest.pth',
            'unet_alpha': 1.0, 'text_encoder_alpha': 1.0,
            'concept_name': f'<{name}1> <{name}2>',
        }
    w('datasets/data_cfgs/multi-concept/real/potter+hermione+thanos_chilloutmix.json',
      json.dumps([fusion_entry(n) for n in ('potter', 'hermione', 'thanos')],
                 indent=4))
    w('datasets/data_cfgs/multi-concept/anime/hina+kaori+tezuka_anythingv4.json',
      json.dumps([fusion_entry(n) for n in ('hina', 'kaori', 'tezuka')],
                 indent=4))


# ---------------------------------------------------------------- prompts
def prompt_suite(cls):
    return '\n'.join([
        'photo of a <TOK>',
        '<TOK>',
        f'photo of a {cls}',
        f'a close-up photo of <TOK> at sunset',
        'a <TOK> standing in a snowy forest',
        'a painting of <TOK> in the style of Monet',
        'a <TOK> next to a river, mountains behind',
        'a photo of <TOK> in a library',
    ])


def bench_suite(cls):
    return '\n'.join([
        f'a photo of a <TOK> {cls} on a beach',
        f'a <TOK> {cls} floating on water',
        f'a <TOK> {cls} in the desert at noon',
        f'an oil painting of a <TOK> {cls}',
        f'a <TOK> {cls} covered in snow',
        f'a photo of a <TOK> {cls} on a city street at night',
        f'a <TOK> {cls} under cherry blossoms',
        f'a studio photo of a <TOK> {cls}, white background',
    ])


def gen_prompts():
    # every class the data cfgs reference (incl. the reference's airplane
    # suite, test_airplane.txt, and anime-specific test_goku.txt)
    for cls in ('man', 'woman', 'girl', 'boy', 'goku'):
        w(f'datasets/validation_prompts/single-concept/characters/test_{cls}.txt',
          prompt_suite(cls))
    for cls in ('dog', 'cat', 'vase', 'chair', 'table', 'car', 'boat',
                'airplane'):
        w(f'datasets/validation_prompts/single-concept/objects/test_{cls}.txt',
          prompt_suite(cls))
    w('datasets/validation_prompts/single-concept/scenes/test_scene.txt',
      prompt_suite('scene'))
    w('datasets/benchmark_prompts/single-concept/characters/test_character.txt',
      bench_suite('character'))
    # 'plushy' mirrors the reference's test_plushy.txt benchmark suite
    for cls in ('pet', 'chair', 'table', 'vase', 'plushy'):
        w(f'datasets/benchmark_prompts/single-concept/objects/test_{cls}.txt',
          bench_suite(cls))
    w('datasets/benchmark_prompts/single-concept/scenes/test_scene.txt',
      bench_suite('scene'))


# ------------------------------------------------------------------ YAMLs
TRAIN_YML = """\
# ED-LoRA tuning: {name} ({cat}). Schema mirrors the reference
# options/train/EDLoRA (e.g. 8101_EDLoRA_potter_Cmix_B4_Repeat500.yml);
# point pretrained_path at a local diffusers SD1.x checkpoint directory.
name: EDLoRA_{name}_B4_Repeat500
manual_seed: 0
mixed_precision: bf16          # TPU-native (reference: fp16)
gradient_accumulation_steps: 1

datasets:
  train:
    name: LoraDataset
    concept_list: datasets/data_cfgs/single-concept/characters/{cat}/{name}.json
    use_caption: true
    use_mask: {use_mask}
    instance_transform:
      - {{ type: HumanResizeCropFinalV3, size: 512, crop_p: 0.5 }}
      - {{ type: ToTensor }}
      - {{ type: Normalize, mean: [ 0.5 ], std: [ 0.5 ] }}
      - {{ type: ShuffleCaption, keep_token_num: 1 }}
      - {{ type: EnhanceText, enhance_type: human }}
    replace_mapping:
      <TOK>: <{name}1> <{name}2>
    batch_size_per_gpu: 2      # per device on the mesh 'data' axis
    dataset_enlarge_ratio: 500

  val_vis:
    name: PromptDataset
    prompts: datasets/validation_prompts/single-concept/characters/test_{cls}.txt
    num_samples_per_prompt: 8
    latent_size: [ 4, 64, 64 ]
    replace_mapping:
      <TOK>: <{name}1> <{name}2>
    batch_size_per_gpu: 4

models:
  pretrained_path: {pretrained}
  enable_edlora: true          # false = vanilla LoRA
  finetune_cfg:
    text_embedding:
      enable_tuning: true
      lr: !!float 1e-3
    text_encoder:
      enable_tuning: true
      lora_cfg:
        rank: 4
        alpha: 1.0
        where: CLIPAttention
      lr: !!float 1e-5
    unet:
      enable_tuning: true
      lora_cfg:
        rank: 4
        alpha: 1.0
        where: Attention
      lr: !!float 1e-4
  new_concept_token: <{name}1>+<{name}2>
  initializer_token: <rand-0.013>+{cls}
  noise_offset: 0.01
  attn_reg_weight: 0.01
  reg_full_identity: false
  use_mask_loss: {use_mask}
  gradient_checkpoint: false

path:
  pretrain_network: ~

train:
  optim_g:
    type: AdamW
    lr: !!float 0.0
    weight_decay: 0.01
    betas: [ 0.9, 0.999 ]
  scheduler: linear
  emb_norm_threshold: !!float 5.5e-1

val:
  val_during_save: true
  compose_visualize: true
  alpha_list: [ 0, 0.7, 1.0 ]   # 0 = embedding-only visualization
  sample:
    num_inference_steps: 50
    guidance_scale: 7.5

logger:
  print_freq: 10
  save_checkpoint_freq: !!float 10000
"""

TEST_YML = """\
# ED-LoRA validation sweep: {name} ({cat}) — reference options/test/EDLoRA.
name: EDLoRA_{name}_test
manual_seed: 0
mixed_precision: bf16

datasets:
  val_vis:
    name: PromptDataset
    prompts: datasets/validation_prompts/single-concept/characters/test_{cls}.txt
    num_samples_per_prompt: 8
    latent_size: [ 4, 64, 64 ]
    replace_mapping:
      <TOK>: <{name}1> <{name}2>
    batch_size_per_gpu: 4

models:
  pretrained_path: {pretrained}
  enable_edlora: true
  new_concept_token: <{name}1>+<{name}2>

path:
  lora_path: experiments/EDLoRA_{name}_B4_Repeat500/models/edlora_model-latest.pth

val:
  compose_visualize: true
  alpha_list: [ 0, 0.7, 1.0 ]
  sample:
    num_inference_steps: 50
    guidance_scale: 7.5
"""


def gen_yamls():
    pre = {'real': 'experiments/pretrained_models/chilloutmix',
           'anime': 'experiments/pretrained_models/anything-v4.0'}
    for cat, names in CHARACTERS.items():
        for name, cls in names[:3]:
            use_mask = 'true' if cat == 'real' else 'false'
            w(f'options/train/EDLoRA/{cat}/EDLoRA_{name}_B4_Repeat500.yml',
              TRAIN_YML.format(name=name, cat=cat, cls=cls,
                               pretrained=pre[cat], use_mask=use_mask))
            w(f'options/test/EDLoRA/{cat}/EDLoRA_{name}_test.yml',
              TEST_YML.format(name=name, cat=cat, cls=cls,
                              pretrained=pre[cat]))


# ------------------------------------------------- spatial conditions
# Demo table mirroring every reference validation_spatial_condition
# category (multi-characters/{real,anime}_pose (+_2x), characters-objects,
# multi-objects — /root/reference/datasets/validation_spatial_condition/**).
# Each entry: (category dir, demo name, context, [(prompt, box-x-span)],
# condition kinds). Boxes are near-full-height columns like the reference
# demos; prompts are original.
_COLS3 = ((28, 251), (215, 453), (651, 996))
_COLS5 = ((18, 192), (194, 407), (433, 614), (627, 803), (803, 978))


def _chars(*names):
    return [f'a <{n}1> <{n}2>' for n in names]


SPATIAL_DEMOS = [
    ('multi-characters/real_pose', 'potter_hermione_thanos',
     'three people standing in a garden',
     _chars('potter', 'hermione', 'thanos'), _COLS3, ('pose', 'sketch'), 1),
    ('multi-characters/real_pose', 'batman_ironman_batman',
     'three heroes on a rooftop at night',
     _chars('batman', 'ironman', 'batman'), _COLS3, ('pose',), 1),
    ('multi-characters/real_pose_2x', 'potter_hermione_thanos_2x',
     'three people standing in a garden',
     _chars('potter', 'hermione', 'thanos'), _COLS3, ('pose',), 2),
    ('multi-characters/anime_pose', 'hina_kaori_tezuka',
     'three anime characters near a lake',
     _chars('hina', 'kaori', 'tezuka'), _COLS3, ('pose', 'sketch'), 1),
    ('multi-characters/anime_pose', 'hina_tezuka_mitsuha_goku_kaori',
     'five anime characters near a lake',
     _chars('hina', 'tezuka', 'mitsuha', 'goku', 'kaori'), _COLS5,
     ('pose',), 1),
    ('multi-characters/anime_pose_2x', 'hina_kaori_tezuka_2x',
     'three anime characters near a lake',
     _chars('hina', 'kaori', 'tezuka'), _COLS3, ('pose',), 2),
    ('characters-objects', 'potter+catA+dogA',
     'a man with a cat and a dog in a park',
     ['a <potter1> <potter2>', 'a <catA1> <catA2>', 'a <dogA1> <dogA2>'],
     _COLS3, ('pose', 'sketch'), 1),
    ('characters-objects', 'hermione+chair+table',
     'a woman beside a chair and a table in a study',
     ['a <hermione1> <hermione2>', 'a <chair1> <chair2>',
      'a <table1> <table2>'], _COLS3, ('pose', 'sketch'), 1),
    ('multi-objects', 'dogA_catA_dogB',
     'two dogs and a cat on a lawn',
     _chars('dogA', 'catA', 'dogB'), _COLS3, ('sketch_jpg',), 1),
    ('multi-objects', 'chair_table_vase',
     'a chair, a table and a vase in a bright room',
     _chars('chair', 'table', 'vase'), _COLS3, ('sketch_jpg',), 1),
]


def _region_txt(context, prompts, cols, scale):
    lines = [f"context_prompt='{context}, 4K, high quality, high "
             "resolution, best quality'",
             "context_neg_prompt='low quality, extra digits, blurry'", '']
    for i, (p, (x0, x1)) in enumerate(zip(prompts, cols), 1):
        lines.append(f"char{i}='{p}'")
        lines.append(f"box{i}='[{4 * scale}, {x0 * scale}, "
                     f"{508 * scale}, {x1 * scale}]'")
        lines.append('')
    return '\n'.join(lines)


def _stick_figure(draw, cx, top, h, width=6):
    head_r = h // 8
    draw.ellipse([cx - head_r, top, cx + head_r, top + 2 * head_r],
                 outline='white', width=width)
    neck = top + 2 * head_r
    hip = top + int(0.55 * h)
    draw.line([cx, neck, cx, hip], fill='white', width=width)
    draw.line([cx - h // 4, neck + h // 10, cx + h // 4, neck + h // 10],
              fill='white', width=width)
    draw.line([cx, hip, cx - h // 5, top + h], fill='white', width=width)
    draw.line([cx, hip, cx + h // 5, top + h], fill='white', width=width)


def gen_spatial():
    try:
        from PIL import Image, ImageDraw
    except ImportError:
        Image = None
    for cat, name, context, prompts, cols, kinds, scale in SPATIAL_DEMOS:
        base = f'datasets/validation_spatial_condition/{cat}'
        w(f'{base}/{name}.txt', _region_txt(context, prompts, cols, scale))
        if Image is None:
            continue
        wpx, hpx = 1024 * scale, 512 * scale
        if 'pose' in kinds:
            img = Image.new('RGB', (wpx, hpx), 'black')
            d = ImageDraw.Draw(img)
            for x0, x1 in cols:
                _stick_figure(d, (x0 + x1) * scale // 2, 16 * scale,
                              480 * scale, width=6 * scale)
            img.save(os.path.join(ROOT, base, f'{name}_pose.png'))
        if 'sketch' in kinds or 'sketch_jpg' in kinds:
            sk = Image.new('RGB', (wpx, hpx), 'black')
            d = ImageDraw.Draw(sk)
            for x0, x1 in cols:
                d.rectangle([x0 * scale, 20 * scale, x1 * scale,
                             500 * scale], outline='white', width=4 * scale)
            ext = 'jpg' if 'sketch_jpg' in kinds else 'png'
            sk.save(os.path.join(ROOT, base, f'{name}_sketch.{ext}'))


if __name__ == '__main__':
    gen_data_cfgs()
    gen_prompts()
    gen_yamls()
    gen_spatial()
    n = sum(len(fs) for _, _, fs in os.walk(os.path.join(ROOT, 'datasets')))
    n += sum(len(fs) for _, _, fs in os.walk(os.path.join(ROOT, 'options')))
    print(f'asset tree written ({n} files under datasets/ + options/)')
