"""T2I-Adapter condition network (keypose / sketch), functional JAX, NHWC.

TPU-native equivalent of the diffusers `T2IAdapter` ('full_adapter'
architecture, the format of TencentARC/t2iadapter_{openpose,sketch}_sd14v1)
the reference loads (regionally_controlable_sampling.py:62-63) and feeds as
down-block residuals (pipeline_regionally_t2iadapter.py:474-546,565).

Architecture: pixel-unshuffle(8) → conv_in → 4 stages (avgpool-down between
stages, 1x1 channel-change conv, N plain conv-relu-conv resnets) emitting one
feature map per UNet down block: [(H/8,c0), (H/16,c1), (H/32,c2), (H/64,c3)].
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mixofshow_tpu.models.layers import as_rng, conv2d, init_conv2d


@dataclasses.dataclass(frozen=True)
class T2IAdapterConfig:
    in_channels: int = 3              # 3 keypose / 1 sketch
    channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    num_res_blocks: int = 2
    downscale_factor: int = 8

    @staticmethod
    def keypose() -> 'T2IAdapterConfig':
        return T2IAdapterConfig(in_channels=3)

    @staticmethod
    def sketch() -> 'T2IAdapterConfig':
        return T2IAdapterConfig(in_channels=1)

    @staticmethod
    def tiny(in_channels: int = 3) -> 'T2IAdapterConfig':
        return T2IAdapterConfig(in_channels=in_channels,
                                channels=(32, 64, 128, 128),
                                num_res_blocks=1)


def init_t2i_adapter(rng, cfg: T2IAdapterConfig = T2IAdapterConfig(),
                     dtype=jnp.float32):
    rng = as_rng(rng)
    r2 = cfg.downscale_factor ** 2
    params = {'conv_in': init_conv2d(rng, 3, 3, cfg.in_channels * r2,
                                     cfg.channels[0], dtype=dtype),
              'body': []}
    cin = cfg.channels[0]
    for i, cout in enumerate(cfg.channels):
        block = {'resnets': []}
        if cin != cout:
            block['in_conv'] = init_conv2d(rng, 1, 1, cin, cout, dtype=dtype)
        for _ in range(cfg.num_res_blocks):
            block['resnets'].append({
                'block1': init_conv2d(rng, 3, 3, cout, cout, dtype=dtype),
                'block2': init_conv2d(rng, 1, 1, cout, cout, dtype=dtype),
            })
        params['body'].append(block)
        cin = cout
    return params


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel unshuffle matching torch channel ordering (c, i, j)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h', w', c, i, j
    return x.reshape(b, h // r, w // r, c * r * r)


def t2i_adapter_apply(params, x: jnp.ndarray,
                      cfg: T2IAdapterConfig = T2IAdapterConfig()
                      ) -> List[jnp.ndarray]:
    """x: (B, H, W, C) condition image in [0, 1] → 4 NHWC feature maps."""
    h = pixel_unshuffle(x, cfg.downscale_factor)
    h = conv2d(params['conv_in'], h)
    feats = []
    for i, block in enumerate(params['body']):
        if i > 0:
            # AvgPool2d(2, ceil_mode=True) between stages. torch divides a
            # partial edge window (odd H/W) by its TRUE element count, not
            # the window size — match with a counting pass (constant-folded;
            # even sizes take the cheap /4).
            hh, ww = h.shape[1], h.shape[2]
            s = jax.lax.reduce_window(
                h, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), 'SAME')
            if hh % 2 or ww % 2:
                cnt = jax.lax.reduce_window(
                    jnp.ones((1, hh, ww, 1), h.dtype), 0.0, jax.lax.add,
                    (1, 2, 2, 1), (1, 2, 2, 1), 'SAME')
                h = s / cnt
            else:
                h = s / 4.0
        if 'in_conv' in block:
            h = conv2d(block['in_conv'], h)
        for res in block['resnets']:
            r = jax.nn.relu(conv2d(res['block1'], h))
            h = h + conv2d(res['block2'], r)
        feats.append(h)
    return feats


# ------------------------------------------------------------------ convert
def convert_t2i_adapter(sd, cfg: T2IAdapterConfig = T2IAdapterConfig()):
    """T2I-Adapter state dict → our param tree.

    Accepts BOTH checkpoint layouts for the 'full_adapter' architecture:
      * diffusers (`adapter.body.{i}.resnets.{j}.block1…`, the layout the
        reference downloads from HF — regionally_controlable_sampling.py:62-63);
      * the original TencentARC/T2I-Adapter `.pth` (flat
        `body.{k}.block1…` with k = stage·nums_rb + j and `in_conv` on the
        first block of a channel-changing stage — sk=True/use_conv=False,
        i.e. the t2iadapter_{keypose,sketch}_sd14v1 releases)."""
    from mixofshow_tpu.convert.diffusers_import import _conv

    if (not any('.resnets.' in k for k in sd)
            and any(k.startswith('body.') and '.block1.' in k for k in sd)):
        sd = _original_to_diffusers_layout(sd, cfg)

    pre = 'adapter.' if any(k.startswith('adapter.') for k in sd) else ''
    params = {'conv_in': _conv(sd, f'{pre}conv_in'), 'body': []}
    for i in range(len(cfg.channels)):
        block = {'resnets': []}
        if f'{pre}body.{i}.in_conv.weight' in sd:
            block['in_conv'] = _conv(sd, f'{pre}body.{i}.in_conv')
        j = 0
        while f'{pre}body.{i}.resnets.{j}.block1.weight' in sd:
            block['resnets'].append({
                'block1': _conv(sd, f'{pre}body.{i}.resnets.{j}.block1'),
                'block2': _conv(sd, f'{pre}body.{i}.resnets.{j}.block2'),
            })
            j += 1
        params['body'].append(block)
    return params


def _original_to_diffusers_layout(sd, cfg: T2IAdapterConfig):
    """Rename original TencentARC flat keys to the diffusers layout so one
    mapper handles both. Rejects sk=False checkpoints (they carry `skep`
    convs — a residual path the full_adapter architecture doesn't have)."""
    if any('.skep.' in k for k in sd):
        raise ValueError(
            'original T2I-Adapter checkpoint with sk=False (skep convs) is '
            'not the full_adapter architecture the reference uses')
    if any('.down_opt.' in k for k in sd):
        # use_conv=True originals downsample with a learned conv; the
        # avgpool-only full_adapter architecture cannot represent it, and
        # silently dropping the conv would produce wrong outputs.
        raise ValueError(
            'original T2I-Adapter checkpoint with use_conv=True (down_opt '
            'convs) is not the avgpool full_adapter architecture')
    flat = sorted({int(k.split('.')[1]) for k in sd
                   if k.startswith('body.')})
    nums_rb = (len(flat) // len(cfg.channels)) or 1
    out = {}
    for k, v in sd.items():
        if not k.startswith('body.'):
            out[k] = v
            continue
        parts = k.split('.')
        idx = int(parts[1])
        i, j = idx // nums_rb, idx % nums_rb
        rest = '.'.join(parts[2:])
        if rest.startswith('in_conv.'):
            out[f'body.{i}.{rest}'] = v
        else:
            out[f'body.{i}.resnets.{j}.{rest}'] = v
    return out


def preprocess_adapter_image(image, height: int, width: int) -> np.ndarray:
    """PIL (or list) → (B, H, W, C) float32 in [0,1] (the reference relies on
    diffusers _preprocess_adapter_image, pipeline...t2iadapter.py:413-423)."""
    from PIL import Image
    if not isinstance(image, (list, tuple)):
        image = [image]
    out = []
    for img in image:
        if isinstance(img, Image.Image):
            img = img.resize((width, height))
            arr = np.asarray(img, np.float32) / 255.0
        else:
            arr = np.asarray(img, np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        out.append(arr)
    return np.stack(out)
