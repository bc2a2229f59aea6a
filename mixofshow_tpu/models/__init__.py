from mixofshow_tpu.models import layers, lora
from mixofshow_tpu.models.clip import CLIPTextConfig, clip_text_encode, init_clip_text
from mixofshow_tpu.models.vae import VAEConfig, init_vae, vae_decode, vae_encode
from mixofshow_tpu.models.unet import UNetConfig, init_unet, unet_apply

__all__ = [
    'layers', 'lora',
    'CLIPTextConfig', 'clip_text_encode', 'init_clip_text',
    'VAEConfig', 'init_vae', 'vae_decode', 'vae_encode',
    'UNetConfig', 'init_unet', 'unet_apply',
]
