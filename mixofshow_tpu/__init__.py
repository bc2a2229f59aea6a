"""mixofshow_tpu — TPU-native rebuild of TencentARC/Mix-of-Show.

A JAX/XLA/Pallas framework providing ED-LoRA concept tuning, gradient fusion
of multiple concept LoRAs, and regionally controllable multi-concept sampling
for Stable Diffusion 1.x — designed TPU-first (pjit over device meshes,
functional parameter pytrees, `lax.scan` sampling loops, Pallas attention
kernels) rather than ported from the PyTorch reference.

Layout:
  models/    — CLIP text encoder, VAE, SD1.5 UNet, T2I-Adapter (functional)
  ops/       — Pallas kernels + batched solvers (flash attention, region attn,
               ridge/least-squares fusion solver)
  diffusion/ — noise schedules: DDPM (train), DPM-Solver++ multistep (sample)
  text/      — pure-Python CLIP BPE tokenizer (host-side)
  pipelines/ — EDLoRA sampling pipeline, regional T2I-Adapter pipeline, trainer
  fusion/    — gradient fusion (4-phase concept merge)
  data/      — datasets + paired PIL transforms (host-side)
  parallel/  — mesh construction and sharding rules
  utils/     — config, registry, logging, checkpoint I/O
  convert/   — torch/diffusers checkpoint → JAX pytree importers
"""

__version__ = '0.1.0'

# Persistent XLA compilation cache for every entry point (CLIs, bench,
# driver compile-check, tests). SD1.5-size programs cost minutes of compile
# per process; cached executables re-load in milliseconds — verified over
# both the remote-TPU plugin and CPU. Opt out with MOS_XLA_CACHE=0.
# Config-only at import time: no backend is initialized here.
from mixofshow_tpu.utils.xla_cache import enable_persistent_cache as _epc

_epc()
del _epc
