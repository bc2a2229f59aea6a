"""Whole-graph UNet/VAE parity vs torch mirrors of diffusers 0.19.3.

Complements the per-layer checks in test_torch_parity.py: a random-init
torch model (diffusers state_dict layout) is converted through
mixofshow_tpu.convert.diffusers_import and both frameworks run the FULL
forward — any divergence in layer order, head-split convention, norm eps,
gelu flavor, padding, or converter key mapping fails the fp32 tolerance.
(The reference runs the real diffusers classes at trainer_edlora.py:38-41;
diffusers itself is not installed here, so tests/torch_mirrors.py implements
its forward semantics.)
"""
import jax.numpy as jnp
import numpy as np
import torch

from mixofshow_tpu.convert.diffusers_import import convert_unet, convert_vae
from mixofshow_tpu.models import UNetConfig, VAEConfig, unet_apply
from mixofshow_tpu.models.vae import vae_decode, vae_encode

from torch_mirrors import TorchUNet, TorchVAE


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_unet_whole_graph_matches_torch():
    cfg = UNetConfig.tiny()
    torch.manual_seed(0)
    tmodel = TorchUNet(cfg).eval()
    params = convert_unet(_sd_numpy(tmodel), cfg)

    rng = np.random.default_rng(1)
    b, s = 2, cfg.sample_size
    sample = rng.normal(size=(b, 4, s, s)).astype(np.float32)
    ctx = rng.normal(size=(b, 77, cfg.cross_attention_dim)).astype(np.float32)
    t = np.asarray([7, 421], np.int64)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(sample), torch.from_numpy(t),
                     torch.from_numpy(ctx)).numpy()

    out, _ = unet_apply(params, jnp.asarray(sample.transpose(0, 2, 3, 1)),
                        jnp.asarray(t, jnp.int32), jnp.asarray(ctx), cfg)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_unet_layerwise_context_matches_torch():
    """The ED-LoRA 4-D (B, 16, 77, C) context: each cross-attn layer slices
    its own index — torch mirror fed per-layer contexts must agree
    (reference edlora.py:130-131 layer-select)."""
    cfg = UNetConfig.tiny()
    torch.manual_seed(2)
    tmodel = TorchUNet(cfg).eval()
    params = convert_unet(_sd_numpy(tmodel), cfg)

    rng = np.random.default_rng(3)
    b, s = 1, cfg.sample_size
    n_layers = cfg.num_cross_layers
    sample = rng.normal(size=(b, 4, s, s)).astype(np.float32)
    ctx = rng.normal(
        size=(b, n_layers, 77, cfg.cross_attention_dim)).astype(np.float32)
    t = np.asarray([123], np.int64)

    # torch mirror has no layerwise support — emulate by hooking each
    # Transformer2DModel with its own context in down->mid->up order
    contexts = iter(range(n_layers))
    idx_of = {}
    for i, blk in enumerate(tmodel.down_blocks):
        for a in blk.attentions:
            idx_of[id(a)] = next(contexts)
    idx_of[id(tmodel.mid_block.attentions[0])] = next(contexts)
    for blk in tmodel.up_blocks:
        for a in blk.attentions:
            idx_of[id(a)] = next(contexts)

    orig_forward = TorchUNet.forward

    import torch_mirrors as tm
    orig_tf = tm.Transformer2DModel.forward

    def routed(self, x, _ctx):
        li = idx_of[id(self)]
        return orig_tf(self, x, torch.from_numpy(ctx[:, li]))

    tm.Transformer2DModel.forward = routed
    try:
        with torch.no_grad():
            ref = orig_forward(tmodel, torch.from_numpy(sample),
                               torch.from_numpy(t),
                               torch.zeros(b, 77, cfg.cross_attention_dim)
                               ).numpy()
    finally:
        tm.Transformer2DModel.forward = orig_tf

    out, _ = unet_apply(params, jnp.asarray(sample.transpose(0, 2, 3, 1)),
                        jnp.asarray(t, jnp.int32), jnp.asarray(ctx), cfg)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_vae_whole_graph_matches_torch():
    cfg = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_groups=8)
    torch.manual_seed(4)
    tmodel = TorchVAE(cfg).eval()
    params = convert_vae(_sd_numpy(tmodel), cfg)

    rng = np.random.default_rng(5)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        mean_t, logvar_t = tmodel.encode(torch.from_numpy(img))
        dec_t = tmodel.decode(mean_t).numpy()

    mean, logvar = vae_encode(params, jnp.asarray(img.transpose(0, 2, 3, 1)),
                              cfg)
    np.testing.assert_allclose(np.asarray(mean).transpose(0, 3, 1, 2),
                               mean_t.numpy(), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logvar).transpose(0, 3, 1, 2),
                               logvar_t.numpy(), atol=3e-4, rtol=1e-3)
    dec = vae_decode(params, mean, cfg)
    np.testing.assert_allclose(np.asarray(dec).transpose(0, 3, 1, 2),
                               dec_t, atol=5e-4, rtol=1e-3)
