"""Minimal torch implementations of the diffusers 0.19.3 UNet/VAE graphs.

Whole-graph parity references for the JAX models (the pattern of
tests/test_torch_parity.py's CLIP check, which uses transformers). diffusers
is not installed in this environment, so these mirrors implement its
documented forward semantics — module names/state_dict keys match diffusers
exactly, so `model.state_dict()` feeds mixofshow_tpu.convert.diffusers_import
unchanged, exercising the converters AND the forward math end-to-end.

Semantics mirrored (diffusers 0.19.3):
  * ResnetBlock2D: conv1(silu(norm1(x))) + time_emb_proj(silu(temb)),
    conv2(silu(norm2(.))), +shortcut; GN eps 1e-5
  * Transformer2DModel (use_linear_projection=False): GN eps 1e-6, 1x1
    proj_in/out convs, one BasicTransformerBlock (attn1 -> attn2 -> GEGLU ff,
    LayerNorm eps 1e-5), heads from attention_head_dim (the SD1.x "heads"
    quirk), exact-gelu GEGLU
  * Downsample2D: stride-2 conv, padding 1 (UNet) / asymmetric (0,1,0,1)
    pad + padding 0 (VAE); Upsample2D: nearest 2x + conv
  * AutoencoderKL mid attention: single head over full channels, bias=True
    projections, residual connection

Reference cites: /root/reference/mixofshow/pipelines/trainer_edlora.py:38-41
loads these exact diffusers classes.
"""
import math

import torch
import torch.nn.functional as F
from torch import nn


# --------------------------------------------------------------------- UNet
class ResnetBlock2D(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, 'conv_shortcut') else x
        return sc + h


class Attention(nn.Module):
    def __init__(self, q_dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(q_dim, q_dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, q_dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, q_dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(q_dim, q_dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, n, c = x.shape
        h, d = self.heads, c // self.heads

        def split(t):
            return t.reshape(b, -1, h, d).permute(0, 2, 1, 3)

        q, k, v = split(self.to_q(x)), split(self.to_k(ctx)), \
            split(self.to_v(ctx))
        attn = torch.softmax(
            q.float() @ k.float().transpose(-1, -2) / math.sqrt(d), dim=-1)
        out = (attn @ v.float()).to(x.dtype)
        out = out.permute(0, 2, 1, 3).reshape(b, n, c)
        return self.to_out[0](out)


class GEGLUFeedForward(nn.Module):
    """diffusers FeedForward: net.0 = GEGLU(proj), net.1 = dropout,
    net.2 = Linear."""

    def __init__(self, dim, inner):
        super().__init__()

        class GEGLU(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, 2 * inner)

            def forward(self, x):
                h, gate = self.proj(x).chunk(2, dim=-1)
                return h * F.gelu(gate)

        self.net = nn.ModuleList([GEGLU(), nn.Identity(),
                                  nn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, c, ctx_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(c)
        self.attn1 = Attention(c, c, heads)
        self.norm2 = nn.LayerNorm(c)
        self.attn2 = Attention(c, ctx_dim, heads)
        self.norm3 = nn.LayerNorm(c)
        self.ff = GEGLUFeedForward(c, 4 * c)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, c, ctx_dim, heads, groups):
        super().__init__()
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = nn.Conv2d(c, c, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(c, ctx_dim, heads)])
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        residual = x
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = self.transformer_blocks[0](x, ctx)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + residual


class TorchUNet(nn.Module):
    """UNet2DConditionModel mirror over a mixofshow_tpu UNetConfig."""

    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        temb = 4 * ch[0]
        g = cfg.norm_groups
        heads = cfg.attention_heads
        ctx = cfg.cross_attention_dim
        self.cfg = cfg
        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(ch[0], temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)

        self.down_blocks = nn.ModuleList()
        cin = ch[0]
        for i, has_cross in enumerate(cfg.down_cross):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(ResnetBlock2D(cin, ch[i], temb, g))
                cin = ch[i]
                if has_cross:
                    blk.attentions.append(
                        Transformer2DModel(cin, ctx, heads, g))
            if i < len(ch) - 1:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(cin, cin, 3, stride=2,
                                                     padding=1)
            self.down_blocks.append(blk)

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([
            ResnetBlock2D(cin, cin, temb, g),
            ResnetBlock2D(cin, cin, temb, g)])
        self.mid_block.attentions = nn.ModuleList(
            [Transformer2DModel(cin, ctx, heads, g)])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        for i, has_cross in enumerate(cfg.up_cross):
            cout = rev[i]
            skip_ch = rev[min(i + 1, len(ch) - 1)]
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for j in range(cfg.layers_per_block + 1):
                skip = rev[i] if j < cfg.layers_per_block else skip_ch
                blk.resnets.append(ResnetBlock2D(cin + skip, cout, temb, g))
                cin = cout
                if has_cross:
                    blk.attentions.append(
                        Transformer2DModel(cin, ctx, heads, g))
            if i < len(ch) - 1:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(cin, cin, 3, padding=1)
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(g, cin, eps=1e-5)
        self.conv_out = nn.Conv2d(cin, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, ctx):
        cfg = self.cfg
        dim = cfg.block_out_channels[0]
        half = dim // 2
        freqs = torch.exp(-math.log(10000.0)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = timesteps.float()[:, None] * freqs[None]
        temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))

        # ED-LoRA layerwise context: a 4-D (B, L, 77, C) ctx is sliced per
        # cross-attn layer in EXECUTION order (down→mid→up), mirroring
        # EDLoRA_AttnProcessor (reference edlora.py:130-131,176-190)
        layerwise = ctx.dim() == 4
        self._li = 0

        def ctx_for_layer():
            if not layerwise:
                return ctx
            c = ctx[:, self._li]
            self._li += 1
            return c

        x = self.conv_in(sample)
        residuals = [x]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                x = res(x, temb)
                if len(blk.attentions):
                    x = blk.attentions[j](x, ctx_for_layer())
                residuals.append(x)
            if hasattr(blk, 'downsamplers'):
                x = blk.downsamplers[0].conv(x)
                residuals.append(x)
        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx_for_layer())
        x = self.mid_block.resnets[1](x, temb)
        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                x = res(torch.cat([x, residuals.pop()], dim=1), temb)
                if len(blk.attentions):
                    x = blk.attentions[j](x, ctx_for_layer())
            if hasattr(blk, 'upsamplers'):
                x = F.interpolate(x, scale_factor=2, mode='nearest')
                x = blk.upsamplers[0].conv(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ---------------------------------------------------------------------- VAE
class VAEResnet(nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, 'conv_shortcut') else x
        return sc + h


class VAEAttention(nn.Module):
    """diffusers 0.19.3 VAE mid attention: Attention(heads=1,
    dim_head=channels, bias=True, residual_connection=True)."""

    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        hid = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(hid), self.to_k(hid), self.to_v(hid)
        attn = torch.softmax(
            q.float() @ k.float().transpose(-1, -2) / math.sqrt(c), dim=-1)
        out = (attn @ v.float()).to(x.dtype)
        out = self.to_out[0](out)
        out = out.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + out


class TorchVAE(nn.Module):
    """AutoencoderKL mirror over a mixofshow_tpu VAEConfig."""

    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        g = cfg.norm_groups
        n = len(ch)

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        cin = ch[0]
        for i in range(n):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(VAEResnet(cin, ch[i], g))
                cin = ch[i]
            if i < n - 1:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(cin, cin, 3, stride=2,
                                                     padding=0)
            enc.down_blocks.append(blk)
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList([VAEResnet(cin, cin, g),
                                               VAEResnet(cin, cin, g)])
        enc.mid_block.attentions = nn.ModuleList([VAEAttention(cin, g)])
        enc.conv_norm_out = nn.GroupNorm(g, cin, eps=1e-6)
        enc.conv_out = nn.Conv2d(cin, 2 * cfg.latent_channels, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(cfg.latent_channels, ch[-1], 3, padding=1)
        dec.mid_block = nn.Module()
        cin = ch[-1]
        dec.mid_block.resnets = nn.ModuleList([VAEResnet(cin, cin, g),
                                               VAEResnet(cin, cin, g)])
        dec.mid_block.attentions = nn.ModuleList([VAEAttention(cin, g)])
        dec.up_blocks = nn.ModuleList()
        for i, cout in enumerate(reversed(ch)):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(VAEResnet(cin, cout, g))
                cin = cout
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(cin, cin, 3, padding=1)
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(g, cin, eps=1e-6)
        dec.conv_out = nn.Conv2d(cin, cfg.in_channels, 3, padding=1)
        self.decoder = dec
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)

    def encode(self, x):
        e = self.encoder
        x = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, 'downsamplers'):
                x = F.pad(x, (0, 1, 0, 1))  # diffusers asymmetric pad
                x = blk.downsamplers[0].conv(x)
        x = e.mid_block.resnets[0](x)
        x = e.mid_block.attentions[0](x)
        x = e.mid_block.resnets[1](x)
        x = e.conv_out(F.silu(e.conv_norm_out(x)))
        moments = self.quant_conv(x)
        mean, logvar = moments.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        d = self.decoder
        x = d.conv_in(self.post_quant_conv(z))
        x = d.mid_block.resnets[0](x)
        x = d.mid_block.attentions[0](x)
        x = d.mid_block.resnets[1](x)
        for blk in d.up_blocks:
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, 'upsamplers'):
                x = F.interpolate(x, scale_factor=2, mode='nearest')
                x = blk.upsamplers[0].conv(x)
        return d.conv_out(F.silu(d.conv_norm_out(x)))


# ----------------------------------------------------- DPM-Solver++ scheduler
class TorchDPMSolverMultistep:
    """Stateful mirror of diffusers 0.19.3 DPMSolverMultistepScheduler with
    the reference's configuration: scaled_linear betas (0.00085, 0.012),
    algorithm dpmsolver++, solver_order 2, solver_type midpoint, linspace
    timestep spacing, lower_order_final (reference loads it at
    pipeline_edlora.py:290 / regionally_controlable_sampling.py:57-60).
    Independent reimplementation of the documented update equations —
    validates mixofshow_tpu.diffusion.DPMSolverMultistep's precomputed-table
    formulation, which restates the same math without scheduler state."""

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, prediction_type='epsilon'):
        betas = torch.linspace(beta_start ** 0.5, beta_end ** 0.5,
                               num_train_timesteps,
                               dtype=torch.float64) ** 2
        acp = torch.cumprod(1.0 - betas, dim=0)
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.alpha_t = torch.sqrt(acp).float()
        self.sigma_t = torch.sqrt(1.0 - acp).float()
        self.lambda_t = (torch.log(self.alpha_t)
                         - torch.log(self.sigma_t)).float()
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps):
        import numpy as np
        ts = np.linspace(0, self.num_train_timesteps - 1,
                         num_inference_steps + 1).round()[::-1][:-1].copy()
        self.timesteps = torch.from_numpy(ts.astype('int64'))
        self.model_outputs = [None, None]
        self.timestep_list = [None, None]
        self.lower_order_nums = 0

    def scale_model_input(self, sample, t):
        return sample

    def _to_x0(self, model_output, t, sample):
        if self.prediction_type == 'epsilon':
            return (sample - self.sigma_t[t] * model_output) / self.alpha_t[t]
        if self.prediction_type == 'v_prediction':
            return (self.alpha_t[t] * sample
                    - self.sigma_t[t] * model_output)
        raise ValueError(self.prediction_type)

    def step(self, model_output, t, sample):
        step_index = (self.timesteps == t).nonzero().item()
        prev_t = (0 if step_index == len(self.timesteps) - 1
                  else self.timesteps[step_index + 1].item())
        t = int(t)
        m0 = self._to_x0(model_output, t, sample)

        lower_order_final = (step_index == len(self.timesteps) - 1
                             and len(self.timesteps) < 15)
        if self.lower_order_nums < 1 or lower_order_final:
            # first-order (DPM-Solver++ 1S == DDIM in x0 form)
            lam_t, lam_s = self.lambda_t[prev_t], self.lambda_t[t]
            h = lam_t - lam_s
            x = (self.sigma_t[prev_t] / self.sigma_t[t]) * sample \
                - self.alpha_t[prev_t] * torch.expm1(-h) * m0
        else:
            # second-order multistep, midpoint
            s1 = self.timestep_list[-1]
            m1 = self.model_outputs[-1]
            lam_t = self.lambda_t[prev_t]
            lam_s0, lam_s1 = self.lambda_t[t], self.lambda_t[s1]
            h, h0 = lam_t - lam_s0, lam_s0 - lam_s1
            r0 = h0 / h
            d0, d1 = m0, (1.0 / r0) * (m0 - m1)
            x = (self.sigma_t[prev_t] / self.sigma_t[t]) * sample \
                - self.alpha_t[prev_t] * torch.expm1(-h) * d0 \
                - 0.5 * self.alpha_t[prev_t] * torch.expm1(-h) * d1
        self.model_outputs = [self.model_outputs[-1], m0]
        self.timestep_list = [self.timestep_list[-1], t]
        self.lower_order_nums = min(self.lower_order_nums + 1, 2)
        return x


def run_reference_sampling_chain(tunet, tvae, text_forward, tokenizer,
                                 new_concept_cfg, prompt, negative_prompt,
                                 latents_nchw, num_inference_steps,
                                 guidance_scale, scaling_factor=0.18215):
    """Torch mirror of the reference EDLoRAPipeline.__call__ chain
    (pipeline_edlora.py:193-313): bind_concept_prompt expansion → text
    encode → (B, 16, 77, C) layerwise embeds + CFG cat → DPM-Solver++(2M)
    50-step loop → VAE decode with 1/0.18215 scaling and (x/2+0.5).clamp.

    `text_forward(ids_int64) -> (N, 77, C)` abstracts the text encoder
    (transformers CLIPTextModel in tests). Returns (final_latents_nchw,
    images_nchw in [0, 1])."""
    from mixofshow_tpu.pipelines.concepts import (NUM_CROSS_ATTENTION_LAYERS,
                                                  bind_concept_prompt)
    b = len(prompt)
    expanded = bind_concept_prompt(list(prompt), new_concept_cfg)
    ids = torch.from_numpy(tokenizer(expanded).astype('int64'))
    emb = text_forward(ids)
    emb = emb.reshape(b, NUM_CROSS_ATTENTION_LAYERS, *emb.shape[1:])
    nids = torch.from_numpy(
        tokenizer([negative_prompt] * b).astype('int64'))
    nemb = text_forward(nids)[:, None].expand(
        b, NUM_CROSS_ATTENTION_LAYERS, -1, -1)
    embeds = torch.cat([nemb, emb])  # [uncond; cond]

    sched = TorchDPMSolverMultistep()
    sched.set_timesteps(num_inference_steps)
    latents = latents_nchw * sched.init_noise_sigma
    for t in sched.timesteps:
        latent_in = torch.cat([latents] * 2)
        latent_in = sched.scale_model_input(latent_in, t)
        with torch.no_grad():
            noise = tunet(latent_in, t.expand(latent_in.shape[0]), embeds)
        un, co = noise.chunk(2)
        noise = un + guidance_scale * (co - un)
        latents = sched.step(noise, t, latents)
    with torch.no_grad():
        image = tvae.decode(latents / scaling_factor)
    return latents, (image / 2 + 0.5).clamp(0, 1)


# ------------------------------------------------------------ region rewrite
def reference_region_rewrite(hidden_states, query, region_list, height,
                             width, scale):
    """Line-faithful mirror of RegionT2I_AttnProcessor.region_rewrite
    (reference pipeline_regionally_t2iadapter.py:32-86): sliced-box
    per-region attention on head-to-batch tensors (B·H, S, D), ceil/floor
    box rasterization, overlap counting, replace_ratio 1.

    hidden_states: (B·H, S, D) global attention output (pre-to_out);
    query: (B·H, S, D); region_list: [(region_key, region_value, box)] with
    K/V already head-to-batch; returns the rewritten (B·H, S, D)."""
    seq_lens = query.shape[1]
    downscale = math.sqrt(height * width / seq_lens)
    fh, fw = int(height // downscale), int(width // downscale)

    region_mask = torch.zeros((fh, fw))
    for *_, box in region_list:
        sh, sw, eh, ew = box
        sh, sw = math.ceil(sh * fh), math.ceil(sw * fw)
        eh, ew = math.floor(eh * fh), math.floor(ew * fw)
        region_mask[sh:eh, sw:ew] += 1

    query = query.reshape(-1, fh, fw, query.shape[-1])
    hidden_states = hidden_states.reshape(-1, fh, fw,
                                          hidden_states.shape[-1])
    new_hidden = torch.zeros_like(hidden_states)
    new_hidden[:, region_mask == 0, :] = \
        hidden_states[:, region_mask == 0, :]

    for rkey, rval, box in region_list:
        sh, sw, eh, ew = box
        sh, sw = math.ceil(sh * fh), math.ceil(sw * fw)
        eh, ew = math.floor(eh * fh), math.floor(ew * fw)
        attn = torch.einsum('bhwc,bnc->bhwn',
                            query[:, sh:eh, sw:ew, :].float(),
                            rkey.float()) * scale
        attn = attn.softmax(dim=-1).to(rval.dtype)
        out = torch.einsum('bhwn,bnc->bhwc', attn, rval)
        new_hidden[:, sh:eh, sw:ew, :] += out / region_mask.reshape(
            1, fh, fw, 1)[:, sh:eh, sw:ew, :]
    return new_hidden.reshape(-1, seq_lens, new_hidden.shape[-1])


def reference_region_processor(p, x, ctx, region_list, heads, height, width):
    """Full RegionT2I_AttnProcessor.__call__ cross-attention mirror
    (reference …t2iadapter.py:88-145): QKV projections, head_to_batch_dim,
    global softmax attention, region_rewrite, batch_to_head_dim, to_out.

    p: dict of numpy kernels in OUR layout ((in, out) 'kernel' + 'bias');
    x: (B, S, C) torch; ctx: (B, 77, C); region_list: [(embeds, box)]."""
    def lin(name, t):
        w = torch.from_numpy(p[name]['kernel'])
        y = t @ w
        if 'bias' in p[name]:
            y = y + torch.from_numpy(p[name]['bias'])
        return y

    b, s, c = x.shape
    d = c // heads
    scale = 1.0 / math.sqrt(d)

    def head_to_batch(t):
        return t.reshape(b, -1, heads, d).permute(0, 2, 1, 3) \
                .reshape(b * heads, -1, d)

    q = head_to_batch(lin('to_q', x))
    k = head_to_batch(lin('to_k', ctx))
    v = head_to_batch(lin('to_v', ctx))
    probs = torch.softmax(q.float() @ k.float().transpose(-1, -2) * scale,
                          dim=-1)
    hidden = (probs @ v.float()).to(x.dtype)

    regions = []
    for embeds, box in region_list:
        rk = head_to_batch(lin('to_k', embeds))
        rv = head_to_batch(lin('to_v', embeds))
        regions.append((rk, rv, box))
    hidden = reference_region_rewrite(hidden, q, regions, height, width,
                                      scale)
    hidden = hidden.reshape(b, heads, -1, d).permute(0, 2, 1, 3) \
                   .reshape(b, -1, c)
    return lin('to_out', hidden)


# ------------------------------------------------------------- T2I-Adapter
class TorchT2IAdapter(nn.Module):
    """diffusers 0.19.3 T2IAdapter ('full_adapter') mirror: PixelUnshuffle(8)
    → conv_in → 4 stages of [AvgPool2d(2, ceil_mode=True) between stages,
    optional 1x1 in_conv on channel change, N (conv3x3-relu-conv1x1)+res
    blocks]. state_dict keys match diffusers ('adapter.…' prefix added by
    the caller when testing the converter). Loaded by the reference at
    regionally_controlable_sampling.py:62-63."""

    def __init__(self, cfg):
        super().__init__()
        r = cfg.downscale_factor
        self.r = r
        self.unshuffle = nn.PixelUnshuffle(r)
        self.conv_in = nn.Conv2d(cfg.in_channels * r * r, cfg.channels[0],
                                 3, padding=1)
        self.body = nn.ModuleList()
        cin = cfg.channels[0]
        for i, cout in enumerate(cfg.channels):
            blk = nn.Module()
            blk.downsample = (nn.AvgPool2d(2, ceil_mode=True) if i > 0
                              else None)
            if cin != cout:
                blk.in_conv = nn.Conv2d(cin, cout, 1)
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.num_res_blocks):
                res = nn.Module()
                res.block1 = nn.Conv2d(cout, cout, 3, padding=1)
                res.block2 = nn.Conv2d(cout, cout, 1)
                blk.resnets.append(res)
            self.body.append(blk)
            cin = cout

    def forward(self, x):
        x = self.conv_in(self.unshuffle(x))
        feats = []
        for blk in self.body:
            if blk.downsample is not None:
                x = blk.downsample(x)
            if hasattr(blk, 'in_conv'):
                x = blk.in_conv(x)
            for res in blk.resnets:
                x = x + res.block2(F.relu(res.block1(x)))
            feats.append(x)
        return feats


# --------------------------------------------------------- fusion LBFGS
def reference_lbfgs_fit(k_target, v_target, w0, iters):
    """Mirror of the reference per-layer fusion optimizer update_quasi_newton
    (gradient_fusion.py:38-96): torch.optim.LBFGS, lr=1, strong-Wolfe line
    search, history 25, tolerances 1e-16, best-loss tracking, objective
    mse(K @ W^T, V) via the chunked path.

    k_target: (N, F) float32 torch; v_target: (N, O); w0: (O, F) torch
    Linear weight layout. Returns the best W found."""
    w = w0.detach().clone()
    w.requires_grad = True
    best = {'loss': float('inf'), 'w': w0.detach().clone()}

    opt = torch.optim.LBFGS([w], lr=1, max_iter=iters, history_size=25,
                            line_search_fn='strong_wolfe',
                            tolerance_grad=1e-16, tolerance_change=1e-16)

    def closure():
        opt.zero_grad()
        loss = F.mse_loss(F.linear(k_target, w), v_target)
        if loss.item() < best['loss']:
            best['loss'] = loss.item()
            best['w'] = w.detach().clone()
        loss.backward()
        return loss

    opt.step(closure)
    return best['w']
