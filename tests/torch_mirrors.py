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

        x = self.conv_in(sample)
        residuals = [x]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                x = res(x, temb)
                if len(blk.attentions):
                    x = blk.attentions[j](x, ctx)
                residuals.append(x)
            if hasattr(blk, 'downsamplers'):
                x = blk.downsamplers[0].conv(x)
                residuals.append(x)
        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, temb)
        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                x = res(torch.cat([x, residuals.pop()], dim=1), temb)
                if len(blk.attentions):
                    x = blk.attentions[j](x, ctx)
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
