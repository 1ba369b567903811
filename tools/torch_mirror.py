"""Independent torch mirror of the SD UNet / VAE-encoder semantics, for converter +
numerics parity fixtures.

This image has torch but no diffusers, so real-checkpoint activation dumps
(tools/dump_torch_reference.py) cannot be produced here. This module provides the next-best
cross-framework evidence: a from-scratch torch implementation of the same published
architecture, emitting a state_dict in the *diffusers naming scheme* that
``convert.diffusion_import`` expects. A fixture generated from it
(tools/make_parity_fixture.py) exercises the full convert -> JAX-forward -> score pipeline
against torch-computed values, catching converter transposes/layout bugs and op-semantics
drift — the failure classes that matter for real-weight fidelity (SURVEY.md §7 "weight
conversion fidelity").

It is NOT derived from /root/reference (which contains no model internals — it calls
diffusers); layer semantics follow the published Stable Diffusion architecture, mirrored
against what our converters consume (convert/diffusion_import.py:53-217).

Scope: the tiny configs only (UNetConfig.tiny / VAEConfig.tiny) — enough structure to cover
every converter branch (resnets with/without shortcut, cross-attn blocks, mid attention,
down/up sampling, GEGLU, quant_conv) at committable fixture size.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# shared layers (diffusers naming)
# ---------------------------------------------------------------------------


def timestep_embedding(t: torch.Tensor, dim: int, max_period: float = 10000.0) -> torch.Tensor:
    """Sinusoidal embedding, cos-first (flip_sin_to_cos), freq shift 0 — SD's time_proj."""
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class Attention(nn.Module):
    """Multi-head attention, diffusers `Attention` layout (to_q/k/v no bias, to_out.0).

    Stashes the last (B, heads, S, D) q/k/v on ``self.last_qkv`` so fixtures can record tap
    values without hook machinery."""

    def __init__(self, dim: int, heads: int, context_dim: int | None = None, qkv_bias: bool = False):
        super().__init__()
        cdim = context_dim or dim
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=qkv_bias)
        self.to_k = nn.Linear(cdim, dim, bias=qkv_bias)
        self.to_v = nn.Linear(cdim, dim, bias=qkv_bias)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.last_qkv = None

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, s, _ = x.shape
        sk = ctx.shape[1]

        def heads_first(t, seq):
            return t.view(b, seq, self.heads, -1).transpose(1, 2)

        q = heads_first(self.to_q(x), s)
        k = heads_first(self.to_k(ctx), sk)
        v = heads_first(self.to_v(ctx), sk)
        self.last_qkv = (q.detach(), k.detach(), v.detach())
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, s, -1)
        return self.to_out[0](out)


class FeedForward(nn.Module):
    """GEGLU feed-forward, diffusers layout ff.net.0.proj / ff.net.2."""

    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        proj = nn.Linear(dim, dim * mult * 2)
        self.net = nn.ModuleList([nn.Module(), nn.Identity(), nn.Linear(dim * mult, dim)])
        self.net[0].proj = proj

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, context_dim: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, context_dim=context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2D(nn.Module):
    """Transformer2DModel with 1x1-conv projections (the SD-1.5 variant)."""

    def __init__(self, channels: int, heads: int, context_dim: int, depth: int = 1):
        super().__init__()
        self.norm = nn.GroupNorm(32, channels, eps=1e-6)
        self.proj_in = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(channels, heads, context_dim) for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(channels, channels, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            y = blk(y, context)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


class ResnetBlock2D(nn.Module):
    def __init__(self, cin: int, cout: int, temb_dim: int | None = None, eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


# ---------------------------------------------------------------------------
# tiny UNet (mirrors UNetConfig.tiny: chans (32,64), cross (True,False),
# layers_per_block 1, heads 2, context 32, conv projections)
# ---------------------------------------------------------------------------


class TinyUNet(nn.Module):
    def __init__(self, in_channels=4, out_channels=4, chans=(32, 64), heads=2, context_dim=32):
        super().__init__()
        ted = chans[0] * 4
        self.chans, self.heads, self.ted = chans, heads, ted

        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(chans[0], ted)
        self.time_embedding.linear_2 = nn.Linear(ted, ted)
        self.conv_in = nn.Conv2d(in_channels, chans[0], 3, padding=1)

        # down 0: cross-attn block with downsampler; down 1: plain block, no downsampler
        d0 = nn.Module()
        d0.resnets = nn.ModuleList([ResnetBlock2D(chans[0], chans[0], ted)])
        d0.attentions = nn.ModuleList([Transformer2D(chans[0], heads, context_dim)])
        d0.downsamplers = nn.ModuleList([nn.Module()])
        d0.downsamplers[0].conv = nn.Conv2d(chans[0], chans[0], 3, stride=2, padding=1)
        d1 = nn.Module()
        d1.resnets = nn.ModuleList([ResnetBlock2D(chans[0], chans[1], ted)])
        self.down_blocks = nn.ModuleList([d0, d1])

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(chans[1], chans[1], ted), ResnetBlock2D(chans[1], chans[1], ted)]
        )
        self.mid_block.attentions = nn.ModuleList([Transformer2D(chans[1], heads, context_dim)])

        # up 0 mirrors down 1 (no attn, has upsampler); up 1 mirrors down 0 (attn, no upsampler)
        u0 = nn.Module()
        u0.resnets = nn.ModuleList(
            [ResnetBlock2D(chans[1] + chans[1], chans[1], ted),
             ResnetBlock2D(chans[1] + chans[0], chans[1], ted)]
        )
        u0.upsamplers = nn.ModuleList([nn.Module()])
        u0.upsamplers[0].conv = nn.Conv2d(chans[1], chans[1], 3, padding=1)
        u1 = nn.Module()
        u1.resnets = nn.ModuleList(
            [ResnetBlock2D(chans[1] + chans[0], chans[0], ted),
             ResnetBlock2D(chans[0] + chans[0], chans[0], ted)]
        )
        u1.attentions = nn.ModuleList(
            [Transformer2D(chans[0], heads, context_dim), Transformer2D(chans[0], heads, context_dim)]
        )
        self.up_blocks = nn.ModuleList([u0, u1])

        self.conv_norm_out = nn.GroupNorm(32, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], out_channels, 3, padding=1)

    def forward(self, x, t, context):
        if t.ndim == 0:
            t = t.expand(x.shape[0])
        emb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(timestep_embedding(t, self.chans[0])))
        )
        h = self.conv_in(x)
        skips = [h]
        d0, d1 = self.down_blocks
        h = d0.resnets[0](h, emb)
        h = d0.attentions[0](h, context)
        skips.append(h)
        h = d0.downsamplers[0].conv(h)
        skips.append(h)
        h = d1.resnets[0](h, emb)
        skips.append(h)

        h = self.mid_block.resnets[0](h, emb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, emb)

        u0, u1 = self.up_blocks
        for r in u0.resnets:
            h = r(torch.cat([h, skips.pop()], dim=1), emb)
        h = F.interpolate(h, scale_factor=2, mode="nearest")
        h = u0.upsamplers[0].conv(h)
        for r, a in zip(u1.resnets, u1.attentions):
            h = r(torch.cat([h, skips.pop()], dim=1), emb)
            h = a(h, context)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# tiny VAE encoder (mirrors VAEConfig.tiny: chans (32,64), 1 resnet/block)
# ---------------------------------------------------------------------------


class VAEAttention(nn.Module):
    """Single-head VAE mid attention (diffusers Attention with group_norm + residual)."""

    def __init__(self, channels: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y)[:, None], self.to_k(y)[:, None], self.to_v(y)[:, None]
        y = F.scaled_dot_product_attention(q, k, v)[:, 0]
        y = self.to_out[0](y).reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + y


class TinyVAEEncoder(nn.Module):
    def __init__(self, chans=(32, 64), latent_channels=4):
        super().__init__()
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        d0 = nn.Module()
        d0.resnets = nn.ModuleList([ResnetBlock2D(chans[0], chans[0], eps=1e-6)])
        d0.downsamplers = nn.ModuleList([nn.Module()])
        d0.downsamplers[0].conv = nn.Conv2d(chans[0], chans[0], 3, stride=2, padding=0)
        d1 = nn.Module()
        d1.resnets = nn.ModuleList([ResnetBlock2D(chans[0], chans[1], eps=1e-6)])
        enc.down_blocks = nn.ModuleList([d0, d1])
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(chans[1], chans[1], eps=1e-6), ResnetBlock2D(chans[1], chans[1], eps=1e-6)]
        )
        enc.mid_block.attentions = nn.ModuleList([VAEAttention(chans[1])])
        enc.conv_norm_out = nn.GroupNorm(32, chans[1], eps=1e-6)
        enc.conv_out = nn.Conv2d(chans[1], 2 * latent_channels, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)

    def forward(self, x):
        e = self.encoder
        h = e.conv_in(x)
        h = e.down_blocks[0].resnets[0](h)
        h = F.pad(h, (0, 1, 0, 1))  # VAE's asymmetric downsample padding
        h = e.down_blocks[0].downsamplers[0].conv(h)
        h = e.down_blocks[1].resnets[0](h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        return self.quant_conv(e.conv_out(F.silu(e.conv_norm_out(h))))


class TinyVAEDecoder(nn.Module):
    """Decoder half (used by the DiT sampling path); same tiny geometry mirrored."""

    def __init__(self, chans=(32, 64), latent_channels=4):
        super().__init__()
        rev = list(reversed(chans))  # (64, 32)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)
        dec = nn.Module()
        dec.conv_in = nn.Conv2d(latent_channels, rev[0], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(rev[0], rev[0], eps=1e-6), ResnetBlock2D(rev[0], rev[0], eps=1e-6)]
        )
        dec.mid_block.attentions = nn.ModuleList([VAEAttention(rev[0])])
        u0 = nn.Module()
        u0.resnets = nn.ModuleList(
            [ResnetBlock2D(rev[0], rev[0], eps=1e-6), ResnetBlock2D(rev[0], rev[0], eps=1e-6)]
        )
        u0.upsamplers = nn.ModuleList([nn.Module()])
        u0.upsamplers[0].conv = nn.Conv2d(rev[0], rev[0], 3, padding=1)
        u1 = nn.Module()
        u1.resnets = nn.ModuleList(
            [ResnetBlock2D(rev[0], rev[1], eps=1e-6), ResnetBlock2D(rev[1], rev[1], eps=1e-6)]
        )
        dec.up_blocks = nn.ModuleList([u0, u1])
        dec.conv_norm_out = nn.GroupNorm(32, rev[1], eps=1e-6)
        dec.conv_out = nn.Conv2d(rev[1], 3, 3, padding=1)
        self.decoder = dec

    def forward(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        u0, u1 = d.up_blocks
        for r in u0.resnets:
            h = r(h)
        h = u0.upsamplers[0].conv(F.interpolate(h, scale_factor=2, mode="nearest"))
        for r in u1.resnets:
            h = r(h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# the full scoring readout in torch (reference semantics,
# /root/reference/diffsim/diffsim.py:171-197)
# ---------------------------------------------------------------------------


def sample_latents(moments: torch.Tensor, eps: torch.Tensor, scaling: float) -> torch.Tensor:
    mean, logvar = moments.chunk(2, dim=1)
    std = torch.exp(0.5 * logvar.clamp(-30.0, 20.0))
    return (mean + std * eps) * scaling


def cross_attention_score(qkv_a, qkv_b, similarity: str = "cosine") -> float:
    qa, ka, va = qkv_a
    qb, kb, vb = qkv_b
    a_on_b = F.scaled_dot_product_attention(qa, kb, vb)
    b_on_a = F.scaled_dot_product_attention(qb, ka, va)
    self_a = F.scaled_dot_product_attention(qa, ka, va)
    self_b = F.scaled_dot_product_attention(qb, kb, vb)
    if similarity == "cosine":
        s1 = F.cosine_similarity(a_on_b.reshape(1, -1), self_a.reshape(1, -1))
        s2 = F.cosine_similarity(b_on_a.reshape(1, -1), self_b.reshape(1, -1))
    else:
        s1 = F.mse_loss(a_on_b, self_a)[None]
        s2 = F.mse_loss(b_on_a, self_b)[None]
    return float((s1 + s2) / 2.0)


@torch.no_grad()
def diffsim_score_pair(
    unet: TinyUNet,
    vae: TinyVAEEncoder,
    pix_a: torch.Tensor,
    pix_b: torch.Tensor,
    embeds: torch.Tensor,
    eps_vae: tuple[torch.Tensor, torch.Tensor],
    eps_noise: tuple[torch.Tensor, torch.Tensor],
    model_t: float,
    a: float,
    b: float,
    scaling: float = 0.18215,
    similarity: str = "cosine",
) -> float:
    """One DiffSim pair score with *injected* noise, mirroring the fused scoring graph:
    VAE encode -> sample -> q_sample to (a, b) -> CFG-doubled UNet fwd -> tap at
    up_blocks[-1].attentions[-1].transformer_blocks[-1].attn1 -> 4xSDPA readout.
    pix: (1, 3, H, W) in [-1, 1]; embeds: (2, 77, cdim) [uncond, cond]."""
    tap_site = unet.up_blocks[1].attentions[-1].transformer_blocks[-1].attn1
    qkv = []
    for pix, ev, en in zip((pix_a, pix_b), eps_vae, eps_noise):
        z = sample_latents(vae(pix), ev, scaling)
        x = a * z + b * en
        x = torch.cat([x, x], dim=0)  # CFG duplicate [uncond, cond]
        unet(x, torch.tensor(model_t), embeds)
        qkv.append(tap_site.last_qkv)
    return cross_attention_score(qkv[0], qkv[1], similarity)


# ---------------------------------------------------------------------------
# tiny SDXL UNet (mirrors UNetConfig.tiny_xl: chans (32,64), cross (False,True),
# transformer depth (0,2), mid depth 2, LINEAR projections, text_time addition embed)
# — every XL-specific mechanism the reference's XL scorer exercises
# (/root/reference/diffsim/diffsim_xl_pipeline.py:199-262,312-323)
# ---------------------------------------------------------------------------


class LinearTransformer2D(nn.Module):
    """Transformer2DModel with use_linear_projection=True (the SDXL variant): the reshape
    happens BEFORE proj_in and AFTER proj_out, with nn.Linear projections."""

    def __init__(self, channels: int, heads: int, context_dim: int, depth: int):
        super().__init__()
        self.norm = nn.GroupNorm(32, channels, eps=1e-6)
        self.proj_in = nn.Linear(channels, channels)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(channels, heads, context_dim) for _ in range(depth)]
        )
        self.proj_out = nn.Linear(channels, channels)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, context)
        y = self.proj_out(y)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return y + res


class TinyXLUNet(nn.Module):
    """Mirrors UNetConfig.tiny_xl(cross_attention_dim=64): heads 2, ted 128,
    addition_time_embed_dim 8, projection_class_embeddings_input_dim 16 + 8*6."""

    def __init__(self, in_channels=4, out_channels=4, chans=(32, 64), heads=2,
                 context_dim=64, pooled_dim=16, add_time_dim=8, tdepth=2):
        super().__init__()
        ted = chans[0] * 4
        self.chans, self.heads, self.ted = chans, heads, ted
        self.add_time_dim = add_time_dim

        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(chans[0], ted)
        self.time_embedding.linear_2 = nn.Linear(ted, ted)
        # SDXL 'text_time' addition embedding: concat[pooled text_embeds, sinusoid(time_ids)]
        self.add_embedding = nn.Module()
        self.add_embedding.linear_1 = nn.Linear(pooled_dim + add_time_dim * 6, ted)
        self.add_embedding.linear_2 = nn.Linear(ted, ted)
        self.conv_in = nn.Conv2d(in_channels, chans[0], 3, padding=1)

        # down 0: plain resnet + downsampler; down 1: cross-attn block (depth-2, linear proj)
        d0 = nn.Module()
        d0.resnets = nn.ModuleList([ResnetBlock2D(chans[0], chans[0], ted)])
        d0.downsamplers = nn.ModuleList([nn.Module()])
        d0.downsamplers[0].conv = nn.Conv2d(chans[0], chans[0], 3, stride=2, padding=1)
        d1 = nn.Module()
        d1.resnets = nn.ModuleList([ResnetBlock2D(chans[0], chans[1], ted)])
        d1.attentions = nn.ModuleList([LinearTransformer2D(chans[1], heads, context_dim, tdepth)])
        self.down_blocks = nn.ModuleList([d0, d1])

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(chans[1], chans[1], ted), ResnetBlock2D(chans[1], chans[1], ted)]
        )
        self.mid_block.attentions = nn.ModuleList(
            [LinearTransformer2D(chans[1], heads, context_dim, tdepth)]
        )

        # up 0 mirrors down 1 (two attn, upsampler); up 1 mirrors down 0 (plain)
        u0 = nn.Module()
        u0.resnets = nn.ModuleList(
            [ResnetBlock2D(chans[1] + chans[1], chans[1], ted),
             ResnetBlock2D(chans[1] + chans[0], chans[1], ted)]
        )
        u0.attentions = nn.ModuleList(
            [LinearTransformer2D(chans[1], heads, context_dim, tdepth),
             LinearTransformer2D(chans[1], heads, context_dim, tdepth)]
        )
        u0.upsamplers = nn.ModuleList([nn.Module()])
        u0.upsamplers[0].conv = nn.Conv2d(chans[1], chans[1], 3, padding=1)
        u1 = nn.Module()
        u1.resnets = nn.ModuleList(
            [ResnetBlock2D(chans[1] + chans[0], chans[0], ted),
             ResnetBlock2D(chans[0] + chans[0], chans[0], ted)]
        )
        self.up_blocks = nn.ModuleList([u0, u1])

        self.conv_norm_out = nn.GroupNorm(32, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], out_channels, 3, padding=1)

    def forward(self, x, t, context, text_embeds, time_ids):
        """x (B,C,H,W); context (B,77,cdim); text_embeds (B,pooled); time_ids (B,6)."""
        if t.ndim == 0:
            t = t.expand(x.shape[0])
        emb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(timestep_embedding(t, self.chans[0])))
        )
        tproj = timestep_embedding(time_ids.reshape(-1), self.add_time_dim).reshape(
            time_ids.shape[0], -1
        )
        add = torch.cat([text_embeds, tproj], dim=-1)
        emb = emb + self.add_embedding.linear_2(F.silu(self.add_embedding.linear_1(add)))

        h = self.conv_in(x)
        skips = [h]
        d0, d1 = self.down_blocks
        h = d0.resnets[0](h, emb)
        skips.append(h)
        h = d0.downsamplers[0].conv(h)
        skips.append(h)
        h = d1.resnets[0](h, emb)
        h = d1.attentions[0](h, context)
        skips.append(h)

        h = self.mid_block.resnets[0](h, emb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, emb)

        u0, u1 = self.up_blocks
        for r, a in zip(u0.resnets, u0.attentions):
            h = r(torch.cat([h, skips.pop()], dim=1), emb)
            h = a(h, context)
        h = F.interpolate(h, scale_factor=2, mode="nearest")
        h = u0.upsamplers[0].conv(h)
        for r in u1.resnets:
            h = r(torch.cat([h, skips.pop()], dim=1), emb)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


@torch.no_grad()
def diffsim_xl_score_pair(
    unet: TinyXLUNet,
    vae: TinyVAEEncoder,
    pix_a: torch.Tensor,
    pix_b: torch.Tensor,
    embeds: torch.Tensor,
    pooled: torch.Tensor,
    time_ids: torch.Tensor,
    eps_vae: tuple[torch.Tensor, torch.Tensor],
    eps_noise: tuple[torch.Tensor, torch.Tensor],
    model_t: float,
    a: float,
    b: float,
    tap_site: nn.Module,
    scaling: float = 0.18215,
    similarity: str = "cosine",
) -> float:
    """One SDXL DiffSim pair score with injected noise: fp32 VAE encode -> sample ->
    init_noise_sigma/'leading' q_sample (a, b from core.schedulers.sdxl_noise_spec) ->
    CFG-doubled UNet fwd with text_time micro-conditioning -> tap -> 4xSDPA readout.
    embeds (2, 77, cdim) [uncond, cond]; pooled (2, pooled_dim); time_ids (6,)."""
    tids = time_ids[None].expand(2, -1)
    qkv = []
    for pix, ev, en in zip((pix_a, pix_b), eps_vae, eps_noise):
        z = sample_latents(vae(pix), ev, scaling)
        x = a * z + b * en
        x = torch.cat([x, x], dim=0)  # CFG duplicate [uncond, cond]
        unet(x, torch.tensor(model_t), embeds, pooled, tids)
        qkv.append(tap_site.last_qkv)
    return cross_attention_score(qkv[0], qkv[1], similarity)
