"""Independent torch mirror of the published DiT architecture at tiny scale, in the
``DiT-XL-2-*.pt`` checkpoint naming — golden reference for ``models/dit.py`` +
``convert/diffusion_import.convert_dit`` (same pattern as tools/torch_mirror.py /
tools/torch_sam.py).

Layer semantics follow the published DiT (Peebles & Xie, arXiv 2212.09748: adaLN-Zero
blocks over timm-style attention, fixed 2-D sin-cos positions, (p, q, c) unpatchify);
NOT derived from /root/reference (whose copy we must not translate) — re-implemented from
the paper + checkpoint layout so agreement is evidence, not circularity.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def get_2d_sincos_pos_embed(embed_dim, grid_size):
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w first
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb = np.concatenate([_1d(embed_dim // 2, grid[0]), _1d(embed_dim // 2, grid[1])], axis=1)
    return emb.astype(np.float32)  # (N, embed_dim)


def timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def modulate(x, shift, scale):
    return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class Attention(nn.Module):
    """timm-style fused-qkv attention. Stashes the (B, heads, N, hd) q/k/v on
    ``self.last_qkv`` — the tap the reference's pre-hook captures from the fused projection
    (q_norm/k_norm are Identity in published DiT configs,
    /root/reference/diffsim/diffsim_dit.py:19-26)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.last_qkv = None

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        self.last_qkv = (q.detach(), k.detach(), v.detach())
        attn = (q @ k.transpose(-2, -1)) * hd**-0.5
        x = (attn.softmax(-1) @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class DiTBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.attn = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        mh = int(dim * mlp_ratio)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, mh)
        self.mlp.fc2 = nn.Linear(mh, dim)
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(dim, 6 * dim, bias=True))

    def forward(self, x, c):
        sm, scm, gm, sp, scp, gp = self.adaLN_modulation(c).chunk(6, dim=1)
        x = x + gm.unsqueeze(1) * self.attn(modulate(self.norm1(x), sm, scm))
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(modulate(self.norm2(x), sp, scp)), approximate="tanh"))
        return x + gp.unsqueeze(1) * h


class DiT(nn.Module):
    def __init__(self, input_size, patch, in_channels, hidden, depth, heads, num_classes,
                 learn_sigma=True, mlp_ratio=4.0):
        super().__init__()
        self.patch = patch
        self.out_channels = in_channels * 2 if learn_sigma else in_channels
        grid = input_size // patch
        self.x_embedder = nn.Module()
        self.x_embedder.proj = nn.Conv2d(in_channels, hidden, patch, patch)
        self.register_buffer(
            "pos_embed", torch.from_numpy(get_2d_sincos_pos_embed(hidden, grid)).unsqueeze(0)
        )
        self.t_embedder = nn.Module()
        self.t_embedder.mlp = nn.Sequential(
            nn.Linear(256, hidden), nn.SiLU(), nn.Linear(hidden, hidden)
        )
        self.y_embedder = nn.Module()
        self.y_embedder.embedding_table = nn.Embedding(num_classes + 1, hidden)
        self.blocks = nn.ModuleList([DiTBlock(hidden, heads, mlp_ratio) for _ in range(depth)])
        self.final_layer = nn.Module()
        self.final_layer.norm = nn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)
        self.final_layer.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(hidden, 2 * hidden, bias=True)
        )
        self.final_layer.linear = nn.Linear(hidden, patch * patch * self.out_channels)

    def unpatchify(self, x):
        c, p = self.out_channels, self.patch
        h = w = int(x.shape[1] ** 0.5)
        x = x.reshape(x.shape[0], h, w, p, p, c)
        x = torch.einsum("nhwpqc->nchpwq", x)
        return x.reshape(x.shape[0], c, h * p, w * p)

    @torch.no_grad()
    def forward(self, x, t, y):
        """x (B, C, H, W), t (B,), y (B,) -> (B, out_channels, H, W)."""
        x = self.x_embedder.proj(x).flatten(2).transpose(1, 2) + self.pos_embed
        # t_embedder.mlp indices 0 and 2 are the linears (1 is SiLU), as in the checkpoint
        c = self.t_embedder.mlp(timestep_embedding(t, 256))
        c = c + self.y_embedder.embedding_table(y)
        for blk in self.blocks:
            x = blk(x, c)
        shift, scale = self.final_layer.adaLN_modulation(c).chunk(2, dim=1)
        x = self.final_layer.linear(modulate(self.final_layer.norm(x), shift, scale))
        return self.unpatchify(x)


@torch.no_grad()
def dit_score_pair(
    model: DiT,
    vae,
    num_classes: int,
    pix_a: torch.Tensor,
    pix_b: torch.Tensor,
    eps_vae,
    eps_noise,
    model_t: float,
    a: float,
    b: float,
    tap_layer: int,
    scaling: float = 0.18215,
    similarity: str = "cosine",
) -> float:
    """One DiT DiffSim pair score with injected noise, the full reference scoring semantics
    (/root/reference/diffsim/diffsim_dit.py:63-142): VAE encode -> sample -> DDIM add_noise at
    raw t (a, b from core.schedulers.dit_noise_spec's SD-1.5 scaled_linear table) -> batch-2
    forward with y=[1, null] at the RESPACED model timestep -> fused-qkv tap -> 4xSDPA
    readout. pix: (1, 3, H, W) in [-1, 1]."""
    from tools.torch_mirror import cross_attention_score, sample_latents

    tap_site = model.blocks[tap_layer].attn
    y = torch.tensor([1, num_classes], dtype=torch.long)
    qkv = []
    for pix, ev, en in zip((pix_a, pix_b), eps_vae, eps_noise):
        z = sample_latents(vae(pix), ev, scaling)
        x = a * z + b * en
        x = torch.cat([x, x], dim=0)  # cond + null-class rows
        model(x, torch.tensor([model_t, model_t]), y)
        qkv.append(tap_site.last_qkv)
    return cross_attention_score(qkv[0], qkv[1], similarity)
