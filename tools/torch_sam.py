"""Independent torch mirror of the SAM architecture at tiny scale, in the published
``sam_vit_*.pth`` state-dict naming — golden reference for ``models/sam.py`` +
``convert/sam_import.py`` (the same convert -> forward -> compare pattern as
tools/torch_mirror.py; this image has torch but no segment_anything package).

Layer semantics follow the paper (arXiv 2304.02643) and the published checkpoint layout;
NOT derived from /root/reference (which never invokes SAM — requirements.txt:15 only).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):  # (B, C, H, W)
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


def window_partition(x, win):
    b, h, w, c = x.shape
    ph, pw = (-h) % win, (-w) % win
    x = F.pad(x, (0, 0, 0, pw, 0, ph))
    hp, wp = h + ph, w + pw
    x = x.view(b, hp // win, win, wp // win, win, c).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win, win, c), (hp, wp)


def window_unpartition(x, win, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp // win * (wp // win))
    x = x.view(b, hp // win, wp // win, win, win, -1).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, -1)[:, :h, :w]


def get_rel_pos(q_size, k_size, rel_pos):
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = F.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel, mode="linear",
        ).reshape(-1, max_rel).permute(1, 0)
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.long()]


class EncAttention(nn.Module):
    def __init__(self, dim, heads, input_size):
        super().__init__()
        self.heads = heads
        head_dim = dim // heads
        self.scale = head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rel_pos_h = nn.Parameter(torch.zeros(2 * input_size - 1, head_dim))
        self.rel_pos_w = nn.Parameter(torch.zeros(2 * input_size - 1, head_dim))

    def forward(self, x):  # (B, H, W, C)
        b, h, w, _ = x.shape
        qkv = self.qkv(x).reshape(b, h * w, 3, self.heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, b * self.heads, h * w, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        rh = get_rel_pos(h, h, self.rel_pos_h)
        rw = get_rel_pos(w, w, self.rel_pos_w)
        r_q = q.reshape(b * self.heads, h, w, -1)
        rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, rw)
        attn = (
            attn.view(b * self.heads, h, w, h, w)
            + rel_h[:, :, :, :, None]
            + rel_w[:, :, :, None, :]
        ).view(b * self.heads, h * w, h * w)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).view(b, self.heads, h, w, -1).permute(0, 2, 3, 1, 4).reshape(b, h, w, -1)
        return self.proj(x)


class EncBlock(nn.Module):
    def __init__(self, dim, heads, window, input_size):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = EncAttention(dim, heads, window if window > 0 else input_size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.lin1 = nn.Linear(dim, dim * 4)
        self.mlp.lin2 = nn.Linear(dim * 4, dim)
        self.window = window

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window > 0:
            x, pad_hw = window_partition(x, self.window)
            hw = (shortcut.shape[1], shortcut.shape[2])
        x = self.attn(x)
        if self.window > 0:
            x = window_unpartition(x, self.window, pad_hw, hw)
        x = shortcut + x
        return x + self.mlp.lin2(F.gelu(self.mlp.lin1(self.norm2(x))))


class ImageEncoderViT(nn.Module):
    def __init__(self, img_size, patch, dim, depth, heads, window, global_attn, out_chans):
        super().__init__()
        grid = img_size // patch
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        self.pos_embed = nn.Parameter(torch.zeros(1, grid, grid, dim))
        self.blocks = nn.ModuleList(
            [EncBlock(dim, heads, 0 if i in global_attn else window, grid) for i in range(depth)]
        )
        self.neck = nn.Sequential(
            nn.Conv2d(dim, out_chans, 1, bias=False),
            LayerNorm2d(out_chans),
            nn.Conv2d(out_chans, out_chans, 3, padding=1, bias=False),
            LayerNorm2d(out_chans),
        )

    def forward(self, x):  # (B, 3, S, S)
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))


class PositionEmbeddingRandom(nn.Module):
    def __init__(self, num_pos_feats):
        super().__init__()
        self.register_buffer(
            "positional_encoding_gaussian_matrix", torch.randn(2, num_pos_feats)
        )

    def _pe(self, coords):
        coords = 2 * coords - 1
        coords = coords @ self.positional_encoding_gaussian_matrix
        coords = 2 * math.pi * coords
        return torch.cat([torch.sin(coords), torch.cos(coords)], dim=-1)

    def forward(self, size):
        h, w = size
        device = self.positional_encoding_gaussian_matrix.device
        grid = torch.ones(h, w, device=device)
        y = (grid.cumsum(0) - 0.5) / h
        x = (grid.cumsum(1) - 0.5) / w
        return self._pe(torch.stack([x, y], dim=-1)).permute(2, 0, 1)

    def forward_with_coords(self, coords, image_size):
        c = coords.clone().float()
        c[..., 0] = c[..., 0] / image_size[1]
        c[..., 1] = c[..., 1] / image_size[0]
        return self._pe(c)


class PromptEncoder(nn.Module):
    def __init__(self, embed_dim, grid, image_size, mask_in_chans):
        super().__init__()
        self.embed_dim = embed_dim
        self.grid = grid
        self.image_size = image_size
        self.pe_layer = PositionEmbeddingRandom(embed_dim // 2)
        self.point_embeddings = nn.ModuleList([nn.Embedding(1, embed_dim) for _ in range(4)])
        self.not_a_point_embed = nn.Embedding(1, embed_dim)
        self.no_mask_embed = nn.Embedding(1, embed_dim)
        self.mask_downscaling = nn.Sequential(
            nn.Conv2d(1, mask_in_chans // 4, 2, 2),
            LayerNorm2d(mask_in_chans // 4),
            nn.GELU(),
            nn.Conv2d(mask_in_chans // 4, mask_in_chans, 2, 2),
            LayerNorm2d(mask_in_chans),
            nn.GELU(),
            nn.Conv2d(mask_in_chans, embed_dim, 1),
        )

    def get_dense_pe(self):
        return self.pe_layer((self.grid, self.grid)).unsqueeze(0)

    def encode_points(self, coords, labels):
        """pad=True semantics: append a (0,0)/-1 padding point."""
        coords = torch.cat([coords, torch.zeros(coords.shape[0], 1, 2)], dim=1)
        labels = torch.cat([labels, -torch.ones(labels.shape[0], 1, dtype=labels.dtype)], dim=1)
        pe = self.pe_layer.forward_with_coords(
            coords + 0.5, (self.image_size, self.image_size)
        )
        pe[labels == -1] = 0.0
        pe[labels == -1] += self.not_a_point_embed.weight[0]
        for role in range(4):
            pe[labels == role] += self.point_embeddings[role].weight[0]
        return pe


class DecAttention(nn.Module):
    def __init__(self, dim, heads, downsample_rate=1):
        super().__init__()
        internal = dim // downsample_rate
        self.heads = heads
        self.q_proj = nn.Linear(dim, internal)
        self.k_proj = nn.Linear(dim, internal)
        self.v_proj = nn.Linear(dim, internal)
        self.out_proj = nn.Linear(internal, dim)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        b, nq, c = q.shape
        hd = c // self.heads
        q = q.view(b, nq, self.heads, hd).transpose(1, 2)
        k = k.view(b, k.shape[1], self.heads, hd).transpose(1, 2)
        v = v.view(b, v.shape[1], self.heads, hd).transpose(1, 2)
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(b, nq, c)
        return self.out_proj(out)


class TwoWayLayer(nn.Module):
    def __init__(self, dim, heads, mlp_dim, skip_first_pe):
        super().__init__()
        self.self_attn = DecAttention(dim, heads)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_attn_token_to_image = DecAttention(dim, heads, 2)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential()
        self.mlp.lin1 = nn.Linear(dim, mlp_dim)
        self.mlp.lin2 = nn.Linear(mlp_dim, dim)
        self.norm3 = nn.LayerNorm(dim)
        self.cross_attn_image_to_token = DecAttention(dim, heads, 2)
        self.norm4 = nn.LayerNorm(dim)
        self.skip_first_pe = skip_first_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_pe:
            # published semantics: attention output REPLACES queries (no residual) on layer 0
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        attn = self.cross_attn_token_to_image(queries + query_pe, keys + key_pe, keys)
        queries = self.norm2(queries + attn)
        queries = self.norm3(queries + self.mlp.lin2(F.relu(self.mlp.lin1(queries))))
        attn = self.cross_attn_image_to_token(keys + key_pe, queries + query_pe, queries)
        keys = self.norm4(keys + attn)
        return queries, keys


class MaskDecoder(nn.Module):
    def __init__(self, dim, heads, depth, mlp_dim, num_mask_tokens):
        super().__init__()
        self.num_mask_tokens = num_mask_tokens
        self.iou_token = nn.Embedding(1, dim)
        self.mask_tokens = nn.Embedding(num_mask_tokens, dim)
        self.transformer = nn.Module()
        self.transformer.layers = nn.ModuleList(
            [TwoWayLayer(dim, heads, mlp_dim, i == 0) for i in range(depth)]
        )
        self.transformer.final_attn_token_to_image = DecAttention(dim, heads, 2)
        self.transformer.norm_final_attn = nn.LayerNorm(dim)
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(dim, dim // 4, 2, 2),
            LayerNorm2d(dim // 4),
            nn.GELU(),
            nn.ConvTranspose2d(dim // 4, dim // 8, 2, 2),
            nn.GELU(),
        )
        self.output_hypernetworks_mlps = nn.ModuleList()
        for _ in range(num_mask_tokens):
            m = nn.Module()
            m.layers = nn.ModuleList(
                [nn.Linear(dim, dim), nn.Linear(dim, dim), nn.Linear(dim, dim // 8)]
            )
            self.output_hypernetworks_mlps.append(m)
        self.iou_prediction_head = nn.Module()
        self.iou_prediction_head.layers = nn.ModuleList(
            [nn.Linear(dim, dim), nn.Linear(dim, dim), nn.Linear(dim, num_mask_tokens)]
        )

    @staticmethod
    def _mlp3(m, x):
        x = F.relu(m.layers[0](x))
        x = F.relu(m.layers[1](x))
        return m.layers[2](x)

    def forward(self, image_embed, image_pe, sparse):
        """image_embed (B, C, g, g), image_pe (1, C, g, g), sparse (B, N, C)."""
        b = image_embed.shape[0]
        tokens = torch.cat([self.iou_token.weight, self.mask_tokens.weight], dim=0)
        tokens = tokens.unsqueeze(0).expand(b, -1, -1)
        tokens = torch.cat([tokens, sparse], dim=1)

        g = image_embed.shape[-1]
        queries = tokens
        keys = image_embed.flatten(2).permute(0, 2, 1)
        key_pe = image_pe.flatten(2).permute(0, 2, 1).expand(b, -1, -1)
        for layer in self.transformer.layers:
            queries, keys = layer(queries, keys, tokens, key_pe)
        attn = self.transformer.final_attn_token_to_image(
            queries + tokens, keys + key_pe, keys
        )
        queries = self.transformer.norm_final_attn(queries + attn)

        iou_out = queries[:, 0]
        mask_tokens_out = queries[:, 1 : 1 + self.num_mask_tokens]
        src = keys.transpose(1, 2).reshape(b, -1, g, g)
        upscaled = self.output_upscaling(src)
        hyper = torch.stack(
            [self._mlp3(m, mask_tokens_out[:, i]) for i, m in enumerate(self.output_hypernetworks_mlps)],
            dim=1,
        )
        bq, c, h, w = upscaled.shape
        masks = (hyper @ upscaled.view(bq, c, h * w)).view(bq, -1, h, w)
        iou = self._mlp3(self.iou_prediction_head, iou_out)
        return masks, iou


class Sam(nn.Module):
    """cfg mirrors diffsim_tpu.models.sam.SamConfig."""

    def __init__(self, *, image_size, patch, encoder_dim, encoder_depth, encoder_heads,
                 global_attn, window, prompt_dim, decoder_heads, decoder_depth, decoder_mlp,
                 num_mask_tokens=4):
        super().__init__()
        grid = image_size // patch
        self.image_size = image_size
        self.image_encoder = ImageEncoderViT(
            image_size, patch, encoder_dim, encoder_depth, encoder_heads, window,
            set(global_attn), prompt_dim,
        )
        self.prompt_encoder = PromptEncoder(
            prompt_dim, grid, image_size, mask_in_chans=max(prompt_dim // 16, 4)
        )
        self.mask_decoder = MaskDecoder(
            prompt_dim, decoder_heads, decoder_depth, decoder_mlp, num_mask_tokens
        )

    @torch.no_grad()
    def predict(self, pixels, coords, labels, multimask=True):
        """pixels (B, 3, S, S) SAM-normalized; coords (B, N, 2) xy px; labels (B, N)."""
        embed = self.image_encoder(pixels)
        sparse = self.prompt_encoder.encode_points(coords, labels)
        dense = self.prompt_encoder.no_mask_embed.weight[0].view(1, -1, 1, 1)
        masks, iou = self.mask_decoder(
            embed + dense, self.prompt_encoder.get_dense_pe(), sparse
        )
        if multimask:
            return masks[:, 1:], iou[:, 1:]
        return masks[:, :1], iou[:, :1]
