"""Segment Anything (SAM) — promptable segmentation, functional NHWC JAX.

The reference declares SAM as the mask source for ``--use_mask`` ("SAM-CLIP to segment the
target region first", /root/reference/argprocess.py:16, requirements.txt:15
``segment_anything==1.0``) but never wires it; this build implements the real thing so
mask-weighted query scoring (metrics/diffeats.py:75-87 semantics) can generate its masks
from the published SAM checkpoints. Architecture re-derived from the paper (Kirillov et al.,
2023, arXiv 2304.02643) and the published checkpoint layout; nothing is ported from torch
code.

Three parts, mirroring the checkpoint's top-level split:

* ``image_encoder``: ViT-{B,L,H}/16 at 1024x1024 with windowed attention (window 14) except
  a few global layers, decomposed relative position embeddings added to attention logits,
  and a conv "neck" to 256 channels -> (B, 64, 64, 256) embeddings.
* ``prompt_encoder``: random-Fourier positional encoding of point/box prompts plus learned
  per-role embeddings; a dense no-mask embedding (mask prompts supported via the conv
  downscaling stack).
* ``mask_decoder``: IoU token + 4 mask tokens through a depth-2 two-way transformer
  (token->image and image->token cross attention), transposed-conv upscaling, per-token
  hypernetwork MLPs -> (B, n_masks, 256, 256) mask logits + IoU predictions.

``convert.sam_import.convert_sam`` maps the published ``sam_vit_{b,l,h}.pth`` checkpoints
onto these trees; tests golden the forward against an independent torch mirror
(tools/torch_sam.py).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from diffsim_tpu.ops.blocks import (
    conv2d,
    conv2d_init,
    gelu,
    layer_norm,
    linear,
    linear_init,
    norm_init,
    rand_normal,
)


@dataclasses.dataclass(frozen=True)
class SamConfig:
    image_size: int = 1024
    patch: int = 16
    encoder_dim: int = 768
    encoder_depth: int = 12
    encoder_heads: int = 12
    global_attn: tuple = (2, 5, 8, 11)
    window: int = 14
    prompt_dim: int = 256
    decoder_heads: int = 8
    decoder_depth: int = 2
    decoder_mlp: int = 2048
    num_mask_tokens: int = 4  # 1 "single" + 3 multimask outputs

    @property
    def grid(self) -> int:
        return self.image_size // self.patch

    @staticmethod
    def vit_b() -> "SamConfig":
        return SamConfig()

    @staticmethod
    def vit_l() -> "SamConfig":
        return SamConfig(encoder_dim=1024, encoder_depth=24, encoder_heads=16,
                         global_attn=(5, 11, 17, 23))

    @staticmethod
    def vit_h() -> "SamConfig":
        return SamConfig(encoder_dim=1280, encoder_depth=32, encoder_heads=16,
                         global_attn=(7, 15, 23, 31))

    @staticmethod
    def tiny() -> "SamConfig":
        """CPU-test scale: 32px input, 4x4 token grid, window 2, one global layer."""
        return SamConfig(image_size=32, patch=8, encoder_dim=16, encoder_depth=2,
                         encoder_heads=2, global_attn=(1,), window=2, prompt_dim=16,
                         decoder_heads=2, decoder_mlp=32)


# SAM's pixel normalization (applied after resize-longest-side to image_size and zero-pad)
PIXEL_MEAN = jnp.asarray([123.675, 116.28, 103.53])
PIXEL_STD = jnp.asarray([58.395, 57.12, 57.375])


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------


def _enc_block_init(key, cfg: SamConfig, windowed: bool, dtype):
    ks = jax.random.split(key, 4)
    d = cfg.encoder_dim
    size = cfg.window if windowed else cfg.grid
    head_dim = d // cfg.encoder_heads
    return {
        "norm1": norm_init(d, dtype),
        "attn": {
            "qkv": linear_init(ks[0], d, 3 * d, dtype=dtype),
            "proj": linear_init(ks[1], d, d, dtype=dtype),
            "rel_pos_h": rand_normal(ks[2], (2 * size - 1, head_dim), dtype, 0.02),
            "rel_pos_w": rand_normal(ks[3], (2 * size - 1, head_dim), dtype, 0.02),
        },
        "norm2": norm_init(d, dtype),
        "mlp": {
            "fc1": linear_init(jax.random.fold_in(key, 7), d, 4 * d, dtype=dtype),
            "fc2": linear_init(jax.random.fold_in(key, 8), 4 * d, d, dtype=dtype),
        },
    }


def encoder_init(key, cfg: SamConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.encoder_depth + 8)
    d = cfg.encoder_dim
    return {
        "patch_embed": conv2d_init(keys[0], cfg.patch, cfg.patch, 3, d, dtype=dtype),
        "pos_embed": rand_normal(keys[1], (cfg.grid, cfg.grid, d), dtype, 0.02),
        "blocks": [
            _enc_block_init(keys[2 + i], cfg, i not in cfg.global_attn, dtype)
            for i in range(cfg.encoder_depth)
        ],
        "neck": {
            "conv1": {"w": rand_normal(keys[-4], (1, 1, d, cfg.prompt_dim), dtype, 0.02)},
            "ln1": norm_init(cfg.prompt_dim, dtype),
            "conv2": {"w": rand_normal(keys[-3], (3, 3, cfg.prompt_dim, cfg.prompt_dim), dtype, 0.02)},
            "ln2": norm_init(cfg.prompt_dim, dtype),
        },
    }


def _get_rel_pos(size: int, rel_pos: jax.Array) -> jax.Array:
    """(2*size-1, head_dim) relative-position table for q_size == k_size == size, linearly
    resized if the stored table has a different length (SAM's get_rel_pos interpolation)."""
    max_rel = 2 * size - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32), (max_rel, rel_pos.shape[1]), "linear"
        ).astype(rel_pos.dtype)
    # q_size == k_size: relative index (q - k) + (size - 1)
    idx = jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + (size - 1)
    return rel_pos[idx]  # (size, size, head_dim)


def _attention(p, x, heads: int):
    """SAM encoder attention over (B, H, W, C) with decomposed rel-pos added to the logits."""
    b, h, w, c = x.shape
    head_dim = c // heads
    scale = head_dim**-0.5
    qkv = linear(p["qkv"], x.reshape(b, h * w, c))
    qkv = qkv.reshape(b, h * w, 3, heads, head_dim).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, heads, HW, hd)

    logits = jnp.einsum("bnqd,bnkd->bnqk", q, k, preferred_element_type=jnp.float32) * scale
    rh = _get_rel_pos(h, p["rel_pos_h"]).astype(jnp.float32)  # (h, h, hd)
    rw = _get_rel_pos(w, p["rel_pos_w"]).astype(jnp.float32)
    r_q = q.reshape(b, heads, h, w, head_dim).astype(jnp.float32)
    rel_h = jnp.einsum("bnhwd,hkd->bnhwk", r_q, rh)  # (B, heads, h, w, k_h)
    rel_w = jnp.einsum("bnhwd,wkd->bnhwk", r_q, rw)  # (B, heads, h, w, k_w)
    logits = (
        logits.reshape(b, heads, h, w, h, w)
        + rel_h[..., :, None]
        + rel_w[..., None, :]
    ).reshape(b, heads, h * w, h * w)

    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnqk,bnkd->bnqd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return linear(p["proj"], out)


def _window_partition(x, win):
    b, h, w, c = x.shape
    ph, pw = (-h) % win, (-w) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win, win, c), (hp, wp)


def _window_unpartition(x, win, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp // win * (wp // win))
    x = x.reshape(b, hp // win, wp // win, win, win, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, -1)[:, :h, :w]


def encoder_apply(p, pixels, cfg: SamConfig):
    """pixels (B, S, S, 3) SAM-normalized -> (B, grid, grid, prompt_dim) image embeddings."""
    x = conv2d(p["patch_embed"], pixels, stride=cfg.patch, padding=0)  # (B, g, g, D)
    x = x + p["pos_embed"][None]
    for i, bp in enumerate(p["blocks"]):
        shortcut = x
        h = layer_norm(bp["norm1"], x, eps=1e-6)
        if i not in cfg.global_attn:
            h, pad_hw = _window_partition(h, cfg.window)
            h = _attention(bp["attn"], h, cfg.encoder_heads)
            h = _window_unpartition(h, cfg.window, pad_hw, x.shape[1:3])
        else:
            h = _attention(bp["attn"], h, cfg.encoder_heads)
        x = shortcut + h
        m = layer_norm(bp["norm2"], x, eps=1e-6)
        x = x + linear(bp["mlp"]["fc2"], gelu(linear(bp["mlp"]["fc1"], m)))

    n = p["neck"]
    x = conv2d(n["conv1"], x, padding=0)
    x = layer_norm(n["ln1"], x, eps=1e-6)
    x = conv2d(n["conv2"], x)
    return layer_norm(n["ln2"], x, eps=1e-6)


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------


def prompt_init(key, cfg: SamConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    pd = cfg.prompt_dim
    md = max(pd // 64, 1)  # mask_downscaling: 1 -> md -> 4*md -> pd (SAM: 1 -> 4 -> 16 -> 256)
    return {
        # PositionEmbeddingRandom's gaussian matrix (2, pd/2), stored UNSCALED here; the
        # published checkpoints bake scale=1 into the values
        "pe_gaussian": rand_normal(ks[0], (2, pd // 2), dtype, 1.0),
        # 0: negative point, 1: positive point, 2: box top-left, 3: box bottom-right
        "point_embeddings": [rand_normal(ks[1 + i], (pd,), dtype, 1.0) for i in range(4)],
        "not_a_point": rand_normal(ks[5], (pd,), dtype, 1.0),
        "no_mask": rand_normal(ks[6], (pd,), dtype, 1.0),
        "mask_downscaling": {
            "conv1": conv2d_init(ks[7], 2, 2, 1, max(md, 1), dtype=dtype),
            "ln1": norm_init(max(md, 1), dtype),
            "conv2": conv2d_init(ks[8], 2, 2, max(md, 1), max(4 * md, 1), dtype=dtype),
            "ln2": norm_init(max(4 * md, 1), dtype),
            "conv3": conv2d_init(ks[9], 1, 1, max(4 * md, 1), pd, dtype=dtype),
        },
    }


def _pe_encode(p, coords):
    """coords (..., 2) in [0, 1] -> (..., prompt_dim) random-Fourier features."""
    c = (2.0 * coords - 1.0).astype(jnp.float32) @ p["pe_gaussian"].astype(jnp.float32)
    c = 2.0 * math.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_pe(p, grid: int):
    """(grid, grid, prompt_dim) positional encoding of the image-embedding grid."""
    ys = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
    xs = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
    coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (g, g, 2) = (x, y)
    return _pe_encode(p, coords)


def encode_points(p, cfg: SamConfig, coords, labels):
    """coords (B, N, 2) pixel xy in [0, image_size); labels (B, N) 1=fg, 0=bg, -1=pad,
    2/3=box corners -> (B, N+1, prompt_dim) sparse prompt embeddings. A padding point
    (label -1) is appended, as SAM does when no box prompt accompanies the points."""
    pad_coord = jnp.zeros(coords.shape[:1] + (1, 2), coords.dtype)
    pad_label = -jnp.ones(labels.shape[:1] + (1,), labels.dtype)
    coords = jnp.concatenate([coords, pad_coord], axis=1)
    labels = jnp.concatenate([labels, pad_label], axis=1)

    pe = _pe_encode(p, (coords.astype(jnp.float32) + 0.5) / cfg.image_size)
    lab = labels[..., None]
    # label -1: pe zeroed, not_a_point embedding alone; labels 0..3: pe + role embedding
    emb = jnp.where(lab == -1, p["not_a_point"].astype(pe.dtype), pe)
    for role in range(4):
        emb = jnp.where(lab == role, pe + p["point_embeddings"][role].astype(pe.dtype), emb)
    return emb


def encode_mask_prompt(p, mask):
    """mask (B, 4*grid, 4*grid, 1) logits -> (B, grid, grid, prompt_dim) dense embedding."""
    d = p["mask_downscaling"]
    x = conv2d(d["conv1"], mask, stride=2, padding=0)
    x = gelu(layer_norm(d["ln1"], x, eps=1e-6))
    x = conv2d(d["conv2"], x, stride=2, padding=0)
    x = gelu(layer_norm(d["ln2"], x, eps=1e-6))
    return conv2d(d["conv3"], x, padding=0)


# ---------------------------------------------------------------------------
# mask decoder (two-way transformer)
# ---------------------------------------------------------------------------


def _dec_attn_init(key, dim, internal, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": linear_init(ks[0], dim, internal, dtype=dtype),
        "k": linear_init(ks[1], dim, internal, dtype=dtype),
        "v": linear_init(ks[2], dim, internal, dtype=dtype),
        "out": linear_init(ks[3], internal, dim, dtype=dtype),
    }


def _dec_attn(p, q_in, k_in, v_in, heads: int):
    q = linear(p["q"], q_in)
    k = linear(p["k"], k_in)
    v = linear(p["v"], v_in)
    b, nq, c = q.shape
    hd = c // heads
    q = q.reshape(b, nq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, k.shape[1], heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, v.shape[1], heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bnqd,bnkd->bnqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits / math.sqrt(hd), axis=-1)
    out = jnp.einsum("bnqk,bnkd->bnqd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
    return linear(p["out"], out)


def _twoway_layer_init(key, cfg: SamConfig, dtype):
    ks = jax.random.split(key, 8)
    pd = cfg.prompt_dim
    half = pd // 2
    return {
        "self_attn": _dec_attn_init(ks[0], pd, pd, dtype),
        "norm1": norm_init(pd, dtype),
        "cross_t2i": _dec_attn_init(ks[1], pd, half, dtype),
        "norm2": norm_init(pd, dtype),
        "mlp": {
            "fc1": linear_init(ks[2], pd, cfg.decoder_mlp, dtype=dtype),
            "fc2": linear_init(ks[3], cfg.decoder_mlp, pd, dtype=dtype),
        },
        "norm3": norm_init(pd, dtype),
        "cross_i2t": _dec_attn_init(ks[4], pd, half, dtype),
        "norm4": norm_init(pd, dtype),
    }


def decoder_init(key, cfg: SamConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 16)
    pd = cfg.prompt_dim
    n_tok = cfg.num_mask_tokens
    up1, up2 = pd // 4, pd // 8
    return {
        "iou_token": rand_normal(ks[0], (pd,), dtype, 1.0),
        "mask_tokens": rand_normal(ks[1], (n_tok, pd), dtype, 1.0),
        "layers": [_twoway_layer_init(ks[2 + i], cfg, dtype) for i in range(cfg.decoder_depth)],
        "final_attn": _dec_attn_init(ks[6], pd, pd // 2, dtype),
        "norm_final": norm_init(pd, dtype),
        "upscale": {
            "convt1": {"w": rand_normal(ks[7], (2, 2, pd, up1), dtype, 0.02),
                       "b": jnp.zeros((up1,), dtype)},
            "ln": norm_init(up1, dtype),
            "convt2": {"w": rand_normal(ks[8], (2, 2, up1, up2), dtype, 0.02),
                       "b": jnp.zeros((up2,), dtype)},
        },
        "hyper_mlps": [
            {
                "fc1": linear_init(jax.random.fold_in(ks[9], i), pd, pd, dtype=dtype),
                "fc2": linear_init(jax.random.fold_in(ks[10], i), pd, pd, dtype=dtype),
                "fc3": linear_init(jax.random.fold_in(ks[11], i), pd, up2, dtype=dtype),
            }
            for i in range(n_tok)
        ],
        "iou_head": {
            "fc1": linear_init(ks[12], pd, pd, dtype=dtype),
            "fc2": linear_init(ks[13], pd, pd, dtype=dtype),
            "fc3": linear_init(ks[14], pd, n_tok, dtype=dtype),
        },
    }


def _conv_transpose(p, x):
    """2x2 stride-2 transposed conv (torch ConvTranspose2d semantics): every input pixel
    paints a 2x2 output block with w (2, 2, cin, cout) — one matmul over cin, no kernel-flip
    ambiguity."""
    b, h, w_, c = x.shape
    y = jnp.einsum("bijc,pqco->bipjqo", x, p["w"].astype(x.dtype))
    y = y.reshape(b, 2 * h, 2 * w_, -1)
    return y + p["b"].astype(x.dtype)


def _mlp3(p, x, relu_out=False):
    h = jax.nn.relu(linear(p["fc1"], x))
    h = jax.nn.relu(linear(p["fc2"], h))
    h = linear(p["fc3"], h)
    return jax.nn.relu(h) if relu_out else h


def decoder_apply(p, cfg: SamConfig, image_embed, image_pe, sparse_prompt):
    """image_embed (B, g, g, pd), image_pe (g, g, pd), sparse_prompt (B, N, pd) ->
    (mask_logits (B, n_tokens, 4g, 4g), iou_pred (B, n_tokens)).

    The two-way transformer re-adds the ORIGINAL token/pe embeddings as positional context
    at every attention, per the published design; layer 0's self-attention skips the token
    positional add (skip_first_layer_pe)."""
    b, g = image_embed.shape[0], image_embed.shape[1]
    pd = cfg.prompt_dim
    heads = cfg.decoder_heads

    tokens0 = jnp.concatenate([p["iou_token"][None], p["mask_tokens"]], axis=0)
    tokens0 = jnp.broadcast_to(tokens0[None], (b, tokens0.shape[0], pd)).astype(image_embed.dtype)
    tokens0 = jnp.concatenate([tokens0, sparse_prompt.astype(image_embed.dtype)], axis=1)

    queries = tokens0
    keys = image_embed.reshape(b, g * g, pd)
    key_pe = jnp.broadcast_to(image_pe.reshape(1, g * g, pd), keys.shape).astype(keys.dtype)

    for i, lp in enumerate(p["layers"]):
        if i == 0:
            # skip_first_layer_pe: the published block REPLACES queries with the attention
            # output here (no +queries residual, unlike every later layer)
            queries = _dec_attn(lp["self_attn"], queries, queries, queries, heads)
            queries = layer_norm(lp["norm1"], queries)
        else:
            qq = queries + tokens0
            q = _dec_attn(lp["self_attn"], qq, qq, queries, heads)
            queries = layer_norm(lp["norm1"], queries + q)
        a = _dec_attn(lp["cross_t2i"], queries + tokens0, keys + key_pe, keys, heads)
        queries = layer_norm(lp["norm2"], queries + a)
        m = linear(lp["mlp"]["fc2"], jax.nn.relu(linear(lp["mlp"]["fc1"], queries)))
        queries = layer_norm(lp["norm3"], queries + m)
        a = _dec_attn(lp["cross_i2t"], keys + key_pe, queries + tokens0, queries, heads)
        keys = layer_norm(lp["norm4"], keys + a)

    a = _dec_attn(p["final_attn"], queries + tokens0, keys + key_pe, keys, heads)
    queries = layer_norm(p["norm_final"], queries + a)

    iou_out = queries[:, 0]
    mask_tokens_out = queries[:, 1 : 1 + cfg.num_mask_tokens]

    src = keys.reshape(b, g, g, pd)
    up = p["upscale"]
    src = _conv_transpose(up["convt1"], src)
    src = gelu(layer_norm(up["ln"], src, eps=1e-6))
    src = gelu(_conv_transpose(up["convt2"], src))  # (B, 4g, 4g, pd//8)

    hyper = jnp.stack(
        [_mlp3(mp, mask_tokens_out[:, i]) for i, mp in enumerate(p["hyper_mlps"])], axis=1
    )  # (B, n_tok, pd//8)
    masks = jnp.einsum("btc,bhwc->bthw", hyper.astype(jnp.float32), src.astype(jnp.float32))
    iou_pred = _mlp3(p["iou_head"], iou_out)
    return masks, iou_pred


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def init(key, cfg: SamConfig, dtype=jnp.float32):
    ke, kp, kd = jax.random.split(key, 3)
    return {
        "image_encoder": encoder_init(ke, cfg, dtype),
        "prompt_encoder": prompt_init(kp, cfg, dtype),
        "mask_decoder": decoder_init(kd, cfg, dtype),
    }


def predict(p, cfg: SamConfig, pixels, point_coords, point_labels, multimask: bool = True):
    """One SamPredictor.predict equivalent: SAM-normalized pixels (B, S, S, 3), point prompts
    (B, N, 2) xy + (B, N) labels -> (mask_logits (B, M, S/4, S/4), iou_pred (B, M)) where
    M = 3 (multimask, tokens 1..3) or 1 (token 0). Threshold logits at 0.0 for binary masks."""
    embed = encoder_apply(p["image_encoder"], pixels, cfg)
    pe = dense_pe(p["prompt_encoder"], cfg.grid)
    sparse = encode_points(p["prompt_encoder"], cfg, point_coords, point_labels)
    dense = p["prompt_encoder"]["no_mask"].astype(embed.dtype)
    masks, iou = decoder_apply(
        p["mask_decoder"], cfg, embed + dense[None, None, None, :], pe, sparse
    )
    if multimask:
        return masks[:, 1:], iou[:, 1:]
    return masks[:, :1], iou[:, :1]
