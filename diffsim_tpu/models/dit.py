"""DiT (Diffusion Transformer) family — DiT-{S,B,L,XL}/{2,4,8} — with adaLN-Zero conditioning.

Re-derived from the published DiT architecture (the reference vendors Meta's implementation at
/root/reference/DiT/modelsdit.py: PatchEmbed + fixed 2D sin-cos positions, TimestepEmbedder,
LabelEmbedder with CFG dropout, adaLN-Zero blocks over fused-qkv attention, FinalLayer,
unpatchify). The DiffSim scorer taps ``blocks[target_layer].attn`` Q/K/V after q/k-norm
(/root/reference/diffsim/diffsim_dit.py:19-26); here the block returns them functionally.

Supports training (label-dropout rng) as well as inference; ``forward_with_cfg`` replicates the
published 3-channel cfg quirk (/root/reference/DiT/modelsdit.py:253-269).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffsim_tpu.ops.attention import sdpa
from diffsim_tpu.ops.blocks import (
    layer_norm,
    linear,
    linear_init,
    norm_init,
    rand_normal,
    silu,
    timestep_embedding,
)
from diffsim_tpu.ops.taps import QKV, TapSpec


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden: int = 1152
    depth: int = 28
    heads: int = 16
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    class_dropout_prob: float = 0.1
    learn_sigma: bool = False  # the reference's modelsdit.py default (models.py uses True)

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def tokens_per_side(self) -> int:
        return self.input_size // self.patch_size

    @staticmethod
    def xl2(input_size: int = 32, **kw) -> "DiTConfig":
        return DiTConfig(input_size=input_size, patch_size=2, hidden=1152, depth=28, heads=16, **kw)

    @staticmethod
    def l2(input_size: int = 32, **kw) -> "DiTConfig":
        return DiTConfig(input_size=input_size, patch_size=2, hidden=1024, depth=24, heads=16, **kw)

    @staticmethod
    def b2(input_size: int = 32, **kw) -> "DiTConfig":
        return DiTConfig(input_size=input_size, patch_size=2, hidden=768, depth=12, heads=12, **kw)

    @staticmethod
    def s2(input_size: int = 32, **kw) -> "DiTConfig":
        return DiTConfig(input_size=input_size, patch_size=2, hidden=384, depth=12, heads=6, **kw)

    @staticmethod
    def tiny(input_size: int = 8, **kw) -> "DiTConfig":
        kw.setdefault("num_classes", 10)
        return DiTConfig(input_size=input_size, patch_size=2, hidden=32, depth=2, heads=2, **kw)


def _zoo(hidden, depth, heads, patch):
    def make(input_size: int = 32, **kw) -> DiTConfig:
        return DiTConfig(input_size=input_size, patch_size=patch, hidden=hidden,
                         depth=depth, heads=heads, **kw)

    return make


# DiT model zoo name -> constructor, mirroring DiT_models (/root/reference/DiT/modelsdit.py:332-374)
MODELS = {
    f"DiT-{name}/{patch}": _zoo(hidden, depth, heads, patch)
    for (name, hidden, depth, heads) in [
        ("XL", 1152, 28, 16), ("L", 1024, 24, 16), ("B", 768, 12, 12), ("S", 384, 12, 6)
    ]
    for patch in (2, 4, 8)
}


def _sincos_1d(dim: int, pos: np.ndarray) -> np.ndarray:
    omega = 1.0 / (10000.0 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)))
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def pos_embed_2d(dim: int, grid_size: int) -> np.ndarray:
    """Fixed 2D sin-cos position table, (grid*grid, dim), float32 — the published DiT layout
    (w-coordinate embedding first, sin before cos)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # [0]: w varies fastest, [1]: h
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb = np.concatenate([_sincos_1d(dim // 2, grid[0]), _sincos_1d(dim // 2, grid[1])], axis=1)
    return emb.astype(np.float32)


def _block_init(key, cfg: DiTConfig, dtype):
    ks = jax.random.split(key, 5)
    h = cfg.hidden
    mlp_hidden = int(h * cfg.mlp_ratio)
    return {
        "attn": {
            "qkv": linear_init(ks[0], h, 3 * h, dtype=dtype),
            "proj": linear_init(ks[1], h, h, dtype=dtype),
        },
        "mlp": {
            "fc1": linear_init(ks[2], h, mlp_hidden, dtype=dtype),
            "fc2": linear_init(ks[3], mlp_hidden, h, dtype=dtype),
        },
        "adaLN": linear_init(ks[4], h, 6 * h, dtype=dtype),
    }


def init(key, cfg: DiTConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, cfg.depth + 8))
    h = cfg.hidden
    p = {
        "patch_embed": {
            # stored as a linear over flattened patches (patch*patch*C, hidden); equivalent to
            # the conv-with-stride PatchEmbed and friendlier to the MXU
            "w": rand_normal(next(keys), (cfg.patch_size * cfg.patch_size * cfg.in_channels, h), dtype, 0.02),
            "b": jnp.zeros((h,), dtype),
        },
        "pos_embed": jnp.asarray(pos_embed_2d(h, cfg.tokens_per_side), dtype),
        "t_embedder": {
            "fc1": linear_init(next(keys), 256, h, dtype=dtype),
            "fc2": linear_init(next(keys), h, h, dtype=dtype),
        },
        "y_embedder": rand_normal(next(keys), (cfg.num_classes + 1, h), dtype, 0.02),
        "blocks": [_block_init(next(keys), cfg, dtype) for _ in range(cfg.depth)],
        "final": {
            "adaLN": linear_init(next(keys), h, 2 * h, dtype=dtype),
            "linear": linear_init(next(keys), h, cfg.patch_size * cfg.patch_size * cfg.out_channels, dtype=dtype),
        },
    }
    return p


def patchify(x: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, C) -> (B, N, patch*patch*C), row-major patches (PatchEmbed flatten order).

    The feature order within a patch is (ph, pw, C) — matching a conv kernel applied to NHWC,
    which is how the converter lays out the torch PatchEmbed weights."""
    b, hh, ww, c = x.shape
    gh, gw = hh // patch, ww // patch
    x = x.reshape(b, gh, patch, gw, patch, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def unpatchify(x: jax.Array, patch: int, out_channels: int) -> jax.Array:
    """(B, N, patch*patch*C) -> (B, H, W, C). Feature order (ph, pw, C) — note the published
    DiT unpatchify uses (C, ph, pw); the converter permutes the final-layer weights so the
    pixel-space result is identical."""
    b, n, _ = x.shape
    g = int(round(n**0.5))
    x = x.reshape(b, g, g, patch, patch, out_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, g * patch, g * patch, out_channels)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


def _dit_attention(p, x, heads, capture=None):
    b, n, c = x.shape
    qkv = linear(p["qkv"], x).reshape(b, n, 3, heads, c // heads)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    # q_norm / k_norm are Identity in the published DiT configs (timm qk_norm=False)
    taps = {"q": q, "k": k, "v": v} if capture == QKV else {}
    out = sdpa(q, k, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return linear(p["proj"], out), taps


def _block(p, x, c_emb, heads, capture=None):
    mod = linear(p["adaLN"], silu(c_emb))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
    h, taps = _dit_attention(
        p["attn"], _modulate(layer_norm(None, x, eps=1e-6), shift_msa, scale_msa), heads, capture
    )
    x = x + gate_msa[:, None, :] * h
    y = _modulate(layer_norm(None, x, eps=1e-6), shift_mlp, scale_mlp)
    y = linear(p["mlp"]["fc2"], jax.nn.gelu(linear(p["mlp"]["fc1"], y), approximate=True))
    x = x + gate_mlp[:, None, :] * y
    return x, taps


def apply(
    p,
    x,
    t,
    y,
    cfg: DiTConfig,
    *,
    tap: TapSpec | None = None,
    train: bool = False,
    dropout_key: jax.Array | None = None,
    remat: bool = False,
):
    """Forward: x (B,H,W,C) latents, t (B,) timesteps, y (B,) class labels.

    Returns (out, taps); out is (B,H,W,out_channels). ``tap`` address is ``(layer_idx,)`` over
    ``blocks`` (/root/reference/diffsim/diffsim_dit.py:100). With ``train=True`` labels are
    dropped to the null class with prob ``class_dropout_prob`` (CFG training).

    ``remat=True`` wraps every DiT block in ``jax.checkpoint``: the backward pass recomputes
    block activations instead of holding all ``depth`` of them in HBM — the TPU memory/FLOPs
    trade that lets DiT-XL train at larger per-chip batch (numerics unchanged)."""
    b = x.shape[0]
    if jnp.ndim(t) == 0:
        t = jnp.broadcast_to(t, (b,))
    h = linear(p["patch_embed"], patchify(x, cfg.patch_size)) + p["pos_embed"][None]
    temb = timestep_embedding(t, 256).astype(h.dtype)
    c_emb = linear(p["t_embedder"]["fc2"], silu(linear(p["t_embedder"]["fc1"], temb)))
    if train and cfg.class_dropout_prob > 0:
        drop = jax.random.bernoulli(dropout_key, cfg.class_dropout_prob, (b,))
        y = jnp.where(drop, cfg.num_classes, y)
    c_emb = c_emb + p["y_embedder"][y]

    taps: dict = {}
    block = _block
    if remat:
        block = jax.checkpoint(_block, static_argnums=(3, 4))
    for i, bp in enumerate(p["blocks"]):
        capture = tap.capture if (tap is not None and tap.block == "blocks" and tap.address[0] % cfg.depth == i) else None
        h, tp = block(bp, h, c_emb, cfg.heads, capture)
        taps.update(tp)

    mod = linear(p["final"]["adaLN"], silu(c_emb))
    shift, scale = jnp.split(mod, 2, axis=-1)
    h = linear(p["final"]["linear"], _modulate(layer_norm(None, h, eps=1e-6), shift, scale))
    return unpatchify(h, cfg.patch_size, cfg.out_channels), taps


def forward_with_cfg(p, x, t, y, cfg: DiTConfig, cfg_scale: float):
    """The published DiT CFG forward: batch is [cond_half, uncond_half] sharing latents; only
    the first 3 channels are guided (/root/reference/DiT/modelsdit.py:253-269)."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out, _ = apply(p, combined, t, y, cfg)
    eps, rest = out[..., :3], out[..., 3:]
    cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
    guided = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([guided, guided], axis=0)
    return jnp.concatenate([eps, rest], axis=-1)
