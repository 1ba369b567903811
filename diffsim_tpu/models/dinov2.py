"""DINOv2 (HF Dinov2Model) and DINO v1 (ViT-S/8) towers with taps — backbones of the
dino / dinov1 / dino_cross / dinofeats baselines (/root/reference/metrics/dino.py).

DINOv2 taps fire on the self-attention submodule, whose input is post-layer-norm — so unlike
the CLIP hook, these Q/K/V match the model's real attention inputs
(/root/reference/metrics/hooks.py:23-32). The readout is softmax attention on the un-merged
(B, heads, seq, head_dim) context with NO out-proj (/root/reference/metrics/dino.py:120-131).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffsim_tpu.ops.attention import merge_heads, sdpa, split_heads
from diffsim_tpu.ops.blocks import (
    gelu,
    layer_norm,
    linear,
    linear_init,
    norm_init,
    rand_normal,
)


@dataclasses.dataclass(frozen=True)
class DinoConfig:
    hidden: int = 384
    layers: int = 12
    heads: int = 6
    intermediate: int = 1536
    patch: int = 14
    pos_grid: int = 37  # stored positional grid side (dinov2-small trains at 518/14=37)
    layerscale: bool = True  # v2 yes, v1 no
    eps: float = 1e-6

    @staticmethod
    def v2_small() -> "DinoConfig":
        return DinoConfig()

    @staticmethod
    def v2_base() -> "DinoConfig":
        return DinoConfig(hidden=768, heads=12, intermediate=3072)

    @staticmethod
    def v1_vits8() -> "DinoConfig":
        # DINO v1 ViT-S/8 (torch.hub dino_vits8): patch 8, trained at 224 -> 28x28 grid
        return DinoConfig(patch=8, pos_grid=28, layerscale=False)

    @staticmethod
    def tiny(layerscale: bool = True) -> "DinoConfig":
        return DinoConfig(hidden=32, layers=2, heads=2, intermediate=64, patch=8, pos_grid=4,
                          layerscale=layerscale)


def _layer_init(key, cfg, dtype):
    ks = jax.random.split(key, 6)
    h = cfg.hidden
    p = {
        "norm1": norm_init(h, dtype),
        "attn": {
            "q": linear_init(ks[0], h, h, dtype=dtype),
            "k": linear_init(ks[1], h, h, dtype=dtype),
            "v": linear_init(ks[2], h, h, dtype=dtype),
            "out": linear_init(ks[3], h, h, dtype=dtype),
        },
        "norm2": norm_init(h, dtype),
        "fc1": linear_init(ks[4], h, cfg.intermediate, dtype=dtype),
        "fc2": linear_init(ks[5], cfg.intermediate, h, dtype=dtype),
    }
    if cfg.layerscale:
        p["ls1"] = jnp.ones((h,), dtype)
        p["ls2"] = jnp.ones((h,), dtype)
    return p


def init(key, cfg: DinoConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.layers + 4)
    return {
        "cls_token": rand_normal(keys[0], (cfg.hidden,), dtype, 0.02),
        "patch_embedding": {
            "w": rand_normal(keys[1], (cfg.patch * cfg.patch * 3, cfg.hidden), dtype, 0.02),
            "b": jnp.zeros((cfg.hidden,), dtype),
        },
        "position_embedding": rand_normal(keys[2], (cfg.pos_grid**2 + 1, cfg.hidden), dtype, 0.02),
        "layers": [_layer_init(keys[3 + i], cfg, dtype) for i in range(cfg.layers)],
        "final_norm": norm_init(cfg.hidden, dtype),
    }


def _patchify(x, patch):
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def interpolate_pos_embed(pos: jax.Array, target_grid: int) -> jax.Array:
    """Bicubic interpolation of the patch-position grid to the runtime token grid — HF
    Dinov2Embeddings.interpolate_pos_encoding semantics (CLS position passes through)."""
    n = pos.shape[0] - 1
    grid = int(round(n**0.5))
    if grid == target_grid:
        return pos
    cls_pos, patch_pos = pos[:1], pos[1:]
    patch_pos = patch_pos.reshape(grid, grid, -1).astype(jnp.float32)
    patch_pos = jax.image.resize(
        patch_pos, (target_grid, target_grid, patch_pos.shape[-1]), method="bicubic"
    )
    return jnp.concatenate([cls_pos, patch_pos.reshape(target_grid**2, -1).astype(pos.dtype)])


def apply(p, pixels, cfg: DinoConfig, *, tap_layer: int | None = None, capture: str = "qkv"):
    """pixels (B, S, S, 3) ImageNet-normalized -> dict with cls (final-norm CLS token),
    last_hidden_state, and taps {'q','k','v'} (B, heads, tokens, head_dim) or {'out'}."""
    b, s = pixels.shape[0], pixels.shape[1]
    grid = s // cfg.patch
    patches = linear(p["patch_embedding"], _patchify(pixels, cfg.patch))
    cls = jnp.broadcast_to(p["cls_token"], (b, 1, cfg.hidden))
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + interpolate_pos_embed(p["position_embedding"], grid)[None]

    taps = {}
    for i, lp in enumerate(p["layers"]):
        is_tap = tap_layer is not None and tap_layer % cfg.layers == i
        h = layer_norm(lp["norm1"], x, eps=cfg.eps)
        q = split_heads(linear(lp["attn"]["q"], h), cfg.heads)
        k = split_heads(linear(lp["attn"]["k"], h), cfg.heads)
        v = split_heads(linear(lp["attn"]["v"], h), cfg.heads)
        if is_tap and capture == "qkv":
            taps = {"q": q, "k": k, "v": v}
        ctx = sdpa(q, k, v)
        if is_tap and capture == "output":
            # the reference's feature hook grabs the self-attention submodule output — the
            # merged context BEFORE the output dense (hooks.py:34-35 on attention.attention)
            taps = {"out": merge_heads(ctx)}
        attn_out = linear(lp["attn"]["out"], merge_heads(ctx))
        if cfg.layerscale:
            attn_out = attn_out * lp["ls1"]
        x = x + attn_out
        mlp = linear(lp["fc2"], gelu(linear(lp["fc1"], layer_norm(lp["norm2"], x, eps=cfg.eps))))
        if cfg.layerscale:
            mlp = mlp * lp["ls2"]
        x = x + mlp

    x_out = layer_norm(p["final_norm"], x, eps=cfg.eps)
    return {"last_hidden_state": x_out, "cls": x_out[:, 0], "taps": taps}
