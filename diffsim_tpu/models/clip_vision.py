"""CLIP vision tower (ViT-B/32) with taps — backbone of the clip_i / clip_cross / clipfeats
baselines (/root/reference/metrics/clip_i.py).

Tap semantics replicate the reference hooks exactly:
* ``capture='qkv'`` recomputes Q/K/V from the encoder layer's *raw input* (before layer_norm1)
  — that is what ``clip_encoder_layer_forward_hook`` does
  (/root/reference/metrics/hooks.py:3-17), NOT the model's actual post-LN Q/K/V. Quirk
  preserved for parity.
* ``capture='output'`` returns the layer's output hidden state (hooks.py:20-21).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffsim_tpu.ops.attention import merge_heads, sdpa, split_heads
from diffsim_tpu.ops.blocks import (
    layer_norm,
    linear,
    linear_init,
    norm_init,
    quick_gelu,
    rand_normal,
)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    patch: int = 32
    image_size: int = 224
    projection_dim: int = 512
    eps: float = 1e-5

    @property
    def tokens(self) -> int:
        return (self.image_size // self.patch) ** 2 + 1

    @staticmethod
    def b32() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def h14() -> "CLIPVisionConfig":
        """CLIP ViT-H/14 — the IP-Adapter(-plus) image encoder."""
        return CLIPVisionConfig(hidden=1280, layers=32, heads=16, intermediate=5120,
                                patch=14, image_size=224, projection_dim=1024)

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(hidden=32, layers=2, heads=2, intermediate=64, patch=8,
                                image_size=32, projection_dim=16)


def _layer_init(key, cfg, dtype):
    ks = jax.random.split(key, 6)
    h = cfg.hidden
    return {
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


def init(key, cfg: CLIPVisionConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.layers + 5)
    p = {
        "class_embedding": rand_normal(keys[0], (cfg.hidden,), dtype, 0.02),
        # patch embedding stored as linear over flattened (patch, patch, 3) patches (HWIO
        # conv == this after the converter reshapes); no bias in CLIP
        "patch_embedding": {"w": rand_normal(keys[1], (cfg.patch * cfg.patch * 3, cfg.hidden), dtype, 0.02)},
        "position_embedding": rand_normal(keys[2], (cfg.tokens, cfg.hidden), dtype, 0.02),
        "pre_norm": norm_init(cfg.hidden, dtype),
        "layers": [_layer_init(keys[3 + i], cfg, dtype) for i in range(cfg.layers)],
        "post_norm": norm_init(cfg.hidden, dtype),
        "visual_projection": linear_init(keys[-1], cfg.hidden, cfg.projection_dim, bias=False, dtype=dtype),
    }
    return p


def _patchify(x, patch):
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def apply(p, pixels, cfg: CLIPVisionConfig, *, tap_layer: int | None = None, capture: str = "qkv",
          output_hidden_states: bool = False):
    """pixels (B, S, S, 3) CLIP-normalized -> dict with image_embeds (projected CLS), pooled,
    last_hidden_state, and taps.

    taps for 'qkv': (B, heads, tokens, head_dim) computed from the target layer's raw input
    (the reference hook quirk); for 'output': the layer's output hidden state."""
    b = pixels.shape[0]
    patches = linear(p["patch_embedding"], _patchify(pixels, cfg.patch))
    cls = jnp.broadcast_to(p["class_embedding"], (b, 1, cfg.hidden))
    x = jnp.concatenate([cls, patches], axis=1) + p["position_embedding"][None]
    x = layer_norm(p["pre_norm"], x, eps=cfg.eps)

    taps = {}
    hidden_states = [x]
    for i, lp in enumerate(p["layers"]):
        if tap_layer is not None and tap_layer % cfg.layers == i and capture == "qkv":
            # reference hook: projections applied to the layer INPUT, skipping norm1
            taps = {
                "q": split_heads(linear(lp["attn"]["q"], x), cfg.heads),
                "k": split_heads(linear(lp["attn"]["k"], x), cfg.heads),
                "v": split_heads(linear(lp["attn"]["v"], x), cfg.heads),
            }
        h = layer_norm(lp["norm1"], x, eps=cfg.eps)
        q = split_heads(linear(lp["attn"]["q"], h), cfg.heads)
        k = split_heads(linear(lp["attn"]["k"], h), cfg.heads)
        v = split_heads(linear(lp["attn"]["v"], h), cfg.heads)
        x = x + linear(lp["attn"]["out"], merge_heads(sdpa(q, k, v)))
        x = x + linear(lp["fc2"], quick_gelu(linear(lp["fc1"], layer_norm(lp["norm2"], x, eps=cfg.eps))))
        if tap_layer is not None and tap_layer % cfg.layers == i and capture == "output":
            taps = {"out": x}
        hidden_states.append(x)

    pooled = layer_norm(p["post_norm"], x[:, 0:1], eps=cfg.eps)[:, 0]
    out = {
        "last_hidden_state": x,
        "pooled": pooled,
        "image_embeds": linear(p["visual_projection"], pooled),
        "taps": taps,
    }
    if output_hidden_states:
        out["hidden_states"] = hidden_states
    return out


def out_proj_replay(p, context, cfg: CLIPVisionConfig, tap_layer: int):
    """The reference's attention_calc out-proj replay (/root/reference/metrics/clip_i.py:113-127):
    merge heads then apply the target layer's out_proj."""
    lp = p["layers"][tap_layer % cfg.layers]
    return linear(lp["attn"]["out"], merge_heads(context))
