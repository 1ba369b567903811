"""CLIP text encoders (SD-1.5 ViT-L/14 text tower; SDXL adds OpenCLIP bigG).

The reference calls these through diffusers ``encode_prompt``
(/root/reference/diffsim/diffsim_pipeline.py:125-141, diffsim_xl_pipeline.py:172-192):
SD-1.5 takes the final-LN last_hidden_state; SDXL takes the penultimate hidden state of both
towers (clip_skip semantics) plus the projected pooled EOS embedding of tower 2.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffsim_tpu.ops.attention import merge_heads, split_heads
from diffsim_tpu.ops.blocks import layer_norm, linear, linear_init, norm_init, quick_gelu, gelu, rand_normal


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 77
    act: str = "quick_gelu"
    eps: float = 1e-5
    projection_dim: int | None = None  # set => CLIPTextModelWithProjection (SDXL tower 2)

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def sdxl_big_g() -> "CLIPTextConfig":
        return CLIPTextConfig(hidden=1280, layers=32, heads=20, intermediate=5120, act="gelu", projection_dim=1280)

    @staticmethod
    def tiny(vocab_size: int = 1000) -> "CLIPTextConfig":
        return CLIPTextConfig(vocab_size=vocab_size, hidden=32, layers=2, heads=2, intermediate=64)


def _encoder_layer_init(key, cfg: CLIPTextConfig, dtype):
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


def init(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.layers + 3)
    p = {
        "token_embedding": rand_normal(keys[0], (cfg.vocab_size, cfg.hidden), dtype, 0.02),
        "position_embedding": rand_normal(keys[1], (cfg.max_positions, cfg.hidden), dtype, 0.02),
        "layers": [_encoder_layer_init(keys[2 + i], cfg, dtype) for i in range(cfg.layers)],
        "final_norm": norm_init(cfg.hidden, dtype),
    }
    if cfg.projection_dim is not None:
        p["text_projection"] = linear_init(keys[-1], cfg.hidden, cfg.projection_dim, bias=False, dtype=dtype)
    return p


def _causal_attention(p, x, heads):
    s = x.shape[1]
    q = split_heads(linear(p["q"], x), heads)
    k = split_heads(linear(p["k"], x), heads)
    v = split_heads(linear(p["v"], x), heads)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    mask = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1).astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return linear(p["out"], merge_heads(out))


def apply(p, input_ids, cfg: CLIPTextConfig, *, output_hidden_states=False):
    """input_ids (B, 77) -> dict with last_hidden_state, hidden_states (pre-final-LN stack,
    matching HF's ``output_hidden_states``), and pooled/projected embeddings.

    ``pooled`` is the final-LN hidden state at the argmax(input_ids) position — HF CLIP's EOS
    pooling (EOS has the largest token id in both CLIP vocabularies)."""
    act = quick_gelu if cfg.act == "quick_gelu" else gelu
    x = p["token_embedding"][input_ids] + p["position_embedding"][None, : input_ids.shape[1]]
    hidden_states = [x]
    for lp in p["layers"]:
        x = x + _causal_attention(lp["attn"], layer_norm(lp["norm1"], x, eps=cfg.eps), cfg.heads)
        x = x + linear(lp["fc2"], act(linear(lp["fc1"], layer_norm(lp["norm2"], x, eps=cfg.eps))))
        hidden_states.append(x)
    last = layer_norm(p["final_norm"], x, eps=cfg.eps)

    eos_pos = jnp.argmax(input_ids, axis=-1)
    pooled = last[jnp.arange(last.shape[0]), eos_pos]
    out = {"last_hidden_state": last, "pooled": pooled}
    if "text_projection" in p:
        out["text_embeds"] = linear(p["text_projection"], pooled)
    if output_hidden_states:
        out["hidden_states"] = hidden_states
    return out
