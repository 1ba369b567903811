"""IP-Adapter image-projection models and unet wiring.

The reference loads ip-adapter-plus_sd15.safetensors through diffusers
(/root/reference/diffsim/diffsim.py:86-89, scale 0.5) and taps ``attn2``'s per-adapter
K/V lists (/root/reference/diffsim/hacked_attn.py:104-335). Two published projection heads:

* **ImageProjection** (plain ip-adapter): linear CLIP image embed -> (num_tokens=4) x cross-dim
  tokens + LayerNorm.
* **Resampler / IPAdapterPlusImageProjection** (ip-adapter-plus): learned latent queries
  cross-attend (Perceiver-style) over the CLIP-H penultimate patch tokens, depth-4,
  producing 16 tokens.

The adapter K/V projections themselves live inside each attn2's param dict under ``'ip'``
(ops.blocks.attention); :func:`insert_ip_into_unet` places them by the published numbering.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffsim_tpu.ops.attention import merge_heads, split_heads
from diffsim_tpu.ops.blocks import gelu, layer_norm, linear, linear_init, norm_init, rand_normal


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 768  # query/latent width (= SD cross-attention dim for sd15-plus)
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280  # CLIP-H hidden
    output_dim: int = 768
    ff_mult: int = 4

    @staticmethod
    def sd15_plus() -> "ResamplerConfig":
        return ResamplerConfig()

    @staticmethod
    def sdxl_plus() -> "ResamplerConfig":
        return ResamplerConfig(dim=1280, heads=20, output_dim=2048)

    @staticmethod
    def tiny() -> "ResamplerConfig":
        return ResamplerConfig(dim=16, depth=2, dim_head=8, heads=2, num_queries=4,
                               embedding_dim=32, output_dim=32, ff_mult=2)


def resampler_init(key, cfg: ResamplerConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8 + cfg.depth * 8))
    inner = cfg.dim_head * cfg.heads
    layers = []
    for _ in range(cfg.depth):
        layers.append(
            {
                "norm1": norm_init(cfg.dim, dtype),  # over x
                "norm2": norm_init(cfg.dim, dtype),  # over latents
                "to_q": linear_init(next(keys), cfg.dim, inner, bias=False, dtype=dtype),
                "to_kv": linear_init(next(keys), cfg.dim, inner * 2, bias=False, dtype=dtype),
                "to_out": linear_init(next(keys), inner, cfg.dim, bias=False, dtype=dtype),
                "ff_norm": norm_init(cfg.dim, dtype),
                "ff1": linear_init(next(keys), cfg.dim, cfg.dim * cfg.ff_mult, bias=False, dtype=dtype),
                "ff2": linear_init(next(keys), cfg.dim * cfg.ff_mult, cfg.dim, bias=False, dtype=dtype),
            }
        )
    return {
        "latents": rand_normal(next(keys), (cfg.num_queries, cfg.dim), dtype, cfg.dim**-0.5),
        "proj_in": linear_init(next(keys), cfg.embedding_dim, cfg.dim, dtype=dtype),
        "proj_out": linear_init(next(keys), cfg.dim, cfg.output_dim, dtype=dtype),
        "norm_out": norm_init(cfg.output_dim, dtype),
        "layers": layers,
    }


def resampler_apply(p, image_embeds, cfg: ResamplerConfig):
    """image_embeds (B, S, embedding_dim) — CLIP-H penultimate hidden states — ->
    (B, num_queries, output_dim)."""
    b = image_embeds.shape[0]
    x = linear(p["proj_in"], image_embeds)
    latents = jnp.broadcast_to(p["latents"], (b,) + p["latents"].shape)
    for lp in p["layers"]:
        xn = layer_norm(lp["norm1"], x)
        ln = layer_norm(lp["norm2"], latents)
        q = split_heads(linear(lp["to_q"], ln), cfg.heads)
        kv_in = jnp.concatenate([xn, ln], axis=1)
        k, v = jnp.split(linear(lp["to_kv"], kv_in), 2, axis=-1)
        k = split_heads(k, cfg.heads)
        v = split_heads(v, cfg.heads)
        scale = cfg.dim_head**-0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32).astype(v.dtype)
        latents = latents + linear(lp["to_out"], merge_heads(out))
        h = layer_norm(lp["ff_norm"], latents)
        latents = latents + linear(lp["ff2"], gelu(linear(lp["ff1"], h)))
    return layer_norm(p["norm_out"], linear(p["proj_out"], latents))


def image_projection_init(key, image_embed_dim=1024, cross_dim=768, num_tokens=4, dtype=jnp.float32):
    k1 = jax.random.fold_in(key, 0)
    return {
        "proj": linear_init(k1, image_embed_dim, cross_dim * num_tokens, dtype=dtype),
        "norm": norm_init(cross_dim, dtype),
        "num_tokens": num_tokens,
    }


def image_projection_apply(p, image_embeds):
    """Plain ip-adapter head: (B, embed) -> (B, num_tokens, cross_dim)."""
    n = p["num_tokens"] if isinstance(p["num_tokens"], int) else int(p["num_tokens"])
    out = linear(p["proj"], image_embeds)
    out = out.reshape(out.shape[0], n, -1)
    return layer_norm(p["norm"], out)


# ---------------------------------------------------------------------------
# unet wiring
# ---------------------------------------------------------------------------


def attn2_site_order(unet_cfg) -> list[tuple[str, int, int, int]]:
    """The published attn-processor traversal order restricted to cross-attention sites:
    down blocks, mid, up blocks — (kind, block_idx, attention_idx, tblock_idx)."""
    sites = []
    n = len(unet_cfg.block_out_channels)
    for i in range(n):
        if unet_cfg.cross_attn_blocks[i]:
            for j in range(unet_cfg.layers_per_block):
                for t in range(unet_cfg.transformer_depth[i]):
                    sites.append(("down", i, j, t))
    for t in range(unet_cfg.mid_transformer_depth):
        sites.append(("mid", 0, 0, t))
    for i in range(n):
        di = n - 1 - i
        if unet_cfg.cross_attn_blocks[di]:
            for j in range(unet_cfg.layers_per_block + 1):
                for t in range(unet_cfg.transformer_depth[di]):
                    sites.append(("up", i, j, t))
    return sites


def insert_ip_into_unet(unet_params, unet_cfg, ip_weights: list[list[dict]]):
    """Attach per-adapter {'to_k_ip','to_v_ip'} param lists to every attn2. ``ip_weights`` is
    indexed [site][adapter]. Mutates and returns unet_params."""
    sites = attn2_site_order(unet_cfg)
    assert len(ip_weights) == len(sites), (len(ip_weights), len(sites))
    for (kind, bi, ai, ti), w in zip(sites, ip_weights):
        if kind == "down":
            block = unet_params["down"][bi]["attentions"][ai]
        elif kind == "mid":
            block = unet_params["mid"]["attentions"][ai]
        else:
            block = unet_params["up"][bi]["attentions"][ai]
        block["blocks"][ti]["attn2"]["ip"] = w
    return unet_params


def random_ip_weights(key, unet_cfg, cross_dim=None, num_adapters=1, dtype=jnp.float32):
    """Random adapter projections for every attn2 site (tests / throughput runs)."""
    cross_dim = cross_dim or unet_cfg.cross_attention_dim
    sites = attn2_site_order(unet_cfg)
    out = []
    for s_i, (kind, bi, ai, ti) in enumerate(sites):
        n = len(unet_cfg.block_out_channels)
        di = (n - 1 - bi) if kind == "up" else bi
        hidden = unet_cfg.block_out_channels[di if kind != "mid" else -1]
        adapters = []
        for a in range(num_adapters):
            k = jax.random.fold_in(key, s_i * 16 + a)
            adapters.append(
                {
                    "to_k_ip": linear_init(jax.random.fold_in(k, 0), cross_dim, hidden, bias=False, dtype=dtype),
                    "to_v_ip": linear_init(jax.random.fold_in(k, 1), cross_dim, hidden, bias=False, dtype=dtype),
                }
            )
        out.append(adapters)
    return out
