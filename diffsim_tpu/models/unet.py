"""UNet2DCondition (SD-1.5 and SDXL variants), NHWC, functional, with first-class taps.

Re-derived from the published Stable Diffusion architectures; the reference consumes them via
``diffusers.UNet2DConditionModel`` and rips Q/K/V out with forward-pre-hooks
(/root/reference/diffsim/diffsim.py:122-145, diffsim_xl.py:85-107). Here ``apply`` returns
``(eps_pred, taps)`` and the tap site is a static address, so jit sees one fixed graph.

Tap addresses are *absolute* block coordinates ``(block_idx, attn_idx, tblock_idx)`` under
``block in {'down','mid','up'}``; negative attn/tblock indices mean "from the end" (the
reference always uses ``attentions[-1].transformer_blocks[-1]`` for SD-1.5). Translation from
the reference CLI's relative addressing (``down_blocks[:-1][layer]`` etc.) happens in the
scorers, not here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffsim_tpu.ops.blocks import (
    conv2d,
    conv2d_init,
    downsample,
    group_norm,
    linear,
    norm_init,
    resnet_block,
    resnet_block_init,
    silu,
    spatial_transformer,
    spatial_transformer_init,
    time_mlp,
    time_mlp_init,
    timestep_embedding,
    upsample,
)
from diffsim_tpu.ops.taps import TapSpec


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    # True at index i => down block i has cross-attention transformers (up path is mirrored).
    cross_attn_blocks: tuple = (True, True, True, False)
    layers_per_block: int = 2
    transformer_depth: tuple = (1, 1, 1, 0)  # per down-block transformer depth; mid uses [-1] of actives
    mid_transformer_depth: int = 1
    heads: tuple = (8, 8, 8, 8)  # per down-block head count
    cross_attention_dim: int = 768
    linear_proj: bool = False
    norm_eps: float = 1e-5
    addition_embed: str | None = None  # 'text_time' for SDXL
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816

    @staticmethod
    def sd15() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def sdxl() -> "UNetConfig":
        return UNetConfig(
            block_out_channels=(320, 640, 1280),
            cross_attn_blocks=(False, True, True),
            transformer_depth=(0, 2, 10),
            mid_transformer_depth=10,
            heads=(5, 10, 20),
            cross_attention_dim=2048,
            linear_proj=True,
            addition_embed="text_time",
        )

    @staticmethod
    def tiny(cross_attention_dim: int = 32) -> "UNetConfig":
        return UNetConfig(
            block_out_channels=(32, 64),
            cross_attn_blocks=(True, False),
            layers_per_block=1,
            transformer_depth=(1, 0),
            heads=(2, 2),
            cross_attention_dim=cross_attention_dim,
        )

    @staticmethod
    def tiny_xl(cross_attention_dim: int = 32) -> "UNetConfig":
        return UNetConfig(
            block_out_channels=(32, 64),
            cross_attn_blocks=(False, True),
            layers_per_block=1,
            transformer_depth=(0, 2),
            mid_transformer_depth=2,
            heads=(2, 2),
            cross_attention_dim=cross_attention_dim,
            linear_proj=True,
            addition_embed="text_time",
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=16 + 8 * 6,
        )

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def init(key, cfg: UNetConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 1024))
    chans = cfg.block_out_channels
    ted = cfg.time_embed_dim
    p: dict = {
        "time_embedding": time_mlp_init(next(keys), chans[0], ted, dtype),
        "conv_in": conv2d_init(next(keys), 3, 3, cfg.in_channels, chans[0], dtype=dtype),
    }
    if cfg.addition_embed == "text_time":
        p["add_embedding"] = time_mlp_init(
            next(keys), cfg.projection_class_embeddings_input_dim, ted, dtype
        )
        # time_mlp_init gives fc2: mid->mid; the addition MLP maps proj_in->ted->ted already
        # because time_mlp_init's dmid is ted.

    down = []
    cin = chans[0]
    skip_channels = [chans[0]]
    for i, cout in enumerate(chans):
        blk: dict = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(
                resnet_block_init(next(keys), cin if j == 0 else cout, cout, temb_dim=ted, dtype=dtype)
            )
            if cfg.cross_attn_blocks[i]:
                blk["attentions"].append(
                    spatial_transformer_init(
                        next(keys),
                        cout,
                        cfg.heads[i],
                        cfg.cross_attention_dim,
                        depth=cfg.transformer_depth[i],
                        linear_proj=cfg.linear_proj,
                        dtype=dtype,
                    )
                )
            skip_channels.append(cout)
        if i < len(chans) - 1:
            blk["downsample"] = conv2d_init(next(keys), 3, 3, cout, cout, dtype=dtype)
            skip_channels.append(cout)
        down.append(blk)
        cin = cout
    p["down"] = down

    mid_heads = cfg.heads[-1] if cfg.cross_attn_blocks[-1] else cfg.heads[max(
        i for i, c in enumerate(cfg.cross_attn_blocks) if c
    )]
    p["mid"] = {
        "resnet1": resnet_block_init(next(keys), chans[-1], chans[-1], temb_dim=ted, dtype=dtype),
        "attentions": [
            spatial_transformer_init(
                next(keys),
                chans[-1],
                mid_heads,
                cfg.cross_attention_dim,
                depth=cfg.mid_transformer_depth,
                linear_proj=cfg.linear_proj,
                dtype=dtype,
            )
        ],
        "resnet2": resnet_block_init(next(keys), chans[-1], chans[-1], temb_dim=ted, dtype=dtype),
    }

    up = []
    rev = list(reversed(chans))
    cin = rev[0]
    for i, cout in enumerate(rev):
        di = len(chans) - 1 - i  # mirrored down-block index
        blk = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block + 1):
            skip = skip_channels.pop()
            blk["resnets"].append(
                resnet_block_init(
                    next(keys), (cin if j == 0 else cout) + skip, cout, temb_dim=ted, dtype=dtype
                )
            )
            if cfg.cross_attn_blocks[di]:
                blk["attentions"].append(
                    spatial_transformer_init(
                        next(keys),
                        cout,
                        cfg.heads[di],
                        cfg.cross_attention_dim,
                        depth=cfg.transformer_depth[di],
                        linear_proj=cfg.linear_proj,
                        dtype=dtype,
                    )
                )
        if i < len(rev) - 1:
            blk["upsample"] = conv2d_init(next(keys), 3, 3, cout, cout, dtype=dtype)
        up.append(blk)
        cin = cout
    p["up"] = up

    p["norm_out"] = norm_init(chans[0], dtype)
    p["conv_out"] = conv2d_init(next(keys), 3, 3, chans[0], cfg.out_channels, dtype=dtype)
    return p


def _site_tap(tap: TapSpec | None, block: str, bidx: int, aidx: int, n_attn: int):
    """Resolve whether the spatial transformer at (block, bidx, aidx) is the tap site; if so
    return the intra-transformer tap dict."""
    if tap is None or tap.block != block:
        return None
    t_bidx, t_aidx, t_tblock = tap.address
    if block != "mid" and t_bidx != bidx:
        return None
    if t_aidx % n_attn != aidx:
        return None
    return {"tblock": t_tblock, "attn": tap.attn, "capture": tap.capture}


def apply(
    p,
    x,
    t,
    context,
    cfg: UNetConfig,
    *,
    tap: TapSpec | None = None,
    added_cond: dict | None = None,
    ip_embeds=None,
    ip_scale=None,
):
    """Forward pass.

    x: (B, H, W, C) noisy latents; t: scalar or (B,) timestep; context: (B, 77, cdim) text
    embeddings. ``added_cond`` for SDXL: {'text_embeds': (B, 1280), 'time_ids': (B, 6)}
    (/root/reference/diffsim/diffsim_xl_pipeline.py:230-262,312). Returns (eps_pred, taps).
    """
    if jnp.ndim(t) == 0:
        t = jnp.broadcast_to(t, (x.shape[0],))
    temb = timestep_embedding(t, cfg.block_out_channels[0]).astype(x.dtype)
    emb = time_mlp(p["time_embedding"], temb)
    if cfg.addition_embed == "text_time":
        time_ids = added_cond["time_ids"]
        tproj = timestep_embedding(
            time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(time_ids.shape[0], -1)
        add_embeds = jnp.concatenate(
            [added_cond["text_embeds"], tproj.astype(x.dtype)], axis=-1
        )
        emb = emb + time_mlp(p["add_embedding"], add_embeds.astype(x.dtype))

    taps: dict = {}
    h = conv2d(p["conv_in"], x)
    skips = [h]
    for i, blk in enumerate(p["down"]):
        n_attn = max(len(blk["attentions"]), 1)
        for j, rp in enumerate(blk["resnets"]):
            h = resnet_block(rp, h, emb, eps=cfg.norm_eps)
            if blk["attentions"]:
                site = _site_tap(tap, "down", i, j, n_attn)
                h, tp = spatial_transformer(
                    blk["attentions"][j],
                    h,
                    context,
                    heads=cfg.heads[i],
                    linear_proj=cfg.linear_proj,
                    tap=site,
                    ip_embeds=ip_embeds,
                    ip_scale=ip_scale,
                )
                taps.update(tp)
            skips.append(h)
        if "downsample" in blk:
            h = downsample(blk["downsample"], h)
            skips.append(h)

    mid = p["mid"]
    h = resnet_block(mid["resnet1"], h, emb, eps=cfg.norm_eps)
    mid_heads = cfg.heads[-1] if cfg.cross_attn_blocks[-1] else cfg.heads[
        max(i for i, c in enumerate(cfg.cross_attn_blocks) if c)
    ]
    site = _site_tap(tap, "mid", 0, 0, len(mid["attentions"]))
    h, tp = spatial_transformer(
        mid["attentions"][0],
        h,
        context,
        heads=mid_heads,
        linear_proj=cfg.linear_proj,
        tap=site,
        ip_embeds=ip_embeds,
        ip_scale=ip_scale,
    )
    taps.update(tp)
    h = resnet_block(mid["resnet2"], h, emb, eps=cfg.norm_eps)

    for i, blk in enumerate(p["up"]):
        di = len(cfg.block_out_channels) - 1 - i
        n_attn = max(len(blk["attentions"]), 1)
        for j, rp in enumerate(blk["resnets"]):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = resnet_block(rp, h, emb, eps=cfg.norm_eps)
            if blk["attentions"]:
                site = _site_tap(tap, "up", i, j, n_attn)
                h, tp = spatial_transformer(
                    blk["attentions"][j],
                    h,
                    context,
                    heads=cfg.heads[di],
                    linear_proj=cfg.linear_proj,
                    tap=site,
                    ip_embeds=ip_embeds,
                    ip_scale=ip_scale,
                )
                taps.update(tp)
        if "upsample" in blk:
            h = upsample(blk["upsample"], h)

    h = conv2d(p["conv_out"], silu(group_norm(p["norm_out"], h, eps=cfg.norm_eps)))
    return h, taps
