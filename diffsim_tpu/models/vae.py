"""AutoencoderKL (Stable Diffusion VAE), NHWC, functional.

The reference uses it only as ``vae.encode(img).latent_dist.sample(generator) * scaling_factor``
(/root/reference/diffsim/diffsim.py:92-96); the decoder is included for the DiT sampling path
(/root/reference/DiT/sample.py:61-66). Architecture re-derived from the published SD VAE
(block_out_channels 128/256/512/512, 2 resnets per block, mid attention, eps 1e-6).

The SDXL scorer encodes in fp32 and casts the latents to fp16
(/root/reference/diffsim/diffsim_xl.py:58-63) — callers control that via the params dtype.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffsim_tpu.ops.attention import sdpa
from diffsim_tpu.ops.blocks import (
    conv2d,
    conv2d_init,
    downsample,
    group_norm,
    linear,
    linear_init,
    norm_init,
    resnet_block,
    resnet_block_init,
    silu,
    upsample,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    in_channels: int = 3
    latent_channels: int = 4
    scaling_factor: float = 0.18215

    @staticmethod
    def sd() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def sdxl() -> "VAEConfig":
        return VAEConfig(scaling_factor=0.13025)

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(32, 64), layers_per_block=1, scaling_factor=0.18215)

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


# ---------------------------------------------------------------------------
# VAE attention block (single-head, qkv with bias, residual)
# ---------------------------------------------------------------------------


def _attn_block_init(key, channels, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": norm_init(channels, dtype),
        "to_q": linear_init(ks[0], channels, channels, bias=True, dtype=dtype),
        "to_k": linear_init(ks[1], channels, channels, bias=True, dtype=dtype),
        "to_v": linear_init(ks[2], channels, channels, bias=True, dtype=dtype),
        "to_out": linear_init(ks[3], channels, channels, bias=True, dtype=dtype),
    }


def _attn_block(p, x):
    b, h, w, c = x.shape
    res = x
    y = group_norm(p["norm"], x, eps=1e-6).reshape(b, h * w, c)
    q = linear(p["to_q"], y)[:, None]  # single head: (B, 1, S, C)
    k = linear(p["to_k"], y)[:, None]
    v = linear(p["to_v"], y)[:, None]
    y = sdpa(q, k, v)[:, 0]
    y = linear(p["to_out"], y).reshape(b, h, w, c)
    return res + y


def _mid_init(key, channels, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "resnet1": resnet_block_init(k1, channels, channels, dtype=dtype),
        "attn": _attn_block_init(k2, channels, dtype),
        "resnet2": resnet_block_init(k3, channels, channels, dtype=dtype),
    }


def _mid(p, x):
    x = resnet_block(p["resnet1"], x)
    x = _attn_block(p["attn"], x)
    return resnet_block(p["resnet2"], x)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def encoder_init(key, cfg: VAEConfig, dtype=jnp.float32):
    chans = cfg.block_out_channels
    keys = iter(jax.random.split(key, 256))
    down = []
    cin = chans[0]
    for i, cout in enumerate(chans):
        block = {
            "resnets": [
                resnet_block_init(next(keys), cin if j == 0 else cout, cout, dtype=dtype)
                for j in range(cfg.layers_per_block)
            ]
        }
        if i < len(chans) - 1:
            block["downsample"] = conv2d_init(next(keys), 3, 3, cout, cout, dtype=dtype)
        down.append(block)
        cin = cout
    return {
        "conv_in": conv2d_init(next(keys), 3, 3, cfg.in_channels, chans[0], dtype=dtype),
        "down": down,
        "mid": _mid_init(next(keys), chans[-1], dtype),
        "norm_out": norm_init(chans[-1], dtype),
        "conv_out": conv2d_init(next(keys), 3, 3, chans[-1], 2 * cfg.latent_channels, dtype=dtype),
        "quant_conv": conv2d_init(next(keys), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels, dtype=dtype),
    }


def encoder_apply(p, x):
    """(B, H, W, 3) in [-1, 1] -> moments (B, H/8, W/8, 2*latent)."""
    h = conv2d(p["conv_in"], x)
    for block in p["down"]:
        for rp in block["resnets"]:
            h = resnet_block(rp, h)
        if "downsample" in block:
            h = downsample(block["downsample"], h, asymmetric_pad=True)
    h = _mid(p["mid"], h)
    h = conv2d(p["conv_out"], silu(group_norm(p["norm_out"], h, eps=1e-6)))
    return conv2d(p["quant_conv"], h, padding=0)


def sample_latents(moments, key, scaling_factor, noise=None, mode=False):
    """DiagonalGaussianDistribution.sample() * scaling_factor. logvar clamped to [-30, 20] as
    in the published VAE; noise drawn in f32 then cast. ``noise`` overrides the draw (parity
    mode broadcasts one seed-derived noise tensor across the pair batch, mirroring the
    reference's per-call generator reseed, /root/reference/diffsim/diffsim.py:109)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if mode:
        return mean * scaling_factor
    logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, mean.shape, jnp.float32) if noise is None else noise
    return (mean.astype(jnp.float32) + std * eps).astype(mean.dtype) * scaling_factor


def encoder_apply_chunked(p, x, chunk: int | None = None):
    """Encode in ``chunk``-image slices via lax.map: full-resolution VAE activations are the
    largest live buffers in the scoring graph (batch x 512^2 x 128ch), and slicing keeps both
    the compiler and HBM within budget at large pair batches. A non-multiple remainder is
    encoded as one extra slice.

    The default chunk scales with resolution and dtype so peak per-slice activation memory
    stays constant: 16 images at 512px/bf16 (the SD-1.5 production batch), 2 at 1024px/fp32
    (the SDXL path, which at chunk 16 exceeded HBM — measured 17.04G/15.75G)."""
    n = x.shape[0]
    if chunk is None:
        budget = 16 * 512 * 512 * 2  # bytes of input pixels per slice at the 512/bf16 anchor
        chunk = max(1, budget // (x.shape[1] * x.shape[2] * x.dtype.itemsize))
    if n <= chunk:
        return encoder_apply(p, x)
    main = (n // chunk) * chunk
    xs = x[:main].reshape(n // chunk, chunk, *x.shape[1:])
    out = jax.lax.map(lambda xi: encoder_apply(p, xi), xs)
    out = out.reshape(main, *out.shape[2:])
    if main < n:
        out = jnp.concatenate([out, encoder_apply(p, x[main:])], axis=0)
    return out


def encode_and_sample(p, x, key, cfg: VAEConfig):
    return sample_latents(encoder_apply(p, x), key, cfg.scaling_factor)


def decoder_init(key, cfg: VAEConfig, dtype=jnp.float32):
    chans = cfg.block_out_channels
    keys = iter(jax.random.split(key, 256))
    rev = list(reversed(chans))
    up = []
    cin = rev[0]
    for i, cout in enumerate(rev):
        block = {
            "resnets": [
                resnet_block_init(next(keys), cin if j == 0 else cout, cout, dtype=dtype)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if i < len(rev) - 1:
            block["upsample"] = conv2d_init(next(keys), 3, 3, cout, cout, dtype=dtype)
        up.append(block)
        cin = cout
    return {
        "post_quant_conv": conv2d_init(next(keys), 1, 1, cfg.latent_channels, cfg.latent_channels, dtype=dtype),
        "conv_in": conv2d_init(next(keys), 3, 3, cfg.latent_channels, rev[0], dtype=dtype),
        "mid": _mid_init(next(keys), rev[0], dtype),
        "up": up,
        "norm_out": norm_init(rev[-1], dtype),
        "conv_out": conv2d_init(next(keys), 3, 3, rev[-1], cfg.in_channels, dtype=dtype),
    }


def decoder_apply(p, z, cfg: VAEConfig):
    """Latents (already divided by scaling_factor) -> image in [-1, 1]."""
    h = conv2d(p["post_quant_conv"], z, padding=0)
    h = conv2d(p["conv_in"], h)
    h = _mid(p["mid"], h)
    for block in p["up"]:
        for rp in block["resnets"]:
            h = resnet_block(rp, h)
        if "upsample" in block:
            h = upsample(block["upsample"], h)
    return conv2d(p["conv_out"], silu(group_norm(p["norm_out"], h, eps=1e-6)))
