"""Shared neural-net primitives (functional, NHWC, param-dict pytrees).

These are re-derived from the published Stable Diffusion / DiT architectures (the reference
consumes them via diffusers/timm, /root/reference/requirements.txt); nothing here is a port of
reference code. Conventions:

* params are nested dicts of arrays; leaves are stored in whatever dtype the caller loaded
  (bf16 for TPU inference), and every ``*_init`` sibling builds a randomly-initialized tree for
  tests.
* images/features are NHWC (TPU-native). Conv kernels are HWIO.
* normalizations compute in float32 and cast back, regardless of activation dtype.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from diffsim_tpu.ops.attention import merge_heads, sdpa, split_heads
from diffsim_tpu.ops.taps import IP_QKV, OUTPUT, QKV

# ---------------------------------------------------------------------------
# elementary layers
# ---------------------------------------------------------------------------


def rand_normal(key, shape, dtype=jnp.float32, std=1.0):
    """Gaussian init derived from a JAX key, usable both eagerly and under jit.

    Concrete key (host init, CPU tests): numpy on the host — eagerly dispatching thousands
    of tiny TPU RNG kernels takes minutes for a ~1B-param tree, and numpy keeps the
    historical value stream tests were written against. Traced key (the on-device jitted
    init, scorer_base.init_random_on_device): jax.random.normal — one compiled program
    materializes the whole tree on-chip with no relay upload. The two paths draw different
    (but each deterministic) streams; weight *values* only matter for tests, which pin the
    host path, and for throughput runs, which don't care."""
    if isinstance(key, jax.core.Tracer):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)
    import numpy as _np

    seed = int(_np.asarray(jax.random.key_data(key)).ravel()[-1])
    arr = _np.random.default_rng(seed).standard_normal(shape).astype(_np.float32) * std
    return jnp.asarray(arr, dtype)


def linear_init(key, din, dout, bias=True, dtype=jnp.float32, std=0.02):
    p = {"w": rand_normal(key, (din, dout), dtype, std)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def conv2d_init(key, kh, kw, cin, cout, bias=True, dtype=jnp.float32, std=0.02):
    p = {"w": rand_normal(key, (kh, kw, cin, cout), dtype, std)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def conv2d(p, x, stride=1, padding="SAME"):
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def group_norm(p, x, groups=32, eps=1e-6):
    """GroupNorm over the channel (last) axis of NHWC, stats in f32.

    Single-read formulation: E[x] and E[x^2] reduce the bf16 input directly with f32
    accumulators (var = E[x^2] - E[x]^2), instead of materializing an f32 copy of the whole
    activation — at 512^2 resolution that copy dominated the VAE's HBM traffic (~1.6x
    measured speedup, bitwise-equal output at bf16)."""
    orig_dtype = x.dtype
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 2, 4), keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (xg.astype(jnp.float32) - mean) * inv
    y = y.reshape(b, h, w, c) * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def layer_norm(p, x, eps=1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


def silu(x):
    return jax.nn.silu(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# timestep embedding
# ---------------------------------------------------------------------------


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding, cos-first ("flip_sin_to_cos", freq shift 0) — the layout both SD's
    time_proj and DiT's TimestepEmbedder use. ``t`` is (B,) float; returns (B, dim) f32."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def time_mlp_init(key, din, dmid, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, din, dmid, dtype=dtype),
        "fc2": linear_init(k2, dmid, dmid, dtype=dtype),
    }


def time_mlp(p, emb):
    return linear(p["fc2"], silu(linear(p["fc1"], emb)))


# ---------------------------------------------------------------------------
# attention with taps (the diffusers `Attention` equivalent)
# ---------------------------------------------------------------------------


def attention_init(key, dim, heads, context_dim=None, out_bias=True, qkv_bias=False, dtype=jnp.float32):
    kq, kk, kv, ko = jax.random.split(key, 4)
    cdim = context_dim or dim
    return {
        "to_q": linear_init(kq, dim, dim, bias=qkv_bias, dtype=dtype),
        "to_k": linear_init(kk, cdim, dim, bias=qkv_bias, dtype=dtype),
        "to_v": linear_init(kv, cdim, dim, bias=qkv_bias, dtype=dtype),
        "to_out": linear_init(ko, dim, dim, bias=out_bias, dtype=dtype),
    }


def attention(p, x, context=None, *, heads, capture=None, ip_embeds=None, ip_scale=None):
    """Multi-head attention; returns ``(out, taps)``.

    ``capture`` is None or one of taps.QKV / taps.OUTPUT / taps.IP_QKV; when set, ``taps``
    carries the requested tensors in the (B, heads, seq, head_dim) layout the reference's
    hacked processor produces (/root/reference/diffsim/hacked_attn.py:74-77).

    ``ip_embeds`` (optional) is a list of per-adapter image-embedding tensors (B, T, cdim);
    adapter projections live in ``p['ip'][i]['to_k_ip'/'to_v_ip']``, implementing the
    IP-Adapter decomposition out = attn(text) + sum_i scale_i * attn_i(image_i)
    (/root/reference/diffsim/hacked_attn.py:255-335).
    """
    ctx = x if context is None else context
    q = split_heads(linear(p["to_q"], x), heads)
    k = split_heads(linear(p["to_k"], ctx), heads)
    v = split_heads(linear(p["to_v"], ctx), heads)
    hidden = sdpa(q, k, v)

    taps = {}
    if capture == QKV:
        taps = {"q": q, "k": k, "v": v}

    if ip_embeds is not None and "ip" in p:
        ip_ks, ip_vs = [], []
        for i, (p_ip, embeds) in enumerate(zip(p["ip"], ip_embeds)):
            k_ip = split_heads(linear(p_ip["to_k_ip"], embeds), heads)
            v_ip = split_heads(linear(p_ip["to_v_ip"], embeds), heads)
            ip_ks.append(k_ip)
            ip_vs.append(v_ip)
            scale = 1.0 if ip_scale is None else ip_scale[i]
            hidden = hidden + scale * sdpa(q, k_ip, v_ip)
        if capture == IP_QKV:
            taps = {"q": q, "ip_k": ip_ks, "ip_v": ip_vs}

    out = linear(p["to_out"], merge_heads(hidden))
    if capture == OUTPUT:
        taps = {"out": out}
    return out, taps


# ---------------------------------------------------------------------------
# feed-forward (GEGLU, the SD transformer FF)
# ---------------------------------------------------------------------------


def geglu_ff_init(key, dim, mult=4, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "proj_in": linear_init(k1, dim, dim * mult * 2, dtype=dtype),
        "proj_out": linear_init(k2, dim * mult, dim, dtype=dtype),
    }


def geglu_ff(p, x):
    w1, w2 = p["proj_in"]["w"], p["proj_out"]["w"]
    if x.ndim == 3 and "b" in p["proj_in"] and "b" in p["proj_out"]:
        from diffsim_tpu.ops.pallas.ff import _block_rows, fused_geglu_ff, use_fused_ff

        b, s, c = x.shape
        if use_fused_ff(b * s, c, w1.shape[1]):
            # TPU: tile rows and keep the (rows, 8c) projection in VMEM instead of
            # round-tripping it through HBM (ops/pallas/ff.py)
            out = fused_geglu_ff(
                x.reshape(b * s, c), w1, p["proj_in"]["b"], w2, p["proj_out"]["b"],
                block_rows=_block_rows(b * s, c),
            )
            return out.reshape(b, s, c)
    h, g = jnp.split(linear(p["proj_in"], x), 2, axis=-1)
    return linear(p["proj_out"], h * gelu(g))


# ---------------------------------------------------------------------------
# SD transformer block / spatial transformer
# ---------------------------------------------------------------------------


def basic_transformer_block_init(key, dim, heads, context_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return {
        "norm1": norm_init(dim, dtype),
        "attn1": attention_init(ks[0], dim, heads, dtype=dtype),
        "norm2": norm_init(dim, dtype),
        "attn2": attention_init(ks[1], dim, heads, context_dim=context_dim, dtype=dtype),
        "norm3": norm_init(dim, dtype),
        "ff": geglu_ff_init(ks[2], dim, dtype=dtype),
    }


def basic_transformer_block(p, x, context, *, heads, tap=None, ip_embeds=None, ip_scale=None):
    """attn1(self) -> attn2(cross/text[+IP]) -> GEGLU ff, pre-LN residuals.

    ``tap`` is None or a dict {'attn': 'attn1'|'attn2', 'capture': ...} — the site match has
    already been resolved by the caller."""
    taps = {}
    cap1 = tap["capture"] if (tap and tap["attn"] == "attn1") else None
    h, t1 = attention(p["attn1"], layer_norm(p["norm1"], x), None, heads=heads, capture=cap1)
    taps.update(t1)
    x = x + h

    cap2 = tap["capture"] if (tap and tap["attn"] == "attn2") else None
    h, t2 = attention(
        p["attn2"],
        layer_norm(p["norm2"], x),
        context,
        heads=heads,
        capture=cap2,
        ip_embeds=ip_embeds,
        ip_scale=ip_scale,
    )
    taps.update(t2)
    x = x + h

    x = x + geglu_ff(p["ff"], layer_norm(p["norm3"], x))
    return x, taps


def spatial_transformer_init(
    key, channels, heads, context_dim, depth=1, linear_proj=False, dtype=jnp.float32
):
    ks = jax.random.split(key, depth + 2)
    proj_shape = (
        linear_init(ks[0], channels, channels, dtype=dtype)
        if linear_proj
        else conv2d_init(ks[0], 1, 1, channels, channels, dtype=dtype)
    )
    proj_out = (
        linear_init(ks[1], channels, channels, dtype=dtype)
        if linear_proj
        else conv2d_init(ks[1], 1, 1, channels, channels, dtype=dtype)
    )
    return {
        "norm": norm_init(channels, dtype),
        "proj_in": proj_shape,
        "blocks": [
            basic_transformer_block_init(ks[2 + i], channels, heads, context_dim, dtype)
            for i in range(depth)
        ],
        "proj_out": proj_out,
    }


def spatial_transformer(
    p, x, context, *, heads, linear_proj=False, tap=None, ip_embeds=None, ip_scale=None
):
    """Transformer2DModel: GN(32, eps 1e-6) -> proj_in -> flatten -> blocks -> proj_out -> +res.

    SD-1.5 uses 1x1-conv projections; SDXL uses linear ones. ``tap`` is None or
    {'tblock': int, 'attn': str, 'capture': str}."""
    b, hgt, wid, c = x.shape
    res = x
    h = group_norm(p["norm"], x, eps=1e-6)
    if linear_proj:
        h = h.reshape(b, hgt * wid, c)
        h = linear(p["proj_in"], h)
    else:
        h = conv2d(p["proj_in"], h, padding=0)
        h = h.reshape(b, hgt * wid, c)

    taps = {}
    n = len(p["blocks"])
    for i, bp in enumerate(p["blocks"]):
        # negative tblock indices (the reference uses transformer_blocks[-1]) resolve here
        block_tap = tap if (tap is not None and tap["tblock"] % n == i) else None
        h, t = basic_transformer_block(
            bp, h, context, heads=heads, tap=block_tap, ip_embeds=ip_embeds, ip_scale=ip_scale
        )
        taps.update(t)

    if linear_proj:
        h = linear(p["proj_out"], h)
        h = h.reshape(b, hgt, wid, c)
    else:
        h = h.reshape(b, hgt, wid, c)
        h = conv2d(p["proj_out"], h, padding=0)
    return h + res, taps


# ---------------------------------------------------------------------------
# resnet block / up / down sampling
# ---------------------------------------------------------------------------


def resnet_block_init(key, cin, cout, temb_dim=None, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": norm_init(cin, dtype),
        "conv1": conv2d_init(ks[0], 3, 3, cin, cout, dtype=dtype),
        "norm2": norm_init(cout, dtype),
        "conv2": conv2d_init(ks[1], 3, 3, cout, cout, dtype=dtype),
    }
    if temb_dim is not None:
        p["time_emb_proj"] = linear_init(ks[2], temb_dim, cout, dtype=dtype)
    if cin != cout:
        p["shortcut"] = conv2d_init(ks[3], 1, 1, cin, cout, dtype=dtype)
    return p


def resnet_block(p, x, temb=None, *, groups=32, eps=1e-6):
    """diffusers ResnetBlock2D: GN-silu-conv, +time bias, GN-silu-conv, +shortcut.

    VAE resnets use eps 1e-6 and no temb; UNet resnets pass temb and eps 1e-5."""
    h = conv2d(p["conv1"], silu(group_norm(p["norm1"], x, groups=groups, eps=eps)))
    if temb is not None:
        h = h + linear(p["time_emb_proj"], silu(temb))[:, None, None, :].astype(h.dtype)
    h = conv2d(p["conv2"], silu(group_norm(p["norm2"], h, groups=groups, eps=eps)))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x, padding=0)
    return x + h


def downsample(p, x, asymmetric_pad=False):
    """3x3 stride-2 conv. The VAE encoder pads (0,1)x(0,1); the UNet pads symmetrically."""
    pad = [(0, 1), (0, 1)] if asymmetric_pad else [(1, 1), (1, 1)]
    return conv2d(p, x, stride=2, padding=pad)


def upsample(p, x):
    """Nearest-neighbor 2x followed by a 3x3 conv."""
    b, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(p, x)
