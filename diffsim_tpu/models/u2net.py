"""U^2-Net salient-object matting (NHWC, functional) — the compact replacement for the
reference's carvekit (TracerB7+FBA) background removal in Foreground Feature Averaging
(/root/reference/metrics/foreground_feature_averaging.py:20-29).

carvekit is a torch-only stack; U^2-Net (Qin et al., 2020, arXiv 2005.09007) is the standard
compact salient-object detector with published weights (u2netp: 1.1 M params, u2net: 44 M).
Architecture re-derived from the paper: a two-level nested U-structure of RSU (ReSidual
U-block) stages; each RSU-L is itself a small U-Net of depth L over REBNCONV
(3x3 conv + BatchNorm + ReLU) units, and RSU-4F trades pooling for dilation. Six side outputs
are fused by a 1x1 conv; all outputs pass through a sigmoid, d0 (the fused map) is the matte.

``convert.u2net_import.convert_u2net`` maps the published torch checkpoints
(u2netp.pth / u2net.pth) onto these trees; tests golden the forward against an independent
torch mirror (tools/torch_u2net.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffsim_tpu.ops.blocks import conv2d_init, rand_normal


@dataclasses.dataclass(frozen=True)
class U2NetConfig:
    # per encoder stage: (rsu_height_or_0_for_F, in_ch, mid_ch, out_ch)
    encoder: tuple = ()
    # per decoder stage (stage5d..stage1d): same layout
    decoder: tuple = ()
    side_channels: tuple = ()  # input channels of side1..side6

    @staticmethod
    def u2netp() -> "U2NetConfig":
        return U2NetConfig(
            encoder=((7, 3, 16, 64), (6, 64, 16, 64), (5, 64, 16, 64),
                     (4, 64, 16, 64), (0, 64, 16, 64), (0, 64, 16, 64)),
            decoder=((0, 128, 16, 64), (4, 128, 16, 64), (5, 128, 16, 64),
                     (6, 128, 16, 64), (7, 128, 16, 64)),
            side_channels=(64, 64, 64, 64, 64, 64),
        )

    @staticmethod
    def u2net() -> "U2NetConfig":
        return U2NetConfig(
            encoder=((7, 3, 32, 64), (6, 64, 32, 128), (5, 128, 64, 256),
                     (4, 256, 128, 512), (0, 512, 256, 512), (0, 512, 256, 512)),
            decoder=((0, 1024, 256, 512), (4, 1024, 128, 256), (5, 512, 64, 128),
                     (6, 256, 32, 64), (7, 128, 16, 64)),
            side_channels=(64, 64, 128, 256, 512, 512),
        )

    @staticmethod
    def tiny() -> "U2NetConfig":
        """CPU-test scale: shallow RSUs, few channels."""
        return U2NetConfig(
            encoder=((4, 3, 4, 8), (4, 8, 4, 8), (4, 8, 4, 8),
                     (4, 8, 4, 8), (0, 8, 4, 8), (0, 8, 4, 8)),
            decoder=((0, 16, 4, 8), (4, 16, 4, 8), (4, 16, 4, 8),
                     (4, 16, 4, 8), (4, 16, 4, 8)),
            side_channels=(8, 8, 8, 8, 8, 8),
        )


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _rebnconv_init(key, cin, cout, dtype):
    return {
        "conv": conv2d_init(key, 3, 3, cin, cout, dtype=dtype),
        "bn": {
            "scale": jnp.ones((cout,), dtype),
            "bias": jnp.zeros((cout,), dtype),
            "mean": jnp.zeros((cout,), jnp.float32),
            "var": jnp.ones((cout,), jnp.float32),
        },
    }


def _rebnconv(p, x, dilation: int = 1):
    """3x3 conv (dilation d, SAME) -> inference BatchNorm -> ReLU; BN math in f32."""
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["w"].astype(x.dtype), (1, 1), "SAME",
        rhs_dilation=(dilation, dilation), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv"]["b"].astype(x.dtype)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + 1e-5)
    y = (y.astype(jnp.float32) - bn["mean"]) * inv * bn["scale"].astype(jnp.float32) \
        + bn["bias"].astype(jnp.float32)
    return jax.nn.relu(y).astype(x.dtype)


def _maxpool2(x):
    """2x2 stride-2 max pool, ceil mode (pads the high side like torch ceil_mode=True)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    )


def _up_to(x, ref):
    """Bilinear resize to ref's spatial dims (align_corners=False semantics)."""
    return jax.image.resize(
        x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]), "bilinear"
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# RSU blocks
# ---------------------------------------------------------------------------


def _rsu_init(key, height, cin, mid, cout, dtype):
    """RSU-height (or RSU-4F when height == 0)."""
    keys = iter(jax.random.split(key, 64))
    p = {"rebnconvin": _rebnconv_init(next(keys), cin, cout, dtype)}
    if height == 0:  # RSU-4F: dilations 1,2,4,8 / decoder 4,2,1
        p["rebnconv1"] = _rebnconv_init(next(keys), cout, mid, dtype)
        for i in (2, 3, 4):
            p[f"rebnconv{i}"] = _rebnconv_init(next(keys), mid, mid, dtype)
        p["rebnconv3d"] = _rebnconv_init(next(keys), 2 * mid, mid, dtype)
        p["rebnconv2d"] = _rebnconv_init(next(keys), 2 * mid, mid, dtype)
        p["rebnconv1d"] = _rebnconv_init(next(keys), 2 * mid, cout, dtype)
        return p
    p["rebnconv1"] = _rebnconv_init(next(keys), cout, mid, dtype)
    for i in range(2, height + 1):
        p[f"rebnconv{i}"] = _rebnconv_init(next(keys), mid, mid, dtype)
    for i in range(height - 1, 1, -1):
        p[f"rebnconv{i}d"] = _rebnconv_init(next(keys), 2 * mid, mid, dtype)
    p["rebnconv1d"] = _rebnconv_init(next(keys), 2 * mid, cout, dtype)
    return p


def _rsu(p, x, height):
    hxin = _rebnconv(p["rebnconvin"], x)
    if height == 0:  # RSU-4F
        hx1 = _rebnconv(p["rebnconv1"], hxin, 1)
        hx2 = _rebnconv(p["rebnconv2"], hx1, 2)
        hx3 = _rebnconv(p["rebnconv3"], hx2, 4)
        hx4 = _rebnconv(p["rebnconv4"], hx3, 8)
        hx3d = _rebnconv(p["rebnconv3d"], jnp.concatenate([hx4, hx3], -1), 4)
        hx2d = _rebnconv(p["rebnconv2d"], jnp.concatenate([hx3d, hx2], -1), 2)
        hx1d = _rebnconv(p["rebnconv1d"], jnp.concatenate([hx2d, hx1], -1), 1)
        return hx1d + hxin
    enc = []
    h = hxin
    for i in range(1, height):  # rebnconv1..height-1, pooling between
        h = _rebnconv(p[f"rebnconv{i}"], h)
        enc.append(h)
        if i < height - 1:
            h = _maxpool2(h)
    h = _rebnconv(p[f"rebnconv{height}"], enc[-1], 2)  # bottom, dilation 2
    for i in range(height - 1, 0, -1):
        h = _rebnconv(p[f"rebnconv{i}d"], jnp.concatenate([h, enc[i - 1]], -1))
        if i > 1:
            h = _up_to(h, enc[i - 2])
    return h + hxin


# ---------------------------------------------------------------------------
# the full net
# ---------------------------------------------------------------------------


def init(key, cfg: U2NetConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 32))
    p: dict = {}
    for i, (h, cin, mid, cout) in enumerate(cfg.encoder, start=1):
        p[f"stage{i}"] = _rsu_init(next(keys), h, cin, mid, cout, dtype)
    for i, (h, cin, mid, cout) in zip(range(5, 0, -1), cfg.decoder):
        p[f"stage{i}d"] = _rsu_init(next(keys), h, cin, mid, cout, dtype)
    for i, cin in enumerate(cfg.side_channels, start=1):
        p[f"side{i}"] = conv2d_init(next(keys), 3, 3, cin, 1, dtype=dtype)
    p["outconv"] = {"w": rand_normal(next(keys), (1, 1, 6, 1), dtype, 0.02),
                    "b": jnp.zeros((1,), dtype)}
    return p


def apply(p, x, cfg: U2NetConfig):
    """x (B, H, W, 3) normalized pixels -> fused saliency map d0 (B, H, W) in (0, 1)."""
    heights = [h for (h, *_rest) in cfg.encoder]
    dec_heights = [h for (h, *_rest) in cfg.decoder]

    hx1 = _rsu(p["stage1"], x, heights[0])
    hx2 = _rsu(p["stage2"], _maxpool2(hx1), heights[1])
    hx3 = _rsu(p["stage3"], _maxpool2(hx2), heights[2])
    hx4 = _rsu(p["stage4"], _maxpool2(hx3), heights[3])
    hx5 = _rsu(p["stage5"], _maxpool2(hx4), heights[4])
    hx6 = _rsu(p["stage6"], _maxpool2(hx5), heights[5])

    hx5d = _rsu(p["stage5d"], jnp.concatenate([_up_to(hx6, hx5), hx5], -1), dec_heights[0])
    hx4d = _rsu(p["stage4d"], jnp.concatenate([_up_to(hx5d, hx4), hx4], -1), dec_heights[1])
    hx3d = _rsu(p["stage3d"], jnp.concatenate([_up_to(hx4d, hx3), hx3], -1), dec_heights[2])
    hx2d = _rsu(p["stage2d"], jnp.concatenate([_up_to(hx3d, hx2), hx2], -1), dec_heights[3])
    hx1d = _rsu(p["stage1d"], jnp.concatenate([_up_to(hx2d, hx1), hx1], -1), dec_heights[4])

    def side(name, h):
        y = jax.lax.conv_general_dilated(
            h, p[name]["w"].astype(h.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p[name]["b"].astype(h.dtype)
        return _up_to(y, x)

    d = [side("side1", hx1d), side("side2", hx2d), side("side3", hx3d),
         side("side4", hx4d), side("side5", hx5d), side("side6", hx6)]
    d0 = jax.lax.conv_general_dilated(
        jnp.concatenate(d, -1), p["outconv"]["w"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["outconv"]["b"].astype(x.dtype)
    return jax.nn.sigmoid(d0[..., 0].astype(jnp.float32))
