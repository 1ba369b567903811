"""VGG-16/19 feature extractors (torchvision layout) for the Gram-style and LPIPS baselines.

Re-derived from the published VGG architecture; the reference uses
``torchvision.models.vgg19().features`` up to module index 28 = conv5_1's raw output
(/root/reference/metrics/vgg_gram.py:31-50) and LPIPS's five VGG-16 relu taps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffsim_tpu.ops.blocks import conv2d, conv2d_init

# torchvision .features configs: numbers are conv output channels, 'M' is 2x2 maxpool
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]


def init(key, cfg=VGG19_CFG, in_channels: int = 3, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    convs = []
    cin = in_channels
    for item in cfg:
        if item == "M":
            continue
        convs.append(conv2d_init(next(keys), 3, 3, cin, item, dtype=dtype))
        cin = item
    return {"convs": convs}


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def features(p, x, cfg=VGG19_CFG, taps: tuple[int, ...] = ()):
    """Run the conv stack; ``taps`` are torchvision module indices to capture — the value
    captured is the tensor exactly as it exists after that module (conv output if the index is
    a conv, post-ReLU if a ReLU index, post-pool if a pool index). Returns (final_or_None,
    {idx: tensor}). Stops early once all taps are collected."""
    out = {}
    conv_iter = iter(p["convs"])
    idx = 0
    max_tap = max(taps) if taps else None

    def maybe(idx, x):
        if idx in taps:
            out[idx] = x

    for item in cfg:
        if item == "M":
            x = _maxpool2(x)
            maybe(idx, x)
            idx += 1
        else:
            x = conv2d(next(conv_iter), x)
            maybe(idx, x)
            idx += 1
            x = jax.nn.relu(x)
            maybe(idx, x)
            idx += 1
        if max_tap is not None and idx > max_tap:
            return None, out
    return x, out


# LPIPS VGG-16 tap indices: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
LPIPS_VGG16_TAPS = (3, 8, 15, 22, 29)
# vgg_gram's conv5_1 raw output (torchvision vgg19.features index 28)
VGG19_CONV5_1 = 28
