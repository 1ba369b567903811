"""LPIPS perceptual distance (VGG-16 variant) — the reference's ``lpips.LPIPS(net='vgg')``
baseline (/root/reference/cute_main.py:44,166-168).

Re-derived from the published LPIPS formulation: scale inputs with the fixed shift/scale
layer, run VGG-16, tap the five relu stages, channel-unit-normalize each tap, apply the
learned 1x1 "lin" weights, spatial-average, sum stages. Inputs are [-1, 1] images at the
driver's img_size (the reference feeds ``process_image`` output). Lower = more similar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffsim_tpu.models import vgg
from diffsim_tpu.parallel import mesh as meshlib

# the published LPIPS input scaling layer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)
_STAGE_CHANNELS = (64, 128, 256, 512, 512)


def _lin_init(key, dtype):
    ks = jax.random.split(key, len(_STAGE_CHANNELS))
    # non-negative 1x1 weights, as LPIPS constrains them
    return [
        {"w": jnp.abs(jax.random.normal(k, (c,), dtype)) * 0.1}
        for k, c in zip(ks, _STAGE_CHANNELS)
    ]


class LPIPS:
    def __init__(self, params=None, *, mesh=None, dtype=jnp.float32, init_seed: int = 0):
        self.mesh = mesh
        if params is None:
            from diffsim_tpu.metrics.scorer_base import init_random_on_device

            def build():
                k1, k2 = jax.random.split(jax.random.PRNGKey(init_seed))
                return {
                    "vgg": vgg.init(k1, vgg.VGG16_CFG, dtype=dtype),
                    "lins": _lin_init(k2, dtype),
                }

            self.params = init_random_on_device(build, mesh)
        else:
            self.params = jax.device_put(
                params, meshlib.replicated(mesh) if mesh is not None else jax.devices()[0]
            )

    @functools.cached_property
    def _fn(self):
        def fn(params, pix_a, pix_b):
            def taps_of(x):
                if x.dtype == jnp.uint8:
                    x = x.astype(jnp.float32) / 127.5 - 1.0
                x = (x - _SHIFT) / _SCALE
                _, taps = vgg.features(params["vgg"], x, vgg.VGG16_CFG, taps=vgg.LPIPS_VGG16_TAPS)
                return [taps[i] for i in vgg.LPIPS_VGG16_TAPS]

            ta, tb = taps_of(pix_a), taps_of(pix_b)
            total = 0.0
            for fa, fb, lin in zip(ta, tb, params["lins"]):
                fa = fa * jax.lax.rsqrt(jnp.sum(fa * fa, axis=-1, keepdims=True) + 1e-10)
                fb = fb * jax.lax.rsqrt(jnp.sum(fb * fb, axis=-1, keepdims=True) + 1e-10)
                diff = (fa - fb) ** 2
                total = total + jnp.mean(jnp.sum(diff * lin["w"], axis=-1), axis=(1, 2))
            return total

        if self.mesh is not None:
            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return jax.jit(fn, in_shardings=(rs, ds, ds), out_shardings=ds)
        return jax.jit(fn)

    def score_batch(self, pix_a: np.ndarray, pix_b: np.ndarray, blocking: bool = True) -> np.ndarray:
        pix_a, pix_b = np.asarray(pix_a), np.asarray(pix_b)
        pad = 0
        if self.mesh is not None:
            target = meshlib.pad_to_multiple(pix_a.shape[0], meshlib.data_axis_size(self.mesh))
            pad = target - pix_a.shape[0]
            if pad:
                pix_a = np.concatenate([pix_a, np.repeat(pix_a[-1:], pad, 0)])
                pix_b = np.concatenate([pix_b, np.repeat(pix_b[-1:], pad, 0)])
        scores = self._fn(self.params, jnp.asarray(pix_a), jnp.asarray(pix_b))
        from diffsim_tpu.metrics.scorer_base import fetchable

        return fetchable(scores, pad, blocking)

    def __call__(self, pix_a, pix_b):
        return self.score_batch(np.asarray(pix_a), np.asarray(pix_b))
