"""DINO baselines: dino (v2 CLS cosine), dinov1, dino_cross, dinofeats.

Torch reference: /root/reference/metrics/dino.py. The cross readout is softmax attention on
un-merged (B, heads, seq, head_dim) context with NO out-proj (dino.py:120-131); the feature
variant compares the attention submodule's merged context output (hooks.py:34-35).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffsim_tpu.core.image import IMAGENET_MEAN, IMAGENET_STD, dino_preprocess_u8
from diffsim_tpu.metrics.readout import _flat_cosine
from diffsim_tpu.models import dinov2 as dino_model
from diffsim_tpu.ops.attention import sdpa
from diffsim_tpu.parallel import mesh as meshlib


def _resolve_layer(target_layer):
    if isinstance(target_layer, (list, tuple)):
        if len(target_layer) != 1:
            raise ValueError("DINO metrics take a single target_layer")
        return int(target_layer[0])
    return int(target_layer)


class Dinov2Score:
    """HF facebook/dinov2-small equivalent (/root/reference/metrics/dino.py:94-118)."""

    cfg_factory = staticmethod(dino_model.DinoConfig.v2_small)

    def __init__(self, params=None, *, cfg=None, mesh=None, dtype=jnp.float32, init_seed=0):
        self.cfg = cfg or self.cfg_factory()
        self.mesh = mesh
        self.dtype = dtype
        if params is None:
            from diffsim_tpu.metrics.scorer_base import init_random_on_device

            params = init_random_on_device(
                lambda: dino_model.init(jax.random.PRNGKey(init_seed), self.cfg, dtype),
                mesh,
            )
        elif mesh is not None:
            params = jax.device_put(params, meshlib.replicated(mesh))
        else:
            params = jax.device_put(params, jax.devices()[0])
        self.params = params

    def preprocess(self, pil_image):
        return dino_preprocess_u8(pil_image)

    @staticmethod
    def _normalize(pixels):
        if pixels.dtype == jnp.uint8:
            return (pixels.astype(jnp.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return pixels

    def _jit(self, fn):
        if self.mesh is None:
            return jax.jit(fn)
        ds = meshlib.data_sharding(self.mesh)
        rs = meshlib.replicated(self.mesh)
        return jax.jit(fn, in_shardings=(rs, ds), out_shardings=ds)

    def _pad(self, *arrays):
        if self.mesh is None:
            return arrays, 0
        n = arrays[0].shape[0]
        target = meshlib.pad_to_multiple(n, meshlib.data_axis_size(self.mesh))
        pad = target - n
        if pad:
            arrays = tuple(np.concatenate([a, np.repeat(a[-1:], pad, 0)]) for a in arrays)
        return arrays, pad

    @functools.cached_property
    def _cls_fn(self):
        def fn(params, pixels):
            out = dino_model.apply(params, self._normalize(pixels), self.cfg)
            emb = out["cls"].astype(jnp.float32)
            return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        return self._jit(fn)

    def _fetchable(self, scores, pad, blocking):
        from diffsim_tpu.metrics.scorer_base import fetchable

        return fetchable(scores, pad, blocking)

    def image_features(self, pixels: np.ndarray) -> np.ndarray:
        (pixels,), pad = self._pad(np.asarray(pixels))
        out = np.asarray(self._cls_fn(self.params, jnp.asarray(pixels)))
        return out[: out.shape[0] - pad] if pad else out

    @functools.cached_property
    def _pair_fn(self):
        def fn(params, pixels):
            # (2P, S, S, 3): A images then B images — cosine in-graph, one dispatch
            out = dino_model.apply(params, self._normalize(pixels), self.cfg)
            emb = out["cls"].astype(jnp.float32)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            n = emb.shape[0] // 2
            return 100.0 * jnp.sum(emb[:n] * emb[n:], axis=-1)

        return self._jit(fn)

    def dino_score_batch(self, pix_a, pix_b, blocking: bool = True) -> np.ndarray:
        """100 x cosine of normalized CLS embeddings (dino.py:80-92 semantics)."""
        (pix_a, pix_b), pad = self._pad(np.asarray(pix_a), np.asarray(pix_b))
        pix = np.concatenate([pix_a, pix_b], axis=0)
        scores = self._pair_fn(self.params, jnp.asarray(pix))
        return self._fetchable(scores, pad, blocking)

    @functools.lru_cache(maxsize=16)
    def _cross_fn(self, layer: int, capture: str):
        cfg = self.cfg

        def fn(params, pixels):
            out = dino_model.apply(params, self._normalize(pixels), cfg, tap_layer=layer, capture=capture)
            if capture == "output":
                feats = out["taps"]["out"]
                n = feats.shape[0] // 2
                return _flat_cosine(feats[:n], feats[n:])
            q, k, v = out["taps"]["q"], out["taps"]["k"], out["taps"]["v"]
            n = q.shape[0] // 2
            # manual softmax attention, context left un-merged, no out-proj (dino.py:120-131)
            a_on_b = sdpa(q[:n], k[n:], v[n:])
            b_on_a = sdpa(q[n:], k[:n], v[:n])
            self_a = sdpa(q[:n], k[:n], v[:n])
            self_b = sdpa(q[n:], k[n:], v[n:])
            return (_flat_cosine(a_on_b, self_a) + _flat_cosine(b_on_a, self_b)) / 2.0

        return self._jit(fn)

    def dino_cross_score_batch(self, pix_a, pix_b, target_layer, blocking: bool = True) -> np.ndarray:
        layer = _resolve_layer(target_layer)
        (pix_a, pix_b), pad = self._pad(np.asarray(pix_a), np.asarray(pix_b))
        pix = np.concatenate([pix_a, pix_b], axis=0)
        scores = self._cross_fn(layer, "qkv")(self.params, jnp.asarray(pix))
        return self._fetchable(scores, pad, blocking)

    def dino_feature_score_batch(self, pix_a, pix_b, target_layer, blocking: bool = True) -> np.ndarray:
        layer = _resolve_layer(target_layer)
        (pix_a, pix_b), pad = self._pad(np.asarray(pix_a), np.asarray(pix_b))
        pix = np.concatenate([pix_a, pix_b], axis=0)
        scores = self._cross_fn(layer, "output")(self.params, jnp.asarray(pix))
        return self._fetchable(scores, pad, blocking)

    # reference-shaped conveniences
    def dino_score(self, image_a, image_b) -> tuple[float, int]:
        s = self.dino_score_batch(self.preprocess(image_a), self.preprocess(image_b))
        return float(s.sum()), len(s)

    def dino_cross_score(self, image_a, image_b, target_layer) -> float:
        return float(self.dino_cross_score_batch(self.preprocess(image_a), self.preprocess(image_b), target_layer)[0])

    def dino_feature_score(self, image_a, image_b, target_layer) -> float:
        return float(self.dino_feature_score_batch(self.preprocess(image_a), self.preprocess(image_b), target_layer)[0])


class DinoScore(Dinov2Score):
    """DINO v1 ViT-S/8 (torch.hub dino_vits8, /root/reference/metrics/dino.py:38-92)."""

    cfg_factory = staticmethod(dino_model.DinoConfig.v1_vits8)
