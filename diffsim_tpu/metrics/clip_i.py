"""CLIP-based baselines: clip_i (CLIP-I), clip_t, clip_cross, clipfeats.

Torch reference: /root/reference/metrics/clip_i.py. The cross variant applies DiffSim's
cross-image attention trick inside CLIP's vision tower; its hook quirk (Q/K/V computed from
the pre-LN layer input) and out-proj replay are preserved via the model's tap machinery
(models/clip_vision.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffsim_tpu.core.image import CLIP_MEAN, CLIP_STD, clip_preprocess_u8
from diffsim_tpu.core.tokenizer import HashTokenizer
from diffsim_tpu.metrics.readout import _flat_cosine
from diffsim_tpu.models import clip_text, clip_vision
from diffsim_tpu.ops.attention import sdpa
from diffsim_tpu.parallel import mesh as meshlib


def _resolve_layer(target_layer):
    """clip_i.py:131-132 — unlike the SD scorer, the length-1 list unwraps correctly here."""
    if isinstance(target_layer, (list, tuple)):
        if len(target_layer) != 1:
            raise ValueError("CLIP metrics take a single target_layer")
        return int(target_layer[0])
    return int(target_layer)


class CLIPScore:
    def __init__(self, params=None, *, vision_cfg=None, text_cfg=None, mesh=None,
                 tokenizer=None, dtype=jnp.float32, init_seed: int = 0):
        self.vision_cfg = vision_cfg or clip_vision.CLIPVisionConfig.b32()
        # CLIP-B/32 text tower: hidden 512, 8 heads, 12 layers
        self.text_cfg = text_cfg or clip_text.CLIPTextConfig(
            hidden=512, heads=8, intermediate=2048, projection_dim=512
        )
        self.mesh = mesh
        self.dtype = dtype
        self.tokenizer = tokenizer or HashTokenizer(self.text_cfg.vocab_size)
        if params is None:
            from diffsim_tpu.metrics.scorer_base import init_random_on_device

            def build():
                kv, kt = jax.random.split(jax.random.PRNGKey(init_seed))
                return {
                    "vision": clip_vision.init(kv, self.vision_cfg, dtype),
                    "text": clip_text.init(kt, self.text_cfg, dtype),
                }

            params = init_random_on_device(build, mesh)
        elif mesh is not None:
            params = jax.device_put(params, meshlib.replicated(mesh))
        else:
            params = jax.device_put(params, jax.devices()[0])
        self.params = params

    def preprocess(self, pil_image):
        """Host side: resize/crop to uint8; CLIP mean/std normalization runs in-graph."""
        return clip_preprocess_u8(pil_image, self.vision_cfg.image_size)

    @staticmethod
    def _normalize(pixels):
        if pixels.dtype == jnp.uint8:
            return (pixels.astype(jnp.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
        return pixels

    # ------------------------------------------------------------------

    @functools.cached_property
    def _embed_fn(self):
        def fn(params, pixels):
            out = clip_vision.apply(params["vision"], self._normalize(pixels), self.vision_cfg)
            emb = out["image_embeds"].astype(jnp.float32)
            return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        return self._jit(fn)

    def _jit(self, fn, data_args=(1,)):
        if self.mesh is None:
            return jax.jit(fn)
        ds = meshlib.data_sharding(self.mesh)
        rs = meshlib.replicated(self.mesh)
        in_sh = tuple(ds if i in data_args else rs for i in range(fn.__code__.co_argcount))
        return jax.jit(fn, in_shardings=in_sh, out_shardings=ds)

    def _pad(self, *arrays):
        if self.mesh is None:
            return arrays, 0
        n = arrays[0].shape[0]
        target = meshlib.pad_to_multiple(n, meshlib.data_axis_size(self.mesh))
        pad = target - n
        if pad:
            arrays = tuple(np.concatenate([a, np.repeat(a[-1:], pad, 0)]) for a in arrays)
        return arrays, pad

    def _fetchable(self, scores, pad, blocking):
        from diffsim_tpu.metrics.scorer_base import fetchable

        return fetchable(scores, pad, blocking)

    def image_features(self, pixels: np.ndarray, norm: bool = True) -> np.ndarray:
        (pixels,), pad = self._pad(np.asarray(pixels))
        out = np.asarray(self._embed_fn(self.params, jnp.asarray(pixels)))
        return out[: out.shape[0] - pad] if pad else out

    def text_features(self, texts, norm: bool = True) -> np.ndarray:
        ids = jnp.asarray(self.tokenizer(texts))
        out = clip_text.apply(self.params["text"], ids, self.text_cfg)
        emb = np.asarray(out["text_embeds"].astype(jnp.float32))
        if norm:
            emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        return emb

    # ------------------------------------------------------------------

    @functools.cached_property
    def _clipi_fn(self):
        def fn(params, pixels):
            # pixels (2P, S, S, 3): A images then B images — one program, cosine in-graph
            out = clip_vision.apply(params["vision"], self._normalize(pixels), self.vision_cfg)
            emb = out["image_embeds"].astype(jnp.float32)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            n = emb.shape[0] // 2
            return 100.0 * jnp.sum(emb[:n] * emb[n:], axis=-1)

        return self._jit(fn)

    def clipi_score_batch(self, pix_a: np.ndarray, pix_b: np.ndarray,
                          blocking: bool = True) -> np.ndarray:
        """100 x cosine of normalized image embeddings (clip_i.py:85-96)."""
        (pix_a, pix_b), pad = self._pad(np.asarray(pix_a), np.asarray(pix_b))
        pix = np.concatenate([pix_a, pix_b], axis=0)
        scores = self._clipi_fn(self.params, jnp.asarray(pix))
        return self._fetchable(scores, pad, blocking)

    def clipt_score_batch(self, texts, pix: np.ndarray) -> np.ndarray:
        ft = self.text_features(texts)
        fi = self.image_features(pix)
        return 100.0 * np.sum(ft * fi, axis=-1)

    @functools.lru_cache(maxsize=16)
    def _cross_fn(self, layer: int, capture: str):
        cfg = self.vision_cfg

        def fn(params, pixels):
            # pixels (2P, S, S, 3): A images then B images
            out = clip_vision.apply(params["vision"], self._normalize(pixels), cfg, tap_layer=layer, capture=capture)
            if capture == "output":
                feats = out["taps"]["out"]
                n = feats.shape[0] // 2
                return _flat_cosine(feats[:n], feats[n:])
            q, k, v = out["taps"]["q"], out["taps"]["k"], out["taps"]["v"]
            n = q.shape[0] // 2
            qa, qb = q[:n], q[n:]
            ka, kb = k[:n], k[n:]
            va, vb = v[:n], v[n:]
            # reference attention_calc: SDPA with the layer's scale then out_proj replay
            def calc(q_, k_, v_):
                ctx = sdpa(q_, k_, v_)
                return clip_vision.out_proj_replay(params["vision"], ctx, cfg, layer)

            a_on_b = calc(qa, kb, vb)
            b_on_a = calc(qb, ka, va)
            self_a = calc(qa, ka, va)
            self_b = calc(qb, kb, vb)
            return (_flat_cosine(a_on_b, self_a) + _flat_cosine(b_on_a, self_b)) / 2.0

        return self._jit(fn)

    def clip_cross_score_batch(self, pix_a, pix_b, target_layer, blocking: bool = True) -> np.ndarray:
        layer = _resolve_layer(target_layer)
        (pix_a, pix_b), pad = self._pad(np.asarray(pix_a), np.asarray(pix_b))
        pix = np.concatenate([pix_a, pix_b], axis=0)
        scores = self._cross_fn(layer, "qkv")(self.params, jnp.asarray(pix))
        return self._fetchable(scores, pad, blocking)

    def clip_feature_score_batch(self, pix_a, pix_b, target_layer, blocking: bool = True) -> np.ndarray:
        layer = _resolve_layer(target_layer)
        (pix_a, pix_b), pad = self._pad(np.asarray(pix_a), np.asarray(pix_b))
        pix = np.concatenate([pix_a, pix_b], axis=0)
        scores = self._cross_fn(layer, "output")(self.params, jnp.asarray(pix))
        return self._fetchable(scores, pad, blocking)

    # reference-shaped conveniences -------------------------------------------------

    def clipi_score(self, image_a, image_b) -> tuple[float, int]:
        pa = self.preprocess(image_a)
        pb = self.preprocess(image_b)
        s = self.clipi_score_batch(pa, pb)
        return float(s.sum()), len(s)

    def clip_cross_score(self, image_a, image_b, target_layer) -> float:
        return float(self.clip_cross_score_batch(self.preprocess(image_a), self.preprocess(image_b), target_layer)[0])

    def clip_feature_score(self, image_a, image_b, target_layer) -> float:
        return float(self.clip_feature_score_batch(self.preprocess(image_a), self.preprocess(image_b), target_layer)[0])
