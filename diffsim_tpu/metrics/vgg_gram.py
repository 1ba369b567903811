"""VGG-Gram style baseline (/root/reference/metrics/vgg_gram.py).

Reference semantics preserved exactly, including two quirks:
* preprocessing resizes the SHORTEST side to img_size with no crop — images keep their aspect
  ratio, so batches may be ragged (the scorer buckets by shape);
* the score is the cosine of the **last row** of each Gram matrix
  (``style_grams_A[-1].reshape(-1)``, vgg_gram.py:81), not the full matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from diffsim_tpu.core.image import IMAGENET_MEAN, IMAGENET_STD, _shortest_side_resize
from diffsim_tpu.models import vgg
from diffsim_tpu.parallel import mesh as meshlib


class VGGGram:
    def __init__(self, params=None, *, mesh=None, dtype=jnp.float32, init_seed: int = 0):
        self.mesh = mesh
        self.dtype = dtype
        if params is None:
            from diffsim_tpu.metrics.scorer_base import init_random_on_device

            self.params = init_random_on_device(
                lambda: vgg.init(jax.random.PRNGKey(init_seed), vgg.VGG19_CFG, dtype=dtype),
                mesh,
            )
        else:
            self.params = jax.device_put(
                params, meshlib.replicated(mesh) if mesh is not None else jax.devices()[0]
            )

    def preprocess(self, pil_image, img_size: int = 512) -> np.ndarray:
        """torchvision Resize(img_size) (shortest side, bilinear) + ImageNet norm — uint8 out,
        normalization in-graph."""
        img = _shortest_side_resize(pil_image.convert("RGB"), img_size, resample=Image.BILINEAR)
        return np.asarray(img, np.uint8)[None]

    @functools.lru_cache(maxsize=64)
    def _gram_row_fn(self, h: int, w: int):
        def fn(params, pixels):
            x = pixels
            if x.dtype == jnp.uint8:
                x = (x.astype(jnp.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            feats, taps = vgg.features(params, x, vgg.VGG19_CFG, taps=(vgg.VGG19_CONV5_1,))
            f = taps[vgg.VGG19_CONV5_1]  # (B, h', w', 512)
            b = f.shape[0]
            m = f.reshape(b, -1, f.shape[-1]).transpose(0, 2, 1)  # (B, 512, hw)
            gram = jnp.einsum("bdh,beh->bde", m, m, preferred_element_type=jnp.float32)
            return gram[:, -1, :]  # the reference's last-row readout

        return jax.jit(fn)

    def _gram_rows(self, pix: np.ndarray) -> np.ndarray:
        h, w = pix.shape[1:3]
        return np.asarray(self._gram_row_fn(h, w)(self.params, jnp.asarray(pix)))

    def score_batch(self, pix_a, pix_b, blocking: bool = True) -> np.ndarray:
        """Cosine of conv5_1 Gram last rows; accepts stacked arrays or ragged lists.
        All per-shape-bucket programs are dispatched before anything is fetched, so
        ``blocking=False`` overlaps the whole batch with the caller's host work."""
        rows_a = self._rows_any_dispatch(pix_a)
        rows_b = self._rows_any_dispatch(pix_b)

        def fetch():
            # one device_get for every bucket program (one relay round-trip, not 2/bucket)
            got_a, got_b = jax.device_get((rows_a, rows_b))
            ra = np.concatenate([np.asarray(r, np.float32) for r in got_a])
            rb = np.concatenate([np.asarray(r, np.float32) for r in got_b])
            dot = np.sum(ra * rb, axis=-1)
            na = np.maximum(np.linalg.norm(ra, axis=-1), 1e-8)
            nb = np.maximum(np.linalg.norm(rb, axis=-1), 1e-8)
            return dot / (na * nb)

        return fetch() if blocking else fetch

    def _rows_any_dispatch(self, pix) -> list:
        """Async dispatch of the per-shape Gram programs; returns device arrays."""
        if isinstance(pix, np.ndarray):
            h, w = pix.shape[1:3]
            return [self._gram_row_fn(h, w)(self.params, jnp.asarray(pix))]
        out = []
        for p in pix:
            p = p[None] if p.ndim == 3 else p
            out.append(self._gram_row_fn(p.shape[1], p.shape[2])(self.params, jnp.asarray(p)))
        return out

    def _rows_any(self, pix) -> np.ndarray:
        return np.concatenate([np.asarray(r) for r in self._rows_any_dispatch(pix)])

    def gram_similarity(self, image_a_path, image_b_path, img_size: int = 512) -> float:
        from diffsim_tpu.core.image import load_image

        pa = self.preprocess(load_image(image_a_path), img_size)
        pb = self.preprocess(load_image(image_b_path), img_size)
        return float(self.score_batch(pa, pb)[0])
