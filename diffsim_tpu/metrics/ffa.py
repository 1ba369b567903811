"""Foreground Feature Averaging — the "cute" baseline
(/root/reference/metrics/foreground_feature_averaging.py).

Pipeline: background removal (alpha matting) -> DINOv2 ViT-B/14 at 336x336 -> foreground mask
from the matted image downsampled to the 24x24 patch grid -> masked mean over patch tokens ->
cosine. The reference's matting engine is carvekit (TracerB7+FBA) — a torch-only stack we
cannot port faithfully (SURVEY.md §7 step 8 flags this); the matting hook here is pluggable:

* ``matting=U2NetMatting(params)``: a real salient-object matting net (U^2-Net,
  models/u2net.py) — the default whenever converted u2net weights are supplied;
* ``matting=None``: a border-statistics heuristic (pixels close to the median border color are
  background) — weight-free fallback, fails when the object touches the border;
* ``matting=callable``: a user-supplied ``PIL -> RGBA PIL`` (e.g. wrapping carvekit outputs);
* precomputed RGBA images can be fed straight into ``score_batch_rgba``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from diffsim_tpu.core.image import IMAGENET_MEAN, IMAGENET_STD
from diffsim_tpu.models import dinov2 as dino_model
from diffsim_tpu.parallel import mesh as meshlib

_SIZE = 336
_GRID = 24  # 336 / 14


class MattingInversionWarning(UserWarning):
    """A heuristic matte was auto-inverted (border-dominant object). Registered 'always':
    Python's default warning filter dedups by (message, location), which would collapse
    the documented per-image warning to once per process."""


import warnings as _warnings

_warnings.filterwarnings("always", category=MattingInversionWarning)


class U2NetMatting:
    """Model-based alpha matting: U^2-Net saliency, thresholded to a hard alpha (the FFA
    pipeline derives its patch mask from exactly-zeroed background pixels, so a binary matte
    matches the carvekit-style input the reference feeds it)."""

    def __init__(self, params, cfg=None, *, size: int = 320, threshold: float = 0.5,
                 dtype=jnp.float32):
        from diffsim_tpu.models import u2net

        self.cfg = cfg or u2net.U2NetConfig.u2netp()
        self.size = size
        self.threshold = threshold
        self.params = jax.device_put(params, jax.devices()[0])
        self._fn = jax.jit(
            lambda p, x: u2net.apply(p, ((x / 255.0) - IMAGENET_MEAN) / IMAGENET_STD, self.cfg)
        )

    def __call__(self, image: Image.Image) -> Image.Image:
        rgb = image.convert("RGB")
        small = np.asarray(rgb.resize((self.size, self.size), Image.BILINEAR), np.float32)
        pred = np.asarray(self._fn(self.params, jnp.asarray(small)[None]))[0]
        lo, hi = float(pred.min()), float(pred.max())
        pred = (pred - lo) / (hi - lo + 1e-8)  # the published inference normalization
        alpha = Image.fromarray((pred >= self.threshold).astype(np.uint8) * 255, "L")
        alpha = alpha.resize(rgb.size, Image.BILINEAR)
        rgba = np.dstack([np.asarray(rgb, np.uint8), np.asarray(alpha, np.uint8)])
        return Image.fromarray(rgba, "RGBA")


def heuristic_matting(image: Image.Image, threshold: float = 60.0,
                      center_prior: bool = True) -> Image.Image:
    """Border-statistics alpha matte: pixels within ``threshold`` L2 distance of the median
    border color get alpha 0.

    Blind-spot detection (round-4 VERDICT item 5): when the OBJECT dominates the frame
    border (close-up photos — a common CUTE case), the median border color is the object's,
    so the raw matte comes out roughly INVERTED (object -> background): measured mask IoU
    0.000 on the border-dominant fixture category (tools/matting_eval.py). The failure is
    detectable from the matte itself: a foreground matte should cover the image center
    (every 2AFC protocol photographs a centered subject) more than it covers the border.
    With ``center_prior`` (default), the matte is compared against its inversion on that
    statistic, the better-scoring variant wins, and choosing the inversion emits a
    per-image UserWarning (the matte is usable but low-confidence — supply U^2-Net weights
    for model-based matting). Reference behavior: carvekit has no such failure mode
    (/root/reference/metrics/foreground_feature_averaging.py:20-29)."""
    rgb = np.asarray(image.convert("RGB"), np.float32)
    border = np.concatenate(
        [rgb[0], rgb[-1], rgb[:, 0], rgb[:, -1]], axis=0
    )
    bg = np.median(border, axis=0)
    dist = np.sqrt(((rgb - bg) ** 2).sum(-1))
    fg = dist > threshold
    if center_prior:
        h, w = fg.shape
        center_cov = fg[h // 3 : h - h // 3, w // 3 : w - w // 3].mean()
        border_cov = np.concatenate([fg[0], fg[-1], fg[:, 0], fg[:, -1]]).mean()
        # a foreground matte should fill the center, not the border; the inverted matte
        # scores (1-center) - (1-border), so "inversion wins" reduces to this comparison
        if border_cov > center_cov:
            import warnings

            warnings.warn(
                "heuristic_matting: matte looks inverted (object dominates the image "
                f"border, poisoning the border statistics; border coverage {border_cov:.2f}"
                f" > center {center_cov:.2f}) — using the inverted matte. Supply U^2-Net "
                "weights (--matting_weights) for reliable matting on close-ups.",
                MattingInversionWarning,
                stacklevel=2,
            )
            fg = ~fg
    alpha = fg.astype(np.uint8) * 255
    rgba = np.dstack([rgb.astype(np.uint8), alpha])
    return Image.fromarray(rgba, "RGBA")


class ForegroundFeatureAveraging:
    def __init__(self, params=None, *, cfg=None, mesh=None, dtype=jnp.float32,
                 matting=None, init_seed: int = 0):
        self.cfg = cfg or dino_model.DinoConfig.v2_base()
        self.mesh = mesh
        self.matting = matting or heuristic_matting
        if params is None:
            from diffsim_tpu.metrics.scorer_base import init_random_on_device

            self.params = init_random_on_device(
                lambda: dino_model.init(jax.random.PRNGKey(init_seed), self.cfg, dtype),
                mesh,
            )
        else:
            self.params = jax.device_put(
                params, meshlib.replicated(mesh) if mesh is not None else jax.devices()[0]
            )

    # host side ---------------------------------------------------------------

    def preprocess(self, pil_image) -> np.ndarray:
        """Matting + 336x336 bicubic resize; returns (1, 336, 336, 4) uint8 RGBA (alpha==0
        pixels already zeroed, as the reference does before preprocessing)."""
        rgba = np.asarray(self.matting(pil_image), np.uint8).copy()
        rgba[rgba[..., 3] == 0] = 0
        img = Image.fromarray(rgba, "RGBA").resize((_SIZE, _SIZE), Image.BICUBIC)
        return np.asarray(img, np.uint8)[None]

    @staticmethod
    def _mask_from_rgb(rgb_sum: np.ndarray) -> np.ndarray:
        """get_foreground_mask (reference :55-73): background = pixels at the channel-sum
        minimum; mask bilinear-resized to the 24x24 grid, thresholded at 0.5; all-zero masks
        fall back to all-ones."""
        mask = (rgb_sum != rgb_sum.min()).astype(np.uint8) * 255
        resized = np.asarray(
            Image.fromarray(mask).resize((_GRID, _GRID), Image.BILINEAR), np.float32
        ) / 255.0
        out = (resized > 0.5).astype(np.float32)
        if out.sum() == 0:
            out = np.ones_like(out)
        return out

    # device side -------------------------------------------------------------

    @functools.cached_property
    def _feat_fn(self):
        def fn(params, pixels, masks):
            # pixels uint8 (B, 336, 336, 3); masks (B, 24, 24)
            x = (pixels.astype(jnp.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            out = dino_model.apply(params, x, self.cfg)
            patches = out["last_hidden_state"][:, 1:]  # x_norm_patchtokens
            grid = patches.reshape(patches.shape[0], _GRID, _GRID, -1)
            m = masks[..., None]
            return (grid * m).sum(axis=(1, 2)) / jnp.maximum(m.sum(axis=(1, 2)), 1e-6)

        if self.mesh is not None:
            ds = meshlib.data_sharding(self.mesh)
            rs = meshlib.replicated(self.mesh)
            return jax.jit(fn, in_shardings=(rs, ds, ds), out_shardings=ds)
        return jax.jit(fn)

    def _features_dispatch(self, rgba_batch: np.ndarray, variant: str,
                           raw_batch: np.ndarray | None = None):
        """Host mask prep + async device dispatch; returns (device_features, pad)."""
        rgb = rgba_batch[..., :3]
        # normalized-pixel channel-sum reproduces the reference's mask source (it sums the
        # ImageNet-normalized tensor; the minimum is the zeroed background either way)
        masks = np.stack([
            self._mask_from_rgb(((r / 255.0 - IMAGENET_MEAN) / IMAGENET_STD).sum(-1))
            for r in rgb
        ])
        if variant == "Crop-Feat":
            pixels = rgb
        elif variant == "Crop-Img":
            assert raw_batch is not None, "Crop-Img needs the un-matted pixels"
            pixels = raw_batch
        else:
            raise ValueError(f"unknown variant: {variant}")
        pad = 0
        if self.mesh is not None:
            target = meshlib.pad_to_multiple(pixels.shape[0], meshlib.data_axis_size(self.mesh))
            pad = target - pixels.shape[0]
            if pad:
                pixels = np.concatenate([pixels, np.repeat(pixels[-1:], pad, 0)])
                masks = np.concatenate([masks, np.repeat(masks[-1:], pad, 0)])
        return self._feat_fn(self.params, jnp.asarray(pixels), jnp.asarray(masks)), pad

    def features(self, rgba_batch: np.ndarray, variant: str = "Crop-Feat",
                 raw_batch: np.ndarray | None = None) -> np.ndarray:
        """rgba_batch (B, 336, 336, 4) uint8 matted images; raw_batch optional un-matted
        pixels for the Crop-Img variant."""
        dev, pad = self._features_dispatch(rgba_batch, variant, raw_batch)
        out = np.asarray(dev)
        return out[: out.shape[0] - pad] if pad else out

    def score_batch(self, variant: str, rgba_a: np.ndarray, rgba_b: np.ndarray,
                    blocking: bool = True) -> np.ndarray:
        da, pa = self._features_dispatch(np.asarray(rgba_a), variant)
        db, pb = self._features_dispatch(np.asarray(rgba_b), variant)

        def fetch():
            got_a, got_b = jax.device_get((da, db))  # one relay round-trip for both
            fa = np.asarray(got_a, np.float32)
            fb = np.asarray(got_b, np.float32)
            fa = fa[: fa.shape[0] - pa] if pa else fa
            fb = fb[: fb.shape[0] - pb] if pb else fb
            dot = np.sum(fa * fb, axis=-1)
            na = np.maximum(np.linalg.norm(fa, axis=-1), 1e-8)
            nb = np.maximum(np.linalg.norm(fb, axis=-1), 1e-8)
            return dot / (na * nb)

        return fetch() if blocking else fetch

    def __call__(self, variant: str, images_a, images_b=None):
        """Reference-shaped API: lists of PIL images (forward, :75-92)."""
        rgba_a = np.concatenate([self.preprocess(i) for i in images_a])
        if images_b is None:
            return self.features(rgba_a, variant)
        rgba_b = np.concatenate([self.preprocess(i) for i in images_b])
        return float(self.score_batch(variant, rgba_a, rgba_b)[0])
