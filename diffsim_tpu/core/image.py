"""Host-side image loading and preprocessing.

Parity-critical: the reference resizes with PIL lanczos and maps to [-1, 1]
(/root/reference/diffsim/diffsim.py:27-41). Lanczos is deliberately kept on the host in PIL —
re-implementing it in XLA would silently change every downstream score. Arrays are produced in
NHWC (TPU-native layout); the torch reference uses NCHW but layout is internal to each build.
"""

from __future__ import annotations

import concurrent.futures as _futures
import os
from typing import Iterable, Sequence

import numpy as np
from PIL import Image


def load_image(path_or_image, draft_size: int | None = None) -> Image.Image:
    """Open an image path (or pass through a PIL image), like diffusers' ``load_image``.

    ``draft_size``: opt-in fast decode (CLI --fast_decode). For JPEGs, libjpeg decodes in
    the DCT domain at the smallest 1/2-1/8 scale whose result is still >= draft_size per
    side (3-8x faster for large photos on this 1-core host); lanczos then finishes the
    resize. NOT the reference pipeline — pixels differ slightly from a full-resolution
    decode, so scores shift (README "Parity notes"). No-op for PNG/BMP and for JPEGs
    already <= 2x the target."""
    if isinstance(path_or_image, Image.Image):
        return path_or_image
    img = Image.open(path_or_image)
    if draft_size is not None:
        img.draft("RGB", (draft_size, draft_size))
    img.load()
    return img


def process_image(image: Image.Image, img_size: int = 512) -> np.ndarray:
    """RGB -> lanczos resize to (img_size, img_size) -> float32 [-1, 1] -> (1, H, W, 3).

    Mirrors /root/reference/diffsim/diffsim.py:27-41 exactly up to the NHWC layout.
    """
    image = image.convert("RGB")
    image = image.resize((img_size, img_size), resample=Image.LANCZOS)
    arr = np.asarray(image, dtype=np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return arr[None, ...]


def load_and_process(path, img_size: int = 512, fast_decode: bool = False) -> np.ndarray:
    return process_image(load_image(path, img_size if fast_decode else None), img_size)


def load_and_process_u8(path, img_size: int = 512, fast_decode: bool = False) -> np.ndarray:
    return process_image_u8(load_image(path, img_size if fast_decode else None), img_size)


def process_image_u8(image: Image.Image, img_size: int = 512) -> np.ndarray:
    """Transport-optimized variant: RGB lanczos resize, (1, H, W, 3) uint8. The [-1, 1]
    mapping happens in-graph (``u8/127.5 - 1`` is bit-identical in f32 to the host float
    pipeline) — pixel uploads to the device are 4x smaller than float32.

    The resize runs through the native C++ resampler when available (bit-exact with PIL's
    8bpc lanczos — tests/test_native_preprocess.py — but GIL-free, so decode threads scale
    across cores); PIL otherwise."""
    image = image.convert("RGB")
    from diffsim_tpu import native

    out = native.resize_lanczos_u8(np.asarray(image, np.uint8), img_size, img_size)
    if out is None:
        out = np.asarray(image.resize((img_size, img_size), resample=Image.LANCZOS), np.uint8)
    return out[None]


def clip_preprocess_u8(image: Image.Image, size: int = 224) -> np.ndarray:
    """CLIP resize/crop on host, uint8 out; mean/std normalization happens in-graph."""
    image = _shortest_side_resize(image.convert("RGB"), size)
    arr = np.asarray(image, np.uint8)
    return _center_crop(arr, size)[None]


def dino_preprocess_u8(image: Image.Image, resize: int = 256, crop: int = 224) -> np.ndarray:
    image = _shortest_side_resize(image.convert("RGB"), resize)
    arr = np.asarray(image, np.uint8)
    return _center_crop(arr, crop)[None]


def _shortest_side_resize(image: Image.Image, size: int, resample=Image.BICUBIC) -> Image.Image:
    w, h = image.size
    short, long = (w, h) if w <= h else (h, w)
    new_short = size
    new_long = int(size * long / short)
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    return image.resize((nw, nh), resample=resample)


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top : top + size, left : left + size]


CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def clip_preprocess(image: Image.Image, size: int = 224) -> np.ndarray:
    """HF CLIPProcessor pipeline: shortest-side bicubic resize to 224, center crop, 1/255,
    CLIP mean/std. Returns (1, 224, 224, 3) f32."""
    image = _shortest_side_resize(image.convert("RGB"), size)
    arr = np.asarray(image, np.float32) / 255.0
    arr = _center_crop(arr, size)
    return ((arr - CLIP_MEAN) / CLIP_STD)[None]


def dino_preprocess(image: Image.Image, resize: int = 256, crop: int = 224) -> np.ndarray:
    """DINO/DINOv2 pipeline (torchvision transforms in /root/reference/metrics/dino.py:51-58
    and HF BitImageProcessor): shortest side 256 bicubic, center crop 224, ImageNet norm."""
    image = _shortest_side_resize(image.convert("RGB"), resize)
    arr = np.asarray(image, np.float32) / 255.0
    arr = _center_crop(arr, crop)
    return ((arr - IMAGENET_MEAN) / IMAGENET_STD)[None]


class ImageLoader:
    """Threaded prefetching loader: decode+resize many images concurrently on the host while
    the TPU computes. PIL releases the GIL during decode and resize, so threads scale.

    The reference decodes synchronously inside each score call
    (/root/reference/diffsim/diffsim.py:103-106), serializing host and device work; this
    loader is the TPU-side replacement for that hot loop's host half.
    """

    def __init__(self, img_size: int = 512, num_workers: int | None = None, preprocess=None,
                 cache_mb: int = 512, fast_decode: bool = False):
        """``preprocess(pil_image) -> (1, H, W, C)`` overrides the default lanczos/[-1,1]
        pipeline — metric adapters with their own normalization (CLIP, DINO, ...) supply
        theirs.

        ``cache_mb``: LRU budget for preprocessed arrays keyed by path. Benchmark protocols
        reuse images heavily across comparisons (CUTE draws 10 experiments from the same
        class dirs; retrieval scores every query against the same gallery), and the host is
        often a single core — decoding each unique image once is a real end-to-end win.
        0 disables. Cached arrays are shared: treat them as read-only.

        ``fast_decode``: opt-in DCT-domain JPEG decode at >= img_size per side before the
        final resize (CLI --fast_decode; see load_image) — a documented parity divergence."""
        self.img_size = img_size
        self.fast_decode = fast_decode
        self._preprocess = preprocess or (lambda img: process_image(img, img_size))
        if num_workers is None:
            num_workers = min(32, (os.cpu_count() or 8))
        self._pool = _futures.ThreadPoolExecutor(max_workers=num_workers)
        import collections
        import threading

        self._cache: collections.OrderedDict[str, np.ndarray] = collections.OrderedDict()
        self._cache_bytes = 0
        self._cache_budget = int(cache_mb * 1e6)
        self._cache_lock = threading.Lock()

    def _load(self, path) -> np.ndarray:
        key = None
        if isinstance(path, (str, os.PathLike)) and self._cache_budget > 0:
            # key carries mtime+size: a long-lived process (cli.serve) must not return stale
            # pixels when a file is overwritten in place
            try:
                st = os.stat(path)
                key = (os.fspath(path), st.st_mtime_ns, st.st_size)
            except OSError:
                key = None
        if key is not None and self._cache_budget > 0:
            with self._cache_lock:
                hit = self._cache.get(key)
                if hit is not None:
                    self._cache.move_to_end(key)
                    return hit
        arr = self._preprocess(
            load_image(path, self.img_size if self.fast_decode else None))
        if key is not None and self._cache_budget > 0:
            with self._cache_lock:
                if key not in self._cache:
                    self._cache[key] = arr
                    self._cache_bytes += arr.nbytes
                    while self._cache_bytes > self._cache_budget and self._cache:
                        _, old = self._cache.popitem(last=False)
                        self._cache_bytes -= old.nbytes
        return arr

    def submit(self, path) -> _futures.Future:
        return self._pool.submit(self._load, path)

    def load_batch(self, paths: Sequence) -> np.ndarray:
        """Load a list of paths into one (N, H, W, 3) float32 array."""
        futs = [self.submit(p) for p in paths]
        return np.concatenate([f.result() for f in futs], axis=0)

    def iter_batches(self, paths: Sequence, batch: int, prefetch: int = 2) -> Iterable[np.ndarray]:
        """Yield (<=batch, H, W, 3) arrays with ``prefetch`` batches decoded ahead."""
        chunks = [paths[i : i + batch] for i in range(0, len(paths), batch)]
        pending: list[list[_futures.Future]] = []
        idx = 0
        while idx < len(chunks) or pending:
            while idx < len(chunks) and len(pending) <= prefetch:
                pending.append([self.submit(p) for p in chunks[idx]])
                idx += 1
            futs = pending.pop(0)
            yield np.concatenate([f.result() for f in futs], axis=0)

    def close(self):
        self._pool.shutdown(wait=False)


def load_mask(path, img_size: int) -> np.ndarray:
    """Grayscale foreground mask -> (1, img_size, img_size) float32 in [0, 1].

    Nearest-neighbor resize: masks are hard label maps (the reference's SAM output,
    /root/reference/metrics/diffeats.py:75-87); interpolation would bleed the boundary before
    the dilate+pool in readout.mask_to_latent."""
    img = load_image(path).convert("L")
    img = img.resize((img_size, img_size), resample=Image.NEAREST)
    return (np.asarray(img, np.float32) / 255.0)[None]


def mask_from_matting(matting, path, img_size: int) -> np.ndarray:
    """Generate a foreground mask at score time: run an alpha-matting callable
    (``metrics.ffa.U2NetMatting`` or ``heuristic_matting``; RGB PIL -> RGBA PIL) on the image
    and binarize its alpha channel to (1, img_size, img_size) float32 in {0, 1}.

    This is the generated-mask counterpart of ``load_mask``: the reference's --use_mask help
    describes segmenting the target region at score time ("SAM-CLIP",
    /root/reference/argprocess.py:16) before the mask-weighted queries of
    /root/reference/metrics/diffeats.py:75-87; we substitute the matting nets this build
    already ships (documented divergence — SAM is torch-only and never actually invoked in
    the reference either)."""
    rgba = np.asarray(matting(load_image(path)), np.uint8)
    alpha = Image.fromarray(rgba[..., 3], "L").resize((img_size, img_size), Image.NEAREST)
    return (np.asarray(alpha, np.float32) > 127.5).astype(np.float32)[None]


def mask_path_for(image_path: str, image_root: str, mask_root: str) -> str:
    """Resolve the mask for an image: same relative path under ``mask_root``, falling back to
    the same stem with a .png extension."""
    rel = os.path.relpath(image_path, image_root)
    cand = os.path.join(mask_root, rel)
    if os.path.exists(cand):
        return cand
    alt = os.path.splitext(cand)[0] + ".png"
    if os.path.exists(alt):
        return alt
    raise FileNotFoundError(f"no mask for {image_path!r} under {mask_root!r} (tried {cand!r}, {alt!r})")
