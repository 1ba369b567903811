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


def load_image(path_or_image) -> Image.Image:
    """Open an image path (or pass through a PIL image), like diffusers' ``load_image``."""
    if isinstance(path_or_image, Image.Image):
        return path_or_image
    img = Image.open(path_or_image)
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


def load_and_process(path, img_size: int = 512) -> np.ndarray:
    return process_image(load_image(path), img_size)


class ImageLoader:
    """Threaded prefetching loader: decode+resize many images concurrently on the host while
    the TPU computes. PIL releases the GIL during decode and resize, so threads scale.

    The reference decodes synchronously inside each score call
    (/root/reference/diffsim/diffsim.py:103-106), serializing host and device work; this
    loader is the TPU-side replacement for that hot loop's host half.
    """

    def __init__(self, img_size: int = 512, num_workers: int | None = None, preprocess=None):
        """``preprocess(pil_image) -> (1, H, W, C)`` overrides the default lanczos/[-1,1]
        pipeline — metric adapters with their own normalization (CLIP, DINO, ...) supply
        theirs."""
        self.img_size = img_size
        self._preprocess = preprocess or (lambda img: process_image(img, img_size))
        if num_workers is None:
            num_workers = min(32, (os.cpu_count() or 8))
        self._pool = _futures.ThreadPoolExecutor(max_workers=num_workers)

    def _load(self, path) -> np.ndarray:
        return self._preprocess(load_image(path))

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
