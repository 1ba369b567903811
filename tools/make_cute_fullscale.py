"""Generate a full-scale synthetic CUTE directory tree for the end-to-end benchmark run.

The reference's CUTE driver (/root/reference/cute_main.py:54-106) walks
``class/lvl2/lvl3/images`` and runs 10 experiments per class, one comparison per lvl2 dir
per experiment. This builds a tree with the same shape at real-benchmark scale:

    15 classes x 15 lvl2 dirs x 3 lvl3 dirs x 3 images  =  2,025 unique 512px JPEGs
    comparisons = 15 classes x 10 experiments x 15 lvl2  =  2,250 (4,500 scored pairs)

matching the ~2,250-comparison scale of a real CUTE run (round-4 VERDICT item 3). Images
are smooth per-image color gradients + low-frequency texture: fast to generate, compress
to ~20-60 KB, and decode at realistic PIL cost. Content does not affect throughput
(scores are weight/value-independent for timing purposes).

Usage: python tools/make_cute_fullscale.py [ROOT=/tmp/cute_fullscale] [SIZE=512]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
from PIL import Image

CLASSES = 15
LVL2 = 15
LVL3 = 3
IMAGES = 3


def make_tree(root: str, size: int = 512, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "cute")
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    t0 = time.time()
    n = 0
    for c in range(CLASSES):
        for l2 in range(LVL2):
            for l3 in range(LVL3):
                d = os.path.join(base, f"class{c:02d}", f"env{l2:02d}", f"obj{l3}")
                os.makedirs(d, exist_ok=True)
                for i in range(IMAGES):
                    lo = rng.uniform(0, 120, 3)
                    hi = rng.uniform(135, 255, 3)
                    ang = rng.uniform(0, 2 * np.pi)
                    g = (np.cos(ang) * xx + np.sin(ang) * yy) / size
                    g = (g - g.min()) / (g.max() - g.min())
                    img = lo + (hi - lo) * g[..., None]
                    fx, fy = rng.uniform(2, 9, 2)
                    img += 18 * np.sin(2 * np.pi * (fx * xx / size))[..., None]
                    img += 18 * np.sin(2 * np.pi * (fy * yy / size))[..., None]
                    Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(
                        os.path.join(d, f"im{i}.jpg"), quality=90)
                    n += 1
    print(f"wrote {n} images under {base} in {time.time() - t0:.1f}s")
    return base


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cute_fullscale"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    make_tree(root, size)
