"""Generate a full-scale synthetic TID2013 directory for the end-to-end benchmark run.

The reference's TID driver (/root/reference/tid_main.py:60-99) probes a flat directory for
25 pristine references ``I{nn}.BMP`` and, per reference, 24 distortions at levels 2 and 3
(``i{nn}_{dd}_2.bmp`` / ``_3.bmp``), scoring level-2 vs level-3 against the reference —
600 comparisons = 1,200 scored pairs over 1,225 unique images with EXTREME reference
reuse: each pristine image is role-A in 24 comparisons (48 pair-scores), the strongest
cache-hit profile of any protocol (vs CUTE ~10x, NIGHTS 0x). The decision rule is the
always-`>` quirk (level-2 must score strictly more similar), replicated in the runner.

Images: per-reference smooth gradient bases; each distortion adds seeded noise scaled by
level (level 3 noisier than level 2, so a real-weight run trends above chance while a
random-weight run measures pure throughput). BMPs, as the real dataset ships.

Usage: python tools/make_tid_fullscale.py [ROOT=/tmp/tid_fullscale] [SIZE=512]
Then:  python -m diffsim_tpu.cli.main tid --preset tid --image_path ROOT ...
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
from PIL import Image

REFS = 25
DISTS = 24


def make_tree(root: str, size: int = 512, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    t0 = time.time()
    n = 0
    for ref_i in range(1, REFS + 1):
        lo = rng.uniform(0, 120, 3)
        hi = rng.uniform(135, 255, 3)
        ang = rng.uniform(0, 2 * np.pi)
        g = (np.cos(ang) * xx + np.sin(ang) * yy) / size
        g = (g - g.min()) / (g.max() - g.min())
        base = lo + (hi - lo) * g[..., None]
        fx, fy = rng.uniform(2, 9, 2)
        base += 18 * np.sin(2 * np.pi * (fx * xx / size))[..., None]
        base += 18 * np.sin(2 * np.pi * (fy * yy / size))[..., None]
        Image.fromarray(base.clip(0, 255).astype(np.uint8)).save(
            os.path.join(root, f"I{ref_i:02}.BMP"))
        n += 1
        for dist_i in range(1, DISTS + 1):
            for level, sigma in ((2, 10.0), (3, 28.0)):
                img = base + rng.normal(0, sigma, base.shape)
                Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(
                    os.path.join(root, f"i{ref_i:02}_{dist_i:02}_{level}.bmp"))
                n += 1
    print(f"wrote {n} images ({REFS} refs, {REFS * DISTS} comparisons) under {root} "
          f"in {time.time() - t0:.1f}s")
    return root


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tid_fullscale"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    make_tree(root, size)
