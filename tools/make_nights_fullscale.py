"""Generate a full-scale synthetic NIGHTS directory for the end-to-end benchmark run.

The reference's NIGHTS driver (/root/reference/night_main.py:53-65) reads ``data.csv``
(split, ref_path, left_path, right_path, prompt, left_vote) and scores the val split:
2AFC with a vote accuracy readout. This builds the same layout at the real val-split
scale — default 2,120 triplets = 6,360 unique images — with NO image reuse across
triplets: the polar opposite of CUTE's ~10x reuse, so a full run exercises the runner's
miss-dominated path (threaded decode prewarm, cache-fill slabs every window) and the
vote-accuracy merge at scale (round-4 VERDICT item 6).

Images are smooth gradients + low-frequency texture (fast to make, realistic to decode);
left is a perturbed copy of ref and right an independent image, with left_vote=1, so a
random-weight run still has structure (accuracy is meaningless, throughput is not).

Usage: python tools/make_nights_fullscale.py [ROOT=/tmp/nights_fullscale] [N=2120] [SIZE=512]
Then:  python -m diffsim_tpu.cli.main nights --preset nights --image_path ROOT ...
"""

from __future__ import annotations

import csv
import os
import sys
import time

import numpy as np
from PIL import Image


def _img(rng, yy, xx, size):
    lo = rng.uniform(0, 120, 3)
    hi = rng.uniform(135, 255, 3)
    ang = rng.uniform(0, 2 * np.pi)
    g = (np.cos(ang) * xx + np.sin(ang) * yy) / size
    g = (g - g.min()) / (g.max() - g.min())
    img = lo + (hi - lo) * g[..., None]
    fx, fy = rng.uniform(2, 9, 2)
    img += 18 * np.sin(2 * np.pi * (fx * xx / size))[..., None]
    img += 18 * np.sin(2 * np.pi * (fy * yy / size))[..., None]
    return img


def make_tree(root: str, n: int = 2120, size: int = 512, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    words = ("lamp", "bird", "chair", "tree", "boat", "clock", "shoe", "vase")
    t0 = time.time()
    rows = []
    for i in range(n):
        sub = os.path.join("dist", f"{i // 200:03d}")
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        ref = _img(rng, yy, xx, size)
        left = ref + rng.normal(0, 14, ref.shape)  # perturbed ref -> left_vote 1
        right = _img(rng, yy, xx, size)
        paths = {}
        for role, arr in (("ref", ref), ("left", left), ("right", right)):
            rel = os.path.join(sub, f"t{i:05d}_{role}.jpg")
            Image.fromarray(arr.clip(0, 255).astype(np.uint8)).save(
                os.path.join(root, rel), quality=90)
            paths[role] = rel
        rows.append({
            "split": "val" if i % 10 else "train",  # a train sliver proves split filtering
            "ref_path": paths["ref"], "left_path": paths["left"],
            "right_path": paths["right"],
            "prompt": words[i % len(words)], "left_vote": 1,
        })
    with open(os.path.join(root, "data.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    n_val = sum(1 for r in rows if r["split"] == "val")
    print(f"wrote {3 * n} images ({n} triplets, {n_val} val) under {root} "
          f"in {time.time() - t0:.1f}s")
    return root


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nights_fullscale"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2120
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    make_tree(root, n, size)
