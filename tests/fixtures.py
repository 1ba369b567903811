"""On-disk miniature benchmark fixtures exercising each driver protocol (SURVEY.md §4)."""

from __future__ import annotations

import csv
import json
import os

import numpy as np
from PIL import Image


def _img(seed: int, size: int = 40) -> Image.Image:
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size), indexing="ij")
    arr = np.stack(
        [np.sin(rng.uniform(1, 5) * xx * 6.28 + rng.uniform(0, 6)) * 0.5 + 0.5 for _ in range(3)],
        axis=-1,
    )
    return Image.fromarray((arr * 255).astype(np.uint8))


def make_cute(root: str) -> str:
    """cls/lvl2/lvl3/images, with the same lvl3 names across lvl2 dirs."""
    base = os.path.join(root, "cute")
    s = 0
    for cls in ("cat", "mug"):
        for lvl2 in ("env_a", "env_b"):
            for lvl3 in ("obj1", "obj2"):
                d = os.path.join(base, cls, lvl2, lvl3)
                os.makedirs(d, exist_ok=True)
                for i in range(2):
                    _img(s := s + 1).save(os.path.join(d, f"im{i}.png"))
    return base


def make_style(root: str) -> str:
    base = os.path.join(root, "style")
    s = 100
    for style_dir in ("s1", "s2", "s3"):
        d = os.path.join(base, style_dir)
        os.makedirs(d, exist_ok=True)
        for i in range(3):
            _img(s := s + 1).save(os.path.join(d, f"im{i}.png"))
    return base


def make_nights(root: str) -> str:
    base = os.path.join(root, "nights")
    os.makedirs(os.path.join(base, "imgs"), exist_ok=True)
    rows = []
    s = 200
    for i in range(6):
        names = []
        for role in ("ref", "left", "right"):
            name = f"imgs/{role}_{i}.png"
            _img(s := s + 1).save(os.path.join(base, name))
            names.append(name)
        rows.append(
            {
                "ref_path": names[0], "left_path": names[1], "right_path": names[2],
                "left_vote": str(i % 2), "split": "val" if i < 4 else "train",
                "prompt": f"Thing {i}",
            }
        )
    with open(os.path.join(base, "data.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    return base


def make_tid(root: str, refs: int = 2, dists: int = 3) -> str:
    base = os.path.join(root, "tid")
    os.makedirs(base, exist_ok=True)
    s = 300
    for r in range(1, refs + 1):
        _img(s := s + 1).save(os.path.join(base, f"I{r:02}.BMP"))
        for d in range(1, dists + 1):
            # mixed-case filenames exercise the reference's probing (tid_main.py:60-80)
            _img(s := s + 1).save(os.path.join(base, f"i{r:02}_{d:02}_2.bmp"))
            _img(s := s + 1).save(os.path.join(base, f"I{r:02}_{d:02}_3.BMP"))
    return base


def make_ipref(root: str) -> tuple[str, str]:
    base = os.path.join(root, "ipref")
    orig = os.path.join(root, "ipref_orig")
    os.makedirs(orig, exist_ok=True)
    s = 400
    for cls in ("ipA", "ipB"):
        d = os.path.join(base, cls)
        os.makedirs(d, exist_ok=True)
        _img(s := s + 1).save(os.path.join(orig, f"{cls}.JPG"))
        for w_ in ("1.0", "0.8", "0.6", "0.4", "0.35", "0.3", "0.2"):
            _img(s := s + 1).save(os.path.join(d, f"{w_}.png"))
    return base, orig


def make_dreambench(root: str) -> str:
    base = os.path.join(root, "dreambench")
    pipe = os.path.join(base, "dreambooth_sd")
    rating = os.path.join(base, "data_human_rating", "merged_data")
    s = 500
    anno1, anno2 = {}, {}
    for ref in ("ref0", "ref1"):
        os.makedirs(os.path.join(pipe, "src_image", ref), exist_ok=True)
        os.makedirs(os.path.join(pipe, "tgt_image", ref), exist_ok=True)
        os.makedirs(os.path.join(pipe, "text", ref), exist_ok=True)
        _img(s := s + 1).save(os.path.join(pipe, "src_image", ref, "0_0.jpg"))
        for i in range(4):
            _img(s := s + 1).save(os.path.join(pipe, "tgt_image", ref, f"{i}_0.jpg"))
            with open(os.path.join(pipe, "text", ref, f"{i}_0.txt"), "w") as f:
                f.write(f"prompt {i}\n")
            # ratings spread so that some pairs have gap >= 2 and groups agree
            anno1[f"{ref}_k{i}"] = float(i)
            anno2[f"{ref}_k{i}"] = float(i)
    for grp, anno in (("group1", anno1), ("group2", anno2)):
        d = os.path.join(rating, grp)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "dreambooth_sd-cp.json"), "w") as f:
            json.dump(anno, f)
    return base
