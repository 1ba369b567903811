"""Full-scale throughput for the OTHER two scoring backbones on the attached TPU:
SDXL at 1024px (BASELINE.json config 4 — the reference's heaviest published config,
/root/reference/README.md:62,91) and DiT-XL/2 at 512px.

bench.py stays the canonical SD-1.5 flagship line; this prints one JSON line per backbone
and (with --out) writes them to a JSON file. The primary number per backbone drives the
device-cache path (score_triplet_paths) under the same protocol-faithful ~10x image reuse
bench.py uses; `fresh` is the zero-reuse floor (every image uploaded + encoded each time).

Usage: python bench_backbones.py [--out BENCH_BACKBONES.json] [--windows 3]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# Per-backbone baselines. The reference wall-time anchor is SD-1.5@512: 4000 pair-scores
# in ">30 minutes" ~= 2.2 pairs/s on an A100-class GPU (/root/reference/README.md:91, the
# generous reading bench.py uses). Heavier backbones run proportionally slower on the
# reference too, so each gets 2.2 / (FLOPs ratio vs SD-1.5@512), with ratios measured from
# XLA's post-optimization cost analysis of the production scoring graphs
# (tools/flops_ratio.py): sd15@512 2.84 TFLOP/pair, sdxl@1024 19.08 (6.72x),
# dit@512 3.22 (1.13x). Assumes the reference GPU sustains similar MFU across backbones.
SD15_BASELINE_PAIRS_PER_SEC = 2.2
XL_OVER_SD15_FLOPS = 6.719
DIT_OVER_SD15_FLOPS = 1.133
XL_BASELINE = SD15_BASELINE_PAIRS_PER_SEC / XL_OVER_SD15_FLOPS  # 0.327 pairs/s
DIT_BASELINE = SD15_BASELINE_PAIRS_PER_SEC / DIT_OVER_SD15_FLOPS  # 1.942 pairs/s
REUSE = 10  # CUTE references each unique image ~10x (see bench.py)


def _bench(scorer, img: int, windows: int, iters: int, T: int, baseline: float,
           metric: str, **kwargs) -> dict:
    """Timing protocol (CLAUDE.md relay semantics): async-queue, fetch all; best + median
    over windows. Primary = cached path under reuse; `fresh` = zero-reuse floor."""
    from bench import ReuseWorkload  # the flagship bench's workload — one definition

    rng = np.random.default_rng(0)
    work = ReuseWorkload(rng, img=img, ring=12, reuse=REUSE)
    for _ in range(2):
        paths, row_map = work.batch(T)
        scorer.score_triplet_paths(*paths, row_map=row_map, **kwargs)

    def cached_window():
        t0 = time.perf_counter()
        fetches = []
        for _ in range(iters):
            paths, row_map = work.batch(T)
            fetches.append(scorer.score_triplet_paths(*paths, row_map=row_map,
                                                      blocking=False, **kwargs))
        for f in fetches:
            f()
        return time.perf_counter() - t0

    times = [cached_window() for _ in range(windows)]
    pairs = iters * T * 2

    pix3 = [rng.integers(0, 256, (T, img, img, 3), dtype=np.uint8) for _ in range(3)]
    scorer.score_triplet_batch(*pix3, **kwargs)

    def fresh_window():
        t0 = time.perf_counter()
        fetches = [scorer.score_triplet_batch(*pix3, blocking=False, **kwargs)
                   for _ in range(iters)]
        for f in fetches:
            f()
        return time.perf_counter() - t0

    fresh_times = [fresh_window() for _ in range(windows)]
    best = pairs / min(times)
    return {
        "metric": metric,
        "value": round(best, 3),
        "unit": "pairs/s/chip",
        "vs_backbone_baseline": round(best / baseline, 2),
        "vs_sd15_baseline": round(best / SD15_BASELINE_PAIRS_PER_SEC, 2),
        "backbone_baseline_pairs_per_sec": round(baseline, 3),
        "median": round(pairs / float(np.median(times)), 3),
        "windows": windows,
        "reuse": REUSE,
        "fresh": round(pairs / min(fresh_times), 3),
        "fresh_median": round(pairs / float(np.median(fresh_times)), 3),
    }


def bench_xl(windows: int, iters: int = 2, batch_triplets: int = 2) -> dict:
    from diffsim_tpu.metrics.diffsim_xl import DiffSimXL

    return _bench(
        DiffSimXL(img_size=1024), 1024, windows, iters, batch_triplets, XL_BASELINE,
        "sdxl_diffsim_pairs_per_sec_per_chip_1024px",
        prompt="The photo of a benchmark", target_block="up_blocks",
        target_layer=(0, 1, 1), target_step=900, similarity="cosine", seed=2334,
    )


def bench_dit(windows: int, iters: int = 4, batch_triplets: int = 8) -> dict:
    from diffsim_tpu.metrics.diffsim_dit import DiffSimDiT

    return _bench(
        DiffSimDiT(img_size=512), 512, windows, iters, batch_triplets, DIT_BASELINE,
        "dit_diffsim_pairs_per_sec_per_chip_512px",
        target_layer=13, target_step=600, similarity="cosine", seed=2334,
    )


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--only", choices=["xl", "dit"], default=None)
    args = ap.parse_args()

    from diffsim_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()

    rows = []
    if args.only in (None, "xl"):
        rows.append(bench_xl(args.windows))
        print(json.dumps(rows[-1]))
    if args.only in (None, "dit"):
        rows.append(bench_dit(args.windows))
        print(json.dumps(rows[-1]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
