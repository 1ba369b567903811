"""Full-scale throughput for the OTHER two scoring backbones on the attached TPU:
SDXL at 1024px (BASELINE.json config 4 — the reference's heaviest published config,
/root/reference/README.md:62,91) and DiT-XL/2 at 512px.

bench.py stays the canonical SD-1.5 flagship line; this prints one JSON line per backbone
and (with --out) writes them to a JSON file. Proves the 1024px SDXL program compiles and
runs through the relay (lax.map-chunked VAE) and records pairs/s for all three backbones
(SD-1.5 number comes from bench.py).

Usage: python bench_backbones.py [--out BENCH_BACKBONES.json] [--windows 3]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# reference wall-time context: ">30 min" per benchmark on one GPU; Sref's 4000 pairs in 30
# min ~= 2.2 pairs/s is the same generous 1.0x anchor bench.py uses. SDXL at 1024px is
# ~5.3x the SD-1.5@512 compute (latent 128^2 vs 64^2, 2.6B vs 0.86B), so the anchor there
# is scaled down by the same factor the reference's own XL runs slow down; we keep 1.0x =
# 2.2 pairs/s for comparability and report raw pairs/s alongside.
BASELINE_PAIRS_PER_SEC = 2.2


def _bench_scorer(scorer, metric_name: str, img: int, windows: int, iters: int, T: int,
                  **kwargs) -> dict:
    """Shared timing protocol: async-queue ``iters`` triplet batches per window, fetch all
    (the fetch is what waits for remote execution — CLAUDE.md relay semantics), best-of-N
    windows with the median alongside."""
    rng = np.random.default_rng(0)
    pix = [rng.integers(0, 256, (T, img, img, 3), dtype=np.uint8) for _ in range(3)]
    scorer.score_triplet_batch(*pix, **kwargs)  # compile + warm
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        fetches = [scorer.score_triplet_batch(*pix, blocking=False, **kwargs)
                   for _ in range(iters)]
        for f in fetches:
            f()
        times.append(time.perf_counter() - t0)
    pairs = iters * T * 2
    best = pairs / min(times)
    return {
        "metric": metric_name,
        "value": round(best, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(best / BASELINE_PAIRS_PER_SEC, 2),
        "median": round(pairs / float(np.median(times)), 3),
        "windows": len(times),
    }


def bench_xl(windows: int, iters: int = 2, batch_triplets: int = 2) -> dict:
    from diffsim_tpu.metrics.diffsim_xl import DiffSimXL

    return _bench_scorer(
        DiffSimXL(img_size=1024), "sdxl_diffsim_pairs_per_sec_per_chip_1024px", 1024,
        windows, iters, batch_triplets,
        prompt="The photo of a benchmark", target_block="up_blocks",
        target_layer=(0, 1, 1), target_step=900, similarity="cosine", seed=2334,
    )


def bench_dit(windows: int, iters: int = 4, batch_triplets: int = 8) -> dict:
    from diffsim_tpu.metrics.diffsim_dit import DiffSimDiT

    return _bench_scorer(
        DiffSimDiT(img_size=512), "dit_diffsim_pairs_per_sec_per_chip_512px", 512,
        windows, iters, batch_triplets,
        target_layer=13, target_step=600, similarity="cosine", seed=2334,
    )


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--only", choices=["xl", "dit"], default=None)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          f"/tmp/diffsim_tpu_jax_cache_{jax.default_backend()}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

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
