"""Bench the documented fast mode end-to-end and measure what the speed costs.

Round-4 VERDICT item 8: the fast levers were documented but never packaged —
`--no_cfg_parity` (quirk Q1 opt-out: drop the uncond CFG half,
/root/reference/diffsim/diffsim_pipeline.py:208) and `--bf16_softmax` (attention
probabilities in bf16, ops.attention.fast_softmax). This benches the canonical and the
combined fast configuration on the chip through the SAME cached-path workload bench.py
uses, and reports ranking agreement between the two on a fixed deterministic image set:

* Spearman rank correlation over all pair scores, and
* 2AFC decision agreement: the fraction of triplets where sign(s_ab - s_ac) matches —
  the quantity that actually decides benchmark accuracy.

Agreement is measured under random weights (no published checkpoints in this
environment): it captures the numerical sensitivity of the full pipeline, not
semantic-model agreement — noted in README alongside the numbers.

With --decompose, agreement is additionally measured for each lever ALONE
(bf16_softmax only, no_cfg_parity only) so the cost split is attributable: bf16 softmax
is a pure numerics change (expected ≈1.0 agreement) while dropping the uncond half is a
semantic change to the score definition (the taps genuinely differ — quirk Q1).

Usage: python tools/bench_fastmode.py [--out BENCH_FAST.json] [--windows 6] [--decompose]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BASELINE_PAIRS_PER_SEC = 2.2
IMG = 512
BATCH = 24
ITERS = 6


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra * ra).sum() * (rb * rb).sum()))


def make_images(n: int, rng) -> np.ndarray:
    """Deterministic structured images (gradients + texture) — agreement on pure noise
    is uninformative."""
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
    out = np.empty((n, IMG, IMG, 3), np.uint8)
    for i in range(n):
        lo, hi = rng.uniform(0, 100, 3), rng.uniform(150, 255, 3)
        ang = rng.uniform(0, 2 * np.pi)
        g = np.cos(ang) * xx + np.sin(ang) * yy
        g = (g - g.min()) / (g.max() - g.min() + 1e-9)
        img = lo + (hi - lo) * g[..., None] + rng.normal(0, 10, (IMG, IMG, 3))
        out[i] = img.clip(0, 255).astype(np.uint8)
    return out


def bench_throughput(scorer, kwargs, windows: int) -> tuple[float, float]:
    from bench import ReuseWorkload

    rng = np.random.default_rng(1)
    work = ReuseWorkload(rng)
    for _ in range(2):
        paths, row_map = work.batch(BATCH)
        scorer.score_triplet_paths(*paths, row_map=row_map, **kwargs)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        fetches = []
        for _ in range(ITERS):
            paths, row_map = work.batch(BATCH)
            fetches.append(scorer.score_triplet_paths(*paths, row_map=row_map,
                                                      blocking=False, **kwargs))
        for f in fetches:
            f()
        times.append(time.perf_counter() - t0)
    pairs = ITERS * BATCH * 2
    return pairs / min(times), pairs / float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--windows", type=int, default=6)
    ap.add_argument("--agree_triplets", type=int, default=96)
    ap.add_argument("--decompose", action="store_true",
                    help="also measure agreement for each fast lever alone")
    args = ap.parse_args()

    import jax

    from diffsim_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()

    from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15

    kwargs = dict(prompt="The photo of a benchmark", target_block="up_blocks",
                  target_layer=(0,), target_step=600, similarity="cosine", seed=2334)

    # one set of weights for both modes (agreement must isolate the numerics)
    canonical = DiffSimSD15(img_size=IMG)
    fast = DiffSimSD15(params=canonical.params, img_size=IMG,
                       cfg_parity=False, fast_softmax=True)

    # ---- ranking agreement on a fixed structured image set ----
    rng = np.random.default_rng(7)
    T = args.agree_triplets
    imgs = make_images(3 * T, rng)
    pa, pb, pc = imgs[:T], imgs[T:2 * T], imgs[2 * T:]

    def score_chunked(scorer):
        # One T-sized monolith OOMs HBM (measured 21.05G/15.75G at T=96). The guarded
        # dispatch (runtime/hbm_guard.py) now auto-chunks this onto the scan path — one
        # launch + one fetch for the whole batch, peak activations bounded by the chunk.
        return scorer.score_triplet_batch(pa, pb, pc, **kwargs)

    ca, cc = score_chunked(canonical)
    fa, fc = score_chunked(fast)
    all_c = np.concatenate([ca, cc])
    all_f = np.concatenate([fa, fc])
    rho = spearman(all_c, all_f)
    decisions = float(np.mean(np.sign(ca - cc) == np.sign(fa - fc)))

    per_lever = {}
    if args.decompose:
        for name, levers in (("bf16_only", dict(fast_softmax=True)),
                             ("no_cfg_only", dict(cfg_parity=False))):
            lone = DiffSimSD15(params=canonical.params, img_size=IMG, **levers)
            la, lc = score_chunked(lone)
            per_lever[f"spearman_{name}"] = round(
                spearman(all_c, np.concatenate([la, lc])), 4)
            per_lever[f"decision_{name}"] = round(
                float(np.mean(np.sign(ca - cc) == np.sign(la - lc))), 4)
            del lone

    # ---- throughput, cached-path reuse workload (same protocol as bench.py) ----
    best, median = bench_throughput(fast, kwargs, args.windows)
    can_best, can_median = bench_throughput(canonical, kwargs, args.windows)

    rows = [
        {
            "metric": "sd15_diffsim_fast_pairs_per_sec_per_chip_512px",
            "value": round(best, 3),
            "unit": "pairs/s/chip",
            "vs_baseline": round(best / BASELINE_PAIRS_PER_SEC, 2),
            "median": round(median, 3),
            "config": "--no_cfg_parity --bf16_softmax",
            "spearman_vs_canonical": round(rho, 4),
            "decision_agreement_vs_canonical": round(decisions, 4),
            "agree_pairs": int(2 * T),
            "canonical_best": round(can_best, 3),
            "canonical_median": round(can_median, 3),
            **per_lever,
        },
    ]
    for r in rows:
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
