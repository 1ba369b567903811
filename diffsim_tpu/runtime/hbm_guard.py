"""Pre-flight HBM budgeting for scoring-graph dispatch.

Round-4 incident: one monolithic 96-triplet SD-1.5 scoring graph at 512px remote-compiled
to a 21.05 GB peak-HBM program on the 15.75 GB v5e chip; the failed allocation wedged the
chip claim for the rest of the round. The reference never hits this class of failure only
because it scores one pair at a time (/root/reference/diffsim/diffsim.py:103-106); a batched
TPU design must bound its own peak.

This module makes that wedge class structurally impossible: every triplet dispatch path
(fresh pixels AND cached moments, all three diffusion scorers) estimates peak HBM on the
HOST before building or compiling a graph, auto-chunks under the budget, and REFUSES an
explicit over-budget chunk with a clear error instead of handing XLA an unallocatable
program. The check is pure host arithmetic — a rejected shape never touches the device.

Estimate = static + args + per_triplet * chunk:
* static is EXACT for its two dominant terms — the scorer's parameter tree and the
  device-resident moment pool are real arrays whose nbytes we sum — plus a fixed reserve
  for embed tables, the cache's update-slab programs, and XLA workspace.
* args is the pixel-argument residency of the FULL batch (fresh paths only): the SD-1.5
  scan program takes all padded-n triplets as one argument, and the XL/DiT host loops
  enqueue every chunk's transfer before the first fetch, so chunking bounds activations
  but NOT input buffers. Cached-path arguments are int32 slot indices (negligible; the
  pool is already in static).
* per_triplet is analytic, calibrated on the one hard measurement we have: the 96-triplet
  512px fresh graph peaked at 21.05 GB with ~2.8 GB static -> ~190 MB/triplet, rounded up
  to 200 MB. It scales with (img_size/512)^2 (activations are spatial) and a per-backbone
  ``hbm_scale`` — the same-resolution FLOPs ratio vs SD-1.5 from tools/flops_ratio.py
  compiled cost analysis, rounded UP when deployed (measured SDXL 19.08/2.84/4 = 1.68 ->
  deployed 1.7; measured DiT-XL/2 3.22/2.84 = 1.13 -> deployed 1.15). The fresh-graph
  calibration upper-bounds the cached graph (which skips the VAE encode). Recalibrate
  against XLA's own numbers with tools/hbm_report.py when a chip is attached.
* MARGIN keeps 15% of the budget free for fragmentation, donation timing, and in-flight
  async batches.

``DIFFSIM_TPU_HBM_GB`` overrides the budget (default 15.75, the v5e usable HBM the round-4
OOM reported). Setting it <= 0 disables the guard (escape hatch for parts with more HBM or
for deliberate experiments).
"""

from __future__ import annotations

import os

# calibration point: 21.05 GB peak at 96 triplets, 512px, SD-1.5 real width (round-4
# remote-compile OOM report), less ~2.8 GB static -> 190 MB/triplet, rounded up
PER_TRIPLET_BYTES_512 = 200e6
# embed tables, cache update-slab programs, CLIP pooled outputs, XLA scratch
RESERVE_BYTES = 0.75e9
# fraction of the budget the estimate may fill (slack for fragmentation + async in-flight)
MARGIN = 0.85


class HbmBudgetError(RuntimeError):
    """A requested scoring-graph shape would exceed the device HBM budget. Raised on the
    host BEFORE any compile — the device is never touched with the bad shape."""


def budget_bytes() -> float:
    """Device HBM budget in bytes; <= 0 disables the guard."""
    return float(os.environ.get("DIFFSIM_TPU_HBM_GB", "15.75")) * 1e9


def tree_bytes(tree) -> int:
    """Total bytes of a pytree of arrays (params, pools). Leaves without nbytes count 0."""
    import jax

    return sum(getattr(leaf, "nbytes", 0) for leaf in jax.tree_util.tree_leaves(tree))


def per_triplet_bytes(img_size: int, hbm_scale: float = 1.0) -> float:
    """Analytic peak-activation bytes one triplet adds to a scoring graph."""
    return PER_TRIPLET_BYTES_512 * float(hbm_scale) * (img_size / 512.0) ** 2


def scorer_static_bytes(scorer) -> float:
    """Batch-independent resident bytes: exact params + exact moment pool (if built) +
    fixed reserve."""
    static = tree_bytes(scorer.params) + RESERVE_BYTES
    cache = getattr(scorer, "_moment_cache", None)
    if cache is not None:
        static += getattr(cache.pool, "nbytes", 0)
    return static


def triplet_arg_bytes(img_size: int, itemsize: int) -> int:
    """Pixel-argument bytes one triplet contributes to a FRESH dispatch (3 role images).
    uint8 transport (the production default) -> itemsize 1."""
    return 3 * img_size * img_size * 3 * itemsize


def max_triplets(scorer, n_total: int = 0, arg_itemsize: int = 0) -> int | None:
    """Largest per-graph triplet count whose estimate fits the budget; None = guard
    disabled. 0 means nothing fits (caller raises with remediation). For fresh dispatches
    pass the FULL batch ``n_total`` and the pixel transport ``arg_itemsize``: all input
    buffers are device-resident before the first fetch regardless of chunking."""
    budget = budget_bytes()
    if budget <= 0:
        return None
    avail = (budget * MARGIN - scorer_static_bytes(scorer)
             - n_total * triplet_arg_bytes(scorer.img_size, arg_itemsize))
    per = per_triplet_bytes(scorer.img_size, getattr(scorer, "hbm_scale", 1.0))
    return max(0, int(avail // per))


def check_chunk(scorer, chunk: int, n_total: int = 0, arg_itemsize: int = 0) -> None:
    """Refuse an explicit chunk whose graph estimate exceeds the budget (pre-compile)."""
    budget = budget_bytes()
    if budget <= 0:
        return
    per = per_triplet_bytes(scorer.img_size, getattr(scorer, "hbm_scale", 1.0))
    args = n_total * triplet_arg_bytes(scorer.img_size, arg_itemsize)
    est = scorer_static_bytes(scorer) + args + per * chunk
    if est > budget * MARGIN:
        raise HbmBudgetError(
            f"a {chunk}-triplet graph at {scorer.img_size}px (batch {n_total or chunk}, "
            f"{args / 1e9:.2f} GB resident pixel arguments) is estimated at "
            f"{est / 1e9:.2f} GB against a {budget / 1e9:.2f} GB HBM budget "
            f"({MARGIN:.0%} usable) — pass a smaller chunk= / score in smaller batches, "
            f"use the cached path (score_triplet_paths), lower img_size, or raise "
            f"DIFFSIM_TPU_HBM_GB if this part has more memory"
        )


def check_pairs(scorer, n_pairs: int, arg_itemsize: int = 0) -> None:
    """Pair-path pre-flight: a pair is 2 images / 4 CFG forwards = 2/3 of a triplet's
    graph (3 images / 6 forwards). ``n_pairs`` must be the PADDED count the graph is
    actually built for. The pair paths have no scan dispatch, so an over-budget P is
    refused outright with the batch-size remedy."""
    budget = budget_bytes()
    if budget <= 0:
        return
    per = per_triplet_bytes(scorer.img_size, getattr(scorer, "hbm_scale", 1.0)) * (2 / 3)
    args = n_pairs * 2 * scorer.img_size * scorer.img_size * 3 * arg_itemsize
    est = scorer_static_bytes(scorer) + args + per * n_pairs
    if est > budget * MARGIN:
        raise HbmBudgetError(
            f"a {n_pairs}-pair graph at {scorer.img_size}px is estimated at "
            f"{est / 1e9:.2f} GB against a {budget / 1e9:.2f} GB HBM budget "
            f"({MARGIN:.0%} usable) — score in smaller batches (the 2AFC runner's "
            f"--batch_size), or raise DIFFSIM_TPU_HBM_GB if this part has more memory"
        )
