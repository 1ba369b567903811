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

Estimate = static + per_triplet * n_triplets:
* static is EXACT for its two dominant terms — the scorer's parameter tree and the
  device-resident moment pool are real arrays whose nbytes we sum — plus a fixed reserve
  for embed tables, the cache's update-slab programs, and XLA workspace.
* per_triplet is analytic, calibrated on the one hard measurement we have: the 96-triplet
  512px fresh graph peaked at 21.05 GB with ~2.8 GB static -> ~190 MB/triplet, rounded up
  to 200 MB. It scales with (img_size/512)^2 (activations are spatial) and a per-backbone
  ``hbm_scale`` (same-resolution FLOPs ratio vs SD-1.5, from tools/flops_ratio.py compiled
  cost analysis: SDXL 19.08/2.84/4 ~= 1.7x at equal resolution, DiT-XL/2 1.13x).
  The fresh-graph calibration upper-bounds the cached graph (which skips the VAE encode).
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


def max_triplets(scorer) -> int | None:
    """Largest triplet count whose estimated graph fits the budget; None = guard disabled.
    0 means even one triplet does not fit (caller raises with remediation)."""
    budget = budget_bytes()
    if budget <= 0:
        return None
    avail = budget * MARGIN - scorer_static_bytes(scorer)
    per = per_triplet_bytes(scorer.img_size, getattr(scorer, "hbm_scale", 1.0))
    return max(0, int(avail // per))


def check_chunk(scorer, chunk: int) -> None:
    """Refuse an explicit chunk whose graph estimate exceeds the budget (pre-compile)."""
    budget = budget_bytes()
    if budget <= 0:
        return
    per = per_triplet_bytes(scorer.img_size, getattr(scorer, "hbm_scale", 1.0))
    est = scorer_static_bytes(scorer) + per * chunk
    if est > budget * MARGIN:
        raise HbmBudgetError(
            f"a {chunk}-triplet graph at {scorer.img_size}px is estimated at "
            f"{est / 1e9:.2f} GB against a {budget / 1e9:.2f} GB HBM budget "
            f"({MARGIN:.0%} usable) — pass a smaller chunk=, lower img_size, or raise "
            f"DIFFSIM_TPU_HBM_GB if this part has more memory"
        )


def check_pairs(scorer, n_pairs: int) -> None:
    """Pair-path pre-flight: a pair is 2 images / 4 CFG forwards = 2/3 of a triplet's
    graph (3 images / 6 forwards). The pair paths have no scan dispatch, so an over-budget
    P is refused outright with the batch-size remedy."""
    budget = budget_bytes()
    if budget <= 0:
        return
    per = per_triplet_bytes(scorer.img_size, getattr(scorer, "hbm_scale", 1.0)) * (2 / 3)
    est = scorer_static_bytes(scorer) + per * n_pairs
    if est > budget * MARGIN:
        raise HbmBudgetError(
            f"a {n_pairs}-pair graph at {scorer.img_size}px is estimated at "
            f"{est / 1e9:.2f} GB against a {budget / 1e9:.2f} GB HBM budget "
            f"({MARGIN:.0%} usable) — score in smaller batches (the 2AFC runner's "
            f"--batch_size), or raise DIFFSIM_TPU_HBM_GB if this part has more memory"
        )
