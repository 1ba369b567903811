"""Batched 2AFC benchmark executor.

The reference drivers score one pair at a time inside the protocol loop
(/root/reference/cute_main.py:111-205). Here planning (data.benchmarks) is separate, so the
executor batches the two pairs of every comparison across the whole benchmark, prefetches and
decodes images on host threads while the TPU scores the previous batch, logs every comparison
to JSONL (resumable), and reproduces each driver's accuracy arithmetic exactly — including the
quirks: TID2013 and DreamBench++ compare with ``>`` regardless of --similarity
(/root/reference/tid_main.py:165-166, dreambench_main.py:203), while CUTE/Sref/IPref flip for
mse/lpips, and NIGHTS/DreamBench compare against human votes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

from diffsim_tpu.core.image import ImageLoader
from diffsim_tpu.data.benchmarks import Comparison
from diffsim_tpu.runtime.results import ResultLog

# decision rules (which driver uses which arithmetic)
STANDARD = "standard"  # b-wins, direction flips for lower-better metrics; tracks 2x accuracy
ALWAYS_GREATER = "always_greater"  # TID2013: s_ab > s_ac regardless of similarity
VOTE = "vote"  # NIGHTS: predicted (direction-aware) == vote
VOTE_GREATER = "vote_greater"  # DreamBench++: predicted = 0 if s_ab > s_ac else 1; == vote


@dataclasses.dataclass
class Report:
    total: int = 0
    correct: int = 0
    correct_2x: int = 0

    @property
    def accuracy(self) -> float:
        return self.correct / self.total * 100 if self.total else 0.0

    @property
    def accuracy_2x(self) -> float:
        return self.correct_2x / self.total * 100 if self.total else 0.0


def judge(rule: str, s_ab: float, s_ac: float, vote, lower_better: bool) -> tuple[bool, bool]:
    """(correct, correct_2x) for one comparison."""
    if rule == STANDARD:
        if lower_better:
            return s_ab < s_ac, s_ab * 2 < s_ac
        return s_ab > s_ac, s_ab > 2 * s_ac
    if rule == ALWAYS_GREATER:
        return s_ab > s_ac, False
    if rule == VOTE:
        predicted = int(s_ab < s_ac) if lower_better else int(s_ab > s_ac)
        return predicted == vote, False
    if rule == VOTE_GREATER:
        predicted = 0 if s_ab > s_ac else 1
        return predicted == vote, False
    raise ValueError(f"unknown decision rule: {rule}")


def run_2afc(
    comparisons: Sequence[Comparison],
    score_pairs: Callable[[np.ndarray, np.ndarray, list[str]], np.ndarray],
    *,
    score_triplets: Callable | None = None,
    score_triplet_paths: Callable | None = None,
    prewarm: Callable | None = None,
    rule: str = STANDARD,
    lower_better: bool = False,
    img_size: int = 512,
    batch: int = 16,
    out_path: str | None = None,
    log_every: int = 450,
    loader: ImageLoader | None = None,
    print_fn=print,
    timer=None,
    mask_fn: Callable | None = None,
) -> Report:
    """Score all comparisons and report accuracy.

    ``score_pairs(pix_a, pix_b, prompts) -> scores`` is the metric adapter; pixel arrays are
    (N, H, W, 3) in [-1, 1]. Each batch of B comparisons issues one 2B-pair scoring call
    ([(a,b)..., (a,c)...]).

    ``mask_fn(image_path) -> (1, H, W)`` enables mask-weighted scoring (--use_mask): masks are
    decoded alongside the images and passed to ``score_pairs(mask_a=, mask_b=)``; the triplet
    fusion is bypassed (it has no mask plumbing).

    ``score_triplet_paths`` (see MetricAdapter) takes priority over ``score_triplets`` when
    every input is an on-disk path: images are keyed by path in a device-resident feature
    cache, so a repeated image costs no relay upload, no decode and no encode. In this mode
    the runner does NOT prefetch-decode the batch — the adapter decodes only cache MISSES
    via the loader (one decode per unique image), and ``prewarm`` (if given) decodes the
    NEXT chunk's misses on loader threads while the current chunk scores.
    """
    import os as _os
    log = ResultLog(out_path)
    report = Report()

    pending = [i for i in range(len(comparisons)) if i not in log.done]
    # prefetch image decode ahead of the device
    chunks = [pending[i : i + batch] for i in range(0, len(pending), batch)]

    # Cached-path mode: when every input is an on-disk path and the adapter keys images in
    # the device-resident feature cache, the runner must NOT decode the batch itself —
    # that's one decode per REFERENCE (the reference's own behavior,
    # /root/reference/diffsim/diffsim.py:103-106, measured at ~5 s/batch of host decode on
    # this 1-core host — it throttled the first full-scale CUTE run to <2 pairs/s). The
    # adapter decodes only cache MISSES via the loader (one decode per UNIQUE image).
    use_paths = (
        score_triplet_paths is not None
        and mask_fn is None
        and all(
            isinstance(getattr(comparisons[i], r), (str, _os.PathLike))
            for i in pending for r in "abc"
        )
    )
    if loader is None:
        # In cached-path mode the loader feeds the moment cache, which requires uint8 pixel
        # transport — the default float32 [-1,1] preprocess would raise in the adapter (or,
        # under `python -O` historically, silently double-normalize). Build the right one.
        if use_paths:
            from diffsim_tpu.core.image import process_image_u8

            loader = ImageLoader(
                img_size, preprocess=lambda im: process_image_u8(im, img_size)
            )
        else:
            loader = ImageLoader(img_size)

    mask_pool = None
    if mask_fn is not None:
        import concurrent.futures as _futures

        mask_pool = _futures.ThreadPoolExecutor(max_workers=8)

    def decode(chunk):
        if use_paths:
            return None  # no per-reference decode: the adapter fills cache misses itself
        futs = []
        for i in chunk:
            c = comparisons[i]
            entry = (loader.submit(c.a), loader.submit(c.b), loader.submit(c.c))
            if mask_pool is not None:
                entry = entry + (
                    mask_pool.submit(mask_fn, c.a),
                    mask_pool.submit(mask_fn, c.b),
                    mask_pool.submit(mask_fn, c.c),
                )
            futs.append(entry)
        return futs

    inflight = []
    ci = 0
    PREFETCH = 2
    while ci < len(chunks) and len(inflight) < PREFETCH:
        inflight.append((chunks[ci], decode(chunks[ci])))
        ci += 1

    from diffsim_tpu.runtime.profiling import StageTimer

    timer = timer or StageTimer()
    pending_fetch = None  # (chunk, fetch) — one scored batch kept in flight

    def drain():
        nonlocal pending_fetch
        if pending_fetch is None:
            return
        chunk_, fetch_ = pending_fetch
        pending_fetch = None
        with timer.stage("fetch"):
            scores = fetch_() if callable(fetch_) else fetch_
        n_ = len(chunk_)
        with timer.stage("log"):
            if isinstance(scores, tuple):  # triplet path: (s_ab, s_ac)
                s_ab, s_ac = scores
                for j, i in enumerate(chunk_):
                    log.record(i, s_ab=float(s_ab[j]), s_ac=float(s_ac[j]))
            else:
                for j, i in enumerate(chunk_):
                    log.record(i, s_ab=float(scores[j]), s_ac=float(scores[n_ + j]))

    while inflight:
        chunk, futs = inflight.pop(0)
        with timer.stage("decode"):
            arrs = None if futs is None else [
                tuple(f.result() for f in entry) for entry in futs
            ]
        if ci < len(chunks):
            inflight.append((chunks[ci], decode(chunks[ci])))
            ci += 1
        prompts = [comparisons[i].prompt for i in chunk]
        with timer.stage("dispatch"):
            if use_paths:
                roles = [[getattr(comparisons[i], r) for i in chunk] for r in "abc"]
                result = score_triplet_paths(*roles, None, None, None, prompts,
                                             blocking=False, loader=loader)
                if prewarm is not None and inflight:
                    # decode the NEXT chunk's cache misses while this one scores
                    nxt = inflight[0][0]
                    prewarm([[getattr(comparisons[i], r) for i in nxt] for r in "abc"],
                            loader)
            elif mask_fn is not None:
                pix_a = np.concatenate([e[0] for e in arrs] * 2, axis=0)
                pix_bc = np.concatenate([e[1] for e in arrs] + [e[2] for e in arrs], axis=0)
                m_a = np.concatenate([e[3] for e in arrs] * 2, axis=0)
                m_bc = np.concatenate([e[4] for e in arrs] + [e[5] for e in arrs], axis=0)
                result = score_pairs(pix_a, pix_bc, prompts * 2, blocking=False,
                                     mask_a=m_a, mask_b=m_bc)
            elif score_triplets is not None or score_triplet_paths is not None:
                pa = np.concatenate([e[0] for e in arrs], axis=0)
                pb = np.concatenate([e[1] for e in arrs], axis=0)
                pc = np.concatenate([e[2] for e in arrs], axis=0)
                roles = [[getattr(comparisons[i], r) for i in chunk] for r in "abc"]
                pathlike = all(
                    isinstance(p, (str, _os.PathLike)) for role in roles for p in role
                )
                if score_triplet_paths is not None and pathlike:
                    result = score_triplet_paths(*roles, pa, pb, pc, prompts,
                                                 blocking=False, loader=loader)
                elif score_triplets is not None:
                    result = score_triplets(pa, pb, pc, prompts, blocking=False)
                else:  # paths adapter without triplet fallback, non-path inputs
                    result = score_pairs(np.concatenate([pa, pa], axis=0),
                                         np.concatenate([pb, pc], axis=0),
                                         prompts * 2, blocking=False)
            else:
                pix_a = np.concatenate([e[0] for e in arrs] * 2, axis=0)
                pix_bc = np.concatenate([e[1] for e in arrs] + [e[2] for e in arrs], axis=0)
                # every adapter supports async dispatch (MetricAdapter contract) — no
                # synchronous fallback
                result = score_pairs(pix_a, pix_bc, prompts * 2, blocking=False)
        drain()
        pending_fetch = (chunk, result)
    drain()

    for i in range(len(comparisons)):
        rec = log.done.get(i)
        if rec is None:
            continue
        ok, ok2 = judge(rule, rec["s_ab"], rec["s_ac"], comparisons[i].vote, lower_better)
        report.total += 1
        report.correct += int(ok)
        report.correct_2x += int(ok2)
        if log_every and report.total % log_every == 0:
            print_fn(f"Current total samples: {report.total}")
            print_fn(f"Total {report.total}; Correct {report.correct}; Correct 2x {report.correct_2x}")
            print_fn(f"Accuracy: {report.accuracy}%")

    log.close()
    print_fn(f"Total comparisons: {report.total}")
    print_fn(f"Total {report.total}; Correct {report.correct}; Correct 2x {report.correct_2x}")
    print_fn(f"Accuracy: {report.accuracy}%")
    if rule == STANDARD:
        print_fn(f"2x Accuracy: {report.accuracy_2x}%")
    return report


def run_2afc_ensemble(
    comparisons: Sequence[Comparison],
    adapters: Sequence,
    *,
    vote_based: bool = False,
    img_size: int = 512,
    batch: int = 16,
    out_path: str | None = None,
    print_fn=print,
    timer=None,
) -> Report:
    """The reference's 2-of-3 majority vote (/root/reference/cute_main.py:189-194), run through
    the same machinery as the single-metric path: every image of a comparison is DECODED ONCE
    (all metric-specific preprocessors run on the one decoded PIL image), all metrics of a
    batch are dispatched asynchronously (triplet-fused where the adapter supports it), and one
    batch stays in flight so host decode overlaps device compute. Per-metric JSONL logs keep
    runs resumable. ``adapters`` are MetricAdapter-like objects (score_pairs, lower_better,
    preprocess, score_triplets)."""
    from diffsim_tpu.core.image import load_image, process_image
    from diffsim_tpu.runtime.profiling import StageTimer

    timer = timer or StageTimer()
    preps = [ad.preprocess or (lambda img: process_image(img, img_size)) for ad in adapters]

    logs = [ResultLog(f"{out_path}.m{idx}" if out_path else None) for idx in range(len(adapters))]
    done = set.intersection(*(set(log.done) for log in logs)) if logs else set()
    pending = [i for i in range(len(comparisons)) if i not in done]
    chunks = [pending[i : i + batch] for i in range(0, len(pending), batch)]

    import concurrent.futures as _futures
    import os as _os

    pool = _futures.ThreadPoolExecutor(max_workers=min(32, (_os.cpu_count() or 8)))

    def decode_all(path):
        """One decode, every metric's preprocessing — (arr_m0, arr_m1, ...)."""
        img = load_image(path)
        return tuple(prep(img) for prep in preps)

    def decode(chunk):
        return [
            tuple(pool.submit(decode_all, getattr(comparisons[i], role)) for role in "abc")
            for i in chunk
        ]

    inflight = []
    ci = 0
    while ci < len(chunks) and len(inflight) < 2:
        inflight.append((chunks[ci], decode(chunks[ci])))
        ci += 1

    pending_fetch = None  # (chunk, [per-metric fetch])

    def drain():
        nonlocal pending_fetch
        if pending_fetch is None:
            return
        chunk_, fetches = pending_fetch
        pending_fetch = None
        for m, fetch in enumerate(fetches):
            with timer.stage(f"fetch.m{m}"):
                scores = fetch() if callable(fetch) else fetch
            if isinstance(scores, tuple):
                s_ab, s_ac = scores
                for j, i in enumerate(chunk_):
                    logs[m].record(i, s_ab=float(s_ab[j]), s_ac=float(s_ac[j]))
            else:
                n_ = len(chunk_)
                for j, i in enumerate(chunk_):
                    logs[m].record(i, s_ab=float(scores[j]), s_ac=float(scores[n_ + j]))

    while inflight:
        chunk, futs = inflight.pop(0)
        with timer.stage("decode"):
            arrs = [tuple(f.result() for f in triple) for triple in futs]
        if ci < len(chunks):
            inflight.append((chunks[ci], decode(chunks[ci])))
            ci += 1
        prompts = [comparisons[i].prompt for i in chunk]
        roles = [[getattr(comparisons[i], r) for i in chunk] for r in "abc"]
        pathlike = all(isinstance(p, (str, _os.PathLike)) for role in roles for p in role)
        fetches = []
        with timer.stage("dispatch"):
            for m, ad in enumerate(adapters):
                pa = np.concatenate([a[m] for a, _, _ in arrs], axis=0)
                pb = np.concatenate([b[m] for _, b, _ in arrs], axis=0)
                pc = np.concatenate([c[m] for _, _, c in arrs], axis=0)
                if getattr(ad, "score_triplet_paths", None) is not None and pathlike:
                    # device-cache path: the ensemble's shared decode already produced this
                    # metric's uint8 rows — they feed cache MISSES; repeats skip the upload
                    # and VAE encode entirely
                    fetches.append(ad.score_triplet_paths(*roles, pa, pb, pc, prompts,
                                                          blocking=False))
                elif ad.score_triplets is not None:
                    fetches.append(ad.score_triplets(pa, pb, pc, prompts, blocking=False))
                else:
                    pix_a = np.concatenate([pa, pa], axis=0)
                    pix_bc = np.concatenate([pb, pc], axis=0)
                    fetches.append(ad.score_pairs(pix_a, pix_bc, prompts * 2, blocking=False))
        drain()
        pending_fetch = (chunk, fetches)
    drain()
    pool.shutdown(wait=False)

    report = Report()
    for i, c in enumerate(comparisons):
        if any(i not in log.done for log in logs):
            continue
        votes = 0
        for log, ad in zip(logs, adapters):
            rec = log.done[i]
            b_wins = rec["s_ab"] < rec["s_ac"] if ad.lower_better else rec["s_ab"] > rec["s_ac"]
            votes += int(b_wins)
        majority_b = votes >= 2
        if vote_based:
            ok = (c.vote == 1 and majority_b) or (c.vote == 0 and not majority_b)
        else:
            ok = majority_b
        report.total += 1
        report.correct += int(ok)
    for log in logs:
        log.close()
    print_fn(f"Total {report.total}; Correct {report.correct}")
    print_fn(f"Accuracy: {report.accuracy}%")
    return report
