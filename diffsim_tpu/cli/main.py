"""Unified benchmark CLI: ``python -m diffsim_tpu.cli.main <benchmark> [argprocess flags]``.

One executable covering the reference's six driver scripts (cute_main.py, style_main.py,
night_main.py, tid_main.py, ipref_main.py, dreambench_main.py) with the same flags, decision
arithmetic, and printout shape — batched and sharded instead of pair-at-a-time.
"""

from __future__ import annotations

import sys

from diffsim_tpu.cli.args import arg_parse
from diffsim_tpu.core.image import ImageLoader
from diffsim_tpu.data import benchmarks
from diffsim_tpu.metrics.registry import build_metric
from diffsim_tpu.runtime import runner

BENCHMARKS = {
    # name -> (planner(args) -> comparisons, decision rule)
    "cute": (lambda a: benchmarks.cute(a.image_path, a.seed), runner.STANDARD),
    "style": (lambda a: benchmarks.style(a.image_path, a.seed, a.prompt), runner.STANDARD),
    "sref": (lambda a: benchmarks.style(a.image_path, a.seed, a.prompt), runner.STANDARD),
    "instantstyle": (lambda a: benchmarks.style(a.image_path, a.seed, a.prompt), runner.STANDARD),
    "night": (lambda a: benchmarks.nights(a.image_path, a.seed), runner.VOTE),
    "nights": (lambda a: benchmarks.nights(a.image_path, a.seed), runner.VOTE),
    "tid": (lambda a: benchmarks.tid2013(a.image_path, a.seed), runner.ALWAYS_GREATER),
    "ipref": (lambda a: benchmarks.ipref(a.image_path, a.original_path, a.seed), runner.STANDARD),
    "dreambench": (lambda a: benchmarks.dreambench(a.image_path, a.seed, a.prompt), runner.VOTE_GREATER),
}


def enable_compile_cache():
    """Persistent XLA compilation cache shared by every entry point — see
    runtime/compile_cache.py for the fragmentation rationale."""
    from diffsim_tpu.runtime.compile_cache import enable_compile_cache as _enable

    _enable()


def make_mesh_or_none(num_devices=None):
    import jax

    from diffsim_tpu.parallel import mesh as meshlib

    n = len(jax.devices()) if num_devices is None else num_devices
    return meshlib.make_mesh(num_devices) if n > 1 else None


def run_benchmark(benchmark: str, argv=None) -> runner.Report:
    enable_compile_cache()
    args = arg_parse(argv)
    planner, rule = BENCHMARKS[benchmark]
    comparisons = planner(args)
    if args.shard:
        # multi-host scoring: host i runs comparisons i, i+N, i+2N, ... — the full plan is
        # deterministic on every host (seeded planners), so shards are disjoint and complete
        i, n = (int(x) for x in args.shard.split("/"))
        assert 0 <= i < n, args.shard
        comparisons = comparisons[i::n]
        if args.results:
            args.results = f"{args.results}.s{i}-{n}"
        print(f"shard {i}/{n}: {len(comparisons)} comparisons")
    print(f"=========seed {args.seed}=========")
    print(f"Experiment on {args.target_block}, layer {args.target_layer}, timestep {args.target_step}:")

    mesh = make_mesh_or_none(args.num_devices)

    if args.metric == "ensemble":
        adapters = [build_metric(_clone_args(args, metric=m), mesh)
                    for m in ("diffsim", "clip_i", "dino")]
        return runner.run_2afc_ensemble(
            comparisons, adapters, vote_based=rule in (runner.VOTE, runner.VOTE_GREATER),
            img_size=args.image_size, batch=args.batch_size, out_path=args.results,
        )

    adapter = build_metric(args, mesh)
    loader = ImageLoader(args.image_size, preprocess=adapter.preprocess,
                         fast_decode=getattr(args, 'fast_decode', False))
    lower = adapter.lower_better or args.metric == "lpips"

    mask_fn = None
    if args.use_mask and adapter.wants_masks:
        size = args.image_size
        if args.mask_path:
            # precomputed masks from a mirrored directory tree
            from diffsim_tpu.core.image import load_mask, mask_path_for

            def mask_fn(path):
                return load_mask(mask_path_for(path, args.image_path, args.mask_path), size)
        else:
            # score-time mask generation (the reference's --use_mask help describes SAM-CLIP
            # segmentation at score time, /root/reference/argprocess.py:16): SAM center-point
            # prompt with --sam_weights, U^2-Net saliency with --matting_weights,
            # border-statistics heuristic otherwise
            from diffsim_tpu.core.image import mask_from_matting
            from diffsim_tpu.metrics.ffa import U2NetMatting, heuristic_matting
            from diffsim_tpu.metrics.registry import _load_params

            if args.sam_weights:
                from diffsim_tpu.metrics.sam_masking import SamMasking

                matting = SamMasking(_load_params(args.sam_weights))
                print("[use_mask] generating masks with SAM (center-point prompt)")
            elif args.matting_weights:
                matting = U2NetMatting(_load_params(args.matting_weights))
                print("[use_mask] generating masks with U^2-Net saliency")
            else:
                matting = heuristic_matting
                print("[use_mask] generating masks with the border-statistics heuristic "
                      "(pass --sam_weights/--matting_weights or --mask_path for "
                      "model-quality masks)")

            def mask_fn(path):
                return mask_from_matting(matting, path, size)
    elif args.use_mask:
        print(f"[warn] --use_mask has no effect for --metric {args.metric}")

    from diffsim_tpu.runtime.profiling import StageTimer, trace
    import contextlib

    timer = StageTimer() if args.profile else None
    ctx = trace(args.profile_trace) if args.profile_trace else contextlib.nullcontext()
    with ctx:
        report = runner.run_2afc(
            comparisons,
            adapter.score_pairs,
            score_triplets=adapter.score_triplets,
            score_triplet_paths=adapter.score_triplet_paths,
            prewarm=adapter.prewarm,
            rule=rule,
            lower_better=lower,
            img_size=args.image_size,
            batch=args.batch_size,
            out_path=args.results,
            loader=loader,
            timer=timer,
            mask_fn=mask_fn,
        )
    if timer is not None:
        timer.report()
    return report


def _clone_args(args, **overrides):
    import copy

    new = copy.copy(args)
    for k, v in overrides.items():
        setattr(new, k, v)
    return new


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in BENCHMARKS:
        print(f"usage: python -m diffsim_tpu.cli.main <{'|'.join(sorted(set(BENCHMARKS)))}> [flags]")
        raise SystemExit(2)
    run_benchmark(sys.argv[1], sys.argv[2:])


if __name__ == "__main__":
    main()
