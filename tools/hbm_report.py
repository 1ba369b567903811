"""Compare the HBM guard's analytic estimate with XLA's own memory analysis.

AOT-compiles the SD-1.5 fresh-triplet scoring graph at the requested (T, img_size) and
prints ``compiled.memory_analysis()`` (temp/argument/output allocation bytes) next to
``runtime.hbm_guard``'s pre-flight estimate. Run ON THE TPU BACKEND to recalibrate
``PER_TRIPLET_BYTES_512`` with real numbers (the round-4 calibration point is a single
OOM report); ``--cpu`` runs the same analysis on the CPU backend (layouts differ — use
only for shape-trend sanity, not absolute calibration).

Usage: python tools/hbm_report.py [--t 24] [--img 512] [--cpu]
The guard is bypassed here on purpose (we are measuring, not dispatching), by lowering
the graph directly — the same approach as tools/flops_ratio.py.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=24, help="triplets in the graph")
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import tests.conftest  # noqa: F401  (forces the CPU backend)

    import jax
    import jax.numpy as jnp

    from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15, sd15_tap
    from diffsim_tpu.runtime import hbm_guard

    sc = DiffSimSD15(img_size=args.img, dtype=jnp.bfloat16)
    fn = sc._triplet_fn(sd15_tap("up_blocks", 0), "cosine")
    pix = jax.ShapeDtypeStruct((args.t, args.img, args.img, 3), jnp.uint8)
    embeds_u, pidx_one = sc._embeds_and_idx(["The photo of a benchmark"])
    pidx = jnp.zeros((args.t,), jnp.int32)
    sab, key = sc._noise_consts(600, 2334)
    compiled = fn.lower(sc.params, pix, pix, pix, embeds_u, pidx, sab, key).compile()
    mem = compiled.memory_analysis()

    est = hbm_guard.scorer_static_bytes(sc) + args.t * hbm_guard.per_triplet_bytes(
        args.img, sc.hbm_scale)
    row = {
        "backend": jax.default_backend(),
        "t": args.t,
        "img": args.img,
        "xla_temp_gb": round(getattr(mem, "temp_size_in_bytes", 0) / 1e9, 3),
        "xla_argument_gb": round(getattr(mem, "argument_size_in_bytes", 0) / 1e9, 3),
        "xla_output_gb": round(getattr(mem, "output_size_in_bytes", 0) / 1e9, 3),
        "xla_alias_gb": round(getattr(mem, "alias_size_in_bytes", 0) / 1e9, 3),
        "guard_estimate_gb": round(est / 1e9, 3),
        "guard_budget_gb": round(hbm_guard.budget_bytes() / 1e9, 3),
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
