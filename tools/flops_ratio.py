"""Measure FLOPs/pair of the three scoring backbones from their COMPILED graphs.

Purpose (round-4 VERDICT item 6): `bench_backbones.py` compared SDXL@1024 and DiT@512
throughput against the 2.2 pairs/s anchor derived from the reference's SD-1.5 wall time
(/root/reference/README.md:91), which understates the heavier backbones — the reference
itself would run SDXL@1024 several times slower than SD-1.5@512. The honest per-backbone
anchor is 2.2 / (FLOPs ratio vs SD-1.5@512), assuming the reference GPU sustains similar
MFU across backbones.

The ratios come from XLA's own POST-OPTIMIZATION cost analysis of the production triplet
scoring graphs (so tap-graph dead-code elimination — the post-tap layers XLA prunes — is
accounted), compiled on the CPU backend at full model scale with one triplet (= 2 pairs),
canonical config per backbone (the BASELINE.md workloads).

Usage: python tools/flops_ratio.py    (CPU; several minutes — the 1024px XL graph compile
dominates; prints one JSON line, committed numbers land in bench_backbones.py)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")

import tests.conftest  # noqa: F401  (forces the CPU backend under the axon sitecustomize)

import jax
import jax.numpy as jnp
import numpy as np


def _compiled_flops(lowered) -> float:
    return float(lowered.compile().cost_analysis()["flops"])


def sd15_flops_per_pair() -> float:
    from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15, sd15_tap

    sc = DiffSimSD15(img_size=512, dtype=jnp.bfloat16)
    tap = sd15_tap("up_blocks", 0)
    fn = sc._triplet_fn(tap, "cosine")
    pix = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.uint8)
    embeds_u, pidx = sc._embeds_and_idx(["The photo of a benchmark"])
    sab, key = sc._noise_consts(600, 2334)
    lowered = fn.lower(sc.params, pix, pix, pix, embeds_u, pidx, sab, key)
    return _compiled_flops(lowered) / 2


def xl_flops_per_pair() -> float:
    from diffsim_tpu.metrics.diffsim_xl import DiffSimXL

    from diffsim_tpu.core import schedulers
    from diffsim_tpu.metrics.diffsim_xl import sdxl_tap

    sc = DiffSimXL(img_size=1024)
    fn = sc._triplet_fn(sdxl_tap("up_blocks", (0, 1, 1)), "cosine")
    pix = jax.ShapeDtypeStruct((1, 3, 1024, 1024, 3), jnp.uint8)
    hid = sc.text_cfg.hidden + sc.text2_cfg.hidden
    embeds = jax.ShapeDtypeStruct((1, 2, 77, hid), sc.dtype)
    pooled = jax.ShapeDtypeStruct((1, 2, sc.text2_cfg.hidden), sc.dtype)
    spec = schedulers.sdxl_noise_spec(900)
    sab = (jnp.float32(spec.model_t), jnp.float32(spec.a), jnp.float32(spec.b))
    lowered = fn.lower(sc.params, pix, embeds, pooled, sab, jax.random.PRNGKey(2334))
    return _compiled_flops(lowered) / 2


def dit_flops_per_pair() -> float:
    from diffsim_tpu.metrics.diffsim_dit import DiffSimDiT

    from diffsim_tpu.core import schedulers
    from diffsim_tpu.ops.taps import QKV, TapSpec

    sc = DiffSimDiT(img_size=512)
    tap = TapSpec("blocks", (sc._resolve_layer(13),), "attn1", QKV)
    fn = sc._triplet_fn(tap, "cosine")
    pix = jax.ShapeDtypeStruct((1, 3, 512, 512, 3), jnp.uint8)
    spec = schedulers.dit_noise_spec(600)
    sab = (jnp.float32(spec.model_t), jnp.float32(spec.a), jnp.float32(spec.b))
    lowered = fn.lower(sc.params, pix, sab, jax.random.PRNGKey(2334))
    return _compiled_flops(lowered) / 2


def main():
    sd = sd15_flops_per_pair()
    print(f"# sd15@512: {sd / 1e12:.3f} TFLOP/pair", file=sys.stderr)
    dit = dit_flops_per_pair()
    print(f"# dit@512: {dit / 1e12:.3f} TFLOP/pair", file=sys.stderr)
    xl = xl_flops_per_pair()
    print(f"# sdxl@1024: {xl / 1e12:.3f} TFLOP/pair", file=sys.stderr)
    print(json.dumps({
        "sd15_512_tflop_per_pair": round(sd / 1e12, 3),
        "sdxl_1024_tflop_per_pair": round(xl / 1e12, 3),
        "dit_512_tflop_per_pair": round(dit / 1e12, 3),
        "xl_over_sd15": round(xl / sd, 3),
        "dit_over_sd15": round(dit / sd, 3),
    }))


if __name__ == "__main__":
    main()
