"""Microbench just the UNet self-attention sites on the attached TPU — the fast inner loop
for pallas-kernel tuning (the full profile is tools/profile_unet_ops.py).

Usage: python tools/profile_sdpa.py [--batch 144] [--reps 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12

SITES = [  # (heads, tokens, head_dim, count-in-full-unet)
    (8, 4096, 40, 5),
    (8, 1024, 80, 5),
    (8, 256, 160, 5),
    (8, 64, 160, 1),
]


def scan_timer(fn, args, reps):
    jfn = jax.jit(fn)

    def run_once():
        outs = [jfn(*args) for _ in range(reps)]
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[0]))

    run_once()
    t0 = time.perf_counter()
    run_once()
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=144)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from diffsim_tpu.ops.attention import sdpa

    B = args.batch
    print(f"B={B} bf16; MXU ceiling for hd D is ~min(D,128)/128 of peak on both matmuls")
    print(f"{'site':<28} {'ms':>8} {'TFLOP':>7} {'MXU%':>6} {'hd-ceiling%':>12}")
    for heads, tok, hd, count in SITES:
        mk = lambda seed: jax.jit(
            lambda: (jax.random.normal(jax.random.PRNGKey(seed), (B, heads, tok, hd),
                                       jnp.float32) * 0.3).astype(jnp.bfloat16))()
        q, k, v = mk(0), mk(1), mk(2)
        jax.block_until_ready((q, k, v))
        t = scan_timer(lambda a, b_, c: sdpa(a, b_, c), (q, k, v), args.reps)
        fl = 4 * B * heads * tok * tok * hd
        mxu = fl / t / PEAK_BF16 * 100
        ceil = min(hd, 128) / 128 * 100
        print(f"h{heads} tok{tok:<5} hd{hd:<4} x{count:<3} {t*1e3:>8.2f} {fl/1e12:>7.2f} "
              f"{mxu:>6.1f} {mxu/ceil*100:>11.1f}%")


if __name__ == "__main__":
    main()
