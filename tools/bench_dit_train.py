"""DiT training throughput on the attached TPU — the reference's only training workload
(/root/reference/DiT/train.py; its README quotes fast-DiT at 0.84 steps/s for DiT-XL/2@256
on one A100, /root/reference/DiT/README.md:119).

Times the full production train step (in-graph frozen-VAE encode -> q_sample ->
DiT forward/backward -> AdamW -> in-step EMA) with --bf16 --remat, per-chip batch
--batch. Steps are queued back-to-back and a scalar fetched from the last metrics
(scan_timer semantics — the relay's block_until_ready is unreliable).

Usage: python tools/bench_dit_train.py [--batch 32] [--image_size 256] [--steps 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--model", type=str, default="DiT-XL/2")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--no_remat", action="store_true")
    args = ap.parse_args()

    from diffsim_tpu.train.dit_trainer import DiTTrainer, TrainConfig

    cfg = TrainConfig(
        image_size=args.image_size, model=args.model, global_batch=args.batch,
        remat=not args.no_remat, compute_dtype=None if args.no_bf16 else "bfloat16",
    )
    trainer = DiTTrainer(cfg)
    rng = np.random.default_rng(0)
    pixels = rng.integers(0, 256, (args.batch, args.image_size, args.image_size, 3),
                          dtype=np.uint8)
    labels = rng.integers(0, 1000, args.batch).astype(np.int32)
    key = jax.random.PRNGKey(0)

    def run(n):
        m = None
        for _ in range(n):
            m = trainer.train_step(pixels, labels, key)
        # in-order device execution: fetching the last loss waits for all queued steps
        return float(m["loss"])

    run(2)  # compile + warm
    t0 = time.perf_counter()
    run(args.steps)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"{args.model}@{args.image_size} batch={args.batch} "
          f"bf16={not args.no_bf16} remat={not args.no_remat}: "
          f"{dt*1e3:.0f} ms/step = {1/dt:.2f} steps/s = "
          f"{args.batch/dt:.1f} images/s per chip")


if __name__ == "__main__":
    main()
