"""Measure the axon relay's host->device upload bandwidth right now.

The relay's bandwidth swings 12-40 MB/s session to session (CLAUDE.md); full-scale
protocol wall clocks are first-touch-upload dominated, so any cross-session wall-clock
comparison (e.g. the round-4 288 s vs round-5 472 s CUTE runs, docs/FULLBENCH_R5.md)
needs the session's bandwidth on record to separate relay variance from real
regressions. Uploads a few uint8 buffers sized like the protocol batches (24-triplet
uint8 pixel rows at 512px = 72 images x 512x512x3 = 56.6 MB) and prints MB/s.

Usage: python tools/probe_relay_bandwidth.py [--mb 56] [--reps 3]
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
    ap.add_argument("--mb", type=int, default=56, help="buffer size in MB per upload")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev}")
    n = args.mb * 1024 * 1024
    rates = []
    for i in range(args.reps):
        # fresh random bytes each rep: the relay may dedupe/compress repeated buffers
        host = np.random.default_rng(i).integers(0, 255, size=(n,), dtype=np.uint8)
        t0 = time.perf_counter()
        buf = jax.device_put(host, dev)
        # relay buffers need a derived fetch to prove arrival (CLAUDE.md timing rule)
        np.asarray(jax.device_get(buf[-1]))
        dt = time.perf_counter() - t0
        rates.append(args.mb / dt)
        print(f"rep {i}: {args.mb} MB in {dt:.2f} s = {rates[-1]:.1f} MB/s")
    rates.sort()
    print(f"median upload bandwidth: {rates[len(rates) // 2]:.1f} MB/s")


if __name__ == "__main__":
    main()
