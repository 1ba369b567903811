"""On-chip validation of the K-streaming Pallas attention (ops/pallas/attention_stream.py).

Round-4 VERDICT item 2: the kernel routes in the production SDXL@1024 path (the VAE's
single-head d=512 mid attention, 16,384 tokens — /root/reference/diffsim/diffsim_xl.py:58-63
implies that site at 1024px) but had only ever executed in interpret mode on CPU. This tool
runs the real Mosaic lowering on the attached chip and reports, per sequence length:

* numerics: max |pallas - xla| on bf16 inputs, alongside the XLA path's own distance from
  an all-f32 exact reference (the noise floor the value dtype imposes), for both the
  f32-softmax contract and the bf16_probs fast mode;
* timing: kernel vs the XLA materialized-logits path, relay-safe (queued launches, scalar
  fetch from the last output — see tools/profile_compute.py:scan_timer), with effective
  TFLOP/s at 4*S^2*D flops;
* a routing recommendation: if the kernel also wins at 4,096 tokens (the 512px site,
  currently left to XLA), MIN_STREAM_SEQ should drop.

Usage: python tools/validate_stream_attention.py [--seqs 4096 8192 16384] [--d 512]
       [--reps 4] [--out docs/STREAM_KERNEL_R5.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def xla_sdpa(q, k, v, bf16_probs=False):
    """The sdpa() tail (ops/attention.py:79-92) without the Pallas routing."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    if bf16_probs:
        logits = (logits - jnp.max(logits, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    weights = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum(
        "...qk,...kd->...qd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def f32_exact(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...qd,...kd->...qk", q.astype(jnp.float32),
                        k.astype(jnp.float32), preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", weights, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


def scan_timer(fn, args, reps):
    """Relay-safe timing (CLAUDE.md): queue reps identical launches, fetch a scalar from
    the LAST output — in-order device execution makes that fetch wait for all of them."""
    jfn = jax.jit(fn)

    def run_once():
        outs = [jfn(*args) for _ in range(reps)]
        np.asarray(jax.device_get(outs[-1].ravel()[0]))

    run_once()  # compile + warm
    t0 = time.perf_counter()
    run_once()
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, nargs="+", default=[4096, 8192, 16384])
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from diffsim_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()

    from diffsim_tpu.ops.pallas.attention_stream import streaming_self_attention

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    rows = []
    for s in args.seqs:
        key = jax.random.PRNGKey(s)
        kq, kk, kv = jax.random.split(key, 3)
        shape = (args.b, 1, s, args.d)
        # the production site's activation scale: GroupNorm'd VAE features, O(1)
        q = jax.device_put(jax.random.normal(kq, shape, jnp.bfloat16), dev)
        k = jax.device_put(jax.random.normal(kk, shape, jnp.bfloat16), dev)
        v = jax.device_put(jax.random.normal(kv, shape, jnp.bfloat16), dev)

        row = {"seq": s, "d": args.d, "b": args.b,
               "flops": 4 * args.b * s * s * args.d}

        exact = np.asarray(jax.device_get(jax.jit(f32_exact)(q, k, v)))
        for mode, fast in (("f32", False), ("bf16_probs", True)):
            pal = np.asarray(jax.device_get(jax.jit(
                lambda q, k, v, fast=fast: streaming_self_attention(q, k, v, fast)
            )(q, k, v))).astype(np.float32)
            xla = np.asarray(jax.device_get(jax.jit(
                lambda q, k, v, fast=fast: xla_sdpa(q, k, v, fast)
            )(q, k, v))).astype(np.float32)
            row[f"{mode}_max_abs_pallas_vs_xla"] = float(np.abs(pal - xla).max())
            row[f"{mode}_max_abs_xla_vs_f32exact"] = float(np.abs(xla - exact).max())
            row[f"{mode}_max_abs_pallas_vs_f32exact"] = float(np.abs(pal - exact).max())

        t_pal = scan_timer(lambda q, k, v: streaming_self_attention(q, k, v),
                           (q, k, v), args.reps)
        t_xla = scan_timer(xla_sdpa, (q, k, v), args.reps)
        row["pallas_ms"] = round(t_pal * 1e3, 3)
        row["xla_ms"] = round(t_xla * 1e3, 3)
        row["pallas_tflops"] = round(row["flops"] / t_pal / 1e12, 2)
        row["xla_tflops"] = round(row["flops"] / t_xla / 1e12, 2)
        row["speedup"] = round(t_xla / t_pal, 3)
        print(json.dumps(row))
        rows.append(row)

    rec = "keep MIN_STREAM_SEQ=8192"
    r4096 = next((r for r in rows if r["seq"] == 4096), None)
    if r4096 and r4096["speedup"] > 1.05:
        rec = "LOWER MIN_STREAM_SEQ to 4096 (kernel wins there too)"
    summary = {"recommendation": rec, "rows": rows}
    print(json.dumps({"recommendation": rec}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
