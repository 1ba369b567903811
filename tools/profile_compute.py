"""Device-resident compute split of the SD-1.5 scoring graph: VAE encode vs UNet forward vs
readout, timed separately with inputs staged in HBM (no relay transport in the timed region).

Each stage queues K identical launches back-to-back and fetches a scalar from the LAST
output: the single device executes enqueued programs in order, so the fetch waits for all of
them and the ~0.5 s relay launch/fetch latency is paid once per stage, amortized over K.
(block_until_ready on relay buffers does not reliably wait for remote execution.)

Usage: python tools/profile_compute.py [--batch 24] [--img 512] [--reps 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_timer(stage, args, reps):
    """Queue `reps` identical launches back-to-back and fetch a scalar from the LAST output:
    the single device executes enqueued programs in order, so the fetch waits for all of
    them. One launch+fetch latency total, amortized over reps. (block_until_ready on relay
    buffers does not reliably wait — a device_get does.)

    ``stage(*args)``: pass params and activations as ARGUMENTS, never close over device
    arrays — closed-over arrays serialize into the HLO as literal constants, and the remote
    compile helper rejects multi-hundred-MB uploads (HTTP 413)."""
    fn = jax.jit(stage)

    def run_once():
        outs = [fn(*args) for _ in range(reps)]
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    run_once()  # compile + warm
    t0 = time.perf_counter()
    run_once()
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)  # triplets
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--no_cfg_parity", action="store_true",
                    help="Profile the documented fast mode (uncond CFG half dropped)")
    args = ap.parse_args()

    from diffsim_tpu.core import schedulers
    from diffsim_tpu.metrics import readout
    from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15
    from diffsim_tpu.models import unet, vae
    from diffsim_tpu.ops.taps import QKV, TapSpec

    T, IMG, REPS = args.batch, args.img, args.reps
    scorer = DiffSimSD15(img_size=IMG, cfg_parity=not args.no_cfg_parity)
    params = scorer.params
    h = IMG // 8
    dtype = jnp.bfloat16
    spec = schedulers.sd15_noise_spec(600)
    tap = TapSpec("up", (1, -1, -1), "attn1", QKV)
    cfg = scorer.unet_cfg

    pix = jax.device_put(
        (np.random.default_rng(0).standard_normal((3 * T, IMG, IMG, 3)) * 0.5).astype(np.float32)
    ).astype(dtype)
    jax.block_until_ready(pix)

    t_vae = scan_timer(lambda p, x: vae.encoder_apply_chunked(p["vae"], x), (params, pix), REPS)

    per_img = 2 if scorer.cfg_parity else 1  # CFG doubling
    n_in = 3 * per_img * T
    x_in = jax.device_put(
        np.random.default_rng(1).standard_normal((n_in, h, h, 4)).astype(np.float32)
    ).astype(dtype)
    ctx = jax.device_put(
        np.random.default_rng(2).standard_normal((n_in, 77, 768)).astype(np.float32)
    ).astype(dtype)
    jax.block_until_ready((x_in, ctx))

    def unet_stage(p, x, c):
        _, taps = unet.apply(p["unet"], x, jnp.float32(spec.model_t), c, cfg, tap=tap)
        return taps

    t_unet = scan_timer(unet_stage, (params, x_in, ctx), REPS)

    taps = jax.jit(unet_stage)(params, x_in, ctx)
    q = taps["q"].reshape((T, 3 * per_img) + taps["q"].shape[1:])
    k = taps["k"].reshape((T, 3 * per_img) + taps["k"].shape[1:])
    v = taps["v"].reshape((T, 3 * per_img) + taps["v"].shape[1:])
    jax.block_until_ready((q, k, v))
    sa = slice(0, per_img)
    sb = slice(per_img, 2 * per_img)
    sc = slice(2 * per_img, 3 * per_img)

    def readout_stage(q, k, v):
        s_ab = readout.cross_attention_score(
            q[:, sa], k[:, sa], v[:, sa], q[:, sb], k[:, sb], v[:, sb], "cosine"
        )
        s_ac = readout.cross_attention_score(
            q[:, sa], k[:, sa], v[:, sa], q[:, sc], k[:, sc], v[:, sc], "cosine"
        )
        return s_ab + s_ac

    t_ro = scan_timer(readout_stage, (q, k, v), REPS)

    # full fused triplet graph, one launch per rep (relay launch latency included; reps
    # queued back-to-back so it is paid once, as in bench.py's async windows)
    body = scorer._triplet_fn(tap, "cosine")
    pa, pb, pc = (pix[i * T:(i + 1) * T] for i in range(3))
    embeds_u, pidx = scorer._embeds_and_idx(["The photo of a benchmark"] * T)
    sab, key2 = scorer._noise_consts(600, 2334)
    eu, pi = jnp.asarray(embeds_u), jnp.asarray(pidx)
    out = body(params, pa, pb, pc, eu, pi, sab, key2)
    np.asarray(jax.device_get(out))
    t0 = time.perf_counter()
    outs = [body(params, pa, pb, pc, eu, pi, sab, key2) for _ in range(REPS)]
    np.asarray(jax.device_get(outs[-1]))
    t_full = (time.perf_counter() - t0) / REPS

    pairs = 2 * T
    mode = "CFG-parity" if scorer.cfg_parity else "fast (no CFG half)"
    print(f"batch={T} triplets ({3*T} images, {n_in} UNet fwds, {pairs} pairs, {mode}), reps={REPS}")
    print(f"vae_encode : {t_vae*1e3:8.1f} ms  ({t_vae/pairs*1e3:6.2f} ms/pair)")
    print(f"unet_fwd   : {t_unet*1e3:8.1f} ms  ({t_unet/pairs*1e3:6.2f} ms/pair)")
    print(f"readout    : {t_ro*1e3:8.1f} ms  ({t_ro/pairs*1e3:6.2f} ms/pair)")
    print(f"full_graph : {t_full*1e3:8.1f} ms  ({t_full/pairs*1e3:6.2f} ms/pair)")
    print(f"sum(parts) : {(t_vae+t_unet+t_ro)*1e3:8.1f} ms")
    print(f"compute-bound pairs/s: {pairs/t_full:.1f}")


if __name__ == "__main__":
    main()
