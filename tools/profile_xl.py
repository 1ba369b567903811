"""Device-resident stage split of the SDXL@1024 scoring graph (BASELINE config 4): fp32 VAE
encode vs CFG-doubled UNet forward vs full fused triplet graph — the evidence companion to
bench_backbones.py's end-to-end number (same scan_timer semantics as tools/profile_compute.py).

Usage: python tools/profile_xl.py [--batch 2] [--img 1024] [--reps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_compute import scan_timer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)  # triplets
    ap.add_argument("--img", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--bf16_vae", action="store_true",
                    help="Profile the --xl_vae_bf16 mode (bf16 VAE encode)")
    args = ap.parse_args()

    from diffsim_tpu.core import schedulers
    from diffsim_tpu.metrics.diffsim_xl import DiffSimXL, sdxl_tap
    from diffsim_tpu.models import unet, vae

    T, IMG, REPS = args.batch, args.img, args.reps
    scorer = DiffSimXL(img_size=IMG, vae_fp32=not args.bf16_vae)
    params = scorer.params
    h = IMG // 8
    spec = schedulers.sdxl_noise_spec(900)
    tap = sdxl_tap("up_blocks", (0, 1, 1))
    cfg = scorer.unet_cfg

    def dev_normal(shape, dtype, seed):
        out = jax.jit(lambda: (jax.random.normal(jax.random.PRNGKey(seed), shape,
                                                 jnp.float32) * 0.3).astype(dtype))()
        jax.block_until_ready(out)
        return out

    pix = dev_normal((3 * T, IMG, IMG, 3), scorer._enc_dtype, 0)
    t_vae = scan_timer(lambda p, x: vae.encoder_apply_chunked(p["vae"], x), (params, pix), REPS)

    n_in = 6 * T
    x_in = dev_normal((n_in, h, h, 4), jnp.bfloat16, 1)
    ctx = dev_normal((n_in, 77, 2048), jnp.bfloat16, 2)
    pool = dev_normal((n_in, scorer.text2_cfg.projection_dim), jnp.bfloat16, 3)
    tids = jnp.tile(jnp.asarray(scorer.default_time_ids())[None], (n_in, 1))
    jax.block_until_ready(tids)

    def unet_stage(p, x, c, pl_, ti):
        added = {"text_embeds": pl_, "time_ids": ti}
        _, taps = unet.apply(p["unet"], x, jnp.float32(spec.model_t), c, cfg,
                             tap=tap, added_cond=added)
        return taps

    t_unet = scan_timer(unet_stage, (params, x_in, ctx, pool, tids), REPS)

    # full fused triplet graph (one launch per rep, queued)
    fn = scorer._triplet_fn(tap, "cosine")
    pix_u8 = np.random.default_rng(0).integers(0, 256, (T, 3, IMG, IMG, 3), dtype=np.uint8)
    enc = scorer.encode_prompt("The photo of a benchmark")
    embeds = np.stack([enc[0]] * T)
    pooled = np.stack([enc[1]] * T)
    sab = (jnp.float32(spec.model_t), jnp.float32(spec.a), jnp.float32(spec.b))
    key = jax.random.PRNGKey(2334)
    jpix = jnp.asarray(pix_u8)
    out = fn(params, jpix, embeds, pooled, sab, key)
    np.asarray(jax.device_get(out))
    t0 = time.perf_counter()
    outs = [fn(params, jpix, embeds, pooled, sab, key) for _ in range(REPS)]
    np.asarray(jax.device_get(outs[-1]))
    t_full = (time.perf_counter() - t0) / REPS

    pairs = 2 * T
    print(f"batch={T} triplets ({3*T} images @ {IMG}px, {n_in} CFG UNet fwds, {pairs} pairs), reps={REPS}")
    print(f"vae_encode(fp32) : {t_vae*1e3:8.1f} ms  ({t_vae/pairs*1e3:7.2f} ms/pair)")
    print(f"unet_fwd (tap)   : {t_unet*1e3:8.1f} ms  ({t_unet/pairs*1e3:7.2f} ms/pair)")
    print(f"full_graph       : {t_full*1e3:8.1f} ms  ({t_full/pairs*1e3:7.2f} ms/pair)")
    print(f"compute-bound pairs/s: {pairs/t_full:.2f}")


if __name__ == "__main__":
    main()
