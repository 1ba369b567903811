"""Per-stage attribution of the SDXL VAE encoder at 1024px (round-4 VERDICT item 4).

docs/PROFILE_R3.md measured the fp32 VAE encode at ~26% MFU at 1024px vs 83% at 512px and
left the 3x unattributed ("XLA's conv handling"). This times every encoder stage
separately on the chip — conv_in, each down block (per resolution), the mid block with
its single-head d=512 attention (16,384 tokens at 1024px!), and the output head — with
inputs staged in HBM (scan_timer protocol: queue K launches, fetch a scalar from the
last; see tools/profile_compute.py). Reports ms, analytic TFLOP, and % of the v5e bf16
peak (197 TFLOP/s — same denominator every committed profile uses, including for fp32
stages, so columns are comparable across docs).

Usage: python tools/profile_vae_1024.py [--img 1024] [--chunk 2] [--dtype f32|bf16]
       [--reps 6]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16 peak — the fixed denominator of every committed profile


def conv_flops(b, h, w, cin, cout, k=3):
    return 2.0 * b * h * w * cout * (k * k * cin)


def resnet_flops(b, h, w, cin, cout):
    f = conv_flops(b, h, w, cin, cout) + conv_flops(b, h, w, cout, cout)
    if cin != cout:
        f += conv_flops(b, h, w, cin, cout, k=1)
    return f


def attn_flops(b, s, c):
    proj = 4 * 2.0 * b * s * c * c  # q, k, v, out projections
    scores = 4.0 * b * s * s * c  # logits + PV
    return proj + scores


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=2, help="images per encode slice "
                    "(2 = the 1024px fp32 production chunk)")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    from diffsim_tpu.models import vae
    from tools.profile_compute import scan_timer

    cfg = vae.VAEConfig.sdxl() if args.img >= 1024 else vae.VAEConfig.sd()
    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = vae.encoder_init(jax.random.PRNGKey(0), cfg, dtype)
    params = jax.device_put(params, jax.devices()[0])

    B, S = args.chunk, args.img
    rng = np.random.default_rng(0)
    chans = cfg.block_out_channels

    rows = []

    def stage(name, fn, p_sub, x_host, flops):
        x = jax.device_put(jnp.asarray(x_host, dtype), jax.devices()[0])
        dt = scan_timer(fn, (p_sub, x), args.reps)
        rows.append((name, dt * 1e3, flops / 1e12, flops / dt / PEAK * 100))
        return np.asarray(fn(p_sub, x))  # real output feeds the next stage's input shape

    # conv_in
    x0 = rng.standard_normal((B, S, S, 3)) * 0.5
    h = stage("conv_in 3->%d @%d^2" % (chans[0], S),
              lambda p, x: vae.conv2d(p, x), params["conv_in"], x0,
              conv_flops(B, S, S, 3, chans[0]))

    # down blocks
    res = S
    cin = chans[0]
    for i, cout in enumerate(chans):
        block = params["down"][i]

        def down_fn(p, x, has_ds=("downsample" in block)):
            for rp in p["resnets"]:
                x = vae.resnet_block(rp, x)
            if has_ds:
                x = vae.downsample(p["downsample"], x, asymmetric_pad=True)
            return x

        f = sum(resnet_flops(B, res, res, cin if j == 0 else cout, cout)
                for j in range(cfg.layers_per_block))
        if "downsample" in block:
            f += conv_flops(B, res // 2, res // 2, cout, cout)
        h = stage(f"down[{i}] {cin}->{cout} @{res}^2", down_fn, block, h, f)
        cin = cout
        if "downsample" in block:
            res //= 2

    # mid: resnets vs the single-head d=512 attention, separately
    s_tok = res * res
    h = stage(f"mid.resnet1 @{res}^2",
              lambda p, x: vae.resnet_block(p, x), params["mid"]["resnet1"], h,
              resnet_flops(B, res, res, cin, cin))
    h = stage(f"mid.attn d={cin} S={s_tok}",
              lambda p, x: vae._attn_block(p, x), params["mid"]["attn"], h,
              attn_flops(B, s_tok, cin))
    h = stage(f"mid.resnet2 @{res}^2",
              lambda p, x: vae.resnet_block(p, x), params["mid"]["resnet2"], h,
              resnet_flops(B, res, res, cin, cin))

    # output head
    def head_fn(p, x):
        y = vae.conv2d(p["conv_out"], vae.silu(vae.group_norm(p["norm_out"], x, eps=1e-6)))
        return vae.conv2d(p["quant_conv"], y, padding=0)

    f_head = conv_flops(B, res, res, cin, 2 * cfg.latent_channels) + conv_flops(
        B, res, res, 2 * cfg.latent_channels, 2 * cfg.latent_channels, k=1)
    stage("head norm+conv_out+quant", head_fn,
          {k: params[k] for k in ("norm_out", "conv_out", "quant_conv")}, h, f_head)

    # full encode for cross-check
    x = jax.device_put(jnp.asarray(x0, dtype), jax.devices()[0])
    dt = scan_timer(lambda p, x: vae.encoder_apply(p, x), (params, x), args.reps)
    total_f = sum(r[2] for r in rows) * 1e12
    rows.append(("FULL encoder_apply", dt * 1e3, total_f / 1e12, total_f / dt / PEAK * 100))

    print(f"# VAE encoder per-stage @{S}px {args.dtype} chunk={B} "
          f"(ms per {B}-image slice; MXU% vs 197 TF/s bf16 peak)")
    print(f"{'stage':<34}{'ms':>9}{'TFLOP':>9}{'MXU%':>7}")
    for name, ms, tf, pct in rows:
        print(f"{name:<34}{ms:>9.1f}{tf:>9.2f}{pct:>7.1f}")


if __name__ == "__main__":
    main()
