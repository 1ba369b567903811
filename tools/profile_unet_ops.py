"""Per-op-family profile of the SD-1.5 UNet at the production bench shapes — the evidence
for WHERE the non-MXU time goes (round-3 perf directive: demonstrate the bound, don't
assert it).

Measures, with inputs staged in HBM (scan_timer semantics from tools/profile_compute.py):

  A. the full UNet returning eps (no dead code);
  B. the UNet returning ONLY the canonical up-tap (what the scorer jits — XLA prunes
     everything the tap does not depend on, i.e. up blocks 2/3 + conv_out);
  C. ditto for a down_blocks[0] tap (nearly the whole UNet should be pruned);
  D. op-family microbenches at every deployed shape, using the scorer's real param tree:
     resnet blocks, spatial transformers, and inside one transformer per level the
     attention core (sdpa) alone;

and prints a table with measured ms, a FLOPs model, and implied MXU utilization per family
(v5e bf16 peak 197 TFLOP/s). Per-pair compute model:
/root/reference/diffsim/diffsim_pipeline.py:208-221 (2 CFG-doubled UNet forwards per pair).

Usage: python tools/profile_unet_ops.py [--batch 24] [--reps 4] [--img 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12  # v5e


def scan_timer(stage, args, reps):
    """See tools/profile_compute.py — queue reps launches, fetch a scalar from the last."""
    fn = jax.jit(stage)

    def run_once():
        outs = [fn(*args) for _ in range(reps)]
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    run_once()
    t0 = time.perf_counter()
    run_once()
    return (time.perf_counter() - t0) / reps


def device_normal(shape, dtype, seed):
    """Generate test activations ON the device (relay upload of a 400 MB batch costs more
    than the whole measurement)."""
    out = jax.jit(
        lambda: (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32) * 0.3).astype(dtype),
    )()
    jax.block_until_ready(out)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24, help="triplets (x6 = CFG UNet inputs)")
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--bf16_softmax", action="store_true",
                    help="trace every graph under the fast-softmax contract (the "
                         "--bf16_softmax CLI mode) — measures how much of the hd-40 "
                         "sites' f32-VPU residual the contract trade actually recovers")
    args = ap.parse_args()

    from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15
    from diffsim_tpu.models import unet
    from diffsim_tpu.ops import blocks as B_
    from diffsim_tpu.ops.attention import fast_softmax, sdpa
    from diffsim_tpu.ops.taps import QKV, TapSpec

    if args.bf16_softmax:
        # trace-time flag: entering here puts every graph jitted below (scan_timer jits
        # lazily, tracing on first call — inside this context) on the fast contract
        ctx_mgr = fast_softmax()
        ctx_mgr.__enter__()
        print("fast-softmax contract: bf16 probabilities (the --bf16_softmax mode)")

    B = 6 * args.batch  # CFG-doubled UNet batch of the triplet graph
    lat = args.img // 8
    dtype = jnp.bfloat16
    print(f"UNet batch {B} (= {args.batch} triplets), latent {lat}x{lat}, bf16, reps={args.reps}")

    scorer = DiffSimSD15(img_size=args.img)
    p = scorer.params["unet"]
    cfg = scorer.unet_cfg
    x = device_normal((B, lat, lat, 4), dtype, 0)
    ctx = device_normal((B, 77, 768), dtype, 1)
    t_model = jnp.float32(601.0)

    results = []  # (name, ms, flops or None)

    def eps_stage(p_, x_, c_):
        out, _ = unet.apply(p_, x_, t_model, c_, cfg)
        return out

    def tap_stage(tap):
        def fn(p_, x_, c_):
            _, taps = unet.apply(p_, x_, t_model, c_, cfg, tap=tap)
            return taps["q"]

        return fn

    t_eps = scan_timer(eps_stage, (p, x, ctx), args.reps)
    t_up1 = scan_timer(tap_stage(TapSpec("up", (1, -1, -1), "attn1", QKV)), (p, x, ctx), args.reps)
    t_dn0 = scan_timer(tap_stage(TapSpec("down", (0, -1, -1), "attn1", QKV)), (p, x, ctx), args.reps)

    # ---------------- op-family inventory (SD-1.5 geometry) ----------------
    chans = cfg.block_out_channels
    n_lvl = len(chans)
    lvl_side = [lat // (2**i) for i in range(n_lvl)]

    # resnets: (cin, cout, side, param_path) with multiplicity, walked like unet.apply
    resnets = []  # (params, cin, cout, side)
    transformers = []  # (params, c, side, heads)
    for i in range(n_lvl):
        side = lvl_side[i]
        for j in range(cfg.layers_per_block):
            rp = p["down"][i]["resnets"][j]
            cin = chans[i - 1] if (i > 0 and j == 0) else chans[i]
            resnets.append((rp, cin, chans[i], side))
            if cfg.cross_attn_blocks[i]:
                transformers.append((p["down"][i]["attentions"][j], chans[i], side, cfg.heads[i]))
    mid_side = lvl_side[-1]
    resnets.append((p["mid"]["resnet1"], chans[-1], chans[-1], mid_side))
    resnets.append((p["mid"]["resnet2"], chans[-1], chans[-1], mid_side))
    mid_heads = cfg.heads[-1] if cfg.cross_attn_blocks[-1] else cfg.heads[
        max(i for i, c in enumerate(cfg.cross_attn_blocks) if c)]
    transformers.append((p["mid"]["attentions"][0], chans[-1], mid_side, mid_heads))
    skip = []
    for i in range(n_lvl):
        for j in range(cfg.layers_per_block):
            skip.append(chans[i])
        if i < n_lvl - 1:
            skip.append(chans[i])
    skip = [chans[0]] + skip
    rev = list(reversed(chans))
    cin_up = rev[0]
    pruned_resnets, pruned_transformers = [], []  # up blocks AFTER the canonical up-1 tap
    for i, cout in enumerate(rev):
        di = n_lvl - 1 - i
        side = lvl_side[di]
        for j in range(cfg.layers_per_block + 1):
            sk = skip.pop()
            rp = p["up"][i]["resnets"][j]
            entry = (rp, (cin_up if j == 0 else cout) + sk, cout, side)
            resnets.append(entry)
            if i > 1:
                pruned_resnets.append(entry)
            if cfg.cross_attn_blocks[di]:
                tentry = (p["up"][i]["attentions"][j], cout, side, cfg.heads[di])
                transformers.append(tentry)
                if i > 1:
                    pruned_transformers.append(tentry)
        cin_up = cout

    # ---------------- microbenches ----------------
    temb = device_normal((B, cfg.time_embed_dim), dtype, 2)

    def bench_family(name, entries, runner, flops_fn):
        total_ms, total_fl = 0.0, 0.0
        per_shape: dict[tuple, list] = {}
        for entry in entries:
            key = runner(entry, measure=False)
            per_shape.setdefault(key, []).append(entry)
        for key, group in per_shape.items():
            t = runner(group[0], measure=True)
            fl = flops_fn(group[0])
            total_ms += t * 1e3 * len(group)
            total_fl += fl * len(group)
            results.append((f"  {name} {key} x{len(group)}", t * 1e3 * len(group), fl * len(group)))
        results.append((f"{name} TOTAL", total_ms, total_fl))
        return total_ms

    act_cache: dict[tuple, jax.Array] = {}

    def act(shape, seed):
        if shape not in act_cache:
            act_cache[shape] = device_normal(shape, dtype, seed)
        return act_cache[shape]

    def run_resnet(entry, measure):
        rp, cin, cout, side = entry
        if not measure:
            return (cin, cout, side)
        xx = act((B, side, side, cin), hash((cin, side)) % 1000)
        return scan_timer(lambda rp_, x_, e_: B_.resnet_block(rp_, x_, e_, eps=cfg.norm_eps),
                          (rp, xx, temb), args.reps)

    def fl_resnet(entry):
        _, cin, cout, side = entry
        conv = 2 * 9 * cin * cout + 2 * 9 * cout * cout
        short = 2 * cin * cout if cin != cout else 0
        return (conv + short) * side * side * B

    def run_transformer(entry, measure):
        tp, c, side, heads = entry
        if not measure:
            return (c, side)
        xx = act((B, side, side, c), hash((c, side, "t")) % 1000)
        return scan_timer(
            lambda tp_, x_, c_: B_.spatial_transformer(tp_, x_, c_, heads=heads,
                                                       linear_proj=cfg.linear_proj)[0],
            (tp, xx, ctx), args.reps)

    def fl_transformer(entry):
        _, c, side, heads = entry
        tok = side * side
        proj = 2 * c * c * 2  # proj_in/out (1x1 conv == linear)
        attn1 = 2 * c * c * 4 + 4 * tok * c  # qkv+out projs + sdpa per token
        attn2 = 2 * c * c * 2 + 2 * 2 * c * 77 + 4 * 77 * c
        ff = 2 * c * (8 * c) + 2 * (4 * c) * c
        return (proj + attn1 + attn2 + ff) * tok * B

    def run_sdpa(entry, measure):
        c, side, heads = entry
        hd = c // heads
        tok = side * side
        if not measure:
            return (heads, tok, hd)
        q = act((B, heads, tok, hd), hash((c, side, "q")) % 1000)
        k = act((B, heads, tok, hd), hash((c, side, "k")) % 1000)
        v = act((B, heads, tok, hd), hash((c, side, "v")) % 1000)
        return scan_timer(lambda q_, k_, v_: sdpa(q_, k_, v_), (q, k, v), args.reps)

    def fl_sdpa(entry):
        c, side, heads = entry
        tok = side * side
        return 4 * B * heads * tok * tok * (c // heads)

    t_res = bench_family("resnet", resnets, run_resnet, fl_resnet)
    t_tr = bench_family("transformer", transformers, run_transformer, fl_transformer)
    sdpa_sites = sorted({(c, side, heads) for _, c, side, heads in transformers})
    sdpa_counts = {}
    for _, c, side, heads in transformers:
        sdpa_counts[(c, side, heads)] = sdpa_counts.get((c, side, heads), 0) + 1
    t_sdpa = 0.0
    for site in sdpa_sites:
        t = run_sdpa(site, measure=True)
        n = sdpa_counts[site]
        fl = fl_sdpa(site)
        t_sdpa += t * 1e3 * n
        results.append((f"  sdpa(self) h{site[2]} tok{site[1]**2} hd{site[0]//site[2]} x{n}",
                        t * 1e3 * n, fl * n))
    results.append(("sdpa(self) TOTAL", t_sdpa, None))

    # ---------------- report ----------------
    def mfu(ms, fl):
        return fl / (ms / 1e3) / PEAK_BF16 * 100 if (fl and ms) else 0.0

    print()
    print(f"{'stage':<44} {'ms':>9} {'TFLOP':>8} {'MXU%':>6}")
    fl_eps_total = sum(fl_resnet(r) for r in resnets) + sum(fl_transformer(t) for t in transformers)
    # the canonical tap graph: XLA dead-code-eliminates everything the up-1 tap does not
    # depend on (up blocks 2+, conv_out)
    fl_canonical = fl_eps_total - sum(fl_resnet(r) for r in pruned_resnets) - sum(
        fl_transformer(t) for t in pruned_transformers)
    for name, ms, fl in [
        ("A. full UNet (eps returned)", t_eps * 1e3, fl_eps_total),
        ("B. tap-only graph, up_blocks[1] (canonical)", t_up1 * 1e3, fl_canonical),
        ("C. tap-only graph, down_blocks[0]", t_dn0 * 1e3, None),
    ]:
        print(f"{name:<44} {ms:>9.1f} {(fl or 0)/1e12:>8.2f} {mfu(ms, fl):>6.1f}")
    print("--- op families (sum over deployed shapes, same batch) ---")
    for name, ms, fl in results:
        print(f"{name:<44} {ms:>9.1f} {(fl or 0)/1e12:>8.2f} {mfu(ms, fl):>6.1f}")
    print(f"{'sum resnet+transformer':<44} {t_res + t_tr:>9.1f}")
    pairs = 2 * args.batch
    print()
    print(f"per-pair: eps-graph {t_eps/pairs*1e3:.2f} ms, canonical tap graph {t_up1/pairs*1e3:.2f} ms")


if __name__ == "__main__":
    main()
