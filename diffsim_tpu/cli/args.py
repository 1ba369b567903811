"""CLI argument surface — the reference's argprocess flags (/root/reference/argprocess.py:3-20)
plus framework extensions (batching, mesh, weights, resume)."""

from __future__ import annotations

import argparse
import sys

# The reference's blessed per-benchmark hyperparameters, verbatim from its launcher scripts
# (/root/reference/cute_main.sh:3, night_main.sh:3, style_main.sh:4,7, tid_main.sh:3,
# ipref_main.sh:4, dreambench_main.sh:3). ``--preset X`` expands to these flags; any flag the
# user passes explicitly wins (presets are prepended, argparse keeps the last occurrence).
PRESETS = {
    "cute": "--image_size 512 --target_block up_blocks --target_layer 0 --target_step 600"
            " --similarity cosine --seed 2334 --metric diffsim",
    "nights": "--image_size 512 --target_block up_blocks --target_layer 0 --target_step 500"
              " --similarity cosine --seed 2334 --metric diffsim",
    "sref": "--target_block up_blocks --target_layer 0 --target_step 900"
            " --similarity cosine --seed 2334 --metric diffsim",
    "instantstyle": "--target_block up_blocks --target_layer 0 --target_step 900"
                    " --similarity cosine --seed 2334 --metric diffsim",
    "tid": "--target_block up_blocks --target_layer 0 --target_step 900"
           " --similarity cosine --seed 2334 --metric diffsim",
    "ipref": "--target_block up_blocks --target_layer 5 --target_step 750"
             " --similarity cosine --seed 2334 --metric diffsim",
    "dreambench": "--target_block up_blocks --target_layer 0 --target_step 750"
                  " --similarity cosine --seed 2334 --metric diffsim",
}


def expand_preset(argv):
    """Replace ``--preset NAME`` with the canonical reference flag set (prepended, so explicit
    flags in argv override the preset's values)."""
    argv = list(argv)
    if "--preset" not in argv:
        return argv
    i = argv.index("--preset")
    try:
        name = argv[i + 1]
    except IndexError:
        raise SystemExit("--preset requires a name: " + "|".join(sorted(PRESETS)))
    if name not in PRESETS:
        raise SystemExit(f"unknown preset {name!r}; choose from {'|'.join(sorted(PRESETS))}")
    del argv[i:i + 2]
    return PRESETS[name].split() + argv


def arg_parse(argv=None):
    argv = expand_preset(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description="diffsim-tpu benchmark driver")
    parser.add_argument("--preset", type=str, choices=sorted(PRESETS), default=None,
                        help="Expand the reference's blessed flag set for a benchmark "
                             "(consumed before parsing; explicit flags override)")
    # --- reference-compatible surface ---
    parser.add_argument("--image_path", type=str, help="Path to image folder")
    parser.add_argument("--original_path", type=str, default=None, help="Path to original images for ipref")
    parser.add_argument("--out_path", type=str, default=None, help="Output folder / results JSONL path")
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--target_block", type=str, choices=["down_blocks", "mid_blocks", "up_blocks"], default="up_blocks")
    parser.add_argument("--target_layer", type=int, default=[2], nargs="+",
                        help="Target layer index; 3 numbers (block, attention, transformer) for SDXL")
    parser.add_argument("--target_step", type=int, default=100)
    parser.add_argument("--metric", type=str, default="diffsim",
                        choices=["diffsim", "diffsim_xl", "clip_i", "clip_cross", "dino", "dinov1",
                                 "dino_cross", "cute", "lpips", "gram", "diffeats", "clipfeats",
                                 "dinofeats", "ensemble", "dit"])
    parser.add_argument("--similarity", type=str, choices=["cosine", "mse"], default="mse")
    parser.add_argument("--prompt", type=str, default="High quality image")
    parser.add_argument("--ip_adapter", action="store_true")
    parser.add_argument("--use_mask", action="store_true",
                        help="Weight tapped queries by foreground masks (the reference's SAM "
                             "path, metrics/diffeats.py:75-87). Masks come from --mask_path "
                             "when given, else are generated at score time: U^2-Net saliency "
                             "with --matting_weights, border-statistics heuristic otherwise.")
    parser.add_argument("--mask_path", type=str, default=None,
                        help="Root of a directory tree mirroring --image_path with one "
                             "grayscale mask image per input image (same relative path; .png "
                             "fallback). Without it, --use_mask generates masks with the "
                             "matting nets this build ships (SAM is torch-only; documented "
                             "divergence).")
    parser.add_argument("--use_text_attn", action="store_true",
                        help="Tap the TEXT cross-attention (attn2) Q/K/V instead of the "
                             "self-attention, same 4xSDPA readout (the reference declares "
                             "this flag but never implements it; here it works)")
    parser.add_argument("--seed", type=int, default=2333)
    # --- framework extensions ---
    parser.add_argument("--batch_size", type=int, default=16, help="Comparisons per device batch")
    parser.add_argument("--weights", type=str, default=None, help="Converted checkpoint (.npz) path")
    parser.add_argument("--ip_weights", type=str, default=None,
                        help="Converted IP-Adapter .npz (cli.convert output of convert_ip_adapter)")
    parser.add_argument("--matting_weights", type=str, default=None,
                        help="Converted U^2-Net .npz (cli.convert u2net) for model-based "
                             "matting in --metric cute and for --use_mask mask generation; "
                             "heuristic matting otherwise")
    parser.add_argument("--sam_weights", type=str, default=None,
                        help="Converted SAM .npz (cli.convert sam): --use_mask generates "
                             "masks with a center-point SAM prompt (the reference's declared "
                             "mask source, argprocess.py:16) — takes precedence over "
                             "--matting_weights")
    parser.add_argument("--tokenizer_dir", type=str, default=None, help="Dir with vocab.json + merges.txt")
    parser.add_argument("--allow_hash_tokenizer", action="store_true",
                        help="Permit --weights without --tokenizer_dir for the prompt-encoding "
                             "metrics (hash-tokenized prompts make converted-weight scores "
                             "meaningless; only for throughput runs)")
    parser.add_argument("--results", type=str, default=None, help="JSONL results path (enables resume)")
    parser.add_argument("--no_cfg_parity", dest="cfg_parity", action="store_false",
                        help="Drop the CFG uncond half (2x faster, not score-parity with torch)")
    parser.add_argument("--fast_decode", action="store_true",
                        help="Fast mode (host side): decode large JPEGs in the DCT domain "
                             "at >= image_size per side before the lanczos resize (3-8x "
                             "faster decode on 1-core hosts; miss-dominated protocols like "
                             "NIGHTS are decode-bound there). Pixels differ slightly from "
                             "the reference's full-resolution decode — NOT score-parity")
    parser.add_argument("--bf16_softmax", action="store_true",
                        help="Fast mode: UNet attention softmax probabilities in bfloat16 "
                             "(halves the VPU traffic over the 4096-token score tiles). "
                             "NOT bit-parity with torch's f32 softmax; ranking agreement "
                             "is benched in BENCH_FAST.json. Combine with --no_cfg_parity "
                             "for the fastest documented configuration")
    parser.add_argument("--xl_vae_bf16", action="store_true",
                        help="SDXL: encode with a bf16 VAE instead of the reference's fp32 "
                             "(its fp16-overflow rationale doesn't exist in bf16). Halves "
                             "VAE HBM footprint; ~4%% faster at 1024px (the encode there is "
                             "resolution-bound, not precision-bound). Not bit-parity with "
                             "torch")
    parser.add_argument("--no_device_cache", dest="device_cache", action="store_false",
                        help="Disable the device-resident per-image feature cache (diffsim "
                             "triplet path): every score call re-uploads and re-encodes its "
                             "pixels, like the reference does "
                             "(/root/reference/diffsim/diffsim.py:103-106)")
    parser.add_argument("--moment_cache_mb", type=float, default=None,
                        help="HBM budget for the device-resident feature cache (default 512; "
                             "~64 KB/image at 512px holds ~8000 unique images)")
    parser.add_argument("--num_devices", type=int, default=None, help="Limit mesh size")
    parser.add_argument("--shard", type=str, default=None, metavar="I/N",
                        help="Run only comparison slice I of N (e.g. 0/4): benchmarks are "
                             "embarrassingly parallel over comparisons, so N hosts each run "
                             "their shard against their own chips and the per-shard JSONL "
                             "results (--results r.jsonl becomes r.jsonl.sI-N) merge by "
                             "concatenation")
    parser.add_argument("--model_scale", type=str, choices=["full", "tiny"], default="full",
                        help="'tiny' uses toy model configs (CPU smoke tests / CI)")
    parser.add_argument("--profile", action="store_true", help="Print a per-stage time breakdown")
    parser.add_argument("--profile_trace", type=str, default=None,
                        help="Directory for a jax.profiler XLA trace of the run")
    return parser.parse_args(argv)
