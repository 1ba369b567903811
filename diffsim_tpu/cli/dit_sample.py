"""DiT sampling CLI — covers both reference entry points: single-grid sampling
(/root/reference/DiT/sample.py) and mass FID sampling packed to .npz for the ADM eval suite
(/root/reference/DiT/sample_ddp.py). SPMD: the sample batch shards over the mesh, no
per-rank interleaving needed.

    python -m diffsim_tpu.cli.dit_sample --ckpt dit.npz --vae_weights sd15.npz \
        --image_size 256 --cfg_scale 4.0 --out sample.png
    python -m diffsim_tpu.cli.dit_sample --ckpt dit.npz ... --num_fid_samples 50000 \
        --per_batch 64 --out samples.npz
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from diffsim_tpu.models import dit
from diffsim_tpu.parallel import mesh as meshlib
from diffsim_tpu.train.dit_trainer import DiTTrainer, TrainConfig


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help=".npz with a 'dit' tree (cli.convert dit) or an orbax dir")
    ap.add_argument("--vae_weights", default=None, help=".npz with 'vae'/'vae_decoder' trees")
    ap.add_argument("--model", default="DiT-XL/2", choices=list(dit.MODELS))
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--num_classes", type=int, default=1000)
    ap.add_argument("--cfg_scale", type=float, default=4.0)
    ap.add_argument("--num_sampling_steps", type=int, default=250)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--class_labels", type=int, nargs="+",
                    default=[207, 360, 387, 974, 88, 979, 417, 279])
    ap.add_argument("--num_fid_samples", type=int, default=None)
    ap.add_argument("--per_batch", type=int, default=32)
    ap.add_argument("--ddim", action="store_true")
    ap.add_argument("--model_scale", choices=["full", "tiny"], default="full")
    ap.add_argument("--out", default="sample.png")
    args = ap.parse_args(argv)

    mesh = meshlib.make_mesh() if len(jax.devices()) > 1 else None
    cfg = TrainConfig(image_size=args.image_size, model=args.model)
    dit_cfg = None
    vae_cfg = None
    if args.model_scale == "tiny":
        from diffsim_tpu.models import vae as vae_mod

        dit_cfg = dit.DiTConfig.tiny(input_size=args.image_size // 2, learn_sigma=True,
                                     num_classes=args.num_classes)
        vae_cfg = vae_mod.VAEConfig.tiny()
    trainer = DiTTrainer(cfg, mesh=mesh, dit_cfg=dit_cfg, vae_cfg=vae_cfg)

    decoder = None
    if args.ckpt:
        if args.ckpt.endswith(".npz"):
            from diffsim_tpu.convert import load_params

            tree = load_params(args.ckpt)
            trainer.state["params"] = trainer._place_tree(tree["dit"])
            trainer.state["ema"] = trainer.state["params"]
            if "vae_decoder" in tree:
                decoder = trainer._place_tree(tree["vae_decoder"])
        else:
            trainer.restore(args.ckpt)
    if decoder is None and args.vae_weights:
        from diffsim_tpu.convert import load_params

        decoder = trainer._place_tree(load_params(args.vae_weights)["vae_decoder"])

    key = jax.random.PRNGKey(args.seed)
    if args.num_fid_samples:
        # mass sampling: random classes, chunked batches, packed (N, H, W, 3) uint8 .npz —
        # the ADM evaluation-suite layout (/root/reference/DiT/sample_ddp.py:28-42)
        all_imgs = []
        rng = np.random.default_rng(args.seed)
        done = 0
        while done < args.num_fid_samples:
            n = min(args.per_batch, args.num_fid_samples - done)
            labels = rng.integers(0, args.num_classes, args.per_batch)
            key, sub = jax.random.split(key)
            out = trainer.sample(labels, sub, cfg_scale=args.cfg_scale,
                                 num_steps=args.num_sampling_steps, vae_decoder=decoder,
                                 ddim=args.ddim)
            imgs = np.clip((np.asarray(out, np.float32) + 1) * 127.5, 0, 255).astype(np.uint8)
            all_imgs.append(imgs[:n])
            done += n
            print(f"sampled {done}/{args.num_fid_samples}")
        arr = np.concatenate(all_imgs)
        np.savez(args.out, arr_0=arr)
        print(f"saved {arr.shape} to {args.out}")
    else:
        out = trainer.sample(np.asarray(args.class_labels), key, cfg_scale=args.cfg_scale,
                             num_steps=args.num_sampling_steps, vae_decoder=decoder,
                             ddim=args.ddim)
        _save_grid(out, args.out, decoded=decoder is not None)
        print(f"saved {args.out}")


def _save_grid(images: np.ndarray, path: str, decoded: bool, cols: int = 4):
    from PIL import Image

    arr = np.asarray(images, np.float32)
    if not decoded:  # latents: normalize per-channel for a viewable grid
        arr = (arr - arr.min()) / (arr.max() - arr.min() + 1e-8) * 2 - 1
        arr = arr[..., :3]
    arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
    n, h, w, _ = arr.shape
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(n):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = arr[i]
    Image.fromarray(grid).save(path)


if __name__ == "__main__":
    main()
