"""DiT training CLI — the torchrun train.py equivalent (/root/reference/DiT/train.py:253-268),
single-command SPMD instead of multi-process DDP.

    python -m diffsim_tpu.cli.dit_train --data_path imagenet/train --results_dir results \
        --model DiT-XL/2 --image_size 256 --global_batch_size 256 --epochs 1400
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import numpy as np

from diffsim_tpu.data.imagefolder import ImageFolderDataset
from diffsim_tpu.models import dit
from diffsim_tpu.parallel import mesh as meshlib
from diffsim_tpu.train.dit_trainer import DiTTrainer, TrainConfig


def create_logger(results_dir: str) -> logging.Logger:
    """Process-0 logs to file+stdout; other hosts log to stdout only — the reference's rank-0
    logger pattern (/root/reference/DiT/train.py:67-82), avoiding N processes appending to one
    log.txt on shared storage."""
    handlers: list[logging.Handler] = [logging.StreamHandler()]
    if jax.process_index() == 0:
        os.makedirs(results_dir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(results_dir, "log.txt")))
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
        handlers=handlers,
    )
    return logging.getLogger(__name__)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--results_dir", default="results")
    ap.add_argument("--model", default="DiT-XL/2", choices=list(dit.MODELS))
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=1400)
    ap.add_argument("--global_batch_size", type=int, default=256)
    ap.add_argument("--global_seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=100)
    ap.add_argument("--ckpt_every", type=int, default=50_000)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--vae_weights", default=None, help=".npz with a 'vae' encoder tree")
    ap.add_argument("--model_scale", choices=["full", "tiny"], default="full")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint every DiT block (recompute activations in backward "
                         "— larger per-chip batch for the same HBM; numerics unchanged)")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 model compute with float32 master weights/optimizer/EMA")
    ap.add_argument("--distributed", action="store_true",
                    help="Force jax.distributed.initialize() (TPU-pod auto-detection); "
                         "otherwise it runs only under a JAX_COORDINATOR_ADDRESS env")
    args = ap.parse_args(argv)

    # multi-host: under a pod coordinator this makes jax.devices() span all hosts; the mesh
    # below is then global and each process feeds only its local slice of the batch.
    # Must run before ANY other jax call (even process_count() boots the backend).
    distributed = meshlib.maybe_init_distributed(force=args.distributed)
    logger = create_logger(args.results_dir)
    mesh = meshlib.make_mesh() if len(jax.devices()) > 1 else None
    cfg = TrainConfig(
        image_size=args.image_size, model=args.model,
        global_batch=args.global_batch_size, seed=args.global_seed,
        remat=args.remat, compute_dtype="bfloat16" if args.bf16 else None,
    )
    dit_cfg = None
    vae_cfg = None
    if args.model_scale == "tiny":
        from diffsim_tpu.models import vae as vae_mod

        dit_cfg = dit.DiTConfig.tiny(input_size=args.image_size // 2, learn_sigma=True)
        vae_cfg = vae_mod.VAEConfig.tiny()
    vae_params = None
    if args.vae_weights:
        from diffsim_tpu.convert import load_params

        vae_params = load_params(args.vae_weights)["vae"]
    trainer = DiTTrainer(cfg, mesh=mesh, dit_cfg=dit_cfg, vae_cfg=vae_cfg, vae_params=vae_params)
    if args.resume:
        trainer.restore(os.path.abspath(args.resume))
        logger.info(f"resumed from {args.resume} at step {int(trainer.state['step'])}")

    data = ImageFolderDataset(args.data_path, args.image_size, seed=args.global_seed)
    logger.info(f"dataset: {len(data)} images, {len(data.classes)} classes")
    key = jax.random.PRNGKey(args.global_seed)

    # multi-host: every process derives the same shuffled epoch order (shared seed) but
    # decodes only its batch/nproc slice, then assembles the sharded global array host-locally
    proc_slice = (jax.process_index(), jax.process_count()) if distributed else None

    steps = 0
    t0 = time.time()
    running = []
    for epoch in range(args.epochs):
        logger.info(f"beginning epoch {epoch}")
        for pixels, labels in data.epoch_batches(args.global_batch_size,
                                                 process_slice=proc_slice):
            if distributed:
                pixels = meshlib.global_batch_from_local(mesh, pixels)
                labels = meshlib.global_batch_from_local(mesh, labels)
            metrics = trainer.train_step(pixels, labels, key)
            running.append(float(metrics["loss"]))
            steps += 1
            if steps % args.log_every == 0:
                dt = time.time() - t0
                logger.info(
                    f"(step={steps:07d}) train loss: {np.mean(running):.4f}, "
                    f"steps/sec: {args.log_every / dt:.2f}"
                )
                running = []
                t0 = time.time()
            if steps % args.ckpt_every == 0:
                # EVERY process calls save (unlike the reference's torch rank-0 pattern,
                # /root/reference/DiT/train.py:232-244): orbax's checkpointer runs cross-
                # process sync barriers internally and writes replicated trees once from the
                # primary host — a rank-0-only call would leave process 0 blocked at the
                # barrier (or desync later collectives) on multi-host runs
                path = os.path.abspath(os.path.join(args.results_dir, f"ckpt_{steps:07d}"))
                trainer.save(path)
                if jax.process_index() == 0:
                    logger.info(f"saved checkpoint to {path}")
            if args.max_steps and steps >= args.max_steps:
                logger.info("done (max_steps)")
                return trainer
    logger.info("done")
    return trainer


if __name__ == "__main__":
    main()
