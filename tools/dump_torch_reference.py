"""Dump torch-reference activations for cross-framework parity checks.

Run this in an environment WITH diffusers/torch GPU or CPU (this repo's TPU image has no
diffusers — SURVEY.md §7 flags weight-conversion fidelity as the main engineering risk and
prescribes activation-diff tests against cached torch activations):

    python tools/dump_torch_reference.py --model_dir /path/to/stable-diffusion-v1-5 \
        --out torch_dump.npz

It feeds fixed latents/timestep/context through the torch UNet + VAE encoder and saves:
  - inputs: latents (1,4,64,64), t, encoder_hidden_states (1,77,768), pixels (1,3,512,512)
  - vae_moments: quant_conv output for the fixed pixels
  - eps: UNet output
  - q/k/v at the canonical CUTE tap (up_blocks[1].attentions[-1].transformer_blocks[-1].attn1)

Then, on the TPU side, convert the same checkpoint with ``cli.convert sd15`` and run

    DIFFSIM_TPU_TORCH_DUMP=torch_dump.npz DIFFSIM_TPU_WEIGHTS=sd15.npz \
        python -m pytest tests/test_torch_activation_parity.py -q
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True, help="local SD-1.5 diffusers checkpoint dir")
    ap.add_argument("--out", default="torch_dump.npz")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch
    from diffusers import AutoencoderKL, UNet2DConditionModel

    torch.manual_seed(args.seed)
    unet = UNet2DConditionModel.from_pretrained(args.model_dir, subfolder="unet").eval()
    vae = AutoencoderKL.from_pretrained(args.model_dir, subfolder="vae").eval()

    rng = np.random.default_rng(args.seed)
    latents = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
    context = rng.standard_normal((1, 77, 768)).astype(np.float32)
    pixels = rng.uniform(-1, 1, (1, 3, 512, 512)).astype(np.float32)
    t = 401.0  # the canonical CUTE timestep (target_step=600 through the PNDM table)

    stores = {}

    def hook(module, inputs):
        h = inputs[0]
        b, s, _ = h.shape
        heads = module.heads
        for name, proj in (("q", module.to_q), ("k", module.to_k), ("v", module.to_v)):
            x = proj(h)
            stores[name] = (
                x.view(b, s, heads, -1).transpose(1, 2).detach().numpy()
            )

    unet.up_blocks[1].attentions[-1].transformer_blocks[-1].attn1.register_forward_pre_hook(hook)

    with torch.no_grad():
        eps = unet(
            torch.from_numpy(latents), torch.tensor(t), torch.from_numpy(context)
        ).sample.numpy()
        moments = vae.quant_conv(vae.encoder(torch.from_numpy(pixels))).numpy()

    np.savez(
        args.out,
        latents=latents, t=np.float32(t), context=context, pixels=pixels,
        eps=eps, vae_moments=moments, q=stores["q"], k=stores["k"], v=stores["v"],
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
