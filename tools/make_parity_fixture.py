"""Generate the committed torch-parity fixture (tests/fixtures/torch_parity_tiny.npz).

Runs entirely in this image (torch CPU + JAX CPU): builds the tiny torch mirror
(tools/torch_mirror.py) with seeded random weights, records its state_dicts in diffusers
naming, and dumps torch-computed ground truth for three layers of parity:

  1. VAE-encoder moments for a fixed pixel batch
  2. UNet eps + tap q/k/v at the canonical up tap for fixed latents/context/t
  3. Full DiffSim scores for 20 image pairs with injected noise (the complete scoring
     semantics: encode -> sample -> q_sample -> CFG forward -> 4xSDPA readout,
     /root/reference/diffsim/diffsim.py:171-197)

tests/test_torch_parity_tiny.py replays the same inputs through the converters + JAX models
and asserts allclose / Spearman >= 0.99. Regenerate with:

    python tools/make_parity_fixture.py
"""

from __future__ import annotations

import os

import numpy as np
import torch

from tools.torch_mirror import TinyUNet, TinyVAEDecoder, TinyVAEEncoder, diffsim_score_pair

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "torch_parity_tiny.npz")
N_PAIRS = 20
IMG = 32
LAT = IMG // 2  # VAEConfig.tiny has one downsample
CDIM = 32


def main():
    torch.manual_seed(0)
    unet = TinyUNet().eval()
    vae = TinyVAEEncoder().eval()
    vae_dec = TinyVAEDecoder().eval()

    rng = np.random.default_rng(0)
    latents = rng.standard_normal((1, 4, LAT, LAT)).astype(np.float32)
    context = rng.standard_normal((1, 77, CDIM)).astype(np.float32)
    pixels = rng.uniform(-1, 1, (2, 3, IMG, IMG)).astype(np.float32)

    # noise spec for the canonical CUTE step through the PNDM table (golden-tested separately
    # in tests/test_schedulers.py)
    from diffsim_tpu.core import schedulers

    spec = schedulers.sd15_noise_spec(600)

    out: dict[str, np.ndarray] = {}
    for k, v in unet.state_dict().items():
        out[f"sd::unet::{k}"] = v.numpy()
    for mod in (vae, vae_dec):  # one combined AutoencoderKL state_dict
        for k, v in mod.state_dict().items():
            out[f"sd::vae::{k}"] = v.numpy()

    with torch.no_grad():
        out["vae_moments"] = vae(torch.from_numpy(pixels)).numpy()
        out["vae_decoded"] = vae_dec(torch.from_numpy(latents)).numpy()
        eps = unet(
            torch.from_numpy(latents), torch.tensor(float(spec.model_t)),
            torch.from_numpy(context),
        ).numpy()
    out["eps"] = eps
    tap = unet.up_blocks[1].attentions[-1].transformer_blocks[-1].attn1
    for name, t in zip("qkv", tap.last_qkv):
        out[f"tap_{name}"] = t.numpy()
    out["latents"], out["context"], out["pixels"] = latents, context, pixels
    out["model_t"] = np.float32(spec.model_t)
    out["ab"] = np.asarray([spec.a, spec.b], np.float32)

    # 20-pair score fixture with injected noise. Pairs are graded in similarity (B = A
    # blended with an unrelated image at alpha = i/(N-1)) so the scores spread and the
    # Spearman rank comparison in the test is meaningful rather than a tie-break lottery.
    base = rng.uniform(-1, 1, (N_PAIRS, 3, IMG, IMG)).astype(np.float32)
    other = rng.uniform(-1, 1, (N_PAIRS, 3, IMG, IMG)).astype(np.float32)
    alpha = np.linspace(0.0, 1.0, N_PAIRS, dtype=np.float32)[:, None, None, None]
    partner = (1.0 - alpha) * base + alpha * other
    pair_pix = np.stack([base, partner], axis=1)
    embeds = rng.standard_normal((2, 77, CDIM)).astype(np.float32)  # [uncond, cond]
    eps_vae = rng.standard_normal((2, 1, 4, LAT, LAT)).astype(np.float32)  # per role A/B
    eps_noise = rng.standard_normal((2, 1, 4, LAT, LAT)).astype(np.float32)
    scores = np.asarray(
        [
            diffsim_score_pair(
                unet, vae,
                torch.from_numpy(pair_pix[i, 0:1]), torch.from_numpy(pair_pix[i, 1:2]),
                torch.from_numpy(embeds),
                (torch.from_numpy(eps_vae[0]), torch.from_numpy(eps_vae[1])),
                (torch.from_numpy(eps_noise[0]), torch.from_numpy(eps_noise[1])),
                float(spec.model_t), float(spec.a), float(spec.b),
            )
            for i in range(N_PAIRS)
        ],
        np.float32,
    )
    out["pair_pixels"] = pair_pix
    out["pair_embeds"] = embeds
    out["pair_eps_vae"] = eps_vae
    out["pair_eps_noise"] = eps_noise
    out["pair_scores"] = scores

    path = os.path.abspath(OUT)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    size = os.path.getsize(path) / 1e6
    print(f"wrote {path} ({size:.2f} MB, {len(out)} arrays); scores: {scores[:4]} ...")


if __name__ == "__main__":
    main()
