"""Generate the committed torch-parity fixtures (tests/fixtures/torch_parity_tiny.npz and
tests/fixtures/torch_parity_xl_dit.npz).

Runs entirely in this image (torch CPU + JAX CPU): builds the tiny torch mirror
(tools/torch_mirror.py) with seeded random weights, records its state_dicts in diffusers
naming, and dumps torch-computed ground truth for three layers of parity:

  1. VAE-encoder moments for a fixed pixel batch
  2. UNet eps + tap q/k/v at the canonical up tap for fixed latents/context/t
  3. Full DiffSim scores for 64 image pairs with injected noise (the complete scoring
     semantics: encode -> sample -> q_sample -> CFG forward -> 4xSDPA readout,
     /root/reference/diffsim/diffsim.py:171-197) over a GRID of 3 tap sites x 2 target
     steps x both similarities per backbone — so cross-framework Spearman parity does not
     rest on a single config

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
N_PAIRS = 64
IMG = 32
SIMS = ("cosine", "mse")
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

    # 64-pair score fixture with injected noise. Pairs are graded in similarity (B = A
    # blended with an unrelated image at alpha = i/(N-1)) so the scores spread and the
    # Spearman rank comparison in the test is meaningful rather than a tie-break lottery.
    # Scores are dumped over a GRID — 3 tap sites x 2 target steps x both similarities —
    # one forward per (step, pair, image) with every site's q/k/v read from the same pass.
    base = rng.uniform(-1, 1, (N_PAIRS, 3, IMG, IMG)).astype(np.float32)
    other = rng.uniform(-1, 1, (N_PAIRS, 3, IMG, IMG)).astype(np.float32)
    alpha = np.linspace(0.0, 1.0, N_PAIRS, dtype=np.float32)[:, None, None, None]
    partner = (1.0 - alpha) * base + alpha * other
    pair_pix = np.stack([base, partner], axis=1)
    embeds = rng.standard_normal((2, 77, CDIM)).astype(np.float32)  # [uncond, cond]
    eps_vae = rng.standard_normal((2, 1, 4, LAT, LAT)).astype(np.float32)  # per role A/B
    eps_noise = rng.standard_normal((2, 1, 4, LAT, LAT)).astype(np.float32)

    from tools.torch_mirror import cross_attention_score, sample_latents

    # site names match sd15_tap addressing in the replay test (up/down layer 0, mid)
    sd_sites = {
        "up": unet.up_blocks[1].attentions[-1].transformer_blocks[-1].attn1,
        "down": unet.down_blocks[0].attentions[-1].transformer_blocks[-1].attn1,
        "mid": unet.mid_block.attentions[0].transformer_blocks[-1].attn1,
    }
    with torch.no_grad():
        for step in (600, 150):
            gspec = schedulers.sd15_noise_spec(step)
            qkv = {name: ([], []) for name in sd_sites}
            for i in range(N_PAIRS):
                for r in range(2):
                    z = sample_latents(vae(torch.from_numpy(pair_pix[i, r:r + 1])),
                                       torch.from_numpy(eps_vae[r]), 0.18215)
                    x = float(gspec.a) * z + float(gspec.b) * torch.from_numpy(eps_noise[r])
                    x = torch.cat([x, x], dim=0)  # CFG duplicate [uncond, cond]
                    unet(x, torch.tensor(float(gspec.model_t)), torch.from_numpy(embeds))
                    for name, site in sd_sites.items():
                        qkv[name][r].append(site.last_qkv)
            for name in sd_sites:
                for sim in SIMS:
                    out[f"grid::{name}::{step}::{sim}"] = np.asarray(
                        [cross_attention_score(qkv[name][0][i], qkv[name][1][i], sim)
                         for i in range(N_PAIRS)],
                        np.float32,
                    )
    out["pair_pixels"] = pair_pix
    out["pair_embeds"] = embeds
    out["pair_eps_vae"] = eps_vae
    out["pair_eps_noise"] = eps_noise
    out["pair_scores"] = out["grid::up::600::cosine"]  # legacy single-config key
    # self-check: the grid capture must reproduce the single-site scoring helper exactly
    check = diffsim_score_pair(
        unet, vae, torch.from_numpy(pair_pix[0, 0:1]), torch.from_numpy(pair_pix[0, 1:2]),
        torch.from_numpy(embeds),
        (torch.from_numpy(eps_vae[0]), torch.from_numpy(eps_vae[1])),
        (torch.from_numpy(eps_noise[0]), torch.from_numpy(eps_noise[1])),
        float(spec.model_t), float(spec.a), float(spec.b),
    )
    assert abs(check - float(out["pair_scores"][0])) < 1e-6, (check, out["pair_scores"][0])

    path = os.path.abspath(OUT)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    size = os.path.getsize(path) / 1e6
    print(f"wrote {path} ({size:.2f} MB, {len(out)} arrays); "
          f"scores: {out['pair_scores'][:4]} ...")


OUT_XL_DIT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "torch_parity_xl_dit.npz"
)


def _graded_pairs(rng, n_pairs, img):
    """Pairs graded in similarity so Spearman is meaningful (same scheme as the SD fixture)."""
    base = rng.uniform(-1, 1, (n_pairs, 3, img, img)).astype(np.float32)
    other = rng.uniform(-1, 1, (n_pairs, 3, img, img)).astype(np.float32)
    alpha = np.linspace(0.0, 1.0, n_pairs, dtype=np.float32)[:, None, None, None]
    return np.stack([base, (1.0 - alpha) * base + alpha * other], axis=1)


def main_xl_dit():
    """SDXL + DiT score-level ground truth: the two scoring paths whose quirk piles
    (dual-tower embeds + text_time micro-conditioning + init_noise_sigma noising;
    DDIM-at-raw-t + respaced model timestep + y=[1,null]) had no cross-framework numerical
    evidence before round 3."""
    from diffsim_tpu.core import schedulers
    from tools.torch_dit import DiT as TorchDiT, dit_score_pair
    from tools.torch_mirror import TinyXLUNet, TinyVAEEncoder, diffsim_xl_score_pair

    out: dict[str, np.ndarray] = {}
    rng = np.random.default_rng(1)

    # one shared tiny VAE (encoder+decoder so convert_vae consumes a complete AutoencoderKL
    # state_dict) for both backbones — parity needs consistent weights, not distinct ones
    torch.manual_seed(3)
    shared_vae = TinyVAEEncoder().eval()
    from tools.torch_mirror import TinyVAEDecoder

    shared_dec = TinyVAEDecoder().eval()
    for mod in (shared_vae, shared_dec):
        for k, v in mod.state_dict().items():
            out[f"vae::{k}"] = v.numpy()

    # ---------------- SDXL (UNetConfig.tiny_xl(cross_attention_dim=64)) ----------------
    torch.manual_seed(1)
    xl = TinyXLUNet(context_dim=64).eval()
    xl_vae = shared_vae
    for k, v in xl.state_dict().items():
        out[f"xl::unet::{k}"] = v.numpy()

    spec = schedulers.sdxl_noise_spec(900)  # the canonical Sref/style step
    # force_zeros_for_empty_prompt layout: uncond row is all-zeros
    embeds = np.concatenate(
        [np.zeros((1, 77, 64), np.float32), rng.standard_normal((1, 77, 64)).astype(np.float32)]
    )
    pooled = np.concatenate(
        [np.zeros((1, 16), np.float32), rng.standard_normal((1, 16)).astype(np.float32)]
    )
    time_ids = np.asarray([1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0], np.float32)
    pair_pix = _graded_pairs(rng, N_PAIRS, IMG)
    eps_vae = rng.standard_normal((2, 1, 4, LAT, LAT)).astype(np.float32)
    eps_noise = rng.standard_normal((2, 1, 4, LAT, LAT)).astype(np.float32)
    # primary tap: up_blocks [block 0, attention 1, transformer 1] — depth-2 linear-proj
    # blocks and the 3-index addressing both exercised away from their 0 defaults; the score
    # GRID adds the mid and down sites, a second step and both similarities
    tap_site = xl.up_blocks[0].attentions[1].transformer_blocks[1].attn1
    from tools.torch_mirror import cross_attention_score, sample_latents

    # names encode sdxl_tap's [block, attention, transformer] CLI addressing
    xl_sites = {
        "up011": tap_site,
        "mid01": xl.mid_block.attentions[0].transformer_blocks[1].attn1,
        "down001": xl.down_blocks[1].attentions[0].transformer_blocks[1].attn1,
    }
    tids2 = torch.from_numpy(time_ids)[None].expand(2, -1)
    with torch.no_grad():
        for step in (900, 600):
            gspec = schedulers.sdxl_noise_spec(step)
            qkv = {name: ([], []) for name in xl_sites}
            for i in range(N_PAIRS):
                for r in range(2):
                    z = sample_latents(xl_vae(torch.from_numpy(pair_pix[i, r:r + 1])),
                                       torch.from_numpy(eps_vae[r]), 0.18215)
                    x = float(gspec.a) * z + float(gspec.b) * torch.from_numpy(eps_noise[r])
                    x = torch.cat([x, x], dim=0)  # CFG duplicate [uncond, cond]
                    xl(x, torch.tensor(float(gspec.model_t)), torch.from_numpy(embeds),
                       torch.from_numpy(pooled), tids2)
                    for name, site in xl_sites.items():
                        qkv[name][r].append(site.last_qkv)
            for name in xl_sites:
                for sim in SIMS:
                    out[f"xl_grid::{name}::{step}::{sim}"] = np.asarray(
                        [cross_attention_score(qkv[name][0][i], qkv[name][1][i], sim)
                         for i in range(N_PAIRS)],
                        np.float32,
                    )
    out["xl_pair_pixels"] = pair_pix
    out["xl_embeds"], out["xl_pooled"] = embeds, pooled
    out["xl_eps_vae"], out["xl_eps_noise"] = eps_vae, eps_noise
    out["xl_pair_scores"] = out["xl_grid::up011::900::cosine"]
    # self-check vs the single-site helper
    check = diffsim_xl_score_pair(
        xl, xl_vae, torch.from_numpy(pair_pix[0, 0:1]), torch.from_numpy(pair_pix[0, 1:2]),
        torch.from_numpy(embeds), torch.from_numpy(pooled), torch.from_numpy(time_ids),
        (torch.from_numpy(eps_vae[0]), torch.from_numpy(eps_vae[1])),
        (torch.from_numpy(eps_noise[0]), torch.from_numpy(eps_noise[1])),
        float(spec.model_t), float(spec.a), float(spec.b), tap_site,
    )
    assert abs(check - float(out["xl_pair_scores"][0])) < 1e-6
    # forward-level golden too: eps + tap q/k/v for fixed latents
    latents = rng.standard_normal((1, 4, LAT, LAT)).astype(np.float32)
    with torch.no_grad():
        eps = xl(
            torch.from_numpy(latents), torch.tensor(float(spec.model_t)),
            torch.from_numpy(embeds[1:2]), torch.from_numpy(pooled[1:2]),
            torch.from_numpy(time_ids[None]),
        ).numpy()
    out["xl_latents"], out["xl_eps"] = latents, eps
    for name, t in zip("qkv", tap_site.last_qkv):
        out[f"xl_tap_{name}"] = t.numpy()

    # ---------------- DiT (DiTConfig.tiny(input_size=16, num_classes=10)) ----------------
    torch.manual_seed(2)
    dit = TorchDiT(input_size=LAT, patch=2, in_channels=4, hidden=32, depth=2, heads=2,
                   num_classes=10, learn_sigma=False).eval()
    dit_vae = shared_vae
    for k, v in dit.state_dict().items():
        out[f"dit::model::{k}"] = v.numpy()

    dspec = schedulers.dit_noise_spec(600)
    dit_pix = _graded_pairs(rng, N_PAIRS, IMG)
    dit_eps_vae = rng.standard_normal((2, 1, 4, LAT, LAT)).astype(np.float32)
    dit_eps_noise = rng.standard_normal((2, 1, 4, LAT, LAT)).astype(np.float32)
    # score GRID: both transformer layers x 2 steps x both similarities, one forward per
    # (step, pair, image) with both layers' fused-qkv read from the same pass.
    # (steps must be > 500: the reference's respacing crashes below that — schedulers.py:192)
    y2 = torch.tensor([1, 10], dtype=torch.long)
    with torch.no_grad():
        for step in (600, 800):
            gspec = schedulers.dit_noise_spec(step)
            qkv = {layer: ([], []) for layer in (0, 1)}
            for i in range(N_PAIRS):
                for r in range(2):
                    z = sample_latents(dit_vae(torch.from_numpy(dit_pix[i, r:r + 1])),
                                       torch.from_numpy(dit_eps_vae[r]), 0.18215)
                    x = float(gspec.a) * z + float(gspec.b) * torch.from_numpy(dit_eps_noise[r])
                    x = torch.cat([x, x], dim=0)  # cond + null-class rows
                    dit(x, torch.tensor([float(gspec.model_t)] * 2), y2)
                    for layer in (0, 1):
                        qkv[layer][r].append(dit.blocks[layer].attn.last_qkv)
            for layer in (0, 1):
                for sim in SIMS:
                    out[f"dit_grid::{layer}::{step}::{sim}"] = np.asarray(
                        [cross_attention_score(qkv[layer][0][i], qkv[layer][1][i], sim)
                         for i in range(N_PAIRS)],
                        np.float32,
                    )
    out["dit_pair_pixels"] = dit_pix
    out["dit_eps_vae"], out["dit_eps_noise"] = dit_eps_vae, dit_eps_noise
    out["dit_pair_scores"] = out["dit_grid::1::600::cosine"]
    out["dit_model_t"] = np.float32(dspec.model_t)
    # self-check vs the single-site helper
    check = dit_score_pair(
        dit, dit_vae, 10,
        torch.from_numpy(dit_pix[0, 0:1]), torch.from_numpy(dit_pix[0, 1:2]),
        (torch.from_numpy(dit_eps_vae[0]), torch.from_numpy(dit_eps_vae[1])),
        (torch.from_numpy(dit_eps_noise[0]), torch.from_numpy(dit_eps_noise[1])),
        float(dspec.model_t), float(dspec.a), float(dspec.b), tap_layer=1,
    )
    assert abs(check - float(out["dit_pair_scores"][0])) < 1e-6

    path = os.path.abspath(OUT_XL_DIT)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    size = os.path.getsize(path) / 1e6
    print(f"wrote {path} ({size:.2f} MB, {len(out)} arrays)")
    print(f"  xl scores: {out['xl_pair_scores'][:4]} ...")
    print(f"  dit scores: {out['dit_pair_scores'][:4]} ...")


if __name__ == "__main__":
    main()
    main_xl_dit()
