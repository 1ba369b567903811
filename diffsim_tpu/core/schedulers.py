"""Diffusion noise-schedule tables and the NoiseSpec abstraction.

The reference drives three different torch schedulers purely to (a) pick a model timestep from
``timesteps[sample_timestep]`` and (b) forward-noise clean latents to that timestep:

* SD-1.5: PNDMScheduler (steps_offset=1, skip_prk_steps) with ``num_inference_steps=1000``
  (/root/reference/diffsim/diffsim_pipeline.py:153-183).
* SDXL:  EulerDiscreteScheduler ("leading" spacing, steps_offset=1); note that
  ``prepare_latents`` additionally multiplies the *clean* latents by ``init_noise_sigma``
  before ``add_noise`` and ``scale_model_input`` divides by ``sqrt(sigma_t^2+1)``
  (/root/reference/diffsim/diffsim_xl_pipeline.py:199-313).
* DiT:   DDIMScheduler ``add_noise`` at raw ``t = target_step`` for the noising, while the
  *model* timestep comes from the respaced OpenAI diffusion ``timestep_map[1000 - target_step]``
  (/root/reference/diffsim/diffsim_dit.py:63-114, /root/reference/DiT/diffusion/respace.py:12-66).

All three collapse to one closed form for the tensor that actually enters the network:

    x_model = a * x0 + b * eps,   eps ~ N(0, I)

plus a scalar ``model_t`` fed to the timestep embedding. This module computes ``(model_t, a, b)``
host-side as plain floats; the jitted scoring graph never sees a scheduler object. Tables are
NumPy float64 for exactness, cast at use sites.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np

NUM_TRAIN_TIMESTEPS = 1000


def betas_scaled_linear(
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    n: int = NUM_TRAIN_TIMESTEPS,
) -> np.ndarray:
    """Stable-Diffusion "scaled_linear" beta schedule (linear in sqrt-beta)."""
    return np.linspace(beta_start**0.5, beta_end**0.5, n, dtype=np.float64) ** 2


def betas_linear(
    beta_start: float = 1e-4, beta_end: float = 0.02, n: int = NUM_TRAIN_TIMESTEPS
) -> np.ndarray:
    """ADM/DiT "linear" beta schedule (/root/reference/DiT/diffusion/gaussian_diffusion.py,
    get_named_beta_schedule("linear"): scale = 1000/num_timesteps)."""
    scale = 1000.0 / n
    return np.linspace(scale * beta_start, scale * beta_end, n, dtype=np.float64)


@lru_cache(maxsize=None)
def alphas_cumprod(schedule: str = "scaled_linear", n: int = NUM_TRAIN_TIMESTEPS) -> np.ndarray:
    if schedule == "scaled_linear":
        betas = betas_scaled_linear(n=n)
    elif schedule == "linear":
        betas = betas_linear(n=n)
    else:
        raise ValueError(f"unknown beta schedule: {schedule}")
    out = np.cumprod(1.0 - betas)
    out.setflags(write=False)
    return out


@dataclasses.dataclass(frozen=True)
class NoiseSpec:
    """Everything the jitted graph needs to noise a clean latent and embed time.

    ``x_model = a * x0 + b * eps`` and the network's timestep input is ``model_t``.
    """

    model_t: float
    a: float
    b: float


# ---------------------------------------------------------------------------
# SD-1.5: PNDM timestep table.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def pndm_timestep_table(num_inference_steps: int = 1000, steps_offset: int = 1) -> np.ndarray:
    """The PLMS timestep list PNDMScheduler.set_timesteps builds with skip_prk_steps=True.

    For 1000 steps this is [1000, 999, 999, 998, ..., 1] (length 1001): the base table
    [1..1000] with its last-but-one entry duplicated, reversed. The reference indexes it with
    ``t = timesteps[sample_timestep]`` (/root/reference/diffsim/diffsim_pipeline.py:156-157), so
    the canonical CUTE config ``target_step=600`` lands on DDPM t=401.
    """
    step_ratio = NUM_TRAIN_TIMESTEPS // num_inference_steps
    base = (np.arange(0, num_inference_steps) * step_ratio).round() + steps_offset
    table = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].astype(np.int64)
    table.setflags(write=False)
    return table


def sd15_noise_spec(target_step: int, num_inference_steps: int = 1000) -> NoiseSpec:
    """SD-1.5 path: PNDM table index -> DDPM q_sample coefficients.

    PNDM ``scale_model_input`` is identity and ``init_noise_sigma`` is 1.0, so
    a = sqrt(alpha_bar_t), b = sqrt(1 - alpha_bar_t). t=1000 (target_step=0) would raise an
    IndexError in the torch reference's ``add_noise``; we clamp the *noising* index to 999 while
    keeping the raw value as the model timestep, and document the divergence.
    """
    table = pndm_timestep_table(num_inference_steps)
    t = int(table[target_step])
    ac = alphas_cumprod("scaled_linear")[min(t, NUM_TRAIN_TIMESTEPS - 1)]
    return NoiseSpec(model_t=float(t), a=float(np.sqrt(ac)), b=float(np.sqrt(1.0 - ac)))


# ---------------------------------------------------------------------------
# SDXL: EulerDiscrete ("leading", steps_offset=1).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _euler_sigmas(n: int = NUM_TRAIN_TIMESTEPS) -> np.ndarray:
    ac = alphas_cumprod("scaled_linear", n)
    sig = np.sqrt((1.0 - ac) / ac)
    sig.setflags(write=False)
    return sig


def euler_init_noise_sigma() -> float:
    sig = _euler_sigmas()
    return float(np.sqrt(sig.max() ** 2 + 1.0))


def sdxl_noise_spec(target_step: int, num_inference_steps: int = 1000) -> NoiseSpec:
    """SDXL path. Euler "leading" timesteps with offset 1 are [1000, 999, ..., 1], so
    ``t = 1000 - target_step``. The reference composes three scalings
    (/root/reference/diffsim/diffsim_xl_pipeline.py:204-313 and diffusers
    StableDiffusionXLPipeline.prepare_latents):

        z  = init_noise_sigma * z0              # prepare_latents on user latents
        z  = z + sigma_t * eps                  # Euler add_noise
        x  = z / sqrt(sigma_t^2 + 1)            # scale_model_input

    which reduces to a = init_noise_sigma * sqrt(alpha_bar_t), b = sqrt(1 - alpha_bar_t) — i.e.
    the image signal is amplified ~14.6x relative to a standard q_sample (quirk Q6; preserved
    for parity). sigma_t comes from np.interp over the 1000-entry table, which clamps t=1000
    to index 999.
    """
    t = NUM_TRAIN_TIMESTEPS - target_step
    sig = _euler_sigmas()
    sigma_t = float(np.interp(float(t), np.arange(len(sig), dtype=np.float64), sig))
    c_in = 1.0 / np.sqrt(sigma_t**2 + 1.0)
    return NoiseSpec(
        model_t=float(t),
        a=float(euler_init_noise_sigma() * c_in),
        b=float(sigma_t * c_in),
    )


# ---------------------------------------------------------------------------
# DiT: DDIM noising at raw t + respaced model timestep.
# ---------------------------------------------------------------------------


def space_timesteps(num_timesteps: int, section_counts: list[int]) -> list[int]:
    """OpenAI ADM uniform timestep respacing (re-derived from the published algorithm;
    behavioral parity with /root/reference/DiT/diffusion/respace.py:12-66). Uses Python
    ``round`` (banker's rounding) as the original does."""
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1.0 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur = 0.0
        for _ in range(section_count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return sorted(set(all_steps))


def dit_noise_spec(target_step: int) -> NoiseSpec:
    """DiT path: noise with the SD-1.5 DDIM (scaled_linear) table at raw ``t=target_step``
    (/root/reference/diffsim/diffsim_dit.py:63-88), but feed the model the timestep
    ``timestep_map[1000 - target_step]`` of the diffusion respaced to ``target_step`` steps
    (/root/reference/diffsim/diffsim_dit.py:93-114). Requires target_step > 500 or the index is
    out of range — same constraint as the reference."""
    idx = NUM_TRAIN_TIMESTEPS - target_step
    tmap = space_timesteps(NUM_TRAIN_TIMESTEPS, [target_step])
    if idx >= len(tmap):
        raise ValueError(
            f"target_step={target_step} gives respaced index {idx} >= {len(tmap)} "
            "(the reference crashes here too; use target_step > 500)"
        )
    model_t = tmap[idx]
    ac = alphas_cumprod("scaled_linear")[min(target_step, NUM_TRAIN_TIMESTEPS - 1)]
    return NoiseSpec(model_t=float(model_t), a=float(np.sqrt(ac)), b=float(np.sqrt(1.0 - ac)))


def noise_spec(backbone: str, target_step: int) -> NoiseSpec:
    if backbone in ("sd15", "diffsim"):
        return sd15_noise_spec(target_step)
    if backbone in ("sdxl", "diffsim_xl"):
        return sdxl_noise_spec(target_step)
    if backbone in ("dit", "diffsim_dit"):
        return dit_noise_spec(target_step)
    raise ValueError(f"unknown backbone: {backbone}")
