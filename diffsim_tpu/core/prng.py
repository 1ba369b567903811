"""Deterministic PRNG conventions.

The reference seeds a fresh ``torch.Generator`` per score call and draws from it sequentially:
VAE sample for A, VAE sample for B, noise for A, noise for B
(/root/reference/diffsim/diffsim.py:109-169). Torch and JAX PRNG streams can never bit-match, so
we define a structured JAX equivalent: one base key per (seed, pair), folded with a stable role
tag per draw. Determinism is exact across hosts, chips and shardings.
"""

from __future__ import annotations

import jax

# Stable role tags for the four draws of one pair score.
VAE_A, VAE_B, NOISE_A, NOISE_B = 0, 1, 2, 3


def pair_key(seed: int, pair_index: int = 0) -> jax.Array:
    """Base key for one image pair. ``pair_index`` distinguishes pairs inside a batched sweep
    while keeping every pair's stream independent of batch composition (a pair scores
    identically whether scored alone or in a batch of 4096)."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), pair_index)


def role_key(base: jax.Array, role: int) -> jax.Array:
    return jax.random.fold_in(base, role)
