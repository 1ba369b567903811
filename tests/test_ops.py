import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from diffsim_tpu.ops import attention as A
from diffsim_tpu.ops import blocks as B


def test_sdpa_matches_torch():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 4, 16, 8), dtype=np.float32)
    k = rng.standard_normal((2, 4, 16, 8), dtype=np.float32)
    v = rng.standard_normal((2, 4, 16, 8), dtype=np.float32)
    ours = np.asarray(A.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    theirs = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_sdpa_cross_seq_lengths():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, 2, 10, 8), dtype=np.float32)
    k = rng.standard_normal((1, 2, 7, 8), dtype=np.float32)
    v = rng.standard_normal((1, 2, 7, 8), dtype=np.float32)
    ours = np.asarray(A.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    theirs = F.scaled_dot_product_attention(*map(torch.from_numpy, (q, k, v))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 6, 32), dtype=np.float32)
    scale = rng.standard_normal(32).astype(np.float32)
    bias = rng.standard_normal(32).astype(np.float32)
    ours = np.asarray(
        B.group_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}, jnp.asarray(x), groups=8, eps=1e-6)
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.group_norm(xt, 8, torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-6)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 16), dtype=np.float32)
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    ours = np.asarray(B.layer_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}, jnp.asarray(x)))
    theirs = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 8, 8, 3), dtype=np.float32)
    w = rng.standard_normal((3, 3, 3, 5), dtype=np.float32)  # HWIO
    b = rng.standard_normal(5).astype(np.float32)
    ours = np.asarray(B.conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x), padding=1))
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
    theirs = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), wt, torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)


def test_timestep_embedding_matches_diffusers_formula():
    # diffusers get_timestep_embedding(flip_sin_to_cos=True, downscale_freq_shift=0)
    t = jnp.asarray([0.0, 401.0, 999.0])
    dim = 320
    emb = np.asarray(B.timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # f32 trig at ~1000 rad carries ~1e-4 abs error vs the f64 formula
    np.testing.assert_allclose(emb, expected, rtol=1e-4, atol=5e-4)
    assert emb.shape == (3, dim)


def test_attention_taps_layout():
    key = jax.random.PRNGKey(0)
    p = B.attention_init(key, 16, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    out, taps = B.attention(p, x, heads=4, capture="qkv")
    assert out.shape == (2, 6, 16)
    assert taps["q"].shape == (2, 4, 6, 4)
    # q really is to_q(x) split into heads
    q_manual = A.split_heads(B.linear(p["to_q"], x), 4)
    np.testing.assert_allclose(np.asarray(taps["q"]), np.asarray(q_manual), rtol=1e-6)


def test_attention_no_capture_empty_taps():
    p = B.attention_init(jax.random.PRNGKey(0), 16, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    _, taps = B.attention(p, x, heads=4)
    assert taps == {}


def test_quick_gelu():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    expected = np.asarray(x) * (1 / (1 + np.exp(-1.702 * np.asarray(x))))
    np.testing.assert_allclose(np.asarray(B.quick_gelu(x)), expected, rtol=1e-5)
