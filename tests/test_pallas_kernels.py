"""Pallas kernel routing + interpret-mode numerics (real-TPU numerics are exercised by
bench.py; these tests validate the guards and the XLA-equivalence on CPU via interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsim_tpu.ops.pallas import attention as pattn, readout as pread


def test_fused_attention_routing_guards():
    assert pattn.use_fused((4, 8, 4096, 40), (4, 8, 4096, 40))
    assert not pattn.use_fused((4, 8, 4096, 40), (4, 8, 77, 40))  # cross-attention
    assert not pattn.use_fused((4, 8, 256, 40), (4, 8, 256, 40))  # short seq
    assert not pattn.use_fused((4, 8, 4096, 160), (4, 8, 4096, 160))  # wide head


def test_fused_readout_routing_guards():
    assert pread.use_fused_readout((2, 2, 8, 1024, 80)) == (jax.devices()[0].platform != "cpu")
    assert not pread.use_fused_readout((2, 2, 8, 77, 80))


def test_sdpa_on_cpu_never_routes_to_pallas():
    """conftest forces CPU: the dispatcher must take the XLA path (pallas TPU kernels don't
    lower on CPU) and produce correct attention."""
    from diffsim_tpu.ops.attention import sdpa

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 1024, 64), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 1024, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 1024, 64), jnp.float32)
    out = sdpa(q, k, v)
    assert out.shape == q.shape
    # rows of softmax(QK^T) sum to 1 -> output of attention over constant V equals V's value
    const_v = jnp.ones_like(v)
    np.testing.assert_allclose(np.asarray(sdpa(q, k, const_v)), 1.0, atol=1e-5)


def test_fused_kernels_interpret_mode():
    """Run both kernels under the Pallas interpreter on CPU and compare with the XLA math."""
    from diffsim_tpu.ops.attention import sdpa

    rng = np.random.default_rng(0)
    b, h, s, d = 2, 2, 1024, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32) for _ in range(3))

    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = pattn.fused_self_attention(q, k, v)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_readout_interpret_mode():
    from diffsim_tpu.metrics.readout import cross_attention_score

    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    P, B, H, S, D = 2, 2, 2, 512, 32
    qa, ka, va, qb, kb, vb = (
        jnp.asarray(rng.standard_normal((P, B, H, S, D)), jnp.float32) for _ in range(6)
    )
    ref = cross_attention_score(qa, ka, va, qb, kb, vb, "cosine")  # XLA path on CPU
    with pltpu.force_tpu_interpret_mode():
        a_on_b = pread.fused_direction_score(qa, ka, va, kb, vb, "cosine")
        b_on_a = pread.fused_direction_score(qb, kb, vb, ka, va, "cosine")
    np.testing.assert_allclose(np.asarray((a_on_b + b_on_a) / 2), np.asarray(ref), atol=1e-5)
