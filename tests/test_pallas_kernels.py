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
    assert pattn.use_fused((4, 8, 256, 40), (4, 8, 256, 40))  # 16x16 sites fuse too
    assert pattn.use_fused((4, 8, 256, 160), (4, 8, 256, 160))  # hd-160 sites fuse too
    assert not pattn.use_fused((4, 8, 64, 160), (4, 8, 64, 160))  # mid 8x8: XLA
    # VAE mid attention (d=512) stays on XLA: its K+V alone blow the VMEM budget
    assert not pattn.use_fused((16, 1, 4096, 512), (16, 1, 4096, 512))


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


def test_fused_geglu_ff_interpret_mode():
    """Fused GEGLU FF kernel under the interpreter vs the XLA math path."""
    from jax.experimental.pallas import tpu as pltpu

    from diffsim_tpu.ops import blocks as B
    from diffsim_tpu.ops.pallas.ff import fused_geglu_ff

    rng = np.random.default_rng(0)
    n, c = 64, 32
    p = {
        "proj_in": {"w": jnp.asarray(rng.standard_normal((c, 8 * c)), jnp.float32) * 0.1,
                    "b": jnp.asarray(rng.standard_normal(8 * c), jnp.float32) * 0.1},
        "proj_out": {"w": jnp.asarray(rng.standard_normal((4 * c, c)), jnp.float32) * 0.1,
                     "b": jnp.asarray(rng.standard_normal(c), jnp.float32) * 0.1},
    }
    x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    ref = B.geglu_ff(p, x)  # 2-D input + CPU: the XLA path
    with pltpu.force_tpu_interpret_mode():
        out = fused_geglu_ff(x, p["proj_in"]["w"], p["proj_in"]["b"],
                             p["proj_out"]["w"], p["proj_out"]["b"], block_rows=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_ff_guards():
    from diffsim_tpu.ops.pallas.ff import use_fused_ff

    # conftest forces CPU: never fused there, shapes notwithstanding
    assert not use_fused_ff(4096 * 144, 320, 2560)


def test_fused_attention_wide_head_interpret_mode():
    """The VAE-style single-head wide-dim path (d > 160 -> 256-row q blocks)."""
    from jax.experimental.pallas import tpu as pltpu

    from diffsim_tpu.ops.attention import sdpa

    rng = np.random.default_rng(1)
    b, h, s, d = 2, 1, 256, 512
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32) * 0.1
               for _ in range(3))
    with pltpu.force_tpu_interpret_mode():
        out = pattn.fused_self_attention(q, k, v)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_grad_matches_xla(monkeypatch):
    """The custom VJP (training path) must match jax.grad through the XLA attention math."""
    from jax.experimental.pallas import tpu as pltpu

    from diffsim_tpu.ops.attention import sdpa
    from diffsim_tpu.ops.pallas.attention import fused_self_attention

    rng = np.random.default_rng(2)
    b, h, s, d = 1, 2, 256, 32
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32) * 0.3
               for _ in range(3))
    g = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v) * g)  # CPU: XLA math path

    with pltpu.force_tpu_interpret_mode():
        def loss_fused(q, k, v):
            return jnp.sum(fused_self_attention(q, k, v) * g)

        grads_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(grads_fused, grads_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-4, err_msg=name)


def test_fused_geglu_ff_grad_matches_xla():
    """The GEGLU-FF custom VJP must match jax.grad through the XLA math path (same contract
    as the fused attention kernel: training/grad works identically on every platform)."""
    from jax.experimental.pallas import tpu as pltpu

    from diffsim_tpu.ops import blocks as B
    from diffsim_tpu.ops.pallas.ff import fused_geglu_ff

    rng = np.random.default_rng(3)
    n, c = 32, 16
    p = {
        "proj_in": {"w": jnp.asarray(rng.standard_normal((c, 8 * c)), jnp.float32) * 0.1,
                    "b": jnp.asarray(rng.standard_normal(8 * c), jnp.float32) * 0.1},
        "proj_out": {"w": jnp.asarray(rng.standard_normal((4 * c, c)), jnp.float32) * 0.1,
                     "b": jnp.asarray(rng.standard_normal(c), jnp.float32) * 0.1},
    }
    x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)

    def loss_ref(x, w1, b1, w2, b2):
        out = B.geglu_ff({"proj_in": {"w": w1, "b": b1}, "proj_out": {"w": w2, "b": b2}}, x)
        return jnp.sum(out * g)

    with pltpu.force_tpu_interpret_mode():
        def loss_fused(x, w1, b1, w2, b2):
            return jnp.sum(fused_geglu_ff(x, w1, b1, w2, b2, block_rows=16) * g)

        grads_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            x, p["proj_in"]["w"], p["proj_in"]["b"], p["proj_out"]["w"], p["proj_out"]["b"])
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, p["proj_in"]["w"], p["proj_in"]["b"], p["proj_out"]["w"], p["proj_out"]["b"])
    for gf, gr, name in zip(grads_fused, grads_ref, ["x", "w1", "b1", "w2", "b2"]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-4, err_msg=name)


@pytest.mark.parametrize("s,d", [(1280, 40), (2304, 80)])
def test_fused_attention_non_pow2_seq_full_coverage(s, d):
    """Review regression: sequence lengths that are multiples of 256 but not of 512 (image
    sizes 640/768/896...) used to get a q block that did not divide s — the grid's floor
    division left the last rows of every (batch, head) UNWRITTEN (NaN/garbage scores on the
    real TPU, invisible to CPU tests). _block_q must return a divisor of s within the VMEM
    budget."""
    from jax.experimental.pallas import tpu as pltpu

    from diffsim_tpu.ops.attention import sdpa
    from diffsim_tpu.ops.pallas.attention import _block_q, fused_self_attention, use_fused

    assert use_fused((1, 1, s, d), (1, 1, s, d))
    bq = _block_q(s, d)
    assert s % bq == 0, (s, bq)
    assert bq * s * 4 <= 8 * 1024 * 1024, (s, bq)

    rng = np.random.default_rng(s)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 1, s, d)), jnp.float32) * 0.3
               for _ in range(3))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fused_self_attention(q, k, v))
    assert np.isfinite(out).all(), "unwritten rows"
    np.testing.assert_allclose(out, np.asarray(sdpa(q, k, v)), atol=2e-5)


def test_streaming_attention_interpret_mode(monkeypatch):
    """K-streaming online-softmax kernel (ops/pallas/attention_stream.py) vs the XLA math
    at VAE-mid-attention shapes (single head, wide d, long S) — generic interpreter."""
    monkeypatch.setenv("DIFFSIM_TPU_PALLAS_INTERPRET", "1")
    from diffsim_tpu.ops.attention import sdpa
    from diffsim_tpu.ops.pallas.attention_stream import streaming_self_attention

    rng = np.random.default_rng(4)
    b, h, s, d = 1, 1, 2048, 256
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32) * 0.3
               for _ in range(3))
    out = np.asarray(streaming_self_attention(q, k, v))
    monkeypatch.delenv("DIFFSIM_TPU_PALLAS_INTERPRET")
    ref = np.asarray(sdpa(q, k, v))
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_streaming_attention_bf16_probs_interpret_mode(monkeypatch):
    """Fast mode (--bf16_softmax): exp and the tile rowsum run in bf16 with the running
    l/acc recurrence in f32 scratch — same contract as the fused kernel's bf16_probs.
    The output must track the f32-probs path within bf16 probability quantization."""
    monkeypatch.setenv("DIFFSIM_TPU_PALLAS_INTERPRET", "1")
    from diffsim_tpu.ops.attention import sdpa
    from diffsim_tpu.ops.pallas.attention_stream import streaming_self_attention

    rng = np.random.default_rng(5)
    b, h, s, d = 1, 1, 2048, 256
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32) * 0.3
               for _ in range(3))
    fast = np.asarray(streaming_self_attention(q, k, v, bf16_probs=True))
    exact = np.asarray(streaming_self_attention(q, k, v))
    monkeypatch.delenv("DIFFSIM_TPU_PALLAS_INTERPRET")
    assert np.isfinite(fast).all()
    # bf16 has ~3 decimal digits: probabilities quantize at ~4e-3 relative, and the
    # normalized output averages that error down
    np.testing.assert_allclose(fast, exact, atol=5e-3)
    np.testing.assert_allclose(fast, np.asarray(sdpa(q, k, v)), atol=5e-3)
    assert np.abs(fast - exact).max() > 0  # the bf16 path is actually distinct


def test_streaming_attention_routing_guards(monkeypatch):
    from diffsim_tpu.ops.pallas.attention_stream import use_streaming

    # CPU without the interpret hook never routes
    assert not use_streaming((2, 1, 4096, 512), (2, 1, 4096, 512))
    monkeypatch.setenv("DIFFSIM_TPU_PALLAS_INTERPRET", "1")
    import diffsim_tpu.ops.pallas.spmd as spmd
    from diffsim_tpu.parallel import mesh as meshlib

    with spmd.kernel_mesh(meshlib.make_mesh(8)):
        assert use_streaming((8, 1, 16384, 512), (8, 1, 16384, 512))  # VAE mid @1024px
        # 512px VAE mid (4096 tokens) stays on XLA until the kernel is measured faster
        # there (its encode already runs at 83% MFU)
        assert not use_streaming((8, 1, 4096, 512), (8, 1, 4096, 512))
        assert not use_streaming((8, 8, 16384, 40), (8, 8, 16384, 40))  # narrow: fused kernel
        assert not use_streaming((8, 1, 1024, 512), (8, 1, 1024, 512))  # short: XLA
        assert not use_streaming((8, 1, 16384, 512), (8, 1, 77, 512))  # cross-attention


def test_streaming_attention_on_mesh(monkeypatch):
    """shard_map dispatch over the 8-device mesh (same SPMD contract as the fused kernel)."""
    monkeypatch.setenv("DIFFSIM_TPU_PALLAS_INTERPRET", "1")
    from diffsim_tpu.ops.pallas.attention_stream import streaming_self_attention
    import diffsim_tpu.ops.pallas.spmd as spmd
    from diffsim_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh(8)
    ds = meshlib.data_sharding(mesh)
    rng = np.random.default_rng(5)
    q, k, v = (jnp.asarray(rng.standard_normal((8, 1, 2048, 192)), jnp.float32) * 0.3
               for _ in range(3))
    calls = spmd.SMAP_CALLS
    fn = meshlib.kernel_jit(streaming_self_attention, mesh,
                            in_shardings=(ds, ds, ds), out_shardings=ds)
    out = np.asarray(fn(q, k, v))
    assert spmd.SMAP_CALLS == calls + 1
    monkeypatch.delenv("DIFFSIM_TPU_PALLAS_INTERPRET")
    ref = np.asarray(jax.nn.softmax((q @ jnp.swapaxes(k, -1, -2)) * 192**-0.5, -1) @ v)
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_no_pallas_kill_switch(monkeypatch):
    """DIFFSIM_TPU_NO_PALLAS=1 forces every dispatcher to the XLA math path — the
    operational escape hatch for unattended runs if a kernel misbehaves on new hardware."""
    monkeypatch.setenv("DIFFSIM_TPU_PALLAS_INTERPRET", "1")
    import diffsim_tpu.ops.pallas.spmd as spmd
    from diffsim_tpu.ops.pallas.attention import pallas_route
    from diffsim_tpu.parallel import mesh as meshlib

    with spmd.kernel_mesh(meshlib.make_mesh(8)):
        assert pallas_route(8)
        monkeypatch.setenv("DIFFSIM_TPU_NO_PALLAS", "1")
        assert not pallas_route(8)
