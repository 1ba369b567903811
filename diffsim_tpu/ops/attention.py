"""Scaled-dot-product attention for TPU.

One implementation serves the model forwards and the cross-image readout. Softmax statistics
accumulate in float32 regardless of the activation dtype (bf16 activations keep the MXU fed;
f32 softmax keeps parity with torch's F.scaled_dot_product_attention, which upcasts
internally). Shapes follow the reference tap layout (B, heads, seq, head_dim)
(/root/reference/diffsim/hacked_attn.py:74-83).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

_FAST_SOFTMAX: contextvars.ContextVar = contextvars.ContextVar("fast_softmax", default=False)


@contextlib.contextmanager
def fast_softmax(enabled: bool = True):
    """Trace-time opt-in: compute attention softmax probabilities in bfloat16 instead of
    float32 (the --bf16_softmax fast mode). A *numerics* experiment, NOT a throughput
    lever: the round-5 on-chip A/B (docs/MFU_CEILING.md §5) measured the bf16-probs
    contract 15% SLOWER at the production hd-40/4096-token sites — the v5e VPU is
    f32-native, so bf16 elementwise work upconverts and the cast passes are pure
    overhead. It BREAKS bit-parity with torch's f32-softmax
    F.scaled_dot_product_attention; ranking agreement is benched in BENCH_FAST.json.
    Scoring-graph builders enter this context while tracing (the flag is read at trace
    time, like ops/pallas/spmd.kernel_mesh)."""
    if not enabled:
        yield
        return
    token = _FAST_SOFTMAX.set(True)
    try:
        yield
    finally:
        _FAST_SOFTMAX.reset(token)


def fast_softmax_enabled() -> bool:
    return _FAST_SOFTMAX.get()


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
) -> jax.Array:
    """Attention over (..., heads, seq, head_dim) tensors; returns same-shape output.

    Default scale 1/sqrt(head_dim), matching torch F.scaled_dot_product_attention.
    Long self-attention sites (>=1024 tokens) on TPU route through the Pallas fused kernel
    (ops/pallas/attention.py), which keeps the score tile in VMEM instead of materializing
    (S, S) logits in HBM.
    """
    head_dim = q.shape[-1]
    if scale is None:
        scale = head_dim**-0.5
    if q.ndim == 4 and scale == head_dim**-0.5:
        from diffsim_tpu.ops.pallas.attention import (
            fused_self_attention,
            pallas_route,
            use_fused,
        )

        if use_fused(q.shape, k.shape) and pallas_route(q.shape[0]):
            return fused_self_attention(q, k, v, bf16_probs=fast_softmax_enabled())
        from diffsim_tpu.ops.pallas.attention_stream import (
            streaming_self_attention,
            use_streaming,
        )

        if use_streaming(q.shape, k.shape):
            # wide-head long-sequence sites (the VAE's single-head d=512 mid attention):
            # K/V streamed in blocks with online softmax — the full-K/V fused kernel's
            # VMEM budget doesn't admit d > 160 (16 MB of K+V at 4096 tokens)
            return streaming_self_attention(q, k, v, bf16_probs=fast_softmax_enabled())
    logits = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    )
    if fast_softmax_enabled():
        # fast mode: probabilities in bf16 (max subtraction still in f32 for range safety)
        logits = (logits - jnp.max(logits, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    weights = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "...qk,...kd->...qd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def split_heads(x: jax.Array, heads: int) -> jax.Array:
    """(B, S, H*D) -> (B, heads, S, D), the hacked-processor tap layout."""
    b, s, hd = x.shape
    return x.reshape(b, s, heads, hd // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, heads, S, D) -> (B, S, heads*D)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
