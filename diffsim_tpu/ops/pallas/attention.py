"""Pallas fused attention for the UNet's self-attention sites.

The hot spots are the 64x64-latent self-attentions (4096 tokens, head_dim 40): XLA
materializes the (B, heads, 4096, 4096) f32 logits in HBM — ~34 GB of traffic per layer at
the production pair batch, and an OOM wall for larger batches. This kernel keeps the whole
(q-block x seq) score tile in VMEM: per (batch*head, q-block) grid cell it reads the q block
plus the full K/V for that head, computes logits, softmax and the PV product without ever
spilling scores. K/V for one head at 4096 tokens is ~2 MB — comfortably inside the ~16 MB
VMEM budget (see the repo's pallas guide: VMEM blocks, f32 softmax on the VPU, MXU matmuls
with preferred_element_type=f32).

head_dim 40/80 underfills the MXU's 128-wide contraction/output tiles — an architectural
bound (~31% peak at hd 40) the committed profile (tools/profile_unet_ops.py) demonstrates.
What IS controllable is VPU elementwise traffic over the (bq, S) score tile, so the kernel
minimizes full-tile passes: the softmax scale folds into the exp operand (softmax(s*l) ==
exp(s*(l - max l)) row-wise), and the 1/sum normalization is deferred past the PV matmul
onto the (bq, D) output — 2 fewer full-tile passes than scale-then-softmax-then-divide.

Numerics match ops.attention.sdpa (f32 logits/softmax, output cast to the value dtype) up
to the deferred-normalization rounding (|delta| ~ 1 ulp of the value dtype; the CPU golden
path never routes here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    from diffsim_tpu.ops.pallas import spmd

    return spmd.interpret_env()


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, bf16_probs=False):
    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (S, D)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # softmax(scale * l) == exp(scale * (l - max l)) / sum(...): one fused elementwise
    # chain over the score tile instead of separate scale and divide passes
    m = jnp.max(logits, axis=-1, keepdims=True)
    centered = logits - m
    if bf16_probs:
        # fast mode (ops.attention.fast_softmax): exp/sum over the (bq, S) tile in bf16 —
        # half the VPU bytes on the dominant elementwise passes; f32 max keeps range safety
        centered = centered.astype(jnp.bfloat16)
    e = jnp.exp(centered * scale)
    s = jnp.sum(e, axis=-1, keepdims=True)
    pv = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (pv * (1.0 / s.astype(jnp.float32))).astype(o_ref.dtype)


def _block_q(s: int, d: int) -> int:
    """Largest power-of-two q block that (a) DIVIDES s — the grid is s // bq, so a
    non-divisor leaves the last rows of every (batch, head) unwritten — and (b) keeps the
    f32 score tile within ~8 MB of VMEM (2 MB cap for wide heads, whose K/V already claim
    ~8 MB: bq=256 at d=512/S=4096 measured 16.5 MB scoped, over the 16 MB limit).

    s is a multiple of 256 (use_fused), so s & -s >= 256 and every halving below it still
    divides s."""
    cap = 128 if d > 160 else 1024
    bq = min(cap, s & (-s), s)  # s & -s: largest power-of-two divisor of s
    budget = (2 if d > 160 else 8) * 1024 * 1024
    while bq > 128 and bq * s * 4 > budget:
        bq //= 2
    return bq


def _forward_impl(q, k, v, block_q, bf16_probs=False):
    """Kernel forward with SPMD dispatch: inside a declared kernel mesh (multi-device
    graphs) the pallas call is shard_mapped over the batch dim — per-shard invocation is
    exact because attention never mixes batch rows. See ops/pallas/spmd.py."""
    from diffsim_tpu.ops.pallas import spmd

    if spmd.batch_shardable(q.shape[0]):
        return spmd.smap_batch(
            lambda q, k, v: _pallas_forward(q, k, v, block_q, bf16_probs),
            (True, True, True),
        )(q, k, v)
    return _pallas_forward(q, k, v, block_q, bf16_probs)


def _pallas_forward(q, k, v, block_q, bf16_probs=False):
    b, h, s, d = q.shape
    # NOTE: max is taken over UNSCALED logits and the scale folded into exp's operand —
    # mathematically identical for scale > 0 (see module docstring)
    scale = d**-0.5
    bq = min(block_q, s)
    q3 = q.reshape(b * h, s, d)
    k3 = k.reshape(b * h, s, d)
    v3 = v.reshape(b * h, s, d)
    grid = (b * h, s // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, bf16_probs=bf16_probs),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), v.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=(b * h) * (s * d * 3 + s * d) * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        interpret=_interpret(),
    )(q3, k3, v3)
    return out.reshape(b, h, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_core(q, k, v, block_q, bf16_probs=False):
    return _forward_impl(q, k, v, block_q, bf16_probs)


def _fused_fwd(q, k, v, block_q, bf16_probs=False):
    return _forward_impl(q, k, v, block_q, bf16_probs), (q, k, v)


def _fused_bwd(block_q, bf16_probs, res, g):
    """Standard attention backward in XLA math (f32 softmax recompute) — the training path
    (DiT blocks under jax.grad) differentiates through the fused forward. Materializes the
    (S, S) weights in HBM like XLA's own attention backward would; training sequence lengths
    are <= 1024 tokens (DiT at 512px)."""
    q, k, v = res
    d = q.shape[-1]
    scale = d**-0.5
    logits = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * scale, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("...qk,...qd->...kd", w, g32, preferred_element_type=jnp.float32)
    dp = jnp.einsum("...qd,...kd->...qk", g32, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    tmp = (dp - jnp.sum(dp * w, axis=-1, keepdims=True)) * w
    dq = jnp.einsum("...qk,...kd->...qd", tmp, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("...qk,...qd->...kd", tmp, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fused_self_attention(q: jax.Array, k: jax.Array, v: jax.Array, block_q: int | None = None,
                         bf16_probs: bool = False):
    """(B, H, S, D) self-attention, softmax scale 1/sqrt(D). S must be a multiple of the
    q block (the UNet's token counts are powers of two). Differentiable: the backward is a
    custom VJP in XLA math (_fused_bwd; always f32 softmax — bf16_probs is a forward-only
    fast mode for scoring graphs), so training graphs (DiT) can route through the fused
    forward.

    Deliberately NOT jit-decorated: the SPMD dispatch (_forward_impl) and the interpret
    flag are read from trace-time context, and an inner jit's trace cache keys ONLY on
    avals/statics — a trace captured without the kernel mesh would be silently reused
    inside a sharded graph (and vice versa). Callers are jitted graphs anyway."""
    s, d = q.shape[-2], q.shape[-1]
    bq = block_q or _block_q(s, d)
    return _fused_core(q, k, v, bq, bf16_probs)


# self-attention sites worth routing through the kernel: every square UNet site with >= 256
# tokens. Measured on v5e at the production batch (tools/profile_unet_ops.py): the 256-token
# hd-160 sites spent 45.7 ms in XLA's materialized-logits path; the kernel keeps their score
# tiles in VMEM too. 77-token cross-attention stays on XLA (not square, tiny logits).
# NOT routed: the VAE's single-head d=512 mid attention — double-buffered K+V alone is
# 16 MB of VMEM at 4096x512 (measured scoped-vmem OOM); it would need K-streaming online
# softmax, and XLA's path there sits inside a VAE already at ~83% MFU.
MIN_FUSED_SEQ = 256


def pallas_route(batch0: int) -> bool:
    """Kernel routing guard shared by the pallas dispatchers, for a kernel whose dim 0 is
    the batch of size ``batch0``:

    * CPU never routes (pallas TPU kernels don't lower there) unless
      DIFFSIM_TPU_PALLAS_INTERPRET=1 — the test hook that exercises the multi-device
      dispatch path under ``pltpu.force_tpu_interpret_mode`` on the virtual CPU mesh.
    * Single device: always route (the proven direct path).
    * Multi-device: route only inside a declared kernel mesh whose data axis divides the
      batch — the dispatch then shard_maps the kernel over that axis (ops/pallas/spmd.py).
      Sharded graphs built outside ``parallel.mesh.kernel_jit`` keep the XLA math path,
      since a bare pallas custom call has no SPMD partitioning rule."""
    import os

    from diffsim_tpu.ops.pallas import spmd

    if os.environ.get("DIFFSIM_TPU_NO_PALLAS") == "1":
        return False  # kill switch: every site falls back to XLA math (same scores)
    if jax.devices()[0].platform == "cpu" and os.environ.get(
            "DIFFSIM_TPU_PALLAS_INTERPRET") != "1":
        return False
    if jax.device_count() == 1:
        return True
    return spmd.batch_shardable(batch0)


def use_fused(q_shape, k_shape) -> bool:
    """Shape-only predicate; the platform/SPMD gate (pallas_route) lives at
    the dispatch sites (ops.attention.sdpa, geglu_ff, use_fused_readout)."""
    return (
        q_shape[-2] == k_shape[-2]  # self-attention
        and q_shape[-2] >= MIN_FUSED_SEQ
        and q_shape[-2] % 256 == 0
        and q_shape[-1] <= 160
    )
