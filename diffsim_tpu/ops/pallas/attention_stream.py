"""K-streaming (flash-style) Pallas attention for WIDE-head self-attention sites.

The fused kernel in ops/pallas/attention.py holds each head's full K/V in VMEM — fine for
the UNet's head_dim 40-160, but the VAE's single-head d=512 mid attention blows the budget
(K+V alone are 16 MB at 4096 tokens; 64 MB at the 16,384 tokens of a 1024px encode — the
SDXL path). This kernel streams K/V in blocks with the online-softmax recurrence
(running row max m, normalizer l, unnormalized accumulator acc), so VMEM holds only
(q-block, k-block) tiles regardless of sequence length:

    m'   = max(m, rowmax(S_j))            S_j = Q K_j^T * scale
    l'   = l * exp(m - m') + rowsum(exp(S_j - m'))
    acc' = acc * exp(m - m') + exp(S_j - m') V_j
    out  = acc / l      (after the last k block)

Grid (batch*heads, q-blocks, k-blocks) with the k dim INNERMOST — Pallas TPU iterates the
grid sequentially with the last axis fastest, which is exactly the carry order the scratch
accumulators need. Numerics: f32 scores/normalizers, probabilities cast to the value dtype
for the PV matmul (same contract as the fused kernel; matches ops.attention.sdpa to ~1 ulp
of the value dtype).

Routed (ops.attention.sdpa) for square self-attention with head_dim > 160 and >= 2048
tokens on TPU — i.e. the VAE mid attention at >= 512px inputs, where XLA otherwise
materializes the (S, S) f32 logits in HBM (1.07 GB per 16,384-token image).
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


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, nk,
            bf16_probs=False):
    # m/l scratch are (bq, 128) with ALL LANES EQUAL — full-lane stores are the layout
    # Mosaic's own flash kernels use; (bq, 1) scalar columns are layout-hostile on the VPU
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # scale folded into exp's operand (same identity as the fused kernel: max over
    # unscaled logits, scale > 0)
    m_prev = m_ref[...]  # (bq, 128), lanes equal
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))  # broadcast -> (bq, 128)
    centered = s - m_new[:, :1]
    if bf16_probs:
        # fast mode (ops.attention.fast_softmax): exp and the tile rowsum run in bf16 —
        # same contract as the fused kernel's bf16_probs (f32 max keeps range safety);
        # the running l/acc recurrence stays in f32 scratch
        centered = centered.astype(jnp.bfloat16)
    p = jnp.exp(centered * scale)  # (bq, bk); bf16 in fast mode, f32 otherwise
    alpha = jnp.exp((m_prev - m_new) * scale)  # (bq, 128), lanes equal, f32
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True).astype(
        jnp.float32
    )
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[...] = m_new

    @pl.when(kk == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / l_ref[...][:, :1]).astype(o_ref.dtype)


def _pallas_forward(q, k, v, block_q, block_k, bf16_probs=False):
    b, h, s, d = q.shape
    scale = d**-0.5
    bq = min(block_q, s)
    bk = min(block_k, s)
    nk = s // bk
    q3 = q.reshape(b * h, s, d)
    k3 = k.reshape(b * h, s, d)
    v3 = v.reshape(b * h, s, d)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, nk=nk, bf16_probs=bf16_probs),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), v.dtype),
        grid=(b * h, s // bq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # m (running max, lanes equal)
            pltpu.VMEM((bq, 128), jnp.float32),  # l (normalizer, lanes equal)
            pltpu.VMEM((bq, d), jnp.float32),  # acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=(b * h) * (s * d * 4) * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        interpret=_interpret(),
    )(q3, k3, v3)
    return out.reshape(b, h, s, d)


def _forward_impl(q, k, v, block_q, block_k, bf16_probs=False):
    """SPMD dispatch identical to the fused kernel's (ops/pallas/spmd.py)."""
    from diffsim_tpu.ops.pallas import spmd

    if spmd.batch_shardable(q.shape[0]):
        return spmd.smap_batch(
            lambda q, k, v: _pallas_forward(q, k, v, block_q, block_k, bf16_probs),
            (True, True, True),
        )(q, k, v)
    return _pallas_forward(q, k, v, block_q, block_k, bf16_probs)


def _blocks(s: int, d: int) -> tuple[int, int]:
    """(block_q, block_k): largest power-of-two divisors of s within a VMEM budget of
    roughly bq*d(acc,f32) + 2*bk*d(K,V) + bq*bk(scores) + double-buffering ~ 6 MB."""
    bq = bk = 256
    while bq > 64 and s % bq:
        bq //= 2
    while bk > 64 and s % bk:
        bk //= 2
    return bq, bk


def streaming_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                             bf16_probs: bool = False):
    """(B, H, S, D) self-attention for wide heads (D > 160), softmax scale 1/sqrt(D).
    S must be a multiple of the blocks (powers of two >= 2048 in the routed sites).
    Forward-only: the scoring graphs never differentiate through the VAE encode."""
    s, d = q.shape[-2], q.shape[-1]
    bq, bk = _blocks(s, d)
    return _forward_impl(q, k, v, bq, bk, bf16_probs)


MIN_STREAM_SEQ = 8192  # route only where XLA is measured BAD: the 16,384-token 1024px VAE
# mid attention (~26% encode MFU, docs/PROFILE_R3.md). The 4096-token 512px site sits
# inside a VAE already at 83% MFU — keep XLA there until the kernel is measured faster
# on-chip (lower this threshold if it wins at 4096).


def use_streaming(q_shape, k_shape) -> bool:
    """Route square wide-head long-sequence self-attention (the VAE mid block at >=1024px
    inputs: single head, d 512, 16,384 tokens) through the K-streaming kernel on TPU."""
    from diffsim_tpu.ops.pallas.attention import pallas_route

    s, d = q_shape[-2], q_shape[-1]
    return (
        q_shape[-2] == k_shape[-2]
        and s >= MIN_STREAM_SEQ
        and s % 256 == 0
        and 160 < d <= 1024
        and pallas_route(q_shape[0])
    )
