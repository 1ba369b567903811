"""Pallas fused attention for the UNet's self-attention sites.

The hot spots are the 64x64-latent self-attentions (4096 tokens, head_dim 40): XLA
materializes the (B, heads, 4096, 4096) f32 logits in HBM — ~34 GB of traffic per layer at
the production pair batch, and an OOM wall for larger batches. This kernel keeps the whole
(q-block x seq) score tile in VMEM: per (batch*head, q-block) grid cell it reads the q block
plus the full K/V for that head, computes logits, softmax and the PV product without ever
spilling scores. K/V for one head at 4096 tokens is ~2 MB — comfortably inside the ~16 MB
VMEM budget (see the repo's pallas guide: VMEM blocks, f32 softmax on the VPU, MXU matmuls
with preferred_element_type=f32).

Numerics match ops.attention.sdpa (f32 logits/softmax, output cast to the value dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (S, D)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.dot(weights.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def fused_self_attention(q: jax.Array, k: jax.Array, v: jax.Array, block_q: int = 512):
    """(B, H, S, D) self-attention, softmax scale 1/sqrt(D). S must be a multiple of
    ``block_q`` (the UNet's token counts are powers of two)."""
    b, h, s, d = q.shape
    scale = d**-0.5
    bq = min(block_q, s)
    q3 = q.reshape(b * h, s, d)
    k3 = k.reshape(b * h, s, d)
    v3 = v.reshape(b * h, s, d)
    grid = (b * h, s // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
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
    )(q3, k3, v3)
    return out.reshape(b, h, s, d)


# self-attention sites worth routing through the kernel: long sequences where XLA's
# materialized logits dominate; short ones stay on the XLA path
MIN_FUSED_SEQ = 1024


def use_fused(q_shape, k_shape) -> bool:
    return (
        q_shape[-2] == k_shape[-2]  # self-attention
        and q_shape[-2] >= MIN_FUSED_SEQ
        and q_shape[-2] % 512 == 0
        and q_shape[-1] <= 128
    )
