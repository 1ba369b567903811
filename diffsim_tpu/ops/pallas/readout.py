"""Pallas fused DiffSim readout: cross/self attention + similarity accumulation in one pass.

The readout computes ``sim(attn(Q_A,K_B,V_B), attn(Q_A,K_A,V_A))`` per pair
(/root/reference/diffsim/diffsim.py:171-197). Done naively, both attention outputs
materialize in HBM just to be dot-producted and discarded. This kernel computes both
attentions for one q-block in VMEM and accumulates the three cosine partials
(sum(o1*o2), sum(o1^2), sum(o2^2)) — or the MSE partial sum((o1-o2)^2) — directly to SMEM
scalars. The final per-pair reduction (sum partials over batch/heads/q-blocks, then
dot/sqrt(n1*n2)) runs in plain jnp; flattened-cosine math is exactly preserved because
cosine(flatten) = sum(dot) / sqrt(sum(n1) * sum(n2)).
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


def _kernel(q_ref, k1_ref, v1_ref, k2_ref, v2_ref, out_ref, *, scale, mse):
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]

    def attn(k_ref, v_ref):
        logits = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.dot(w.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)

    o1 = attn(k1_ref, v1_ref)  # cross: attn(q, K_other, V_other)
    o2 = attn(k2_ref, v2_ref)  # self:  attn(q, K_own, V_own)
    if mse:
        d = o1 - o2
        vals = jnp.stack([jnp.sum(d * d), 0.0, 0.0])
    else:
        vals = jnp.stack([jnp.sum(o1 * o2), jnp.sum(o1 * o1), jnp.sum(o2 * o2)])
    # accumulate into lane 0 of the (3, 128) row for this N-index: VMEM stores must be
    # vectors, so the scalars broadcast through a lane-0 mask; q-blocks (j) accumulate
    lanes = jax.lax.broadcasted_iota(jnp.int32, (3, 128), 1)
    update = jnp.where(lanes == 0, vals[:, None], 0.0)

    @pl.when(j == 0)
    def _():
        out_ref[i] = jnp.zeros((3, 128), jnp.float32)

    out_ref[i] = out_ref[i] + update


def _pallas_partials(q, k_cross, v_cross, k_self, v_self, mse: bool, block_q: int):
    """(N, 3, 128) partial buffer for N (local) rows — shapes derived from the args so the
    same function serves the direct path and each shard of the SPMD path."""
    n, s, d = q.shape
    bq = min(block_q, s)
    nqb = s // bq
    grid = (n, nqb)
    scale = d**-0.5
    kv_spec = pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    # partials land in one full-array VMEM buffer (N, 3, 128), accumulated over q-blocks in
    # lane 0; rows are (pair*batch*head) — tiny enough to live in VMEM whole
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, mse=mse),
        out_shape=jax.ShapeDtypeStruct((n, 3, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                kv_spec, kv_spec, kv_spec, kv_spec,
            ],
            out_specs=pl.BlockSpec((n, 3, 128), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * s * s * d,
            bytes_accessed=n * s * d * 5 * q.dtype.itemsize,
            transcendentals=2 * n * s * s,
        ),
        interpret=_interpret(),
    )(q, k_cross, v_cross, k_self, v_self)


def cross_self_partials(q, k_cross, v_cross, k_self, v_self, mse: bool = False, block_q: int = 512):
    """All inputs (N, S, D) with N = P*B*heads flattened. Returns three (N,) f32
    partial-sum arrays (dot/mse, |cross|^2, |self|^2). Inside a declared kernel mesh the
    pallas call is shard_mapped over N (rows are independent pairs*batch*heads — see
    ops/pallas/spmd.py). NOT jit-decorated — see fused_self_attention (trace-time context
    vs inner-jit cache)."""
    from diffsim_tpu.ops.pallas import spmd

    call = functools.partial(_pallas_partials, mse=mse, block_q=block_q)
    if spmd.batch_shardable(q.shape[0]):
        out = spmd.smap_batch(call, (True,) * 5)(q, k_cross, v_cross, k_self, v_self)
    else:
        out = call(q, k_cross, v_cross, k_self, v_self)
    return out[:, 0, 0], out[:, 1, 0], out[:, 2, 0]


_COS_EPS = 1e-8


def fused_direction_score(qa, ka, va, kb, vb, similarity: str = "cosine") -> jax.Array:
    """One direction of the DiffSim readout for (P, B, H, S, D) taps: similarity between
    attn(qa, kb, vb) and attn(qa, ka, va), flattened per pair."""
    p, b, h, s, d = qa.shape

    def flat(x):
        return x.reshape(p * b * h, s, d)

    dot, n1, n2 = cross_self_partials(
        flat(qa), flat(kb), flat(vb), flat(ka), flat(va), mse=(similarity == "mse")
    )
    per_pair = lambda x: x.reshape(p, b * h).sum(axis=1)
    if similarity == "mse":
        return per_pair(dot) / (b * h * s * d)
    num = per_pair(dot)
    den = jnp.maximum(jnp.sqrt(per_pair(n1)), _COS_EPS) * jnp.maximum(jnp.sqrt(per_pair(n2)), _COS_EPS)
    return num / den


def use_fused_readout(q_shape) -> bool:
    """Route through the kernel on TPU for self-attention-shaped taps with aligned sequence
    lengths; the XLA path handles everything else (cross-attn K of 77 tokens, CPU, odd S,
    sharded graphs without a declared kernel mesh — see attention.pallas_route)."""
    from diffsim_tpu.ops.pallas.attention import pallas_route

    p, b, h, s, d = q_shape
    return s >= 512 and s % 512 == 0 and d <= 128 and pallas_route(p * b * h)
