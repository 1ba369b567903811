"""Pallas fused GEGLU feed-forward for the UNet transformer blocks.

XLA runs the FF as two matmuls with the (N, 8c) projection materialized in HBM between
them — at the production batch the 64x64-latent sites write+read a ~3 GB intermediate per
transformer (~7 ms of pure HBM traffic each). This kernel tiles over rows and keeps the
whole (bq, 8c) projection in VMEM: x-tile @ W1 -> split -> h * gelu(gate) -> @ W2, nothing
spilled. Both weight matrices ride along in VMEM, which bounds applicability to c <= 640
(W1 is c x 8c bf16: 1.6 MB at c=320, 6.5 MB at c=640, 26 MB at c=1280 — too big).

Numerics match ops.blocks.geglu_ff (f32 matmul accumulation, exact-erf gelu, bf16
intermediate cast at the same point the XLA path casts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation, |error| <= 1.5e-7 — far below
    bf16 resolution. Mosaic implements neither erf nor erfc, so the exact-gelu path needs
    its own polynomial."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _interpret() -> bool:
    from diffsim_tpu.ops.pallas import spmd

    return spmd.interpret_env()


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]  # (bq, C)
    hg = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[...].astype(jnp.float32)
    h, g = jnp.split(hg, 2, axis=-1)
    gelu_g = 0.5 * g * (1.0 + _erf(g * 0.7071067811865476))
    y = (h * gelu_g).astype(x.dtype)
    out = jax.lax.dot_general(
        y, w2_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _forward_impl(x, w1, b1, w2, b2, block_rows):
    """Kernel forward with SPMD dispatch (see ops/pallas/spmd.py): inside a declared kernel
    mesh the pallas call is shard_mapped over the row dim; the block size is re-derived
    from the LOCAL row count (rows are independent, so block choice never changes values)."""
    from diffsim_tpu.ops.pallas import spmd

    if spmd.batch_shardable(x.shape[0]):
        return spmd.smap_batch(
            lambda x, w1, b1, w2, b2: _pallas_forward(
                x, w1, b1, w2, b2, _block_rows(x.shape[0], x.shape[1])),
            (True, False, False, False, False),
        )(x, w1, b1, w2, b2)
    return _pallas_forward(x, w1, b1, w2, b2, block_rows)


def _pallas_forward(x, w1, b1, w2, b2, block_rows):
    n, c = x.shape
    grid = (n // block_rows,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(b1.shape, lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(b2.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * w1.shape[1] + 2 * n * w2.shape[0] * c,
            bytes_accessed=(n * c * 2 + w1.size + w2.size) * x.dtype.itemsize,
            transcendentals=n * w2.shape[0],
        ),
        interpret=_interpret(),
    )(x, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_core(x, w1, b1, w2, b2, block_rows):
    return _forward_impl(x, w1, b1, w2, b2, block_rows)


def _fused_fwd(x, w1, b1, w2, b2, block_rows):
    return _forward_impl(x, w1, b1, w2, b2, block_rows), (x, w1, b1, w2, b2)


def _fused_bwd(block_rows, res, g_out):
    """GEGLU-FF backward in XLA math (f32 recompute of the hidden projection) — mirrors the
    fused attention kernel's custom VJP so jax.grad through UNet transformer blocks works on
    single-TPU exactly as it does on CPU/multi-chip (the fused forward is otherwise not
    differentiable: pallas_call has no automatic transpose rule)."""
    x, w1, b1, w2, b2 = res
    g32 = g_out.astype(jnp.float32)
    hg = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h, gate = jnp.split(hg, 2, axis=-1)
    inv_sqrt2 = 0.7071067811865476
    phi = 0.5 * (1.0 + jax.lax.erf(gate * inv_sqrt2))  # gelu(g)/g cdf term
    gelu_g = gate * phi
    y = (h * gelu_g).astype(x.dtype)  # the same cast point as the forward kernel
    dw2 = jnp.dot(y.astype(jnp.float32).T, g32, preferred_element_type=jnp.float32)
    db2 = jnp.sum(g32, axis=0)
    dy = jnp.dot(g32, w2.astype(jnp.float32).T, preferred_element_type=jnp.float32)
    dh = dy * gelu_g
    # d gelu(g)/dg = Phi(g) + g * pdf(g)
    pdf = jnp.exp(-0.5 * gate * gate) * 0.3989422804014327
    dgate = dy * h * (phi + gate * pdf)
    dhg = jnp.concatenate([dh, dgate], axis=-1)
    dx = jnp.dot(dhg, w1.astype(jnp.float32).T, preferred_element_type=jnp.float32)
    dw1 = jnp.dot(x.astype(jnp.float32).T, dhg, preferred_element_type=jnp.float32)
    db1 = jnp.sum(dhg, axis=0)
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fused_geglu_ff(x, w1, b1, w2, b2, block_rows: int = 512):
    """x (N, C); w1 (C, 8C); w2 (4C, C). N must be a multiple of block_rows.
    Differentiable: the backward is a custom VJP in XLA math (_fused_bwd).
    NOT jit-decorated — see fused_self_attention (trace-time context vs inner-jit cache)."""
    return _fused_core(x, w1, b1, w2, b2, block_rows)


MAX_FUSED_DIM = 640  # W1 must fit VMEM alongside the row tile


def _block_rows(n: int, c: int) -> int:
    """Largest row tile <= 512 (256 for wide c) that DIVIDES n — a non-divisor leaves the
    last rows unwritten (the grid is n // bq). Halves all the way to 1 so per-shard row
    counts under SPMD dispatch always get a valid (if small) block."""
    bq = 512 if c <= 320 else 256
    while bq > 1 and n % bq:
        bq //= 2
    return bq


def use_fused_ff(n: int, c: int, w1_cols: int) -> bool:
    from diffsim_tpu.ops.pallas.attention import pallas_route

    if not pallas_route(n):
        return False
    bq = _block_rows(n, c)
    return c <= MAX_FUSED_DIM and w1_cols == 8 * c and bq >= 8
