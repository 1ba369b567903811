"""The DiffSim cross-image attention readout, shared by all backbones.

Given taps (Q, K, V) for two images, computes

    sim(attn(Q_A, K_B, V_B), attn(Q_A, K_A, V_A))   and symmetrically for B,

reduced with full-flatten cosine or MSE and averaged over both directions —
/root/reference/diffsim/diffsim.py:171-197, diffsim_xl.py:129-155, diffsim_dit.py:130-142.
The cosine runs over *everything* (batch incl. both CFG halves, heads, seq, head_dim), as the
reference flattens the entire store tensor.

All tensors carry a leading pair axis P: shapes (P, B, heads, seq, head_dim).
"""

from __future__ import annotations

import jax.numpy as jnp

from diffsim_tpu.ops.attention import sdpa

_COS_EPS = 1e-8  # torch F.cosine_similarity denominator clamp


def _flat_cosine(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Cosine over all-but-leading axes, f32, (P,) out."""
    xf = x.reshape(x.shape[0], -1).astype(jnp.float32)
    yf = y.reshape(y.shape[0], -1).astype(jnp.float32)
    dot = jnp.sum(xf * yf, axis=-1)
    nx = jnp.maximum(jnp.linalg.norm(xf, axis=-1), _COS_EPS)
    ny = jnp.maximum(jnp.linalg.norm(yf, axis=-1), _COS_EPS)
    return dot / (nx * ny)


def _flat_mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d = (x.astype(jnp.float32) - y.astype(jnp.float32)).reshape(x.shape[0], -1)
    return jnp.mean(d * d, axis=-1)


def cross_attention_score(qa, ka, va, qb, kb, vb, similarity: str = "cosine") -> jnp.ndarray:
    """(P,) DiffSim scores from per-image taps of shape (P, B, heads, seq, head_dim).

    Long self-attention taps on TPU route through the Pallas fused readout
    (ops/pallas/readout.py), which accumulates the similarity partials in VMEM instead of
    materializing the four attention outputs."""
    if similarity in ("cosine", "mse") and qa.ndim == 5 and qa.shape == kb.shape:
        from diffsim_tpu.ops.pallas.readout import fused_direction_score, use_fused_readout

        if use_fused_readout(qa.shape):
            a_on_b = fused_direction_score(qa, ka, va, kb, vb, similarity)
            b_on_a = fused_direction_score(qb, kb, vb, ka, va, similarity)
            return (a_on_b + b_on_a) / 2.0
    attn_a_on_b = sdpa(qa, kb, vb)
    attn_b_on_a = sdpa(qb, ka, va)
    self_attn_a = sdpa(qa, ka, va)
    self_attn_b = sdpa(qb, kb, vb)
    if similarity == "cosine":
        a_on_b = _flat_cosine(attn_a_on_b, self_attn_a)
        b_on_a = _flat_cosine(attn_b_on_a, self_attn_b)
    elif similarity == "mse":
        a_on_b = _flat_mse(attn_a_on_b, self_attn_a)
        b_on_a = _flat_mse(attn_b_on_a, self_attn_b)
    else:
        raise ValueError(f"unknown similarity: {similarity}")
    return (a_on_b + b_on_a) / 2.0


def cross_attention_score_ip(qa, ip_ka, ip_va, qb, ip_kb, ip_vb, similarity: str = "cosine"):
    """IP-Adapter variant: K/V are per-adapter lists; scores are averaged (cosine) or summed
    (mse — the reference's list-sum path, implemented correctly rather than crashing, quirk Q4
    of /root/reference/diffsim/diffsim.py:191-192)."""
    per_adapter = [
        cross_attention_score(qa, ka, va, qb, kb, vb, similarity)
        for ka, va, kb, vb in zip(ip_ka, ip_va, ip_kb, ip_vb)
    ]
    stacked = jnp.stack(per_adapter, axis=0)
    return jnp.mean(stacked, axis=0) if similarity == "cosine" else jnp.sum(stacked, axis=0)


def mask_to_latent(mask: jnp.ndarray, latent_side: int) -> jnp.ndarray:
    """Pixel-space foreground mask -> per-token query weights, the reference's ``mask_query``
    pipeline (/root/reference/metrics/diffeats.py:75-87): 5x5 max-pool dilation then bilinear
    resize to the latent grid. mask: (..., H, W) float in [0,1]; returns (..., latent_side^2).

    The reference generates masks with SAM (a torch-only dependency); here they are supplied
    precomputed — same downstream math."""
    import jax

    lead = mask.shape[:-2]
    m = mask.reshape((-1,) + mask.shape[-2:] + (1,)).astype(jnp.float32)
    m = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1), "SAME"
    )
    m = jax.image.resize(m, (m.shape[0], latent_side, latent_side, 1), "bilinear")
    return m.reshape(lead + (latent_side * latent_side,))


def feature_score(fa, fb, similarity: str = "cosine", minmax_normalize: bool = False):
    """diffeats-style readout on raw attention outputs: optional per-tensor min-max normalize
    then cosine/MSE (/root/reference/metrics/diffeats.py:136-205)."""
    if minmax_normalize:
        def _norm(x):
            xf = x.reshape(x.shape[0], -1).astype(jnp.float32)
            lo = xf.min(axis=-1, keepdims=True)
            hi = xf.max(axis=-1, keepdims=True)
            return (xf - lo) / (hi - lo + 1e-12)
        fa, fb = _norm(fa), _norm(fb)
    return _flat_cosine(fa, fb) if similarity == "cosine" else _flat_mse(fa, fb)
