"""Softmax-feature-map linear attention — the denoiser's core op.

The reference's "EfficientAttention" (/root/reference/mogen/models/
attentions/efficient_attention.py:8-102) is linear-complexity attention à la
ReMoDiffuse: queries are softmaxed over the per-head feature dim, keys over
the time dim (with additive -1e6 pre-softmax masking), and the two einsum
contractions

    ctx  = einsum('bnhd,bnhl->bhdl', K, V)     # sum over time
    out  = einsum('bnhd,bhdl->bnhl', Q, ctx)   # per-token readout

cost O(T · D²/H) instead of O(T² · D).

This module is the single entry point for that contraction pair so the XLA
path and the Pallas fused kernel are interchangeable (see
``raggesture_tpu/ops/pallas/linear_attention_kernel.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_MASK = -1_000_000.0  # the reference's additive mask constant


def feature_softmax_q(q: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the per-head feature dim. q: (B, T, H, Dh)."""
    return jax.nn.softmax(q, axis=-1)


def time_softmax_k(k: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the time dim. k: (B, T, H, Dh)."""
    return jax.nn.softmax(k, axis=1)


def linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """The two-contraction linear attention readout.

    q, k: (B, N, H, Dk) — already softmaxed (feature-dim / time-dim resp.)
    v:    (B, N, H, Dv)
    returns (B, T, H, Dv) with T = q's time length (q and k/v lengths may
    differ for cross attention).
    """
    ctx = jnp.einsum("bnhd,bnhl->bhdl", k, v)
    return jnp.einsum("bnhd,bhdl->bnhl", q, ctx)
