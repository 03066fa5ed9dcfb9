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


def group_size(num_heads: int, head_dim: int) -> int:
    """Heads per 128-lane group for :func:`grouped_linear_attention`.

    1 means "don't group" — the head dim already fills (or doesn't divide)
    the 128-lane vector tile."""
    if head_dim >= 128 or 128 % head_dim:
        return 1
    g = 128 // head_dim
    return g if num_heads % g == 0 else 1


def head_group_mask(g: int, dk: int, dv: int, dtype=jnp.float32) -> jnp.ndarray:
    """(g·dk, g·dv) mask keeping the g per-head diagonal blocks."""
    row = jax.lax.broadcasted_iota(jnp.int32, (g * dk, g * dv), 0) // dk
    col = jax.lax.broadcasted_iota(jnp.int32, (g * dk, g * dv), 1) // dv
    return (row == col).astype(dtype)


def grouped_linear_attention(q: jnp.ndarray, k_flat: jnp.ndarray,
                             v_flat: jnp.ndarray, num_heads: int,
                             g: int = 0) -> jnp.ndarray:
    """:func:`linear_attention` with keys/values kept FLAT (B, N, D).

    On TPU the per-head contraction pair is the training step's pathology:
    ``bnhd,bnhl->bhdl`` at Dh=32 runs as (32, N)·(N, 32) batched GEMMs at
    ~6% MXU utilization, and the (B, N, H, 32) operand reshapes tile-pad
    the lane dim 32→128 — 4× the HBM bytes, ~0.6 ms of pure relayout per
    layer at the train shapes (B=128, N=499).  This variant packs heads
    into 128-lane GROUPS (g = 128/Dh heads each): the group reshape of the
    flat (B, N, D) array is layout-free, the contraction runs as full
    (128, N)·(N, 128) MXU tiles, and masking the (128, 128) group context
    to its per-head diagonal blocks makes the readout exactly the per-head
    einsum pair (off-block q·ctx terms are zeroed) at g× the minimal FLOPs
    — a win whenever N ≫ g·Dh.  Off-TPU (or for non-dividing shapes) it
    falls back to the reference einsums bit-for-bit.

    q: (B, T, H, Dh) feature-softmaxed; k_flat: (B, N, D) time-softmaxed;
    v_flat: (B, N, D).  Returns (B, T, H, Dh).  ``g`` forces a group size
    (tests); 0 = auto (grouping on TPU, reference einsums elsewhere).
    """
    B, N, D = k_flat.shape
    H = num_heads
    dk = D // H
    dv = v_flat.shape[-1] // H
    T = q.shape[1]
    if g == 0:
        g = group_size(H, dk) if (dk == dv
                                  and jax.default_backend() == "tpu") else 1
    if g == 1:
        return linear_attention(q, k_flat.reshape(B, N, H, dk),
                                v_flat.reshape(B, N, H, dv))
    # one full-D contraction pair per 128-lane group, via LANE SLICES: a
    # 128-aligned slice of the flat (B, N, D) operand is tile-aligned
    # (free), where a (B, N, G, 128) reshape would sublane-pad G→8 and
    # re-materialize the whole tensor (measured +7 ms/step at the train
    # shapes before this formulation)
    mask = head_group_mask(g, dk, dv, k_flat.dtype)
    q_flat = q.reshape(B, T, D)
    ys = []
    for gi in range(H // g):
        ksl = k_flat[..., gi * g * dk:(gi + 1) * g * dk]
        vsl = v_flat[..., gi * g * dv:(gi + 1) * g * dv]
        ctx = jnp.einsum("bnd,bne->bde", ksl, vsl) * mask
        qsl = q_flat[..., gi * g * dk:(gi + 1) * g * dk]
        ys.append(jnp.einsum("btd,bde->bte", qsl, ctx))
    return jnp.concatenate(ys, axis=-1).reshape(B, T, H, dv)
