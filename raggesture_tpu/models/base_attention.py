"""Standard softmax attention variants (reference mogen/models/attentions/
base_attention.py:9-152: BaseSelfAttention / BaseCrossAttention /
BaseMixedAttention).

Registered alternatives to the linear "efficient" attention — not used by
the shipped config, but selectable via ``sa_block_cfg.type`` /
``ca_block_cfg.type`` for experiments.  Same interface as the efficient
blocks (masked keys, stylized residual)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.linear_attention import NEG_MASK
from ..registry import ATTENTIONS
from .layers import StylizationBlock, TorchLayerNorm


def _softmax_attention(q, k, v, num_heads, key_bias=None):
    """q: (B,T,D), k/v: (B,N,D) -> (B,T,D) standard scaled dot-product."""
    B, T, D = q.shape
    N = k.shape[1]
    H = num_heads
    Dh = D // H
    qh = q.reshape(B, T, H, Dh)
    kh = k.reshape(B, N, H, Dh)
    vh = v.reshape(B, N, H, Dh)
    logits = jnp.einsum("bthd,bnhd->bhtn", qh, kh) / jnp.sqrt(
        jnp.asarray(Dh, q.dtype))
    if key_bias is not None:
        logits = logits + key_bias
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhtn,bnhd->bthd", w, vh).reshape(B, T, D)


@ATTENTIONS.register_module()
class BaseSelfAttention(nn.Module):
    """base_attention.py:9-63: softmax self-attention with masked keys and
    stylized residual."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, src_mask, emb, deterministic: bool = True):
        B, T, D = x.shape
        xn = TorchLayerNorm(name="norm")(x)
        q = nn.Dense(D, name="query")(xn)
        k = nn.Dense(D, name="key")(xn)
        v = nn.Dense(D, name="value")(xn)
        key_bias = ((1.0 - src_mask).transpose(0, 2, 1)[:, None] * NEG_MASK)
        y = _softmax_attention(q, k, v, self.num_heads, key_bias)
        return x + StylizationBlock(self.latent_dim, self.dropout,
                                    name="proj_out")(y, emb, deterministic)


@ATTENTIONS.register_module()
class BaseCrossAttention(nn.Module):
    """base_attention.py:66-103: softmax cross-attention over condition
    features with condition dropout."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, xf, emb, query_mask=None, cond_mask=None,
                 deterministic: bool = True):
        B, T, D = x.shape
        xn = TorchLayerNorm(name="norm")(x)
        xfn = TorchLayerNorm(name="text_norm")(xf)
        q = nn.Dense(D, name="query")(xn)
        k = nn.Dense(D, name="key")(xfn)
        if cond_mask is not None:
            v = nn.Dense(D, name="value")(xfn * cond_mask)
            key_bias = ((1.0 - cond_mask) * NEG_MASK)[:, None, :, :]
            key_bias = jnp.broadcast_to(
                key_bias.reshape(B, 1, 1, 1), (B, 1, 1, xf.shape[1]))
        else:
            v = nn.Dense(D, name="value")(xfn)
            key_bias = None
        y = _softmax_attention(q, k, v, self.num_heads, key_bias)
        if query_mask is not None:
            y = y * query_mask.reshape(B, T, 1)
        return x + StylizationBlock(self.latent_dim, self.dropout,
                                    name="proj_out")(y, emb, deterministic)


@ATTENTIONS.register_module()
class BaseMixedAttention(nn.Module):
    """base_attention.py:105-152: joint self+cross softmax attention over
    the concatenated [x; xf] key/value sequence."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, xf, emb, src_mask=None, cond_mask=None,
                 deterministic: bool = True):
        B, T, D = x.shape
        xn = TorchLayerNorm(name="norm")(x)
        xfn = TorchLayerNorm(name="text_norm")(xf)
        q = nn.Dense(D, name="query")(xn)
        k = jnp.concatenate([
            nn.Dense(D, name="key_text")(xfn),
            nn.Dense(D, name="key_motion")(xn),
        ], axis=1)
        v = jnp.concatenate([
            nn.Dense(D, name="value_text")(
                xfn * cond_mask if cond_mask is not None else xfn),
            nn.Dense(D, name="value_motion")(
                xn * src_mask if src_mask is not None else xn),
        ], axis=1)
        N = xf.shape[1]
        bias_parts = []
        bias_parts.append(
            jnp.zeros((B, 1, 1, N)) if cond_mask is None
            else jnp.broadcast_to(((1.0 - cond_mask) * NEG_MASK
                                   ).reshape(B, 1, 1, 1), (B, 1, 1, N)))
        bias_parts.append(
            jnp.zeros((B, 1, 1, T)) if src_mask is None
            else ((1.0 - src_mask) * NEG_MASK).transpose(0, 2, 1)[:, None])
        key_bias = jnp.concatenate(bias_parts, axis=-1)
        y = _softmax_attention(q, k, v, self.num_heads, key_bias)
        return x + StylizationBlock(self.latent_dim, self.dropout,
                                    name="proj_out")(y, emb, deterministic)
