"""Shared building blocks: timestep embeddings, positional embeddings,
adaLN stylization, FFN.

Parity targets in /root/reference:
  - timestep_embedding: mogen/models/transformers/diffusion_transformer.py:27-46
    (cos-first concat order!)
  - PositionEmbeddingSine1D / Learned1D: mogen/models/utils/detr_utils.py:27-79
  - StylizationBlock: mogen/models/utils/stylization_block.py:14-40
  - FFN: mogen/models/transformers/diffusion_transformer.py:74-87
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


TorchLayerNorm = lambda **kw: nn.LayerNorm(epsilon=1e-5, **kw)
"""LayerNorm with torch's epsilon (1e-5, vs flax default 1e-6) — required
for numeric parity with converted torch checkpoints."""


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding, (N,) -> (N, dim).

    NOTE: cos block first, then sin — matching the reference exactly (its
    guided-diffusion port concatenates [cos, sin]).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def sine_position_table(max_len: int, d_model: int) -> jnp.ndarray:
    """DETR-style interleaved sine PE table (max_len, d_model):
    pe[:, 0::2] = sin, pe[:, 1::2] = cos."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


def _xavier_uniform_3d(key, shape, dtype=jnp.float32):
    """torch xavier_uniform_ on a (L, 1, D) parameter: fan_in = D,
    fan_out = L*D (receptive field = trailing dims product)."""
    L, d = shape
    fan_in, fan_out = d, L * d
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class LearnedPositionEmbedding(nn.Module):
    """Learned 1-D position embedding, xavier-uniform initialized like the
    reference's (max_len, 1, d) parameter."""

    max_len: int
    d_model: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # x: (B, T, D)
        pe = self.param("pe", _xavier_uniform_3d, (self.max_len, self.d_model))
        return x + pe[None, : x.shape[1], :]


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class StylizationBlock(nn.Module):
    """adaLN-style residual projector: SiLU(emb) -> scale/shift on
    LayerNorm(h), then SiLU -> dropout -> zero-init Linear."""

    latent_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h, emb, deterministic: bool = True):
        # emb: (B, time_embed_dim); h: (B, T, D)
        emb_out = nn.Dense(2 * self.latent_dim, name="emb_layer")(nn.silu(emb))
        scale, shift = jnp.split(emb_out[:, None, :], 2, axis=-1)
        h = TorchLayerNorm(name="norm")(h) * (1 + scale) + shift
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(
            self.latent_dim, kernel_init=zeros_init, bias_init=zeros_init,
            name="out_proj",
        )(h)
        return h


class FFN(nn.Module):
    """Feed-forward with zero-init second linear and stylized residual."""

    latent_dim: int
    ffn_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        y = nn.Dense(self.ffn_dim, name="linear1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(
            self.latent_dim, kernel_init=zeros_init, bias_init=zeros_init,
            name="linear2",
        )(y)
        y = x + StylizationBlock(self.latent_dim, self.dropout, name="proj_out")(
            y, emb, deterministic
        )
        return y


def strided_token_mask(frame_mask, chunk_size: int):
    """Frame-level mask (B, T_frames) -> 43-token-layout mask (B, 4L+3):
    stride by the chunk size and tile 4x with zero separators
    (diffusion_transformer.py:252-254).  One shared implementation for the
    codec encode and the denoiser (latent_motion_mask) so the token layout
    cannot desynchronize between the training encode and sampling paths."""
    m = frame_mask[:, ::chunk_size]
    sep = jnp.zeros_like(m[:, :1])
    return jnp.concatenate([m, sep, m, sep, m, sep, m], axis=1)
