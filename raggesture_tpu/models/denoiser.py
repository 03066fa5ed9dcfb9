"""The retrieval-augmented gesture diffusion denoiser (TPU-native).

Functional rebuild of the reference's ``ReGestureTransformer`` +
``DiffusionTransformer`` stack (/root/reference/mogen/models/transformers/
raggesture.py:887-1114 and diffusion_transformer.py:334-668): an 8-layer
decoder where each layer runs linear self-attention over the 43-token
body-part latent sequence, three parallel linear cross-attentions over
text / audio / speaker conditions, a mixing linear, and an adaLN-stylized
FFN, all modulated by the diffusion-timestep embedding.

Token layout (body_part_cat_axis="time", shipped config): per part
``L = max_seq_len // frame_chunk_size`` latent tokens (10 for 150 frames @
chunk 15), concatenated [upper, sep, hands, sep, face, sep, lowertrans] →
``T = 4L + 3 = 43`` tokens of width 512.

Train-time condition dropout: the reference draws ``cond_type ~
randint(0,100)`` per sample and masks conditions where ``cond_type % 10 ==
0`` (≈10% dropout) inside cross attention (raggesture.py:1024,
efficient_attention.py:83-86).  We pass the resulting {0,1} mask in as
``cond_mask`` so the module stays pure.

Replicated quirks (needed for structural checkpoint parity):
  - cross-attention adds ``(1-query_mask) * -1e6`` to its *output* at
    separator tokens (efficient_attention.py:93-98). Harmless downstream
    (LayerNorm removes uniform shifts; separators carry zero loss weight and
    zero attention mass) but replicated exactly.
  - masked cross-attention values are ``value_proj(norm(xf) * cond_mask)``
    — the value projection *bias* survives masking.
  - the output head and every stylization/FFN second linear are zero-init,
    so at init the network predicts exactly 0 (= x0-prediction of the data
    mean).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.linear_attention import (
    NEG_MASK,
    feature_softmax_q,
    grouped_linear_attention,
    time_softmax_k,
)
from .layers import (
    FFN,
    LearnedPositionEmbedding,
    StylizationBlock,
    TorchLayerNorm,
    sine_position_table,
    timestep_embedding,
    zeros_init,
)


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    """Hyperparameters of the shipped basegesture_len150_beat config
    (/root/reference/configs/raggesture_beatx/basegesture_len150_beat.py:32-99)."""

    latent_dim: int = 512
    time_embed_dim: int = 2048
    num_layers: int = 8
    num_heads: int = 16
    ff_size: int = 1024
    dropout: float = 0.0
    # cross-attention overrides (reference ca_block_cfg may differ from
    # sa_block_cfg; 0 / negative means 'same as self-attention')
    ca_num_heads: int = 0
    ca_dropout: float = -1.0
    text_latent_dim: int = 768   # precomputed BERT features
    audio_latent_dim: int = 768  # precomputed wav2vec2 features
    num_speakers: int = 25
    max_seq_len: int = 150
    frame_chunk_size: int = 15
    num_parts: int = 4
    # optional learned condition encoders (reference text/audio num_layers=0)
    text_num_layers: int = 0
    audio_num_layers: int = 0
    cond_enc_heads: int = 4
    cond_enc_ff: int = 2048

    @property
    def ca_heads(self) -> int:
        return self.ca_num_heads if self.ca_num_heads > 0 else self.num_heads

    @property
    def ca_drop(self) -> float:
        return self.ca_dropout if self.ca_dropout >= 0 else self.dropout

    @property
    def tokens_per_part(self) -> int:
        return self.max_seq_len // self.frame_chunk_size  # 10

    @property
    def num_tokens(self) -> int:
        return self.num_parts * self.tokens_per_part + (self.num_parts - 1)  # 43

    @property
    def sep_indices(self) -> tuple:
        """TRUE separator token positions in the 43-token layout."""
        L = self.tokens_per_part
        return (L, 2 * L + 1, 3 * L + 2)

    @property
    def quirk_sep_indices(self) -> tuple:
        """The reference's QUERY-MASK 'separator' indices [L, 2L, 3L]
        (diffusion_architecture.py:156: ``[(T-3)//4, 2*(T-3)//4,
        3*(T-3)//4]``) — NOT the true layout separators above.  Tokens 2L
        and 3L are VALID tokens (the last hands chunk and the 9th face
        chunk) that the reference masks anyway, while true separators 2L+1
        and 3L+2 stay unmasked; the released checkpoints were trained with
        this off-by-part-offset quirk, so checkpoint parity requires
        replicating it exactly (default_query_masks)."""
        L = self.tokens_per_part
        return (L, 2 * L, 3 * L)

    def part_slices(self) -> Dict[str, slice]:
        """Token index ranges of the four parts in the 43-token layout
        (order: upper, hands, face, lowertrans — diffusion_transformer.py:239-250)."""
        L = self.tokens_per_part
        return {
            "upper": slice(0, L),
            "hands": slice(L + 1, 2 * L + 1),
            "face": slice(2 * L + 2, 3 * L + 2),
            "lowertrans": slice(3 * L + 3, 4 * L + 3),
        }


class EfficientSelfAttention(nn.Module):
    """Linear self-attention with stylized residual (efficient_attention.py:8-45)."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, src_mask, emb, deterministic: bool = True):
        # x: (B,T,D); src_mask: (B,T,1); emb: (B,time_embed_dim)
        B, T, D = x.shape
        H = self.num_heads
        xn = TorchLayerNorm(name="norm")(x)
        q = nn.Dense(D, name="query")(xn)
        k = nn.Dense(D, name="key")(xn) + (1.0 - src_mask) * NEG_MASK
        v = nn.Dense(D, name="value")(xn) * src_mask
        q = feature_softmax_q(q.reshape(B, T, H, -1))
        # k/v stay FLAT: the time softmax is per-feature either way, and the
        # grouped contraction avoids the lane-padded (B,T,H,Dh) relayouts
        k = time_softmax_k(k)
        y = grouped_linear_attention(q, k, v, H).reshape(B, T, D)
        return x + StylizationBlock(self.latent_dim, self.dropout, name="proj_out")(
            y, emb, deterministic
        )


class EfficientCrossAttention(nn.Module):
    """Linear cross-attention with condition dropout and the output-side
    query-mask quirk (efficient_attention.py:48-102)."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, xf, emb, query_mask=None, cond_mask=None,
                 deterministic: bool = True):
        # x: (B,T,D); xf: (B,N,Dc); cond_mask: (B,1,1) in {0,1}; query_mask: (B,T)
        B, T, D = x.shape
        N = xf.shape[1]
        H = self.num_heads
        xn = TorchLayerNorm(name="norm")(x)
        xfn = TorchLayerNorm(name="text_norm")(xf)
        q = feature_softmax_q(nn.Dense(D, name="query")(xn).reshape(B, T, H, -1))
        k = nn.Dense(D, name="key")(xfn)
        if cond_mask is not None:
            k = k + (1.0 - cond_mask) * NEG_MASK
            v = nn.Dense(D, name="value")(xfn * cond_mask)
        else:
            v = nn.Dense(D, name="value")(xfn)
        k = time_softmax_k(k)
        y = grouped_linear_attention(q, k, v, H)
        if query_mask is not None:
            y = y + (1.0 - query_mask).reshape(B, T, 1, 1) * NEG_MASK
        y = y.reshape(B, T, D)
        return x + StylizationBlock(self.latent_dim, self.dropout, name="proj_out")(
            y, emb, deterministic
        )


COND_KEYS = ("xf_text", "xf_audio", "xf_spk")


class DecoderLayer(nn.Module):
    """self-attn -> 3 parallel cross-attns -> concat -> mix -> FFN
    (diffusion_transformer.py:90-127)."""

    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, x, conds, emb, src_mask, query_masks, cond_mask,
                 deterministic: bool = True):
        c = self.cfg
        x = EfficientSelfAttention(c.latent_dim, c.num_heads, c.dropout,
                                   name="sa_block")(x, src_mask, emb, deterministic)
        outs = []
        for key in COND_KEYS:
            qm = query_masks[key] if query_masks is not None else None
            outs.append(
                EfficientCrossAttention(c.latent_dim, c.ca_heads, c.ca_drop,
                                        name=f"ca_{key}")(
                    x, conds[key], emb, query_mask=qm, cond_mask=cond_mask,
                    deterministic=deterministic,
                )
            )
        x = nn.Dense(c.latent_dim, name="ca_mix")(jnp.concatenate(outs, axis=-1))
        x = FFN(c.latent_dim, c.ff_size, c.dropout, name="ffn")(
            x, emb, deterministic
        )
        return x


def _speaker_embed_init(key, shape, dtype=jnp.float32):
    """normal(0,1)/latent_dim init (diffusion_transformer.py:538-542)."""
    return jax.random.normal(key, shape, dtype) / shape[-1]


class CondTransformerEncoder(nn.Module):
    """Optional pre-norm-free torch-style TransformerEncoder over condition
    features (used when text/audio num_layers > 0; shipped config: 0)."""

    num_layers: int
    d_model: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_layers):
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.d_model,
                dropout_rate=self.dropout, name=f"attn_{i}",
            )(x, x, deterministic=deterministic)
            x = TorchLayerNorm(name=f"norm1_{i}")(x + attn)
            y = nn.Dense(self.ff_dim, name=f"ff1_{i}")(x)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.d_model, name=f"ff2_{i}")(y)
            x = TorchLayerNorm(name=f"norm2_{i}")(x + y)
        x = TorchLayerNorm(name="final_norm")(x)
        return x


class GestureDenoiser(nn.Module):
    """The full denoiser: condition encoders + token/pos embeddings +
    decoder stack + zero-init output head."""

    cfg: DenoiserConfig = DenoiserConfig()

    def setup(self):
        c = self.cfg
        self.joint_embed = nn.Dense(c.latent_dim, name="joint_embed")
        self.time_embed_1 = nn.Dense(c.time_embed_dim, name="time_embed_1")
        self.time_embed_2 = nn.Dense(c.time_embed_dim, name="time_embed_2")
        self.text_pre_proj = nn.Dense(c.latent_dim, name="text_pre_proj")
        self.audio_pre_proj = nn.Dense(c.latent_dim, name="audio_pre_proj")
        self.speaker_embedding = nn.Embed(
            c.num_speakers, c.latent_dim, embedding_init=_speaker_embed_init,
            name="speaker_embedding",
        )
        if c.text_num_layers > 0:
            self.text_encoder = CondTransformerEncoder(
                c.text_num_layers, c.latent_dim, c.cond_enc_heads, c.cond_enc_ff,
                c.dropout, name="text_encoder",
            )
        if c.audio_num_layers > 0:
            self.audio_encoder = CondTransformerEncoder(
                c.audio_num_layers, c.latent_dim, c.cond_enc_heads, c.cond_enc_ff,
                c.dropout, name="audio_encoder",
            )
        self.global_pos = LearnedPositionEmbedding(
            c.num_tokens, c.latent_dim, name="global_positional_embedding"
        )
        self.blocks = [
            DecoderLayer(c, name=f"block_{i}") for i in range(c.num_layers)
        ]
        self.out = nn.Dense(
            c.latent_dim, kernel_init=zeros_init, bias_init=zeros_init, name="out"
        )

    def encode_conditions(self, text_feats, audio_feats, speaker_ids,
                          deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Project raw condition features into the latent width.

        text_feats: (B, Nt, 768) frame-aligned BERT; audio_feats: (B, Na, 768)
        wav2vec2; speaker_ids: (B,) or (B, 1) int.  Reference
        get_precompute_condition (raggesture.py:957-1013).
        """
        xf_text = self.text_pre_proj(text_feats)
        if self.cfg.text_num_layers > 0:
            xf_text = self.text_encoder(xf_text, deterministic)
        xf_audio = self.audio_pre_proj(audio_feats)
        if self.cfg.audio_num_layers > 0:
            xf_audio = self.audio_encoder(xf_audio, deterministic)
        if speaker_ids.ndim == 1:
            speaker_ids = speaker_ids[:, None]
        xf_spk = self.speaker_embedding(speaker_ids)  # (B, 1, D)
        return {"xf_text": xf_text, "xf_audio": xf_audio, "xf_spk": xf_spk}

    def __call__(self, latents, timesteps, motion_mask, conds,
                 query_masks=None, cond_mask=None, deterministic: bool = True):
        """Denoise one step.

        latents: (B, 43, 512) noisy latent tokens
        timesteps: (B,) original-scale diffusion timesteps
        motion_mask: (B, 43) validity mask (zeros at separators/padding)
        conds: dict with xf_text (B,Nt,D), xf_audio (B,Na,D), xf_spk (B,1,D)
        query_masks: dict cond-name -> (B, 43) cross-attn output masks
        cond_mask: (B, 1, 1) {0,1} condition-dropout mask
        returns (B, 43, 512) model prediction (x0 under the shipped config)
        """
        c = self.cfg
        B, T, _ = latents.shape
        L = c.tokens_per_part

        src_mask = motion_mask[..., None].astype(latents.dtype)

        emb = timestep_embedding(timesteps, c.latent_dim)
        emb = self.time_embed_2(nn.silu(self.time_embed_1(emb)))

        h = self.joint_embed(latents)

        # per-part sine PE with zero separators (diffusion_transformer.py:649-654)
        pos = sine_position_table(L, c.latent_dim)
        sep = jnp.zeros((1, c.latent_dim))
        pos_cat = jnp.concatenate([pos, sep, pos, sep, pos, sep, pos], axis=0)
        h = h + pos_cat[None, :T, :]
        h = self.global_pos(h)

        for block in self.blocks:
            h = block(h, conds, emb, src_mask, query_masks, cond_mask,
                      deterministic)

        return self.out(h)


def default_query_masks(cfg: DenoiserConfig, batch: int) -> Dict[str, jnp.ndarray]:
    """Cross-attention query masks: ones except the reference's 3
    'separator' indices [L, 2L, 3L] (diffusion_architecture.py:151-166).

    NOTE these are the reference's off-by-part-offset QUIRK indices, not
    the layout's true separators — see DenoiserConfig.quirk_sep_indices.
    """
    m = jnp.ones((batch, cfg.num_tokens))
    m = m.at[:, list(cfg.quirk_sep_indices)].set(0.0)
    return {k: m for k in COND_KEYS}


def latent_motion_mask(cfg: DenoiserConfig, frame_mask: jnp.ndarray) -> jnp.ndarray:
    """Frame-level mask (B, 150) -> token-level mask (B, 43)
    (diffusion_transformer.py:252-254; shared with GestureCodec.encode)."""
    from .layers import strided_token_mask

    return strided_token_mask(frame_mask, cfg.frame_chunk_size)
