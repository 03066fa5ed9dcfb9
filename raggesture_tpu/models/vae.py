"""Body-part Transformer-VAEs: the frozen latent codec under the diffusion.

Rebuild of the reference ``TransformerVAE`` (/root/reference/mogen/models/
transformers/gesture_vae.py:25-239) and its DETR-style skip-connection
transformer (detr_utils.py:101-210): a chunked VAE that encodes each
``frame_chunk_size``-frame window of a body part's 6d-rotation features into
one 512-d latent token, and decodes a full token sequence back to frames in
one pass.

Shapes (shipped config, 150 frames @ chunk 15):
  encode: (B, 150, nfeats) -> (B*10, 15, nfeats) -> one (mu, logvar) token
          pair per chunk -> z (B, 10, 512)
  decode: z (B, 10, 512) + 150 zero queries -> full-sequence skip encoder ->
          (B, 150, nfeats)

Replicated structural quirks (trained checkpoints depend on them):
  - the decoder passes ``pos = PE(xseq0)`` where ``PE(x) = x + pe`` — so every
    layer's q/k get ``src + xseq0 + pe`` (gesture_vae.py:216-219 with
    detr_utils.py:73-79,355-363).  The encoder path does NOT have this quirk
    (PE is applied once to the stream, pos=None).
  - ``encode_to_dist`` *samples* z (rsample) even when used as a frozen
    feature extractor (gesture_vae.py:111-121) — callers pass an rng or set
    ``sample=False`` for the deterministic mean.
  - the "all_encoder" decode arch uses num_heads*8 heads (gesture_vae.py:59-71).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchLayerNorm, _xavier_uniform_3d, sine_position_table


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    nfeats: int
    latent_dim: int = 512
    num_layers: int = 8
    num_heads: int = 4
    ff_size: int = 1024
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    position_embedding: str = "learned"  # or "sine"
    decoder_arch: str = "all_encoder"    # or "encoder_decoder"
    vae_dist: str = "normal"
    frame_chunk_size: int = 15
    num_frames: int = 150
    pe_max_len: int = 1024


def _activation(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "relu":
        return nn.relu
    raise ValueError(name)


class PositionalEmbedding(nn.Module):
    """Learned (xavier-init) or sine PE; returns x + pe[:T]."""

    d_model: int
    kind: str = "learned"
    max_len: int = 1024

    @nn.compact
    def __call__(self, x):  # (B, T, D)
        T = x.shape[1]
        if self.kind == "learned":
            pe = self.param("pe", _xavier_uniform_3d, (self.max_len, self.d_model))
        else:
            pe = sine_position_table(self.max_len, self.d_model)
        return x + pe[None, :T, :]


class TorchMHA(nn.Module):
    """Softmax multi-head attention matching torch.nn.MultiheadAttention
    semantics (packed qkv proj + out proj, key_padding_mask excludes keys)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, deterministic=True):
        # q: (B, Tq, D); k, v: (B, Tk, D); key_padding_mask: (B, Tk) True=valid
        from ..ops.pallas import mha_kernel

        B, Tq, D = q.shape
        H = self.num_heads
        Dh = D // H
        qd = nn.Dense(D, name="q_proj")(q)
        kd = nn.Dense(D, name="k_proj")(k)
        vd = nn.Dense(D, name="v_proj")(v)
        # the many-tiny-head decoders (H*8 heads, Dh 8/16) are HBM-bound
        # through XLA (the (B,H,T,T) logits round-trip); the Pallas kernel
        # keeps logits VMEM-resident (ops/pallas/mha_kernel.py).  Masked or
        # dropout-active calls use the einsum path (same math).
        dropout_active = self.dropout > 0.0 and not deterministic
        if (key_padding_mask is None and not dropout_active
                and jax.default_backend() == "tpu"
                and mha_kernel.supported(qd, kd, H)):
            # the kernel accumulates/returns f32; cast back so both
            # branches hand out_proj the same compute dtype under bf16
            out = mha_kernel.fused_softmax_mha(
                qd, kd, vd, H, 1.0 / math.sqrt(Dh)).astype(qd.dtype)
        else:
            qp = qd.reshape(B, Tq, H, Dh)
            kp = kd.reshape(B, -1, H, Dh)
            vp = vd.reshape(B, -1, H, Dh)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / jnp.sqrt(
                jnp.asarray(Dh, q.dtype)
            )
            if key_padding_mask is not None:
                bias = jnp.where(key_padding_mask[:, None, None, :], 0.0,
                                 -1e9)
                logits = logits + bias
            w = jax.nn.softmax(logits, axis=-1)
            w = nn.Dropout(self.dropout)(w, deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", w, vp).reshape(B, Tq, D)
        return nn.Dense(D, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """torch TransformerEncoderLayer (detr_utils.py:335-393), post- or
    pre-norm. ``pos`` is added to q/k only (not v)."""

    cfg: VAEConfig
    num_heads: int

    @nn.compact
    def __call__(self, x, pos=None, key_padding_mask=None, deterministic=True):
        c = self.cfg
        act = _activation(c.activation)
        drop = lambda y: nn.Dropout(c.dropout)(y, deterministic=deterministic)

        def attn_block(xin):
            qk = xin if pos is None else xin + pos
            return TorchMHA(c.latent_dim, self.num_heads, c.dropout,
                            name="self_attn")(qk, qk, xin, key_padding_mask,
                                              deterministic)

        def ff_block(xin):
            y = nn.Dense(c.ff_size, name="linear1")(xin)
            y = drop(act(y))
            return nn.Dense(c.latent_dim, name="linear2")(y)

        if c.normalize_before:
            x = x + drop(attn_block(TorchLayerNorm(name="norm1")(x)))
            x = x + drop(ff_block(TorchLayerNorm(name="norm2")(x)))
        else:
            x = TorchLayerNorm(name="norm1")(x + drop(attn_block(x)))
            x = TorchLayerNorm(name="norm2")(x + drop(ff_block(x)))
        return x


class DecoderLayerTorch(nn.Module):
    """torch TransformerDecoderLayer (detr_utils.py:396-467) for the optional
    encoder_decoder arch: self-attn + cross-attn to memory + FFN."""

    cfg: VAEConfig
    num_heads: int

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None,
                 deterministic=True):
        c = self.cfg
        act = _activation(c.activation)
        drop = lambda y: nn.Dropout(c.dropout)(y, deterministic=deterministic)
        add_pos = lambda t, p: t if p is None else t + p

        def sa(xin):
            qk = add_pos(xin, query_pos)
            return TorchMHA(c.latent_dim, self.num_heads, c.dropout,
                            name="self_attn")(qk, qk, xin, tgt_key_padding_mask,
                                              deterministic)

        def ca(xin):
            return TorchMHA(c.latent_dim, self.num_heads, c.dropout,
                            name="multihead_attn")(
                add_pos(xin, query_pos), add_pos(memory, pos), memory,
                memory_key_padding_mask, deterministic)

        def ff(xin):
            y = nn.Dense(c.ff_size, name="linear1")(xin)
            y = drop(act(y))
            return nn.Dense(c.latent_dim, name="linear2")(y)

        if c.normalize_before:
            tgt = tgt + drop(sa(TorchLayerNorm(name="norm1")(tgt)))
            tgt = tgt + drop(ca(TorchLayerNorm(name="norm2")(tgt)))
            tgt = tgt + drop(ff(TorchLayerNorm(name="norm3")(tgt)))
        else:
            tgt = TorchLayerNorm(name="norm1")(tgt + drop(sa(tgt)))
            tgt = TorchLayerNorm(name="norm2")(tgt + drop(ca(tgt)))
            tgt = TorchLayerNorm(name="norm3")(tgt + drop(ff(tgt)))
        return tgt


class SkipTransformerEncoder(nn.Module):
    """U-Net-arranged encoder stack with cat+linear skip merges
    (detr_utils.py:101-148).  num_layers is rounded up to odd."""

    cfg: VAEConfig
    num_layers: int
    num_heads: int

    @nn.compact
    def __call__(self, x, pos=None, key_padding_mask=None, deterministic=True):
        c = self.cfg
        n = self.num_layers + (1 if self.num_layers % 2 == 0 else 0)
        num_block = (n - 1) // 2
        kwargs = dict(pos=pos, key_padding_mask=key_padding_mask,
                      deterministic=deterministic)
        xs = []
        for i in range(num_block):
            x = EncoderLayer(c, self.num_heads, name=f"input_{i}")(x, **kwargs)
            xs.append(x)
        x = EncoderLayer(c, self.num_heads, name="middle")(x, **kwargs)
        for i in range(num_block):
            x = jnp.concatenate([x, xs.pop()], axis=-1)
            x = nn.Dense(c.latent_dim, name=f"skip_linear_{i}")(x)
            x = EncoderLayer(c, self.num_heads, name=f"output_{i}")(x, **kwargs)
        x = TorchLayerNorm(name="final_norm")(x)
        return x


class SkipTransformerDecoder(nn.Module):
    """Skip-connected decoder stack (detr_utils.py:150-210)."""

    cfg: VAEConfig
    num_layers: int
    num_heads: int

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None,
                 tgt_key_padding_mask=None, deterministic=True):
        c = self.cfg
        n = self.num_layers + (1 if self.num_layers % 2 == 0 else 0)
        num_block = (n - 1) // 2
        kwargs = dict(pos=pos, query_pos=query_pos,
                      tgt_key_padding_mask=tgt_key_padding_mask,
                      deterministic=deterministic)
        xs = []
        x = tgt
        for i in range(num_block):
            x = DecoderLayerTorch(c, self.num_heads, name=f"input_{i}")(
                x, memory, **kwargs)
            xs.append(x)
        x = DecoderLayerTorch(c, self.num_heads, name="middle")(x, memory, **kwargs)
        for i in range(num_block):
            x = jnp.concatenate([x, xs.pop()], axis=-1)
            x = nn.Dense(c.latent_dim, name=f"skip_linear_{i}")(x)
            x = DecoderLayerTorch(c, self.num_heads, name=f"output_{i}")(
                x, memory, **kwargs)
        x = TorchLayerNorm(name="final_norm")(x)
        return x


def _randn_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class TransformerVAE(nn.Module):
    """One body part's chunked VAE."""

    cfg: VAEConfig

    def setup(self):
        c = self.cfg
        self.skel_embedding = nn.Dense(c.latent_dim, name="skel_embedding")
        self.final_layer = nn.Dense(c.nfeats, name="final_layer")
        self.global_motion_token = self.param(
            "global_motion_token", _randn_init, (2, c.latent_dim)
        )
        self.query_pos_encoder = PositionalEmbedding(
            c.latent_dim, c.position_embedding, c.pe_max_len,
            name="query_pos_encoder",
        )
        self.query_pos_decoder = PositionalEmbedding(
            c.latent_dim, c.position_embedding, c.pe_max_len,
            name="query_pos_decoder",
        )
        self.encoder = SkipTransformerEncoder(
            c, c.num_layers, c.num_heads, name="encoder"
        )
        if c.decoder_arch == "all_encoder":
            self.decoder = SkipTransformerEncoder(
                c, c.num_layers, c.num_heads * 8, name="decoder"
            )
        elif c.decoder_arch == "encoder_decoder":
            self.mem_pos_decoder = PositionalEmbedding(
                c.latent_dim, c.position_embedding, c.pe_max_len,
                name="mem_pos_decoder",
            )
            self.decoder = SkipTransformerDecoder(
                c, (c.num_layers - 1) * 4 + 1, c.num_heads * 4, name="decoder"
            )
        else:
            raise ValueError(c.decoder_arch)

    def encode_dist(self, features, frame_mask=None, deterministic=True):
        """(B, n_frames, nfeats) -> (mu, logvar) each (B, n_chunks, latent)."""
        c = self.cfg
        B, n_frames, nfeats = features.shape
        n_chunks = n_frames // c.frame_chunk_size
        x = features.reshape(B * n_chunks, c.frame_chunk_size, nfeats)
        x = self.skel_embedding(x)
        dist_tokens = jnp.broadcast_to(
            self.global_motion_token[None], (B * n_chunks, 2, c.latent_dim)
        )
        xseq = jnp.concatenate([dist_tokens, x], axis=1)
        xseq = self.query_pos_encoder(xseq)
        if frame_mask is not None:
            m = frame_mask.reshape(B * n_chunks, c.frame_chunk_size) > 0
            aug = jnp.concatenate(
                [jnp.ones((B * n_chunks, 2), bool), m], axis=1
            )
        else:
            aug = None
        latent = self.encoder(xseq, key_padding_mask=aug,
                              deterministic=deterministic)[:, :2]
        mu = latent[:, 0].reshape(B, n_chunks, c.latent_dim)
        logvar = latent[:, 1].reshape(B, n_chunks, c.latent_dim)
        return mu, logvar

    def encode_to_dist(self, features, rng=None, sample=True, frame_mask=None,
                       deterministic=True):
        """Returns (z, (mu, logvar)); samples z ~ N(mu, exp(logvar)) like the
        reference (gesture_vae.py:111-121) unless sample=False."""
        mu, logvar = self.encode_dist(features, frame_mask, deterministic)
        if sample:
            if rng is None:
                rng = self.make_rng("vae")
            std = jnp.exp(0.5 * logvar)
            z = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
        else:
            z = mu
        return z, (mu, logvar)

    def decode(self, z, n_frames: Optional[int] = None, deterministic=True):
        """(B, n_chunks, latent) -> (B, n_frames, nfeats).

        ``n_frames`` defaults to n_chunks * frame_chunk_size (the reference
        uses its num_frames arg; for the diffusion path those coincide)."""
        c = self.cfg
        B, n_chunks, _ = z.shape
        if n_frames is None:
            n_frames = n_chunks * c.frame_chunk_size

        if c.decoder_arch == "all_encoder":
            queries = jnp.zeros((B, n_frames, c.latent_dim), z.dtype)
            xseq = jnp.concatenate([z, queries], axis=1)
            # the quirk: pos = xseq + pe, added AGAIN to q/k inside each layer
            query_pos = self.query_pos_decoder(xseq)
            out = self.decoder(xseq, pos=query_pos,
                               deterministic=deterministic)[:, n_chunks:]
        else:
            queries = jnp.zeros((B, n_frames, c.latent_dim), z.dtype)
            queries = self.query_pos_decoder(queries)
            mem = self.mem_pos_decoder(z)
            out = self.decoder(queries, mem, deterministic=deterministic)
        return self.final_layer(out)

    def __call__(self, features, rng=None, deterministic=True):
        """Full autoencode (training fwd): returns dict like the reference."""
        z, dist = self.encode_to_dist(features, rng=rng,
                                      deterministic=deterministic)
        rec = self.decode(z, n_frames=features.shape[1],
                          deterministic=deterministic)
        return {"rec_pose": rec, "poses_feat": z, "rec_dist": dist}
