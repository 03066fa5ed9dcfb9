"""GestureCodec: the frozen 4-body-part latent codec around the diffusion.

Rebuild of the reference ``GestureRepEncoder`` (/root/reference/mogen/models/
transformers/diffusion_transformer.py:130-330): encodes per-part axis-angle
motion (+ face expressions, root-relative translation, foot contacts) through
four frozen :class:`TransformerVAE` s into the 43-token latent sequence the
denoiser diffuses over, and decodes sampled latents back to axis-angle parts.

Per-part VAE input features (shipped config):
  upper      13 joints * 6d                          = 78
  hands      30 joints * 6d                          = 180
  face       jaw 6d + 100 FLAME expressions          = 106
  lowertrans 9 joints * 6d + 3 transl + 4 contacts   = 61

Token layout along time: [upper(10), 0, hands(10), 0, face(10), 0,
lowertrans(10)] -> 43 tokens (diffusion_transformer.py:239-254).

TPU note: all four VAE encodes/decodes are independent — they are dispatched
as four branches of one jitted function and XLA overlaps them; the aa<->6d
conversions are elementwise jnp and fuse into the embedding matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import rotations as rot
from .vae import TransformerVAE, VAEConfig

PART_NAMES = ("upper", "hands", "face", "lowertrans")
# separator-token logvar: exp(0.5 * SEP_LOGVAR) underflows to exactly 0,
# so sampled separator tokens are exactly mu (= 0) for any noise draw
SEP_LOGVAR = -1e30

# feature sizes of the shipped BEAT2 configuration
UPPER_JOINTS = 13
HANDS_JOINTS = 30
LOWER_JOINTS = 9
FACE_JOINTS = 1          # jaw
NUM_EXPRESSIONS = 100
NUM_CONTACTS = 4
TRANSL_DIM = 3


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    latent_dim: int = 512
    frame_chunk_size: int = 15
    num_frames: int = 150
    # per-VAE depth/heads: the published checkpoints are l8h4 for
    # upper/face/hands and l8h8 for lowertrans (per their experiment names)
    num_layers: int = 8
    num_heads: int = 4
    lowertrans_num_heads: int = 8
    ff_size: int = 1024
    dropout: float = 0.1
    position_embedding: str = "learned"
    decoder_arch: str = "all_encoder"
    activation: str = "gelu"            # reference transformer_activation
    normalize_before: bool = False      # reference transformer_normalize_before

    @property
    def tokens_per_part(self) -> int:
        return self.num_frames // self.frame_chunk_size

    @property
    def num_tokens(self) -> int:
        return 4 * self.tokens_per_part + 3

    def vae_config(self, part: str) -> VAEConfig:
        nfeats = {
            "upper": UPPER_JOINTS * 6,
            "hands": HANDS_JOINTS * 6,
            "face": FACE_JOINTS * 6 + NUM_EXPRESSIONS,
            "lowertrans": LOWER_JOINTS * 6 + TRANSL_DIM + NUM_CONTACTS,
        }[part]
        return VAEConfig(
            nfeats=nfeats,
            latent_dim=self.latent_dim,
            num_layers=self.num_layers,
            num_heads=self.lowertrans_num_heads if part == "lowertrans" else self.num_heads,
            ff_size=self.ff_size,
            dropout=self.dropout,
            position_embedding=self.position_embedding,
            decoder_arch=self.decoder_arch,
            activation=self.activation,
            normalize_before=self.normalize_before,
            frame_chunk_size=self.frame_chunk_size,
            num_frames=self.num_frames,
        )


def part_features(
    motion_upper: jnp.ndarray,   # (B, T, 39) axis-angle
    motion_lower: jnp.ndarray,   # (B, T, 27)
    motion_face: jnp.ndarray,    # (B, T, 3) jaw aa
    motion_hands: jnp.ndarray,   # (B, T, 90)
    motion_transl: jnp.ndarray,  # (B, T, 3)
    motion_facial: jnp.ndarray,  # (B, T, 100) expressions
    motion_contact: jnp.ndarray,  # (B, T, 4)
) -> Dict[str, jnp.ndarray]:
    """Assemble the four VAE input feature tensors (6d rotations etc.).

    Translation x/z are made relative to the first frame
    (diffusion_transformer.py:231-232)."""
    in_upper = rot.aa_feature_to_6d(motion_upper)
    in_hands = rot.aa_feature_to_6d(motion_hands)
    face6d = rot.aa_feature_to_6d(motion_face)
    in_face = jnp.concatenate([face6d, motion_facial], axis=-1)
    lower6d = rot.aa_feature_to_6d(motion_lower)
    transl = jnp.asarray(motion_transl)  # .at[] needs a jnp array
    transl = transl.at[..., 0].add(-transl[..., 0:1, 0])
    transl = transl.at[..., 2].add(-transl[..., 0:1, 2])
    in_lowertrans = jnp.concatenate([lower6d, transl, motion_contact], axis=-1)
    return {
        "upper": in_upper,
        "hands": in_hands,
        "face": in_face,
        "lowertrans": in_lowertrans,
    }


class GestureCodec(nn.Module):
    """Four frozen TransformerVAEs + the separator token layout."""

    cfg: CodecConfig = CodecConfig()

    def setup(self):
        for part in PART_NAMES:
            setattr(
                self, f"{part}_vae",
                TransformerVAE(self.cfg.vae_config(part), name=f"{part}_vae"),
            )

    def _vae(self, part: str) -> TransformerVAE:
        return getattr(self, f"{part}_vae")

    def encode(
        self,
        feats: Dict[str, jnp.ndarray],
        frame_mask: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        sample: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-part VAE encode -> (latents (B, 43, D), token mask (B, 43)).

        ``feats`` comes from :func:`part_features`.  ``sample`` reproduces the
        reference's rsample-at-encode behavior; pass False for deterministic
        means (tests / retrieval determinism)."""
        c = self.cfg
        B, T = feats["upper"].shape[:2]
        if frame_mask is None:
            frame_mask = jnp.ones((B, T))
        zs = {}
        for i, part in enumerate(PART_NAMES):
            part_rng = None
            if sample:
                part_rng = (jax.random.fold_in(rng, i) if rng is not None
                            else self.make_rng("vae"))
            z, _ = self._vae(part).encode_to_dist(
                feats[part], rng=part_rng, sample=sample, frame_mask=frame_mask
            )
            zs[part] = z

        sep = jnp.zeros_like(zs["upper"][:, :1, :])
        latents = jnp.concatenate(
            [zs["upper"], sep, zs["hands"], sep, zs["face"], sep, zs["lowertrans"]],
            axis=1,
        )
        from .layers import strided_token_mask

        token_mask = strided_token_mask(frame_mask, c.frame_chunk_size)
        return latents, token_mask

    def encode_dist(
        self,
        feats: Dict[str, jnp.ndarray],
        frame_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Latent DISTRIBUTION at the 43-token layout: (mu, logvar).

        Separator tokens get mu=0 and logvar=``SEP_LOGVAR`` (std exactly 0
        after exp underflow), so ``mu + exp(0.5*logvar)*eps`` reproduces
        :meth:`encode`'s sampled layout for any eps.  This is the basis of
        the frozen-codec latent cache (datasets/latent_cache.py): the VAEs
        never train, so each window's (mu, logvar) is training-constant and
        re-sampling from the cache is distributionally IDENTICAL to a live
        encode (the reference rsamples at encode, gesture_vae.py:111-121)."""
        c = self.cfg
        B, T = feats["upper"].shape[:2]
        if frame_mask is None:
            frame_mask = jnp.ones((B, T))
        mus, lvs = {}, {}
        for part in PART_NAMES:
            _, (mu, logvar) = self._vae(part).encode_to_dist(
                feats[part], sample=False, frame_mask=frame_mask
            )
            mus[part], lvs[part] = mu, logvar
        sep_mu = jnp.zeros_like(mus["upper"][:, :1, :])
        sep_lv = jnp.full_like(sep_mu, SEP_LOGVAR)
        mu = jnp.concatenate(
            [mus["upper"], sep_mu, mus["hands"], sep_mu, mus["face"],
             sep_mu, mus["lowertrans"]], axis=1)
        logvar = jnp.concatenate(
            [lvs["upper"], sep_lv, lvs["hands"], sep_lv, lvs["face"],
             sep_lv, lvs["lowertrans"]], axis=1)
        return mu, logvar

    def decode(self, z: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """(B, 43, D) -> dict of axis-angle parts + transl/exps/contact
        (diffusion_transformer.py:270-330)."""
        c = self.cfg
        L = (z.shape[1] - 3) // 4
        z_upper = z[:, :L]
        z_hands = z[:, L + 1 : 2 * L + 1]
        z_face = z[:, 2 * L + 2 : 3 * L + 2]
        z_lowertrans = z[:, 3 * L + 3 :]
        n_frames = L * c.frame_chunk_size

        out_upper = self._vae("upper").decode(z_upper, n_frames)
        out_hands = self._vae("hands").decode(z_hands, n_frames)
        out_face = self._vae("face").decode(z_face, n_frames)
        out_lt = self._vae("lowertrans").decode(z_lowertrans, n_frames)

        upper_aa = rot.d6_feature_to_aa(out_upper)
        hands_aa = rot.d6_feature_to_aa(out_hands)
        facej_aa = rot.d6_feature_to_aa(out_face[..., : FACE_JOINTS * 6])
        exps = out_face[..., FACE_JOINTS * 6 :]
        lower6d = out_lt[..., : LOWER_JOINTS * 6]
        transl = out_lt[..., LOWER_JOINTS * 6 : LOWER_JOINTS * 6 + TRANSL_DIM]
        contact = out_lt[..., LOWER_JOINTS * 6 + TRANSL_DIM :]
        lower_aa = rot.d6_feature_to_aa(lower6d)

        return {
            "upper": upper_aa,
            "lower": lower_aa,
            "facepose": facej_aa,
            "hands": hands_aa,
            "transl": transl,
            "exps": exps,
            "contact": contact,
        }

    def __call__(self, feats, frame_mask=None, rng=None, sample=True):
        """encode -> decode roundtrip (init convenience / reconstruction)."""
        z, token_mask = self.encode(feats, frame_mask, rng=rng, sample=sample)
        return self.decode(z), z, token_mask
