"""Generic VAE training architectures + body-part VAE training loss.

Capability match for the reference's registered-but-unused ``PoseVAE`` /
``MotionVAE`` (mogen/models/architectures/vae_architecture.py:14-117) plus
the capability the reference *uses* but does not ship code for: training
the four body-part TransformerVAEs that form the diffusion latent codec
(the shipped checkpoints come from a separate run; loading is at
diffusion_transformer.py:151-188).  ``vae_training_loss`` +
``make_vae_train_step`` give this framework a complete train-your-own-codec
path (see tools/train_vae.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import ARCHITECTURES
from .codec import part_features
from .vae import TransformerVAE, VAEConfig


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """-0.5 * sum(1 + logvar - mu^2 - exp(logvar)) (vae_architecture.py:54)."""
    return -0.5 * jnp.sum(1.0 + logvar - mu ** 2 - jnp.exp(logvar))


@ARCHITECTURES.register_module()
class PoseVAE(nn.Module):
    """Per-frame pose VAE (vae_architecture.py:14-58): flatten frames,
    encode/decode each pose independently."""

    encoder: nn.Module
    decoder: nn.Module
    kl_div_loss_weight: Optional[float] = None

    def __call__(self, motion: jnp.ndarray, rng: jax.Array
                 ) -> Dict[str, jnp.ndarray]:
        B, T = motion.shape[:2]
        pose = motion.reshape(B * T, -1)[:, :-4]  # strip contact dims
        mu, logvar = self.encoder(pose)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        pred = self.decoder(z)
        loss = {"recon_loss": (pred - pose) ** 2}
        if self.kl_div_loss_weight is not None:
            loss["kl_div_loss"] = kl_divergence(mu, logvar) * \
                self.kl_div_loss_weight
        return loss


@ARCHITECTURES.register_module()
class MotionVAE(nn.Module):
    """Sequence VAE (vae_architecture.py:61-117): masked recon + KL."""

    encoder: nn.Module
    decoder: nn.Module
    kl_div_loss_weight: Optional[float] = None

    def __call__(self, motion: jnp.ndarray, motion_mask: jnp.ndarray,
                 rng: jax.Array) -> Dict[str, jnp.ndarray]:
        mu, logvar = self.encoder(motion, motion_mask)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        pred = self.decoder(z, motion_mask)
        recon = jnp.mean((pred - motion) ** 2, axis=-1)
        recon = (recon * motion_mask).sum() / jnp.maximum(motion_mask.sum(), 1.0)
        loss = {"recon_loss": recon}
        if self.kl_div_loss_weight is not None:
            loss["kl_div_loss"] = kl_divergence(mu, logvar) * \
                self.kl_div_loss_weight
        return loss


# ---------------------------------------------------------------------------
# Body-part TransformerVAE training (the codec pretraining stage)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    part: str = "upper"            # upper | hands | face | lowertrans
    kl_weight: float = 1e-4
    recon_weight: float = 1.0
    vel_weight: float = 1.0        # velocity (frame-difference) recon term


def part_batch_features(batch: Dict[str, jnp.ndarray], part: str) -> jnp.ndarray:
    """Extract one part's 6d feature tensor (B, T, nfeats) from a collated
    batch (same composition as the codec encode, codec.part_features)."""
    as_j = lambda k: jnp.asarray(batch[k])  # accept host numpy batches too
    feats = part_features(
        as_j("motion_upper"), as_j("motion_lower"), as_j("motion_face"),
        as_j("motion_hands"), as_j("trans"), as_j("facial"), as_j("contact"),
    )
    return feats[part]


def vae_training_loss(vae: TransformerVAE, params, feats: jnp.ndarray,
                      mask: Optional[jnp.ndarray], rng: jax.Array,
                      cfg: VAETrainConfig
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Masked recon + velocity recon + KL for one body-part VAE."""
    # the frame mask must reach the ENCODER too (codec.py:166 does the
    # same): with padded frames only the loss terms were masked while the
    # encoder attention mixed pad garbage into every chunk latent
    z, (mu, logvar) = vae.apply(params, feats, rng=rng, sample=True,
                                frame_mask=mask,
                                method=vae.encode_to_dist)
    rec = vae.apply(params, z, feats.shape[1], method=vae.decode)
    m = jnp.ones(feats.shape[:2]) if mask is None else mask
    sq = jnp.mean((rec - feats) ** 2, axis=-1)
    recon = (sq * m).sum() / jnp.maximum(m.sum(), 1.0)
    vel_sq = jnp.mean(
        (jnp.diff(rec, axis=1) - jnp.diff(feats, axis=1)) ** 2, axis=-1)
    vel = (vel_sq * m[:, 1:]).sum() / jnp.maximum(m[:, 1:].sum(), 1.0)
    kl = kl_divergence(mu, logvar) / mu.size
    loss = cfg.recon_weight * recon + cfg.vel_weight * vel + \
        cfg.kl_weight * kl
    return loss, {"recon": recon, "vel": vel, "kl": kl, "loss": loss}


def make_vae_train_step(vae: TransformerVAE, tx, cfg: VAETrainConfig,
                        part: str):
    """Jittable (params, opt_state, batch, rng) -> updated step for one
    body-part VAE."""
    import optax

    def step(params, opt_state, batch, rng, step_idx):
        rng = jax.random.fold_in(rng, step_idx)
        feats = part_batch_features(batch, part)

        def loss_fn(p):
            return vae_training_loss(vae, p, feats,
                                     batch.get("motion_mask"), rng, cfg)

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    return step
