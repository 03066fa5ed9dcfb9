"""Synthetic fixtures: tiny batches + tiny configs for tests and dry runs.

The reference's closest analogue is its ``tiny=True`` dataset mode (one BEAT2
file, /root/reference/mogen/datasets/beatx_dataset.py:159-167); since the
BEAT2 data itself is a download, we synthesize batches with the exact field
schema of ``BEATXDataset.__getitem__`` (beatx_dataset.py:1262-1295) so every
model/train/inference path can be exercised hermetically.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.architecture import ArchitectureConfig, DiffusionSpec
from ..models.codec import (
    CodecConfig,
    NUM_CONTACTS,
    NUM_EXPRESSIONS,
    TRANSL_DIM,
    UPPER_JOINTS,
    HANDS_JOINTS,
    LOWER_JOINTS,
    FACE_JOINTS,
)
from ..models.denoiser import DenoiserConfig


def synthetic_batch(
    seed: int = 0,
    batch: int = 2,
    frames: int = 150,
    audio_frames: int = 64,
    text_dim: int = 768,
    audio_dim: int = 768,
    num_speakers: int = 25,
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """A batch with the BEATXDataset tensor schema (ragged string fields — raw
    text, discourse tuples, gesture labels — live host-side and are not part
    of the device batch)."""
    r = np.random.RandomState(seed)

    def rot(n_joints):
        # plausible small axis-angle poses
        return r.randn(batch, frames, n_joints * 3).astype(np.float32) * 0.2

    batch_dict = {
        "motion_upper": rot(UPPER_JOINTS),
        "motion_lower": rot(LOWER_JOINTS),
        "motion_face": rot(FACE_JOINTS),
        "motion_hands": rot(HANDS_JOINTS),
        "trans": r.randn(batch, frames, TRANSL_DIM).astype(np.float32) * 0.1,
        "facial": r.randn(batch, frames, NUM_EXPRESSIONS).astype(np.float32) * 0.1,
        "contact": (r.rand(batch, frames, NUM_CONTACTS) > 0.5).astype(np.float32),
        "motion_mask": np.ones((batch, frames), np.float32),
        "motion_length": np.full((batch,), frames, np.int32),
        "audio": r.randn(batch, audio_frames, audio_dim).astype(np.float32),
        "word": r.randn(batch, frames, text_dim).astype(np.float32),
        "speaker_ids": r.randint(0, num_speakers, (batch,)).astype(np.int32),
    }
    return {k: jnp.asarray(v, dtype if v.dtype == np.float32 else None)
            for k, v in batch_dict.items()}


def tiny_arch_config(frames: int = 30, latent: int = 32) -> ArchitectureConfig:
    """A few-thousand-param config for fast compiles (frames=30, chunk 15 ->
    2 tokens/part, 11 total)."""
    return ArchitectureConfig(
        denoiser=DenoiserConfig(
            latent_dim=latent, time_embed_dim=2 * latent, num_layers=2,
            num_heads=4, ff_size=2 * latent, text_latent_dim=24,
            audio_latent_dim=24, num_speakers=25, max_seq_len=frames,
            frame_chunk_size=15,
        ),
        codec=CodecConfig(
            latent_dim=latent, frame_chunk_size=15, num_frames=frames,
            num_layers=2, num_heads=2, lowertrans_num_heads=2, ff_size=2 * latent,
        ),
        diffusion_train=DiffusionSpec(diffusion_steps=100),
        diffusion_test=DiffusionSpec(
            diffusion_steps=100, respace="2,2,2,2,2", num_inference_timesteps=10
        ),
    )


def tiny_batch(seed: int = 0, batch: int = 2, frames: int = 30):
    return synthetic_batch(seed=seed, batch=batch, frames=frames,
                           audio_frames=8, text_dim=24, audio_dim=24)


def full_arch_config() -> ArchitectureConfig:
    """The shipped basegesture_len150_beat configuration."""
    return ArchitectureConfig()
