"""Fused 4-part codec: the three structurally-identical part VAEs run as ONE
stacked program.

The reference decodes the four body parts through four separate VAE forward
passes (/root/reference/mogen/models/transformers/gesture_vae.py:111-239,
diffusion_transformer.py:270-330).  On TPU those four small transformer
stacks are the measured serving tail: the batch-32 device trace attributes
66 of 211 ms/call to conditions-encode + part-VAE decode spread over ~865
small fusions (docs/PERFORMANCE.md "Where the serving ceiling is").

upper / hands / face share the exact layer structure (D=512, 8 layers,
encoder H=4 / decoder H=32, ff 1024) and differ ONLY in nfeats (78 / 180 /
106); lowertrans differs in head count (H=8/64) and stays on its own pass.
So the three parts stack along a leading axis: weights are zero-padded to
nfeats=180 (zero-padded input-projection rows and output-projection columns
are numerically exact — padded feature columns contribute nothing, padded
output columns are sliced away) and the whole TransformerVAE forward runs
under one ``jax.vmap``, which XLA lowers to batched (3, M, K) x (3, K, N)
MXU GEMMs — 4 transformer programs become 2, and the ~865-fusion tail
collapses by roughly the stacked share.

The stacked parameter tree is parameter-only: build it ONCE per generator
(StagedGenerator._pro discipline — see models/architecture.py) and pass it
into jitted pipelines as an argument, never closure-capture it.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import rotations as rot
from .codec import (
    FACE_JOINTS,
    LOWER_JOINTS,
    TRANSL_DIM,
    CodecConfig,
)
from .vae import TransformerVAE

# the three structurally-identical parts, in stack order
STACK_PARTS = ("upper", "hands", "face")
PAD_NFEATS = 180  # max nfeats across the stacked parts (hands)


def _pad_leaf(path: Tuple[str, ...], x: jnp.ndarray, nfeats: int) -> jnp.ndarray:
    """Zero-pad the nfeats-sized dims of the two boundary projections."""
    name = path[-2] if len(path) >= 2 else ""
    if name == "skel_embedding" and path[-1] == "kernel":
        # (nfeats, D): padded input rows meet zero-padded feature columns
        return jnp.pad(x, ((0, PAD_NFEATS - nfeats), (0, 0)))
    if name == "final_layer":
        if path[-1] == "kernel":  # (D, nfeats)
            return jnp.pad(x, ((0, 0), (0, PAD_NFEATS - nfeats)))
        if path[-1] == "bias":    # (nfeats,)
            return jnp.pad(x, (0, PAD_NFEATS - nfeats))
    return x


def stack_codec_params(codec_params: Dict, cfg: CodecConfig) -> Dict:
    """Stack upper/hands/face VAE params along a new leading axis, nfeats
    padded to ``PAD_NFEATS``.  Returns a tree whose every leaf is (3, ...)."""
    padded = []
    for part in STACK_PARTS:
        nfeats = cfg.vae_config(part).nfeats
        sub = codec_params[f"{part}_vae"]
        padded.append(jax.tree_util.tree_map_with_path(
            lambda kp, x: _pad_leaf(
                tuple(getattr(k, "key", getattr(k, "name", "")) for k in kp),
                x, nfeats),
            sub))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *padded)


def _stack_vae(cfg: CodecConfig) -> TransformerVAE:
    """The shared-architecture module the stacked params drive (hands has
    nfeats=180 == PAD_NFEATS and the common H=4, so its config IS the
    stacked config)."""
    return TransformerVAE(cfg.vae_config("hands"))


def fused_decode(cfg: CodecConfig, codec_params: Dict, stacked: Dict,
                 z: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Drop-in twin of GestureCodec.decode (codec.py:214-247): identical
    outputs, 2 transformer programs instead of 4.

    ``stacked`` comes from :func:`stack_codec_params` (same params as
    ``codec_params`` — both are passed so lowertrans runs unstacked)."""
    L = (z.shape[1] - 3) // 4
    n_frames = L * cfg.frame_chunk_size
    z3 = jnp.stack([z[:, :L], z[:, L + 1:2 * L + 1],
                    z[:, 2 * L + 2:3 * L + 2]])

    vae3 = _stack_vae(cfg)
    out3 = jax.vmap(
        lambda pp, zz: vae3.apply({"params": pp}, zz, n_frames,
                                  method=vae3.decode)
    )(stacked, z3)                      # (3, B, n_frames, 180)

    lt = TransformerVAE(cfg.vae_config("lowertrans"))
    out_lt = lt.apply({"params": codec_params["lowertrans_vae"]},
                      z[:, 3 * L + 3:], n_frames, method=lt.decode)

    nf_upper = cfg.vae_config("upper").nfeats
    nf_face = cfg.vae_config("face").nfeats
    out_upper = out3[0, ..., :nf_upper]
    out_hands = out3[1]
    out_face = out3[2, ..., :nf_face]

    upper_aa = rot.d6_feature_to_aa(out_upper)
    hands_aa = rot.d6_feature_to_aa(out_hands)
    facej_aa = rot.d6_feature_to_aa(out_face[..., :FACE_JOINTS * 6])
    exps = out_face[..., FACE_JOINTS * 6:]
    lower6d = out_lt[..., :LOWER_JOINTS * 6]
    transl = out_lt[..., LOWER_JOINTS * 6:LOWER_JOINTS * 6 + TRANSL_DIM]
    contact = out_lt[..., LOWER_JOINTS * 6 + TRANSL_DIM:]
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


def fused_encode_dist(cfg: CodecConfig, codec_params: Dict, stacked: Dict,
                      feats: Dict[str, jnp.ndarray],
                      frame_mask: jnp.ndarray = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stacked twin of GestureCodec.encode_dist (codec.py:180-212): the
    three H=4 parts encode as one vmapped program; returns (mu, logvar) at
    the 43-token layout with the separator quirk rows."""
    from .codec import SEP_LOGVAR

    B, T = feats["upper"].shape[:2]
    if frame_mask is None:
        frame_mask = jnp.ones((B, T))
    f3 = jnp.stack([
        jnp.pad(feats[p], ((0, 0), (0, 0),
                           (0, PAD_NFEATS - feats[p].shape[-1])))
        for p in STACK_PARTS])

    vae3 = _stack_vae(cfg)
    mu3, lv3 = jax.vmap(
        lambda pp, ff: vae3.apply({"params": pp}, ff, frame_mask,
                                  method=vae3.encode_dist),
        in_axes=(0, 0))(stacked, f3)    # each (3, B, L, D)

    lt = TransformerVAE(cfg.vae_config("lowertrans"))
    mu_lt, lv_lt = lt.apply({"params": codec_params["lowertrans_vae"]},
                            feats["lowertrans"], frame_mask,
                            method=lt.encode_dist)

    sep_mu = jnp.zeros_like(mu3[0, :, :1, :])
    sep_lv = jnp.full_like(sep_mu, SEP_LOGVAR)
    mu = jnp.concatenate([mu3[0], sep_mu, mu3[1], sep_mu, mu3[2],
                          sep_mu, mu_lt], axis=1)
    logvar = jnp.concatenate([lv3[0], sep_lv, lv3[1], sep_lv, lv3[2],
                              sep_lv, lv_lt], axis=1)
    return mu, logvar
