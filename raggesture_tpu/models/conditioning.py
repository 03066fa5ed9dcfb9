"""Sampling-time condition mixing (the ReMoDiffuse-style "scale function").

The reference's ``forward_test`` duplicates the batch into a conditioned and
an unconditioned half, runs the decoder stack once on 2B rows, and mixes the
two outputs with timestep-dependent coefficients
(/root/reference/mogen/models/transformers/raggesture.py:925-954, 1041-1113):

    t > 100:  w = t/1000 * coarse_scale + 1, and a fair coin picks
              {both: w, retr: 1-w}  or  {text: w, none: 1-w}
    t <= 100: the fixed tuned coefficients from the config
              (both .52351, text -.28419, retr 2.39872, none = 1-sum)

    out = out_text*(both+text)*joint_scale + out_none*(retr+none)/joint_scale

The coin flips live *outside* the scan here: :func:`scale_func_table`
precomputes one (S, 4) coefficient row per spaced step from a PRNG key, so
the sampler body stays pure and the whole chain jit-compiles.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..diffusion.schedules import DiffusionSchedule
from .denoiser import DenoiserConfig


@dataclasses.dataclass(frozen=True)
class ScaleFuncConfig:
    """configs/raggesture_beatx/basegesture_len150_beat.py:134-136."""

    coarse_scale: float = 6.5
    both_coef: float = 0.52351
    text_coef: float = -0.28419
    retr_coef: float = 2.39872


def scale_func_table(
    rng: jax.Array, sched: DiffusionSchedule, cfg: ScaleFuncConfig,
    original_num_steps: int = 1000,
) -> jnp.ndarray:
    """Precompute (num_timesteps, 4) rows of (both, text, retr, none) coefs,
    indexed by spaced step index."""
    t_orig = sched.timestep_map.astype(jnp.float32)  # (S,)
    w = t_orig / float(original_num_steps) * cfg.coarse_scale + 1.0
    coin = jax.random.bernoulli(rng, 0.5, (sched.num_timesteps,))
    # coin=True -> {both: w, retr: 1-w}; coin=False -> {text: w, none: 1-w}
    hi = jnp.where(
        coin[:, None],
        jnp.stack([w, jnp.zeros_like(w), 1.0 - w, jnp.zeros_like(w)], axis=-1),
        jnp.stack([jnp.zeros_like(w), w, jnp.zeros_like(w), 1.0 - w], axis=-1),
    )
    none_coef = 1.0 - cfg.both_coef - cfg.text_coef - cfg.retr_coef
    lo = jnp.broadcast_to(
        jnp.array([cfg.both_coef, cfg.text_coef, cfg.retr_coef, none_coef]),
        (sched.num_timesteps, 4),
    )
    return jnp.where((t_orig > 100)[:, None], hi, lo)


def joint_scale_vector(
    cfg: DenoiserConfig, per_joint_scale: Optional[Dict[str, float]] = None
) -> jnp.ndarray:
    """Per-token output scale (T,) from per-body-part scales
    (raggesture.py:910-922); ones when not configured."""
    js = jnp.ones((cfg.num_tokens,))
    if per_joint_scale:
        for part, sl in cfg.part_slices().items():
            key = "lowertransl" if part == "lowertrans" else part
            js = js.at[sl].set(per_joint_scale[key])
    return js


def make_mixed_model_fn(
    apply_fn: Callable,
    conds: Dict[str, jnp.ndarray],
    motion_mask: jnp.ndarray,
    query_masks: Optional[Dict[str, jnp.ndarray]],
    coef_table: jnp.ndarray,
    joint_scale: jnp.ndarray,
) -> Callable:
    """Build a sampler ``model_fn(x, t_orig, step_idx)`` implementing the
    2x-batch cond/uncond mixing of forward_test (raggesture.py:1041-1113).

    ``apply_fn(latents, timesteps, motion_mask, conds, query_masks,
    cond_mask)`` is a bound denoiser apply (params already closed over).
    """

    conds2 = {k: jnp.concatenate([v, v], axis=0) for k, v in conds.items()}
    mask2 = jnp.concatenate([motion_mask, motion_mask], axis=0)
    qm2 = (
        {k: jnp.concatenate([v, v], axis=0) for k, v in query_masks.items()}
        if query_masks is not None
        else None
    )

    def model_fn(x, t_orig, step_idx):
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_orig, t_orig], axis=0)
        cond_mask = jnp.concatenate(
            [jnp.ones((B, 1, 1), x.dtype), jnp.zeros((B, 1, 1), x.dtype)], axis=0
        )
        out = apply_fn(x2, t2, mask2, conds2, qm2, cond_mask)
        out_text, out_none = out[:B], out[B:]
        both, text, retr, none = (
            coef_table[step_idx, 0],
            coef_table[step_idx, 1],
            coef_table[step_idx, 2],
            coef_table[step_idx, 3],
        )
        js = joint_scale[None, :, None]
        return out_text * (both + text) * js + out_none * (retr + none) / js

    return model_fn


def make_conditioned_model_fn(
    apply_fn: Callable,
    conds: Dict[str, jnp.ndarray],
    motion_mask: jnp.ndarray,
    query_masks: Optional[Dict[str, jnp.ndarray]],
) -> Callable:
    """Plain conditioned model_fn (no scale-func mixing): cond_mask = 1.
    Used for DDIM inversion of exemplars (which conditions on the exemplar's
    own text/audio/speaker) and for no-mixing sampling."""

    def model_fn(x, t_orig, step_idx):
        B = x.shape[0]
        cond_mask = jnp.ones((B, 1, 1), x.dtype)
        return apply_fn(x, t_orig, motion_mask, conds, query_masks, cond_mask)

    return model_fn


def make_cfg_model_fn(
    apply_fn: Callable,
    conds: Dict[str, jnp.ndarray],
    motion_mask: jnp.ndarray,
    query_masks: Optional[Dict[str, jnp.ndarray]],
) -> Callable:
    """Classifier-free-guidance model_fn: B-sized x in, (2B, T, D)
    **[uncond; cond]** out — the exact contract p_mean_variance's
    ``cfg_scale > 0`` branch expects (the reference's ``do_clf_guidance``
    model call, gaussian_diffusion.py:529-534,595-609).

    NOTE the ordering: UNCOND first.  The scale-func mixing fns above use
    cond-first internally (mix_outputs) — the two mechanisms are separate
    (shipped config uses scale-func mixing with cfg_scale = 0)."""

    conds2 = {k: jnp.concatenate([v, v], axis=0) for k, v in conds.items()}
    mask2 = jnp.concatenate([motion_mask, motion_mask], axis=0)
    qm2 = (
        {k: jnp.concatenate([v, v], axis=0) for k, v in query_masks.items()}
        if query_masks is not None
        else None
    )

    def model_fn(x, t_orig, step_idx):
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_orig, t_orig], axis=0)
        cond_mask = jnp.concatenate(
            [jnp.zeros((B, 1, 1), x.dtype), jnp.ones((B, 1, 1), x.dtype)],
            axis=0)
        return apply_fn(x2, t2, mask2, conds2, qm2, cond_mask)

    return model_fn


def mix_outputs(out2: jnp.ndarray, B: int, coef_table: jnp.ndarray,
                step_idx, joint_scale: jnp.ndarray) -> jnp.ndarray:
    """Combine the (2B, T, D) cond/uncond denoiser output with the scale-func
    coefficients (the tail of forward_test, raggesture.py:1091-1113)."""
    out_text, out_none = out2[:B], out2[B:]
    both = coef_table[step_idx, 0]
    text = coef_table[step_idx, 1]
    retr = coef_table[step_idx, 2]
    none = coef_table[step_idx, 3]
    js = joint_scale[None, :, None]
    return out_text * (both + text) * js + out_none * (retr + none) / js
