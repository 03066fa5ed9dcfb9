"""Scan-based diffusion samplers: DDPM, DDIM, DDIM inversion, guided DDIM.

The reference runs Python ``for`` loops over timesteps with one CUDA graph
per step (/root/reference/mogen/models/utils/gaussian_diffusion.py:886-908,
1111-1135, 1206-1230, 1331-1395).  Here every loop is a ``lax.scan`` whose
body calls the denoiser once, so an entire 50-step sampling chain (including
the insertion-guidance gradient updates) compiles to a single XLA program —
no host round-trips, static shapes throughout.

``model_fn(x, t_orig, step_idx) -> model_output`` is the denoiser closure:
 - ``x``: (B, T, D) current latents,
 - ``t_orig``: (B,) original-scale timesteps (already mapped through
   ``schedule.timestep_map`` — what the network was trained on),
 - ``step_idx``: scalar spaced-step index, usable to index per-step
   condition-mixing coefficient tables (the reference draws its >t100 coin
   flips inside the model; we precompute them per step for scan purity).

Insertion guidance (reference :1267-1273, :1344-1378): at each step the
latent takes ``guidance_iters[i]`` gradient-descent steps on
``MSE(x * mask, inverted_latent_i)`` before the DDIM update.  The loss
gradient is confined to the splice-mask rows, which the in-seq overwrite
replaces with ``q_sample(inverted_latent_i)`` BEFORE the model call — so
the GD provably never reaches the model, and the default guided path skips
it entirely (see ``ddim_guided_sample_loop``).  ``exact_iters=True`` runs
the literal per-step ``fori_loop`` GD (``guidance_update``) for parity;
``test_diffusion_math.py`` asserts the two paths are bit-identical.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import gaussian as G
from .gaussian import MeanType, VarType
from .schedules import DiffusionSchedule

ModelFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _apply_pre_seq(sched, x, pre_seq, t, rng):
    """Prefix inpainting (reference p_sample :773-777): q_sample the prefix
    and overwrite x[:, :L]."""
    L = pre_seq.shape[1]
    noised = G.q_sample(sched, pre_seq, t, jax.random.normal(rng, pre_seq.shape, x.dtype))
    return x.at[:, :L, :].set(noised)


def _apply_transl_req(sched, x, transl_req, t, rng):
    """Root-translation pinning (reference p_sample transl_req hook,
    gaussian_diffusion.py:779-784): for each (feature_idx, v0, v1) row, the
    first two sequence positions of that feature are overwritten with
    q_sample of the pinned values at every step.  Legacy ReMoDiffuse
    inpainting surface, kept for API parity."""
    for k in range(transl_req.shape[0]):
        idx = transl_req[k, 0].astype(jnp.int32)
        vals = transl_req[k, 1:3]
        noise = jax.random.normal(jax.random.fold_in(rng, k), (2,), x.dtype)
        abar = sched.alphas_cumprod[t[0]]
        x_t = vals * jnp.sqrt(abar) + noise * jnp.sqrt(1.0 - abar)
        x = x.at[:, 0:2, idx].set(x_t[None, :])
    return x


def _model_call(model_fn, sched, x, t, step_idx):
    t_orig = sched.timestep_map[t]
    return model_fn(x, t_orig, step_idx)


def ddpm_step(model_fn, sched, x, t, step_idx, rng, *, mean_type, var_type,
              cfg_scale=0.0, clip_denoised=False):
    out = G.p_mean_variance(
        sched, _model_call(model_fn, sched, x, t, step_idx), x, t,
        mean_type=mean_type, var_type=var_type, cfg_scale=cfg_scale,
        clip_denoised=clip_denoised,
    )
    noise = jax.random.normal(rng, x.shape, x.dtype)
    nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    sample = out.mean + nonzero * jnp.exp(0.5 * out.log_variance) * noise
    return sample, out


def ddim_step(model_fn, sched, x, t, step_idx, rng, *, mean_type, var_type,
              eta=0.0, cfg_scale=0.0, clip_denoised=False):
    """One DDIM update (reference ddim_sample :910-1001, eq. 12)."""
    out = G.p_mean_variance(
        sched, _model_call(model_fn, sched, x, t, step_idx), x, t,
        mean_type=mean_type, var_type=var_type, cfg_scale=cfg_scale,
        clip_denoised=clip_denoised,
    )
    nd = x.ndim
    abar = G._extract(sched.alphas_cumprod, t, nd)
    abar_prev = G._extract(sched.alphas_cumprod_prev, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1 - abar_prev) / (1 - abar))
        * jnp.sqrt(1 - abar / abar_prev)
    )
    mean_pred = out.pred_xstart * jnp.sqrt(abar_prev) + jnp.sqrt(
        1 - abar_prev - sigma**2
    ) * out.eps
    if isinstance(eta, float) and eta == 0.0:
        # deterministic DDIM (the shipped config): skip the per-step RNG —
        # sigma is identically 0, so the noise term vanishes statically
        return mean_pred, out
    noise = jax.random.normal(rng, x.shape, x.dtype)
    nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
    sample = mean_pred + nonzero * sigma * noise
    return sample, out


def ddim_reverse_step(model_fn, sched, x, t, step_idx, *, mean_type, var_type,
                      cfg_scale=0.0, clip_denoised=False):
    """One DDIM inversion update x_t -> x_{t+1} (reference :1003-1040)."""
    out = G.p_mean_variance(
        sched, _model_call(model_fn, sched, x, t, step_idx), x, t,
        mean_type=mean_type, var_type=var_type, cfg_scale=cfg_scale,
        clip_denoised=clip_denoised,
    )
    nd = x.ndim
    abar_next = G._extract(sched.alphas_cumprod_next, t, nd)
    sample = out.pred_xstart * jnp.sqrt(abar_next) + jnp.sqrt(1 - abar_next) * out.eps
    return sample, out


def ddpm_sample_loop(model_fn: ModelFn, sched: DiffusionSchedule, noise, rng, *,
                     mean_type=MeanType.START_X, var_type=VarType.FIXED_LARGE,
                     cfg_scale=0.0, clip_denoised=False, pre_seq=None,
                     transl_req=None):
    """Full DDPM chain T-1..0 as one scan (reference p_sample_loop :805-908).

    ``transl_req``: optional (K, 3) rows of (feature_idx, v0, v1) pinning
    root translation at the first two positions per step (:779-784)."""
    B = noise.shape[0]
    steps = jnp.arange(sched.num_timesteps - 1, -1, -1)

    def body(carry, i):
        x, r = carry
        r, r_noise, r_pre, r_tr = jax.random.split(r, 4)
        t = jnp.full((B,), i, dtype=jnp.int32)
        if pre_seq is not None:
            x = _apply_pre_seq(sched, x, pre_seq, t, r_pre)
        if transl_req is not None:
            x = _apply_transl_req(sched, x, jnp.asarray(transl_req), t, r_tr)
        x, _ = ddpm_step(model_fn, sched, x, t, i, r_noise,
                         mean_type=mean_type, var_type=var_type,
                         cfg_scale=cfg_scale, clip_denoised=clip_denoised)
        return (x, r), None

    (x, _), _ = jax.lax.scan(body, (noise, rng), steps)
    return x


def _noised_in_seq_table(sched, in_seq, rng):
    """(S, B, T, 1) mask + (S, B, T, D) q_sampled splice targets, hoisted.

    The in-seq splice mask is step-invariant and its q_sample noise is iid
    across steps, so both are computed OUTSIDE the sampling scan: one
    nonzero-row reduction and ONE bulk RNG draw replace a per-step threefry
    split + mask recompute + coefficient gather in every scan iteration
    (XLA does not hoist ops feeding a Pallas custom-call out of the loop,
    so this must be explicit — docs/PERFORMANCE.md).  ``in_seq`` may be
    (B, T, D) (constant per step) or (S, B, T, D) (per-step targets)."""
    S = sched.num_timesteps
    if in_seq.ndim == 3:
        in_all = jnp.broadcast_to(in_seq[None], (S,) + in_seq.shape)
    else:
        in_all = in_seq[:S]
    m_all = jnp.any(in_all != 0, axis=-1, keepdims=True).astype(in_all.dtype)
    nd = in_all.ndim
    ab = sched.sqrt_alphas_cumprod.reshape((S,) + (1,) * (nd - 1))
    om = sched.sqrt_one_minus_alphas_cumprod.reshape((S,) + (1,) * (nd - 1))
    noise = jax.random.normal(rng, in_all.shape, in_all.dtype)
    return m_all, in_all * ab + noise * om


def ddim_sample_loop(model_fn: ModelFn, sched: DiffusionSchedule, noise, rng, *,
                     eta=0.0, mean_type=MeanType.START_X,
                     var_type=VarType.FIXED_LARGE, cfg_scale=0.0,
                     clip_denoised=False, in_seq=None, pre_seq=None):
    """Full DDIM chain as one scan (reference ddim_sample_loop :1042-1135).

    With ``eta == 0`` and no ``pre_seq`` the scan body consumes no RNG at
    all (the in-seq splice noise comes from a hoisted bulk table), so the
    per-step work is exactly one denoiser call plus the DDIM algebra."""
    B = noise.shape[0]
    steps = jnp.arange(sched.num_timesteps - 1, -1, -1)
    det = isinstance(eta, float) and eta == 0.0

    m_in = noised_in = None
    if in_seq is not None:
        rng, r_bulk = jax.random.split(rng)
        m_in, noised_in = _noised_in_seq_table(sched, in_seq, r_bulk)

    def body(carry, i):
        x, r = carry
        if pre_seq is not None or not det:
            r, r_pre, r_noise = jax.random.split(r, 3)
        else:
            r_pre = r_noise = r
        t = jnp.full((B,), i, dtype=jnp.int32)
        if pre_seq is not None:
            x = _apply_pre_seq(sched, x, pre_seq, t, r_pre)
        if in_seq is not None:
            x = x * (1.0 - m_in[i]) + noised_in[i] * m_in[i]
        x, _ = ddim_step(model_fn, sched, x, t, i, r_noise,
                         mean_type=mean_type, var_type=var_type, eta=eta,
                         cfg_scale=cfg_scale, clip_denoised=clip_denoised)
        return (x, r), None

    (x, _), _ = jax.lax.scan(body, (noise, rng), steps)
    return x


def ddim_reverse_sample_loop(model_fn: ModelFn, sched: DiffusionSchedule,
                             x_start, *, mean_type=MeanType.START_X,
                             var_type=VarType.FIXED_LARGE, cfg_scale=0.0,
                             clip_denoised=False, return_all_timesteps=True):
    """DDIM inversion 0..T-1 (reference :1137-1230).

    With ``return_all_timesteps`` returns (num_timesteps, B, T, D): the
    post-step latent after each inversion step, exactly the list the
    insertion-guidance path consumes (clean -> noisy order).
    """
    B = x_start.shape[0]
    steps = jnp.arange(sched.num_timesteps)

    def body(x, i):
        t = jnp.full((B,), i, dtype=jnp.int32)
        x, _ = ddim_reverse_step(model_fn, sched, x, t, i,
                                 mean_type=mean_type, var_type=var_type,
                                 cfg_scale=cfg_scale, clip_denoised=clip_denoised)
        return x, (x if return_all_timesteps else None)

    x, all_x = jax.lax.scan(body, x_start, steps)
    return all_x if return_all_timesteps else x


def guidance_update(x, inverted_latent, n_iters, lr):
    """Apply ``n_iters`` literal gradient-descent steps on
    MSE(x * mask, inverted_latent) w.r.t. x (reference :1267-1273, 1344-1378).

    ``mask`` is rows of ``inverted_latent`` that are nonzero over the feature
    dim.  Only the guided loop's ``exact_iters=True`` parity path calls this
    — the default path skips the GD because the subsequent in-seq splice
    overwrites every coordinate it changes (the gradient is diagonal in x
    and confined to the mask rows; k steps equal the closed form
    ``inv + (1 - 2*lr/N)^k * (x - inv)`` there, all of it then replaced by
    ``q_sample(inverted_latent)``)."""
    mask = jnp.any(inverted_latent != 0, axis=-1, keepdims=True).astype(x.dtype)

    def gd_body(_, xc):
        def loss_fn(xq):
            return jnp.mean((xq * mask - inverted_latent) ** 2)
        g = jax.grad(loss_fn)(xc)
        return xc - lr * g

    return jax.lax.fori_loop(0, n_iters, gd_body, x)


def ddim_guided_sample_loop(model_fn: ModelFn, sched: DiffusionSchedule, noise,
                            rng, *, inverted_latents, guidance_iters,
                            guidance_lr=0.1, eta=0.0,
                            mean_type=MeanType.START_X,
                            var_type=VarType.FIXED_LARGE, cfg_scale=0.0,
                            clip_denoised=False, init_in_seq=None,
                            exact_iters=False):
    """Insertion-guided DDIM (reference ddim_guided_sample_loop :1233-1395).

    ``inverted_latents``: (num_timesteps, B, T, D) per-step targets (zeros
    outside inserted windows), clean->noisy order as produced by
    :func:`ddim_reverse_sample_loop`.
    ``guidance_iters``: (num_timesteps,) int32 GD iteration counts per step
    (e.g. ``decreasing_till_25`` = [0]*25 + range(25), indexed by step i).

    Per the reference: at the first visited step (i = S-1) guidance is
    skipped (the start noise already contains the inverted latents) and the
    in-seq splice uses the caller's ``init_in_seq`` (prev-latent handoff);
    at every later step both use ``inverted_latents[i]``.

    **The guidance GD never reaches the model** in the reference semantics:
    its loss gradient is zero outside the nonzero-row mask of
    ``inverted_latent_list[i]`` (:1267-1273), and ``ddim_sample`` then
    overwrites exactly those rows with ``q_sample(in_seq=inverted latents)``
    BEFORE the model call (:934-947, invoked with ``in_seq`` rebound to
    ``inverted_latent_list[i]`` at :1358,1393).  The loop is therefore
    exactly plain DDIM plus a per-step masked overwrite.  The default path
    exploits this (the splice mask and its noise are hoisted out of the
    scan; the dead GD is not computed); ``exact_iters=True`` runs the
    literal per-step GD ``fori_loop`` and is bit-identical to the default
    path — ``test_diffusion_math.py`` asserts the equivalence.
    """
    B = noise.shape[0]
    S = sched.num_timesteps
    steps = jnp.arange(S - 1, -1, -1)
    guidance_iters = jnp.asarray(guidance_iters, dtype=jnp.int32)
    if init_in_seq is None:
        init_in_seq = jnp.zeros_like(noise)
    det = isinstance(eta, float) and eta == 0.0

    # per-step splice targets: init_in_seq at the first visited step
    # (i = S-1), inverted_latents[i] at every later step; mask + q_sample
    # noise hoisted out of the scan (see _noised_in_seq_table)
    in_all = inverted_latents[:S].at[S - 1].set(init_in_seq)
    rng, r_bulk = jax.random.split(rng)
    m_all, noised_all = _noised_in_seq_table(sched, in_all, r_bulk)

    def body(carry, i):
        x, r = carry
        if not det:
            r, r_noise = jax.random.split(r)
        else:
            r_noise = r
        t = jnp.full((B,), i, dtype=jnp.int32)
        if exact_iters:
            # literal reference computation (parity path): the GD result is
            # provably overwritten by the splice below on every coordinate
            # it changes, so this is equal to the default path
            n_iter = jnp.where(i == (S - 1), 0, guidance_iters[i])
            x = guidance_update(x, inverted_latents[i], n_iter, guidance_lr)
        x = x * (1.0 - m_all[i]) + noised_all[i] * m_all[i]
        x, _ = ddim_step(model_fn, sched, x, t, i, r_noise,
                         mean_type=mean_type, var_type=var_type, eta=eta,
                         cfg_scale=cfg_scale, clip_denoised=clip_denoised)
        return (x, r), None

    (x, _), _ = jax.lax.scan(body, (noise, rng), steps)
    return x
