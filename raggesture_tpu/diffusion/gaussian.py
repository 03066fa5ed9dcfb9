"""Pure-functional Gaussian diffusion math over precomputed schedule tables.

The reference's ``GaussianDiffusion`` methods (q_sample / p_mean_variance /
x0<->eps<->v conversions, /root/reference/mogen/models/utils/
gaussian_diffusion.py:442-702) become stateless functions of
``(DiffusionSchedule, arrays, t)`` here, so every sampler can be a
``lax.scan`` body and the whole sampling chain jit-compiles to one XLA
program.

Timestep convention: ``t`` is always the *spaced* step index (0-based row of
the schedule tables).  The denoiser itself must be called with
``schedule.timestep_map[t]`` — the original-scale timestep it was trained on
(reference ``_WrappedModel``, gaussian_diffusion.py:1755-1764).
"""

from __future__ import annotations

import enum
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule


class MeanType(enum.Enum):
    START_X = "start_x"       # model predicts x_0 (shipped config)
    EPSILON = "epsilon"       # model predicts noise
    V_PRED = "v_pred"         # model predicts v (arXiv:2202.00512)
    PREVIOUS_X = "previous_x"  # model predicts x_{t-1}


class VarType(enum.Enum):
    FIXED_LARGE = "fixed_large"  # shipped config
    FIXED_SMALL = "fixed_small"
    LEARNED = "learned"
    LEARNED_RANGE = "learned_range"


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-batch rows of a 1-D table and right-broadcast to ndim."""
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Sample from q(x_t | x_0) (reference :459-477)."""
    nd = x_start.ndim
    return (
        _extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(sched, x_start, x_t, t):
    """Mean/variance of q(x_{t-1} | x_t, x_0) (reference :479-501)."""
    nd = x_t.ndim
    mean = (
        _extract(sched.posterior_mean_coef1, t, nd) * x_start
        + _extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    var = _extract(sched.posterior_variance, t, nd)
    log_var = _extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var


def predict_xstart_from_eps(sched, x_t, t, eps):
    nd = x_t.ndim
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - _extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_eps_from_xstart(sched, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / _extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def predict_xstart_from_v(sched, x_t, t, v):
    nd = x_t.ndim
    return (
        _extract(sched.sqrt_alphas_cumprod, t, nd) * x_t
        - _extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * v
    )


def predict_eps_from_v(sched, x_t, t, v):
    nd = x_t.ndim
    return (
        _extract(sched.sqrt_alphas_cumprod, t, nd) * v
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * x_t
    )


def get_v(sched, x_start, eps, t):
    nd = x_start.ndim
    return (
        _extract(sched.sqrt_alphas_cumprod, t, nd) * eps
        - _extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
    )


def predict_xstart_from_xprev(sched, x_t, t, xprev):
    nd = x_t.ndim
    c1 = _extract(sched.posterior_mean_coef1, t, nd)
    c2 = _extract(sched.posterior_mean_coef2, t, nd)
    return (1.0 / c1) * xprev - (c2 / c1) * x_t


class PMeanVar(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray
    eps: jnp.ndarray


def p_mean_variance(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    x: jnp.ndarray,
    t: jnp.ndarray,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_LARGE,
    cfg_scale: float = 0.0,
    clip_denoised: bool = False,
    denoised_fn: Optional[Callable] = None,
) -> PMeanVar:
    """Compute p(x_{t-1} | x_t) stats from a raw model output.

    Mirrors reference gaussian_diffusion.py:503-653, including the CFG
    contract (``classifier_free_guidance_scale > 0``; shipped config: 0 —
    the retrieval condition-mixing happens inside the denoiser instead):
    ``x``/``t`` stay B-sized while ``model_output`` carries **2B rows,
    uncond first** (the reference's ``do_clf_guidance`` model call,
    :529-534; build one with conditioning.make_cfg_model_fn), and every
    returned stat is B-sized.  Like the reference, CFG is only implemented
    for START_X and EPSILON (:546, :588, :623 assert/raise on the rest).
    """
    nd = x.ndim
    B = x.shape[0]

    if cfg_scale > 0 and (
            var_type in (VarType.LEARNED, VarType.LEARNED_RANGE)
            or mean_type in (MeanType.PREVIOUS_X, MeanType.V_PRED)):
        # reference :546, :588, :623: CFG + learned variance / previous_x /
        # v_pred is unsupported — fail loudly, never silently unguided
        raise NotImplementedError(
            f"classifier-free guidance is not supported for {var_type} / "
            f"{mean_type} (reference gaussian_diffusion.py:546,588,623)")

    if var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        # split model output into (prediction, variance values) along axis 1,
        # as the reference's generic image-era code does (:544-559)
        C = x.shape[1]
        model_output, var_values = jnp.split(model_output, [C], axis=1)
        if var_type == VarType.LEARNED:
            log_var = var_values
            var = jnp.exp(log_var)
        else:
            min_log = _extract(sched.posterior_log_variance_clipped, t, nd)
            max_log = _extract(jnp.log(sched.betas), t, nd)
            frac = (var_values + 1) / 2
            log_var = frac * max_log + (1 - frac) * min_log
            var = jnp.exp(log_var)
    elif var_type == VarType.FIXED_LARGE:
        var = _extract(sched.fixed_large_variance, t, nd)
        log_var = _extract(sched.fixed_large_log_variance, t, nd)
    else:  # FIXED_SMALL
        var = _extract(sched.posterior_variance, t, nd)
        log_var = _extract(sched.posterior_log_variance_clipped, t, nd)

    def process_xstart(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    if mean_type == MeanType.PREVIOUS_X:
        pred_xstart = process_xstart(predict_xstart_from_xprev(sched, x, t, model_output))
        mean = model_output
        eps = predict_eps_from_xstart(sched, x, t, pred_xstart)
        return PMeanVar(mean, var, log_var, pred_xstart, eps)

    if mean_type == MeanType.START_X:
        pred_xstart = process_xstart(model_output)
        if cfg_scale > 0:
            # model_output is (2B, ...) [uncond; cond] for the B-sized x;
            # mix in eps space (reference :595-609) — result is B-sized
            x0_uncond, x0_cond = jnp.split(pred_xstart, 2, axis=0)
            eps_u = predict_eps_from_xstart(sched, x, t, x0_uncond)
            eps_c = predict_eps_from_xstart(sched, x, t, x0_cond)
            eps = eps_u + cfg_scale * (eps_c - eps_u)
            pred_xstart = predict_xstart_from_eps(sched, x, t, eps)
        else:
            eps = predict_eps_from_xstart(sched, x, t, pred_xstart)
    elif mean_type == MeanType.EPSILON:
        if cfg_scale > 0:
            eps_u, eps_c = jnp.split(model_output, 2, axis=0)
            eps = eps_u + cfg_scale * (eps_c - eps_u)
        else:
            eps = model_output
        pred_xstart = process_xstart(predict_xstart_from_eps(sched, x, t, eps))
    elif mean_type == MeanType.V_PRED:
        eps = predict_eps_from_v(sched, x, t, model_output)
        # the reference leaves the V_PRED x0 prediction UNPROCESSED
        # (no denoised_fn/clip, :629-633) — match it exactly
        pred_xstart = predict_xstart_from_eps(sched, x, t, eps)
    else:
        raise NotImplementedError(mean_type)

    mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    return PMeanVar(mean, var, log_var, pred_xstart, eps)


def training_target(
    sched: DiffusionSchedule,
    mean_type: MeanType,
    x_start: jnp.ndarray,
    x_t: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """The regression target for a given mean type (reference :1510-1517)."""
    if mean_type == MeanType.START_X:
        return x_start
    if mean_type == MeanType.EPSILON:
        return noise
    if mean_type == MeanType.V_PRED:
        return get_v(sched, x_start, noise, t)
    if mean_type == MeanType.PREVIOUS_X:
        return q_posterior_mean_variance(sched, x_start, x_t, t)[0]
    raise NotImplementedError(mean_type)
