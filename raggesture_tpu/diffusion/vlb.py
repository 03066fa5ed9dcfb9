"""Variational-bound diagnostics (reference gaussian_diffusion.py:1397-1610:
``_vb_terms_bpd`` / ``_prior_bpd`` / ``calc_bpd_loop``).

Used for likelihood evaluation / debugging, not by the shipped training
loss.  ``calc_bpd_loop`` runs as one ``lax.scan`` over all timesteps
instead of the reference's Python loop.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import gaussian as G
from .gaussian import MeanType, VarType
from .schedules import DiffusionSchedule


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) elementwise (guided-diffusion losses.normal_kl)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales,
                                        bin_size: float = 1.0 / 127.5):
    """Log-likelihood of a discretized Gaussian (guided-diffusion)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + bin_size / 2)
    min_in = inv_stdv * (centered - bin_size / 2)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )


def _mean_flat(x):
    return x.reshape(x.shape[0], -1).mean(axis=1)


def vb_terms_bpd(model_output, sched: DiffusionSchedule, x_start, x_t, t, *,
                 mean_type=MeanType.START_X, var_type=VarType.FIXED_LARGE,
                 clip_denoised: bool = True):
    """One timestep's variational bound in bits-per-dim
    (gaussian_diffusion.py:1397-1431): KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t))
    for t>0, decoder NLL at t=0.  ``clip_denoised`` defaults True like the
    reference's _vb_terms_bpd."""
    true_mean, _, true_log_var = G.q_posterior_mean_variance(
        sched, x_start, x_t, t)
    out = G.p_mean_variance(sched, model_output, x_t, t, mean_type=mean_type,
                            var_type=var_type, clip_denoised=clip_denoised)
    kl = normal_kl(true_mean, true_log_var, out.mean, out.log_variance)
    kl = _mean_flat(kl) / math.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance)
    decoder_nll = _mean_flat(decoder_nll) / math.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out.pred_xstart}


def prior_bpd(sched: DiffusionSchedule, x_start):
    """KL(q(x_T | x_0) || N(0, I)) in bits-per-dim (:1537-1552)."""
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, jnp.int32)
    abar = G._extract(sched.alphas_cumprod, t, x_start.ndim)
    qt_mean = x_start * jnp.sqrt(abar)
    qt_log_var = jnp.log(1.0 - abar)
    kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return _mean_flat(kl) / math.log(2.0)


def calc_bpd_loop(model_fn, sched: DiffusionSchedule, x_start, rng, *,
                  mean_type=MeanType.START_X, var_type=VarType.FIXED_LARGE,
                  clip_denoised: bool = True):
    """Total bpd + per-timestep terms as one scan (:1554-1610).

    model_fn(x_t, t_orig, step_idx) -> model output (the sampler closure).
    Returns dict with total_bpd (B,), prior_bpd (B,), vb (S, B),
    xstart_mse (S, B), mse (S, B) — the reference's full contract."""
    B = x_start.shape[0]
    steps = jnp.arange(sched.num_timesteps - 1, -1, -1)

    def body(r, i):
        r, r_noise = jax.random.split(r)
        t = jnp.full((B,), i, jnp.int32)
        noise = jax.random.normal(r_noise, x_start.shape, x_start.dtype)
        x_t = G.q_sample(sched, x_start, t, noise)
        t_orig = sched.timestep_map[t]
        out = vb_terms_bpd(model_fn(x_t, t_orig, i), sched, x_start, x_t, t,
                           mean_type=mean_type, var_type=var_type,
                           clip_denoised=clip_denoised)
        xstart_mse = _mean_flat((out["pred_xstart"] - x_start) ** 2)
        eps = G.predict_eps_from_xstart(sched, x_t, t, out["pred_xstart"])
        mse = _mean_flat((eps - noise) ** 2)
        return r, (out["output"], xstart_mse, mse)

    _, (vb, xstart_mse, mse) = jax.lax.scan(body, rng, steps)
    pb = prior_bpd(sched, x_start)
    total = vb.sum(axis=0) + pb
    return {"total_bpd": total, "prior_bpd": pb, "vb": vb,
            "xstart_mse": xstart_mse, "mse": mse}
