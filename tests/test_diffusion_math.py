"""Algebraic identity tests for the functional Gaussian diffusion core."""

import jax
import jax.numpy as jnp
import numpy as np

from raggesture_tpu.diffusion import gaussian as G
from raggesture_tpu.diffusion.gaussian import MeanType, VarType
from raggesture_tpu.diffusion.schedules import make_schedule

SCHED = make_schedule("scaled_linear", 1000)


def _xt(key, shape=(4, 43, 8)):
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, shape)
    noise = jax.random.normal(k2, shape)
    t = jax.random.randint(k3, (shape[0],), 0, 1000)
    return x0, noise, t


def test_q_sample_coefficients():
    x0, noise, t = _xt(jax.random.PRNGKey(0))
    xt = G.q_sample(SCHED, x0, t, noise)
    abar = np.asarray(SCHED.alphas_cumprod)[np.asarray(t)]
    expect = (
        np.sqrt(abar)[:, None, None] * np.asarray(x0)
        + np.sqrt(1 - abar)[:, None, None] * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(xt), expect, rtol=1e-4, atol=1e-5)


def test_x0_eps_inverse():
    x0, noise, t = _xt(jax.random.PRNGKey(1))
    xt = G.q_sample(SCHED, x0, t, noise)
    # eps recovered from (x_t, x0) must be the noise
    eps = G.predict_eps_from_xstart(SCHED, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise), rtol=1e-2, atol=1e-3)
    # and x0 recovered from (x_t, eps) must be x0
    x0r = G.predict_xstart_from_eps(SCHED, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0r), np.asarray(x0), rtol=1e-2, atol=1e-3)


def test_v_identities():
    x0, noise, t = _xt(jax.random.PRNGKey(2))
    xt = G.q_sample(SCHED, x0, t, noise)
    v = G.get_v(SCHED, x0, noise, t)
    np.testing.assert_allclose(
        np.asarray(G.predict_xstart_from_v(SCHED, xt, t, v)), np.asarray(x0),
        rtol=1e-2, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(G.predict_eps_from_v(SCHED, xt, t, v)), np.asarray(noise),
        rtol=1e-2, atol=1e-3,
    )


def test_xprev_inverse():
    x0, noise, t = _xt(jax.random.PRNGKey(3))
    t = jnp.maximum(t, 1)
    xt = G.q_sample(SCHED, x0, t, noise)
    mean, _, _ = G.q_posterior_mean_variance(SCHED, x0, xt, t)
    x0r = G.predict_xstart_from_xprev(SCHED, xt, t, mean)
    np.testing.assert_allclose(np.asarray(x0r), np.asarray(x0), rtol=1e-2, atol=1e-2)


def test_p_mean_variance_start_x():
    x0, noise, t = _xt(jax.random.PRNGKey(4))
    xt = G.q_sample(SCHED, x0, t, noise)
    out = G.p_mean_variance(SCHED, x0, xt, t, MeanType.START_X, VarType.FIXED_LARGE)
    # with a perfect model the posterior mean uses the true x0
    mean, _, _ = G.q_posterior_mean_variance(SCHED, x0, xt, t)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(mean), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.eps), np.asarray(noise), rtol=1e-2, atol=1e-3)
    fl = np.asarray(SCHED.fixed_large_variance)[np.asarray(t)]
    np.testing.assert_allclose(
        np.asarray(out.variance)[:, 0, 0], fl, rtol=1e-5
    )


def test_p_mean_variance_epsilon_consistency():
    x0, noise, t = _xt(jax.random.PRNGKey(5))
    xt = G.q_sample(SCHED, x0, t, noise)
    out_sx = G.p_mean_variance(SCHED, x0, xt, t, MeanType.START_X, VarType.FIXED_SMALL)
    out_eps = G.p_mean_variance(SCHED, noise, xt, t, MeanType.EPSILON, VarType.FIXED_SMALL)
    np.testing.assert_allclose(
        np.asarray(out_sx.mean), np.asarray(out_eps.mean), rtol=1e-2, atol=1e-3
    )


def test_training_target_types():
    x0, noise, t = _xt(jax.random.PRNGKey(6))
    xt = G.q_sample(SCHED, x0, t, noise)
    assert np.allclose(
        np.asarray(G.training_target(SCHED, MeanType.START_X, x0, xt, noise, t)),
        np.asarray(x0),
    )
    assert np.allclose(
        np.asarray(G.training_target(SCHED, MeanType.EPSILON, x0, xt, noise, t)),
        np.asarray(noise),
    )


def test_cfg_mixing_start_x():
    """cfg_scale > 0: x stays B-sized, model_output carries 2B rows
    [uncond; cond] (reference do_clf_guidance contract, :529-534,595-609),
    mixed in eps space; scale 1.0 reduces to the pure cond prediction."""
    x0, noise, t = _xt(jax.random.PRNGKey(7), (2, 5, 4))
    xt = G.q_sample(SCHED, x0, t, noise)
    model_out = jnp.concatenate([x0 * 0.5, x0], 0)  # uncond, cond
    out = G.p_mean_variance(
        SCHED, model_out, xt, t, MeanType.START_X, VarType.FIXED_LARGE,
        cfg_scale=1.0,
    )
    out_cond = G.p_mean_variance(SCHED, x0, xt, t, MeanType.START_X, VarType.FIXED_LARGE)
    assert out.pred_xstart.shape == xt.shape
    np.testing.assert_allclose(
        np.asarray(out.pred_xstart), np.asarray(out_cond.pred_xstart),
        rtol=1e-3, atol=1e-4,
    )


def test_ddpm_transl_req_pins_values():
    """transl_req hook (reference p_sample :779-784): the pinned feature's
    first two positions track the requested values through sampling."""
    import jax

    from raggesture_tpu.diffusion import sampling as S
    from raggesture_tpu.diffusion.gaussian import MeanType, VarType
    from raggesture_tpu.diffusion.schedules import make_schedule

    sched = make_schedule("scaled_linear", 50, "2,2,2,2,2", 10)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 4))

    def model_fn(x, t_orig, step_idx):
        # identity x0-predictor: the final p-step's mean passes the pinned
        # x_t through (a zero-predictor would overwrite the pin at t=0,
        # just as it would in the reference)
        return x

    transl_req = jnp.asarray([[2, 5.0, -5.0]])  # pin feature 2 to (5, -5)
    out = S.ddpm_sample_loop(model_fn, sched, noise, jax.random.PRNGKey(1),
                             mean_type=MeanType.START_X,
                             var_type=VarType.FIXED_LARGE,
                             transl_req=transl_req)
    # at the final step t=0, q_sample(vals, 0) ~ vals (alpha_bar_0 ~ 1):
    # position 0/1 of feature 2 end near the pinned values, far from 0
    pinned = np.asarray(out[0, 0:2, 2])
    assert abs(pinned[0] - 5.0) < 1.0 and abs(pinned[1] + 5.0) < 1.0
    # other features are not pinned
    assert abs(float(out[0, 0, 1])) < 3.0


def test_guided_loop_exact_iters_equals_fast_path():
    """The insertion-guidance GD is provably dead in the reference loop:
    its gradient is nonzero only on the splice-mask rows, which ddim_sample
    then overwrites with q_sample(inverted_latent_i) BEFORE the model call
    (gaussian_diffusion.py:1344-1378 + :934-947).  The fast path therefore
    skips it; ``exact_iters=True`` runs the literal per-step fori_loop GD.
    Both must produce the SAME samples (same hoisted noise table)."""
    from raggesture_tpu.diffusion import sampling as S

    sched = make_schedule("scaled_linear", 100, "2,2,2,2,2", 10)
    B, T, D = 2, 6, 8
    S_n = sched.num_timesteps
    rng = jax.random.PRNGKey(3)
    noise = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    inv = np.zeros((S_n, B, T, D), np.float32)
    inv[:, :, 1] = np.random.RandomState(1).randn(S_n, B, D)  # one spliced row
    gi = jnp.asarray([0] * (S_n // 2) + list(range(S_n - S_n // 2)), jnp.int32)

    def model_fn(x, t_orig, step_idx):
        return 0.9 * x  # contraction x0-predictor

    kw = dict(inverted_latents=jnp.asarray(inv), guidance_iters=gi,
              guidance_lr=0.1, mean_type=MeanType.START_X,
              var_type=VarType.FIXED_LARGE)
    fast = S.ddim_guided_sample_loop(model_fn, sched, noise, rng, **kw)
    exact = S.ddim_guided_sample_loop(model_fn, sched, noise, rng,
                                      exact_iters=True, **kw)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(exact))
    # and the guided rows do track the (noised) inverted latents: at the
    # final step the splice writes q_sample(inv_0, t=0) ~ inv_0 before the
    # model call, so the model output on that row reflects it
    assert np.isfinite(np.asarray(fast)).all()


def test_cfg_mixes_uncond_cond_in_eps_space():
    """Reference do_clf_guidance contract (gaussian_diffusion.py:529-534,
    595-620): x/t stay B-sized, model_output carries 2B rows [uncond; cond],
    the guided eps is eps_u + s*(eps_c - eps_u), and every stat is B-sized.
    Unsupported combos raise (reference :546,:588,:623)."""
    sched = make_schedule("scaled_linear", 20)
    rng = np.random.RandomState(3)
    B, T, D = 3, 5, 4
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    t = jnp.asarray([2, 7, 19], jnp.int32)
    x0_u = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    x0_c = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    s = 2.5

    out = G.p_mean_variance(
        sched, jnp.concatenate([x0_u, x0_c], axis=0), x, t,
        mean_type=MeanType.START_X, cfg_scale=s)
    eps_u = G.predict_eps_from_xstart(sched, x, t, x0_u)
    eps_c = G.predict_eps_from_xstart(sched, x, t, x0_c)
    eps_want = eps_u + s * (eps_c - eps_u)
    assert out.eps.shape == (B, T, D)
    np.testing.assert_allclose(np.asarray(out.eps), np.asarray(eps_want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.pred_xstart),
        np.asarray(G.predict_xstart_from_eps(sched, x, t, eps_want)),
        rtol=1e-5, atol=1e-5)

    # EPSILON parameterization mixes the raw outputs directly
    out_e = G.p_mean_variance(
        sched, jnp.concatenate([eps_u, eps_c], axis=0), x, t,
        mean_type=MeanType.EPSILON, cfg_scale=s)
    np.testing.assert_allclose(np.asarray(out_e.eps), np.asarray(eps_want),
                               rtol=1e-5, atol=1e-5)

    for bad in (dict(mean_type=MeanType.V_PRED),
                dict(mean_type=MeanType.PREVIOUS_X),
                dict(var_type=VarType.LEARNED_RANGE)):
        with np.testing.assert_raises(NotImplementedError):
            G.p_mean_variance(sched, jnp.concatenate([x0_u, x0_c], axis=0),
                              x, t, cfg_scale=s, **bad)


def test_cfg_model_fn_orders_uncond_first():
    """make_cfg_model_fn must emit [uncond; cond] (zero then one cond_mask)
    for a B-sized x — the p_mean_variance cfg contract."""
    from raggesture_tpu.models.conditioning import make_cfg_model_fn

    calls = {}

    def apply_fn(x2, t2, mask2, conds2, qm2, cond_mask):
        calls["cm"] = cond_mask
        return x2

    B, T, D = 2, 4, 3
    fn = make_cfg_model_fn(apply_fn, {"xf": jnp.ones((B, 1, D))},
                           jnp.ones((B, T)), None)
    out = fn(jnp.ones((B, T, D)), jnp.zeros((B,), jnp.int32), 0)
    assert out.shape == (2 * B, T, D)
    cm = np.asarray(calls["cm"]).reshape(2 * B)
    assert (cm[:B] == 0).all() and (cm[B:] == 1).all()
