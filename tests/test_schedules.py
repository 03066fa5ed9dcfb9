"""Schedule tables and respacing: golden values vs the guided-diffusion math."""

import jax.numpy as jnp
import numpy as np

from raggesture_tpu.diffusion import schedules as S


def test_scaled_linear_betas():
    betas = S.get_named_beta_schedule("scaled_linear", 1000)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    # sqrt-space linspace, squared
    sq = np.sqrt(betas)
    diffs = np.diff(sq)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-8)


def test_linear_betas():
    betas = S.get_named_beta_schedule("linear", 1000)
    np.testing.assert_allclose(betas[0], 0.0001)
    np.testing.assert_allclose(betas[-1], 0.02)


def test_space_timesteps_sections():
    # the shipped test respacing: 5 sections of 200 steps -> 50 kept steps
    keep = S.space_timesteps(1000, "15,15,8,6,6")
    assert len(keep) == 50
    assert min(keep) == 0
    # each section contributes its count
    sections = [(0, 200, 15), (200, 400, 15), (400, 600, 8), (600, 800, 6), (800, 1000, 6)]
    for lo, hi, n in sections:
        assert sum(1 for k in keep if lo <= k < hi) == n


def test_space_timesteps_ddim():
    keep = S.space_timesteps(1000, "ddim50")
    assert keep == set(range(0, 1000, 20))


def test_space_timesteps_leading_trailing():
    lead = S.space_timesteps(1000, "leading", 50)
    assert len(lead) == 50 and 0 in lead
    trail = S.space_timesteps(1000, "trailing", 50)
    assert 999 in trail and 0 in trail


def test_spaced_schedule_alphas_match_base():
    """Respaced alphas_cumprod rows must equal the base schedule's rows at the
    kept steps (the SpacedDiffusion invariant)."""
    base = S.make_schedule("scaled_linear", 1000)
    spaced = S.make_schedule("scaled_linear", 1000, respace="15,15,8,6,6",
                             num_inference_timesteps=50)
    assert spaced.num_timesteps == 50
    tmap = np.asarray(spaced.timestep_map)
    np.testing.assert_allclose(
        np.asarray(spaced.alphas_cumprod),
        np.asarray(base.alphas_cumprod)[tmap],
        rtol=2e-5,
    )
    assert list(tmap) == sorted(tmap)


def test_posterior_identities():
    sched = S.make_schedule("scaled_linear", 100)
    betas = np.asarray(sched.betas, dtype=np.float64)
    abar = np.cumprod(1 - betas)
    abar_prev = np.append(1.0, abar[:-1])
    post_var = betas * (1 - abar_prev) / (1 - abar)
    np.testing.assert_allclose(np.asarray(sched.posterior_variance), post_var, rtol=1e-5)
    # fixed_large = [post_var[1], betas[1:]]
    fl = np.append(post_var[1], betas[1:])
    np.testing.assert_allclose(np.asarray(sched.fixed_large_variance), fl, rtol=1e-5)


def test_schedule_is_pytree():
    import jax

    sched = S.make_schedule("scaled_linear", 10)
    leaves = jax.tree_util.tree_leaves(sched)
    assert all(isinstance(l, jnp.ndarray) for l in leaves)
    # survives jit closure / argument passing
    f = jax.jit(lambda s: s.alphas_cumprod[0])
    f(sched)


def test_zero_terminal_snr():
    betas = S.get_named_beta_schedule("linear", 100)
    rescaled = S.rescale_zero_terminal_snr(betas)
    abar = np.cumprod(1 - rescaled)
    assert abs(abar[-1]) < 1e-10
