"""DDIM inversion round-trip self-check (reference --visualize_inversion,
diffusion_architecture.py:316-382): the error curve grows with noise level
and the invert→sample round trip approximately reconstructs the input."""

import jax
import jax.numpy as jnp
import numpy as np

from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
from raggesture_tpu.models.architecture import MotionDiffusionModel, StagedGenerator


def test_inversion_round_trip():
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        batch)
    sched = cfg.diffusion_test.schedule()
    gen = StagedGenerator(model, params, sched)

    # exemplar latents = real encoded motion
    z, mask = gen._encode(params, batch)
    Q, T, D = z.shape
    re_dict = {
        "inv_latents": np.asarray(z),
        "inv_mask": np.asarray(mask),
        "inv_conds": {
            "word": np.asarray(batch["word"]),
            "audio": np.asarray(batch["audio"]),
            "speaker_ids": np.asarray(batch["speaker_ids"]),
        },
        "num_queries": Q,
    }
    chk = gen.inversion_self_check(re_dict)
    curve = np.asarray(chk["error_curve"])   # (S, Q)
    assert curve.shape == (sched.num_timesteps, Q)
    # error grows toward the noisy end (compare first vs last step)
    assert (curve[-1] > curve[0]).all()
    # with the zero-init x0 head the model predicts x0=0 for every t, so the
    # final forward DDIM step (alpha_bar_prev = 1) analytically annihilates
    # the latent: recon = 0 and recon_error = E[z^2].  This pins the loop
    # algebra; a *trained* model makes recon_error small (the check the
    # reference prints).
    recon_err = np.asarray(chk["recon_error"])
    assert recon_err.shape == (Q,)
    per_q_scale = np.mean(np.asarray(z) ** 2, axis=(1, 2))
    np.testing.assert_allclose(recon_err, per_q_scale, rtol=1e-4)
    # decoded parts exist with the right leading dims
    dec = chk["recon_decoded"]
    assert dec["pred_upper"].shape[:1] == (Q,)


def test_ddim_reverse_forward_round_trip_linear_model():
    """Pure sampling-level round trip: with a nontrivial linear x0-predictor
    (x0_pred = a*x), DDIM inversion followed by DDIM sampling reconstructs
    the input up to per-step predictor mismatch (small at 10 spaced steps)."""
    from raggesture_tpu.diffusion import sampling as S
    from raggesture_tpu.diffusion.gaussian import MeanType, VarType
    from raggesture_tpu.diffusion.schedules import make_schedule

    sched = make_schedule("scaled_linear", 100, "2,2,2,2,2", 10)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 4, 8), jnp.float32)

    def model_fn(x, t_orig, step_idx):
        return 0.3 * x  # contraction keeps the loop stable

    common = dict(mean_type=MeanType.START_X, var_type=VarType.FIXED_LARGE,
                  cfg_scale=0.0)
    stack = S.ddim_reverse_sample_loop(model_fn, sched, x0, **common)
    recon = S.ddim_sample_loop(model_fn, sched, stack[-1],
                               jax.random.PRNGKey(0), eta=0.0, **common)
    err = float(jnp.mean((recon - x0) ** 2))
    base = float(jnp.mean(x0 ** 2))
    # ~8% at 10 coarse steps with an imperfect predictor — the bound catches
    # loop-algebra regressions (which blow up to O(1) and beyond)
    assert err < 0.15 * base, (err, base)
