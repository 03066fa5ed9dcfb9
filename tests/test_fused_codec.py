"""Fused (stacked 3-part) codec parity vs the per-part GestureCodec.

The stacked path must be numerically exact: zero-padded projections and a
vmapped forward are the same math as the per-part passes
(models/fused_codec.py; reference per-part decode at
/root/reference/mogen/models/transformers/diffusion_transformer.py:270-330).
"""

import jax
import jax.numpy as jnp
import numpy as np

from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
from raggesture_tpu.models.architecture import (
    MotionDiffusionModel,
    init_params,
)
from raggesture_tpu.models.codec import PART_NAMES, part_features
from raggesture_tpu.models.fused_codec import (
    PAD_NFEATS,
    STACK_PARTS,
    fused_decode,
    fused_encode_dist,
    stack_codec_params,
)


def _setup():
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=3)
    params = init_params(model, jax.random.PRNGKey(0), batch)
    codec_params = params["params"]["codec"]
    stacked = stack_codec_params(codec_params, cfg.codec)
    return cfg, model, batch, params, codec_params, stacked


def test_stacked_params_shapes():
    cfg, model, batch, params, codec_params, stacked = _setup()
    # every leaf gains a leading 3-axis; boundary projections pad to 180
    ref = codec_params["hands_vae"]  # nfeats == PAD_NFEATS
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref)[0])
    for path, leaf in jax.tree_util.tree_flatten_with_path(stacked)[0]:
        assert leaf.shape[0] == len(STACK_PARTS)
        assert leaf.shape[1:] == flat_ref[path].shape
    k = stacked["final_layer"]["kernel"]
    assert k.shape[-1] == PAD_NFEATS
    # upper's padded output columns are exactly zero
    np.testing.assert_array_equal(np.asarray(k[0, :, 78:]), 0.0)


def test_fused_decode_matches_per_part():
    cfg, model, batch, params, codec_params, stacked = _setup()
    T = cfg.codec.num_tokens
    z = jax.random.normal(jax.random.PRNGKey(3),
                          (3, T, cfg.codec.latent_dim))
    ref = model.apply(params, z, method=model.decode_latents)
    out = fused_decode(cfg.codec, codec_params, stacked, z)
    assert set(out) == set(ref)
    for k in ref:
        # zero-padded K dims regroup the GEMM summation (vectorized lanes),
        # so padded parts differ by a few ulp (measured 3.3e-6 max on CPU)
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5)


def test_fused_encode_dist_matches_per_part():
    cfg, model, batch, params, codec_params, stacked = _setup()
    feats = part_features(
        batch["motion_upper"], batch["motion_lower"], batch["motion_face"],
        batch["motion_hands"], batch["trans"], batch["facial"],
        batch["contact"])
    mu_ref, lv_ref = model.apply(params, batch,
                                 method=model.encode_motion_dist)
    mu, lv = fused_encode_dist(cfg.codec, codec_params, stacked, feats,
                               batch.get("motion_mask"))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv), np.asarray(lv_ref),
                               rtol=1e-6, atol=1e-6)


def test_training_loss_fused_codec_matches_latent_cache():
    """training_loss(fused_codec=True) draws z0 = mu + std*eps with the
    same rng consumption as the latent-cache branch, and (mu, logvar) are
    parity-exact — so the two losses must match to fp tolerance on the
    same raw batch."""
    from raggesture_tpu.models.architecture import training_loss

    cfg, model, batch, params, codec_params, stacked = _setup()
    sched = cfg.diffusion_train.schedule()
    rng = jax.random.PRNGKey(11)
    mu, lv = model.apply(params, batch, method=model.encode_motion_dist)
    cached = {k: v for k, v in batch.items()
              if k not in ("motion_upper", "motion_lower", "motion_face",
                           "motion_hands", "trans", "facial", "contact")}
    cached["latent_mu"], cached["latent_logvar"] = mu, lv
    loss_ref, logs_ref = training_loss(model, params, sched, cached, rng)
    loss_fused, logs_fused = training_loss(model, params, sched, batch,
                                           rng, fused_codec=True)
    np.testing.assert_allclose(float(loss_fused), float(loss_ref),
                               rtol=1e-4, atol=1e-6)


def test_fused_decode_jits_once():
    """The fused decode compiles standalone (the pipeline-tail shape)."""
    cfg, model, batch, params, codec_params, stacked = _setup()
    T = cfg.codec.num_tokens
    z = jax.random.normal(jax.random.PRNGKey(4),
                          (2, T, cfg.codec.latent_dim))
    f = jax.jit(lambda cp, st, zz: fused_decode(cfg.codec, cp, st, zz))
    out = f(codec_params, stacked, z)
    assert out["upper"].shape == (2, cfg.codec.num_frames, 39)
