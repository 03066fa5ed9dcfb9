"""Frozen-codec latent cache: encode_dist layout, cached-latent training
loss, cache build/serve round trip, fingerprint guard, end-to-end runner.

Reference anchor: the VAEs are frozen (mogen/core/model_freeze_hooks.py:
13-27) yet re-encode every batch every step (diffusion_architecture.py:
136-145); the cache replaces that with a distributionally identical draw
from precomputed (mu, logvar) — gesture_vae.py:111-121 rsamples at encode.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raggesture_tpu.datasets.beatx import collate
from raggesture_tpu.datasets.fixtures import synthetic_batch, tiny_arch_config
from raggesture_tpu.datasets.latent_cache import (
    LatentCachedDataset,
    build_latent_cache,
    codec_fingerprint,
)
from raggesture_tpu.models.architecture import (
    MotionDiffusionModel,
    training_loss,
)


def _model_and_params(batch):
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        batch)
    return cfg, model, params


def _records(n, frames=30):
    out = []
    for i in range(n):
        b = synthetic_batch(seed=i, batch=1, frames=frames, audio_frames=8,
                            text_dim=24, audio_dim=24)
        rec = {k: np.asarray(v[0]) for k, v in b.items()
               if k not in ("speaker_ids", "motion_length")}
        rec["speaker_id"] = np.asarray([int(b["speaker_ids"][0])])
        rec["motion_length"] = frames
        rec["sample_name"] = f"f/{i}"
        rec["sample_idx"] = i
        out.append(rec)
    return out


class _ListDataset:
    def __init__(self, records):
        self.records = records

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        return self.records[i]


def test_encode_motion_dist_matches_deterministic_encode():
    batch = synthetic_batch(seed=0, batch=2, frames=30, audio_frames=8,
                            text_dim=24, audio_dim=24)
    cfg, model, params = _model_and_params(batch)
    mu, logvar = model.apply(params, batch,
                             method=model.encode_motion_dist)
    z_det, token_mask = model.apply(params, batch, sample=False,
                                    method=model.encode_motion)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(z_det),
                               atol=1e-6)
    assert mu.shape == (2, 11, 32)  # 4*2 + 3 separators

    # sampled draw: separators exactly zero (SEP_LOGVAR underflows std to 0)
    std = jnp.exp(0.5 * logvar)
    z = mu + std * jax.random.normal(jax.random.PRNGKey(3), mu.shape)
    seps = [2, 5, 8]
    np.testing.assert_array_equal(np.asarray(z[:, seps]),
                                  np.zeros_like(np.asarray(z[:, seps])))
    # valid tokens DO vary (std > 0 somewhere)
    assert float(jnp.abs(z - mu).max()) > 0


def test_training_loss_cached_latents():
    batch = synthetic_batch(seed=0, batch=2, frames=30, audio_frames=8,
                            text_dim=24, audio_dim=24)
    cfg, model, params = _model_and_params(batch)
    mu, logvar = model.apply(params, batch,
                             method=model.encode_motion_dist)
    cached = dict(batch)
    cached["latent_mu"] = mu
    cached["latent_logvar"] = logvar
    sched = cfg.diffusion_train.schedule()
    rng = jax.random.PRNGKey(7)

    loss, logs = training_loss(model, params, sched, cached, rng)
    assert np.isfinite(float(loss))
    # same rng -> deterministic
    loss2, _ = training_loss(model, params, sched, cached, rng)
    assert float(loss) == float(loss2)

    # gradient flows to the denoiser and NOT to the (unused) codec
    grads = jax.grad(
        lambda p: training_loss(model, p, sched, cached, rng)[0])(params)
    gden = max(float(jnp.abs(g).max()) for g in
               jax.tree_util.tree_leaves(grads["params"]["denoiser"]))
    gcodec = max(float(jnp.abs(g).max()) for g in
                 jax.tree_util.tree_leaves(grads["params"]["codec"]))
    assert gden > 0
    assert gcodec == 0


def test_build_and_serve_cache(tmp_path):
    recs = _records(7)
    ds = _ListDataset(recs)
    batch = collate(recs[:2])
    cfg, model, params = _model_and_params(batch)
    path = str(tmp_path / "latcache")
    build_latent_cache(ds, model, params, path, batch_size=3)
    wrapped = LatentCachedDataset(ds, path, params=params)
    assert len(wrapped) == 7

    rec = wrapped[4]
    assert rec["latent_mu"].shape == (11, 32)
    # served mu matches a direct single-record encode
    mu, logvar = model.apply(params, collate([recs[4]]),
                             method=model.encode_motion_dist)
    np.testing.assert_allclose(rec["latent_mu"], np.asarray(mu[0]),
                               atol=1e-5)
    np.testing.assert_allclose(rec["latent_logvar"], np.asarray(logvar[0]),
                               atol=1e-5)

    # idempotent re-build is a no-op; fingerprint mismatch hard-fails
    build_latent_cache(ds, model, params, path, batch_size=3)
    bad = jax.tree_util.tree_map(lambda x: x * 1.5, params)
    assert codec_fingerprint(bad) != codec_fingerprint(params)
    with pytest.raises(RuntimeError, match="different codec"):
        LatentCachedDataset(ds, path, params=bad)
    with pytest.raises(RuntimeError, match="different codec"):
        build_latent_cache(ds, model, bad, path, batch_size=3)


def test_train_model_with_latent_cache(tmp_path):
    """End-to-end: cached dataset through the runner (collate batches the
    latent fields, device_batch drops the motion fields, the loss takes the
    cached path) with multi-step dispatch on top."""
    from raggesture_tpu.datasets.sampler import DataLoader
    from raggesture_tpu.train.loop import OptimConfig
    from raggesture_tpu.train.runner import device_batch, train_model

    recs = _records(24)
    ds = _ListDataset(recs)
    batch = collate(recs[:2])
    cfg, model, params = _model_and_params(batch)
    path = str(tmp_path / "latcache")
    build_latent_cache(ds, model, params, path, batch_size=4)
    wrapped = LatentCachedDataset(ds, path, params=params)

    db = device_batch(collate([wrapped[0], wrapped[1]]))
    assert "latent_mu" in db and "motion_upper" not in db
    assert "motion_mask" in db

    # batch divisible by the 8-virtual-device test mesh
    dl = DataLoader(wrapped, batch_size=8, shuffle=True, drop_last=True)
    state = train_model(
        model, dl, OptimConfig(total_steps=6), params=params,
        max_epochs=2, workdir=str(tmp_path / "run"), checkpoint_interval=2,
        log_interval=2, tensorboard=False, seed=0, multi_step=2,
    )
    assert int(state.step) == 6
