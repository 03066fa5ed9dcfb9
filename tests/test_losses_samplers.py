"""Losses (weighted MSE, Laplacian MSE) and schedule samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raggesture_tpu.diffusion.samplers import (
    LossSecondMomentResampler,
    UniformSampler,
    build_sampler,
)
from raggesture_tpu.models.losses import (
    LaplacianMSELoss,
    MSELoss,
    laplacian_1d,
    laplacian_filter_time,
    mse_loss,
    weight_reduce_loss,
)


def test_weight_reduce_loss():
    loss = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    assert float(weight_reduce_loss(loss, reduction="sum")) == 10.0
    assert float(weight_reduce_loss(loss, reduction="mean")) == 2.5
    w = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    assert float(weight_reduce_loss(loss, w, reduction="sum")) == 4.0
    assert float(weight_reduce_loss(loss, w, reduction="mean",
                                    avg_factor=2.0)) == 2.0
    with pytest.raises(ValueError):
        weight_reduce_loss(loss, reduction="sum", avg_factor=1.0)


def test_mse_loss_class():
    pred = jnp.ones((2, 3)) * 2
    target = jnp.zeros((2, 3))
    l = MSELoss(reduction="mean", loss_weight=0.5)
    assert float(l(pred, target)) == 2.0  # 0.5 * 4
    l_none = MSELoss(reduction="none")
    assert l_none(pred, target).shape == (2, 3)


def test_laplacian_kernel_and_loss():
    k = np.asarray(laplacian_1d(3))
    assert np.allclose(k, [1.0, -2.0, 1.0])
    assert abs(k.sum()) < 1e-9
    # a linear ramp has zero laplacian (away from the replicate-padded edges)
    t = jnp.arange(10, dtype=jnp.float32)[None, :, None]
    filt = laplacian_filter_time(jnp.tile(t, (1, 1, 2)))
    assert np.allclose(np.asarray(filt)[0, 1:-1], 0.0, atol=1e-5)
    # identical inputs -> zero loss regardless of content
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 4), jnp.float32)
    assert float(LaplacianMSELoss()(x, x)) == 0.0
    # different curvature -> positive
    y = x + t[:, :8] ** 2 * 0.01
    assert float(LaplacianMSELoss()(x, y)) > 0.0


def test_uniform_sampler():
    s = build_sampler("uniform", 100)
    assert isinstance(s, UniformSampler)
    t, w = s.sample(jax.random.PRNGKey(0), 512)
    assert t.shape == (512,) and w.shape == (512,)
    assert int(t.min()) >= 0 and int(t.max()) < 100
    assert np.allclose(np.asarray(w), 1.0)


def test_loss_second_moment_resampler():
    s = LossSecondMomentResampler(10, history_per_term=3)
    assert np.allclose(s.weights(), 1.0)  # uniform until warm
    # warm up with high loss at t=0, low elsewhere
    for _ in range(3):
        s.update_with_losses(list(range(10)), [10.0] + [0.1] * 9)
    w = s.weights()
    assert w[0] > w[1]  # importance follows loss magnitude
    assert np.all(w > 0)  # uniform floor
    t, iw = s.sample(jax.random.PRNGKey(1), 2000)
    counts = np.bincount(np.asarray(t), minlength=10)
    assert counts[0] > counts[5]
    with pytest.raises(NotImplementedError):
        build_sampler("nope", 10)


def test_sampler_wiring_in_train_step():
    """loss-second-moment sampler wired through the train step: explicit t
    reaches training_loss, per-sample losses come back, history updates."""
    from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
    from raggesture_tpu.models.architecture import MotionDiffusionModel
    from raggesture_tpu.parallel.mesh import (
        make_mesh,
        replicate_tree,
        replicated,
        shard_batch,
    )
    from raggesture_tpu.train.loop import (
        OptimConfig,
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2))
    state, tx = create_train_state(model, params, OptimConfig(total_steps=4))
    mesh = make_mesh(1)
    step = jit_train_step(
        make_train_step(model, tx, cfg.diffusion_train.schedule(),
                        with_timesteps=True), mesh, with_timesteps=True)
    state = replicate_tree(state, mesh)
    batch = shard_batch(tiny_batch(batch=2), mesh)
    rng = jax.device_put(jax.random.PRNGKey(0), replicated(mesh))

    sampler = LossSecondMomentResampler(cfg.diffusion_train.diffusion_steps,
                                        history_per_term=2)
    np_rng = np.random.RandomState(0)
    for _ in range(3):
        t_np, w_np = sampler.sample_np(np_rng, 2)
        state, logs = step(state, batch, rng,
                           shard_batch(jnp.asarray(t_np), mesh),
                           shard_batch(jnp.asarray(w_np), mesh))
        per = np.asarray(logs["per_sample_loss"])
        assert per.shape == (2,) and np.isfinite(per).all()
        assert np.array_equal(np.asarray(logs["t"]), t_np)
        sampler.update_with_losses(t_np, per)
    assert sampler._loss_counts.sum() == 6


def test_loss_resampler_synced_multihost_gating():
    """Synced resampling (the reference's all_gather of per-rank losses,
    gaussian_diffusion.py:85-106): two hosts applying the gathered global
    pairs produce bit-identical histories, weights, and — critically — the
    same warm-up gate step as a single host seeing the whole batch, whereas
    unsynced hosts warm up at different steps."""
    T, H = 6, 3
    rs = np.random.RandomState(0)
    # 8 steps of per-host (t, loss) shards, 4 rows each
    steps = [[(rs.randint(0, T, 4), rs.rand(4) + 0.05) for _ in range(2)]
             for _ in range(8)]

    def gather(step):
        ts = np.concatenate([steps[step][h][0] for h in range(2)])
        ls = np.concatenate([steps[step][h][1] for h in range(2)])
        return ts, ls

    hosts = [LossSecondMomentResampler(T, history_per_term=H, synced=True)
             for _ in range(2)]
    single = LossSecondMomentResampler(T, history_per_term=H, synced=False)
    unsynced = [LossSecondMomentResampler(T, history_per_term=H,
                                          synced=False) for _ in range(2)]
    gate_mismatch = False
    for i in range(len(steps)):
        for h in range(2):
            hosts[h]._gather = lambda ts, ls, i=i: gather(i)
            hosts[h].update_with_losses(*steps[i][h])
            unsynced[h].update_with_losses(*steps[i][h])
        single.update_with_losses(*gather(i))
        # synced hosts agree with each other AND with the single-host view
        assert hosts[0]._warmed_up() == hosts[1]._warmed_up() \
            == single._warmed_up()
        np.testing.assert_array_equal(hosts[0]._loss_history,
                                      hosts[1]._loss_history)
        np.testing.assert_array_equal(hosts[0]._loss_history,
                                      single._loss_history)
        np.testing.assert_array_equal(hosts[0].weights(), single.weights())
        gate_mismatch |= (unsynced[0]._warmed_up()
                          != unsynced[1]._warmed_up())
    assert single._warmed_up()  # 64 draws over 6*3 slots: warm by the end
    assert gate_mismatch, "unsynced hosts should gate at different steps"


def test_multihost_gather_single_process_identity():
    from raggesture_tpu.diffusion.samplers import _multihost_gather

    ts = np.array([1, 2, 3], np.int32)
    ls = np.array([0.1, 0.2, 0.3])
    gt, gl = _multihost_gather(ts, ls)
    np.testing.assert_array_equal(gt, ts)
    np.testing.assert_array_equal(gl, ls)


def test_sample_np_matches_weights():
    s = LossSecondMomentResampler(10, history_per_term=2)
    for _ in range(2):
        s.update_with_losses(list(range(10)), [10.0] + [0.1] * 9)
    rng = np.random.RandomState(1)
    t, w = s.sample_np(rng, 4000)
    counts = np.bincount(t, minlength=10)
    assert counts[0] > counts[5]
    assert np.all(w > 0) and t.dtype == np.int32
