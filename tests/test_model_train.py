"""End-to-end model tests on a tiny config: init, train step, inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
from raggesture_tpu.models.architecture import (
    InferenceOptions,
    MotionDiffusionModel,
    generate,
    guidance_iters_schedule,
    training_loss,
)
from raggesture_tpu.models.denoiser import default_query_masks
from raggesture_tpu.train.loop import (
    OptimConfig,
    create_train_state,
    jit_train_step,
    make_train_step,
)
from raggesture_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)}, batch
    )
    return cfg, model, batch, params


def test_init_and_zero_output(setup):
    cfg, model, batch, params = setup
    # zero-init output head: denoiser prediction at init is exactly 0
    z, token_mask = model.apply(params, batch, sample=False,
                                method=model.encode_motion)
    assert z.shape == (2, 11, 32)
    assert token_mask.shape == (2, 11)
    # separators masked out
    np.testing.assert_allclose(np.asarray(token_mask[:, [2, 5, 8]]), 0.0)
    conds = model.apply(params, batch, method=model.encode_conditions)
    qm = default_query_masks(cfg.denoiser, 2)
    t = jnp.array([5, 50])
    out = model.apply(params, z, t, token_mask, conds, qm,
                      jnp.ones((2, 1, 1)), method=model.denoise)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_cond_dropout_invariance(setup):
    """With cond_mask=0 the output must not depend on the condition values."""
    cfg, model, batch, params = setup
    z, token_mask = model.apply(params, batch, sample=False,
                                method=model.encode_motion)
    conds = model.apply(params, batch, method=model.encode_conditions)
    conds2 = {k: v + 100.0 for k, v in conds.items()}
    qm = default_query_masks(cfg.denoiser, 2)
    t = jnp.array([5, 50])
    cm = jnp.zeros((2, 1, 1))

    @jax.jit
    def run(c):
        return model.apply(params, z, t, token_mask, c, qm, cm,
                           method=model.denoise)

    np.testing.assert_allclose(np.asarray(run(conds)), np.asarray(run(conds2)),
                               atol=1e-5)


def test_train_step_descends(setup):
    cfg, model, batch, params = setup
    sched = cfg.diffusion_train.schedule()
    state, tx = create_train_state(model, params, OptimConfig(lr=1e-3,
                                                              total_steps=50))
    step = jax.jit(make_train_step(model, tx, sched))
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(8):
        state, logs = step(state, batch, rng)
        losses.append(float(logs["recon_loss"]))
    assert np.isfinite(losses).all()
    # overfit a fixed batch: loss at the end is below the start
    assert losses[-1] < losses[0], losses
    # codec params unchanged (frozen partition)
    cf0 = jax.tree_util.tree_leaves(params["params"]["codec"])[0]
    cf1 = jax.tree_util.tree_leaves(state.params["params"]["codec"])[0]
    np.testing.assert_allclose(np.asarray(cf0), np.asarray(cf1))


def test_train_step_sharded(setup):
    """Data-parallel step over the 8-device virtual mesh."""
    cfg, model, _, params = setup
    batch = tiny_batch(batch=8)
    sched = cfg.diffusion_train.schedule()
    state, tx = create_train_state(model, params, OptimConfig(total_steps=10))
    mesh = make_mesh()
    assert len(jax.devices()) == 8
    step = jit_train_step(make_train_step(model, tx, sched), mesh)
    # deep-copy before replicating: the jitted step donates its state arg and
    # device_put may alias the module-scoped fixture params on device 0
    state = jax.tree_util.tree_map(jnp.array, state)
    state = replicate_tree(state, mesh)
    sbatch = shard_batch(batch, mesh)
    rng = jax.device_put(jax.random.PRNGKey(0),
                         jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    state, logs = step(state, sbatch, rng)
    assert np.isfinite(float(logs["recon_loss"]))


def test_generate_plain_ddim(setup):
    cfg, model, batch, params = setup
    sched = cfg.diffusion_test.schedule()

    @jax.jit
    def run(rng):
        return generate(model, params, sched, batch, rng)

    out = run(jax.random.PRNGKey(3))
    assert out["pred_upper"].shape == (2, 30, 39)
    assert out["pred_hands"].shape == (2, 30, 90)
    assert out["pred_lower"].shape == (2, 30, 27)
    assert out["pred_facepose"].shape == (2, 30, 3)
    assert out["pred_transl"].shape == (2, 30, 3)
    assert out["pred_exps"].shape == (2, 30, 100)
    assert out["pred_contact"].shape == (2, 30, 4)
    assert out["output_latents"].shape == (2, 11, 32)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_generate_inversion_guidance(setup):
    """Retrieval-style inference: invert 2 exemplars, splice, guided DDIM."""
    cfg, model, batch, params = setup
    sched = cfg.diffusion_test.schedule()
    z, token_mask = model.apply(params, batch, sample=False,
                                method=model.encode_motion)
    re_dict = {
        "inv_latents": z,  # pretend the GT latents are retrieved exemplars
        "inv_conds": {"word": batch["word"], "audio": batch["audio"],
                      "speaker_ids": batch["speaker_ids"]},
        "inv_mask": token_mask,
        # (batch_idx, q_start, r_start, length) in latent tokens
        "splice": jnp.asarray([[0, 0, 0, 1], [1, 1, 1, 1]], jnp.int32),
    }
    gi = guidance_iters_schedule("decreasing_till_25", sched.num_timesteps)
    opts = InferenceOptions(use_inversion=True, insertion_guidance=True,
                            guidance_lr=0.05)

    @jax.jit
    def run(rng):
        return generate(model, params, sched, batch, rng, opts=opts,
                        re_dict=re_dict, guidance_iters=gi)

    out = run(jax.random.PRNGKey(7))
    assert out["pred_upper"].shape == (2, 30, 39)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_guidance_iters_full_name_set():
    """All the reference's schedule names (tools/visualize.py:74-95)."""
    import numpy as np

    from raggesture_tpu.models.architecture import guidance_iters_schedule

    for name, head, tail in [
        ("all_one", 1, 1), ("all_zero", 0, 0), ("all_10", 10, 10),
        ("decreasing", 0, 49), ("increasing", 49, 0),
        ("drop_decreasing_till_25", 0, 49),
        ("step_increasing_from_25", 49, 0),
        ("decreasing_till_25", 0, 24), ("increasing_from_25", 24, 0),
        ("constant", 10, 10), ("none", 0, 0),
    ]:
        arr = np.asarray(guidance_iters_schedule(name, 50))
        assert arr.shape == (50,)
        assert arr[0] == head and arr[-1] == tail, (name, arr[0], arr[-1])
    # reference exact: decreasing_till_25 = [0]*25 + range(25)
    arr = np.asarray(guidance_iters_schedule("decreasing_till_25", 50))
    assert arr[:25].sum() == 0 and list(arr[25:]) == list(range(25))
    import pytest

    with pytest.raises(ValueError):
        guidance_iters_schedule("nope", 50)
