"""Inference-mode coverage: outpainting (in_seq) and prev-latent handoff
through the StagedGenerator (reference inference_kwargs surface,
diffusion_architecture.py:214-249)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
from raggesture_tpu.models.architecture import (
    InferenceOptions,
    MotionDiffusionModel,
    StagedGenerator,
    masked_prev_latent,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        batch)

    # randomize zero-init leaves: with the zero x0 head the sampler output
    # is identically 0 for ANY input, which would make every behavioral
    # assertion vacuous
    def derandomize(tree, key=[100]):
        for k, v in tree.items():
            if isinstance(v, dict):
                derandomize(v, key)
            else:
                key[0] += 1
                arr = np.asarray(v)
                if arr.size and np.allclose(arr, 0):
                    tree[k] = 0.05 * jax.random.normal(
                        jax.random.PRNGKey(key[0]), v.shape)

    params = jax.tree_util.tree_map(np.asarray, params)
    derandomize(params["params"]["denoiser"])
    params = jax.tree_util.tree_map(jnp.asarray, params)
    gen = StagedGenerator(model, params, cfg.diffusion_test.schedule())
    return cfg, model, params, batch, gen


def test_outpaint_in_seq_sampling_level():
    """in_seq outpainting: nonzero rows are q_sampled and overwrite x at
    every step BEFORE the model call (gaussian_diffusion.py:934-947).  With
    an identity x0-predictor the final step passes the pinned rows through
    (a zero predictor would map them to 0 — exactly as in the reference,
    where only a trained model reconstructs the splice)."""
    from raggesture_tpu.diffusion import sampling as S
    from raggesture_tpu.diffusion.gaussian import MeanType, VarType
    from raggesture_tpu.diffusion.schedules import make_schedule

    sched = make_schedule("scaled_linear", 100, "2,2,2,2,2", 10)
    B, T, D = 2, 6, 8
    noise = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    in_seq = np.zeros((B, T, D), np.float32)
    in_seq[:, 1, :] = 3.0

    def model_fn(x, t_orig, step_idx):
        return x  # identity x0-predictor

    out = S.ddim_sample_loop(model_fn, sched, noise, jax.random.PRNGKey(1),
                             mean_type=MeanType.START_X,
                             var_type=VarType.FIXED_LARGE,
                             in_seq=jnp.asarray(in_seq))
    lat = np.asarray(out)
    assert abs(lat[:, 1].mean() - 3.0) < 0.5, lat[:, 1].mean()
    assert abs(lat[:, 0].mean()) < 1.5  # free rows stay O(noise)


def test_outpaint_mode_generator_smoke(setup):
    """StagedGenerator outpaint wiring: raw_motion_latents reach the in_seq
    path and the run completes with the right shapes."""
    cfg, model, params, batch, gen = setup
    B = 2
    T, D = cfg.denoiser.num_tokens, cfg.denoiser.latent_dim
    rml = np.zeros((B, T, D), np.float32)
    rml[:, 1, :] = 3.0
    re_dict = {"raw_motion_latents": rml[:, None]}  # (B, 1, T, D)
    out = gen(batch, jax.random.PRNGKey(0),
              opts=InferenceOptions(outpaint=True), re_dict=re_dict)
    lat = np.asarray(out["output_latents"])
    assert lat.shape == (B, T, D) and np.isfinite(lat).all()
    assert out["pred_upper"].shape[:2] == (B, cfg.codec.num_frames)


def test_prev_latent_handoff(setup):
    """Long-form handoff: each part's LAST latent token seeds the next
    window's FIRST token (diffusion_architecture.py:286-297)."""
    cfg, model, params, batch, gen = setup
    dcfg = cfg.denoiser
    B, T, D = 2, dcfg.num_tokens, dcfg.latent_dim
    prev = jnp.asarray(np.random.RandomState(0).randn(B, T, D), jnp.float32)

    # unit: masked_prev_latent moves last->first per part, zero elsewhere
    m = np.asarray(masked_prev_latent(dcfg, prev))
    for sl in dcfg.part_slices().values():
        np.testing.assert_allclose(m[:, sl.start],
                                   np.asarray(prev)[:, sl.stop - 1])
        assert np.allclose(m[:, sl.start + 1: sl.stop], 0.0)
    for sep in dcfg.sep_indices:
        assert np.allclose(m[:, sep], 0.0)

    # end-to-end smoke: the handoff wires through and changes the result
    # (with the zero-init x0 head the final model step maps the spliced
    # tokens toward 0 — same as the reference with an untrained model — so
    # we assert influence, not exact pinning)
    out = gen(batch, jax.random.PRNGKey(1),
              opts=InferenceOptions(use_prev_latent=True), prev_latent=prev)
    out_free = gen(batch, jax.random.PRNGKey(1))
    lat = np.asarray(out["output_latents"])
    assert lat.shape == prev.shape and np.isfinite(lat).all()
    diff = np.abs(lat - np.asarray(out_free["output_latents"])).max()
    assert diff > 1e-3, "prev-latent handoff had no effect on the output"


def test_mode_validation(setup):
    with pytest.raises(AssertionError):
        InferenceOptions(outpaint=True, use_inversion=True).validate()
    with pytest.raises(AssertionError):
        InferenceOptions(insertion_guidance=True).validate()
    with pytest.raises(AssertionError):
        InferenceOptions(use_prev_latent=True, outpaint=True).validate()


def test_guided_pipeline_q_bucketing_is_exact():
    """Padding the exemplar count to its power-of-two bucket (zero rows,
    mask 0) must not change the guided output at all: the splice gather
    never references pad rows and the pipeline's rng splits are
    Q-independent.  Compares Q=2 (bucket 2, no pad) against the same
    exemplars duplicated to Q=3 (bucket 4, one pad row) where the extra
    real exemplar's splice row is absent (so it contributes nothing)."""
    import numpy as np

    from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
    from raggesture_tpu.models.architecture import (
        InferenceOptions,
        MotionDiffusionModel,
        StagedGenerator,
        guidance_iters_schedule,
    )

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        batch)
    sched = cfg.diffusion_test.schedule()
    gen = StagedGenerator(model, params, sched, fused=True)
    z, mask = gen._encode(params, batch)
    conds_core = {"word": batch["word"], "audio": batch["audio"],
                  "speaker_ids": batch["speaker_ids"]}
    splice = jnp.asarray([[0, 0, 0, 1], [1, 1, 1, 1]], jnp.int32)
    gi = guidance_iters_schedule("constant", sched.num_timesteps)
    opts = InferenceOptions(use_inversion=True, insertion_guidance=True,
                            guidance_lr=0.05)
    r = jax.random.PRNGKey(11)

    out2 = gen(batch, r, opts=opts, guidance_iters=gi, re_dict={
        "inv_latents": z, "inv_mask": mask, "inv_conds": conds_core,
        "splice": splice,
    })
    # Q=3: one extra exemplar whose splice row does not exist -> padded to
    # bucket 4 internally; identical result expected
    z3 = jnp.concatenate([z, z[:1]], axis=0)
    m3 = jnp.concatenate([mask, mask[:1]], axis=0)
    c3 = {k: jnp.concatenate([v, v[:1]], axis=0)
          for k, v in conds_core.items()}
    out3 = gen(batch, r, opts=opts, guidance_iters=gi, re_dict={
        "inv_latents": z3, "inv_mask": m3, "inv_conds": c3,
        "splice": splice,
    })
    for k in out2:
        np.testing.assert_array_equal(np.asarray(out2[k]),
                                      np.asarray(out3[k]))


def test_guided_inversion_cache_matches_fused_pipeline():
    """re_dict with inv_names routes through the inversion cache +
    guided_pipeline_cached; results must match the fused (inversion-inside)
    pipeline, cold and warm, and warm calls must not re-invert."""
    import numpy as np

    from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
    from raggesture_tpu.models.architecture import (
        InferenceOptions,
        MotionDiffusionModel,
        StagedGenerator,
        guidance_iters_schedule,
    )

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        batch)
    sched = cfg.diffusion_test.schedule()
    gen = StagedGenerator(model, params, sched, fused=True)
    z, mask = gen._encode(params, batch)
    conds_core = {"word": batch["word"], "audio": batch["audio"],
                  "speaker_ids": batch["speaker_ids"]}
    splice = jnp.asarray([[0, 0, 0, 1], [1, 1, 1, 1]], jnp.int32)
    gi = guidance_iters_schedule("constant", sched.num_timesteps)
    opts = InferenceOptions(use_inversion=True, insertion_guidance=True,
                            guidance_lr=0.05)
    r = jax.random.PRNGKey(11)
    base = {"inv_latents": z, "inv_mask": mask, "inv_conds": conds_core,
            "splice": splice, "num_queries": 2}

    ref = gen(batch, r, opts=opts, guidance_iters=gi, re_dict=base)

    named = dict(base, inv_names=["ex_a", "ex_b"])
    cold = gen(batch, r, opts=opts, guidance_iters=gi, re_dict=named)
    assert set(gen._inv_cache) == {"ex_a", "ex_b"}
    warm = gen(batch, r, opts=opts, guidance_iters=gi, re_dict=named)
    for k in ref:
        np.testing.assert_allclose(np.asarray(cold[k]), np.asarray(ref[k]),
                                   atol=2e-4)
        np.testing.assert_array_equal(np.asarray(cold[k]),
                                      np.asarray(warm[k]))

    # warm path must not invert again: poison _invert and re-run
    gen._invert = None
    again = gen(batch, r, opts=opts, guidance_iters=gi, re_dict=named)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(warm[k]),
                                      np.asarray(again[k]))

    # params swap invalidates the cache
    gen.params = params
    assert gen._inv_cache == {}


def test_inv_cache_persistence_roundtrip(tmp_path):
    """save_inv_cache -> fresh StagedGenerator -> load_inv_cache hits the
    warm path on the FIRST call (no re-inversion after a restart), with
    bit-identical results; a fingerprint mismatch (different params)
    ignores the file."""
    import numpy as np

    from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
    from raggesture_tpu.models.architecture import (
        InferenceOptions,
        MotionDiffusionModel,
        StagedGenerator,
        guidance_iters_schedule,
    )

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        batch)
    sched = cfg.diffusion_test.schedule()
    gen = StagedGenerator(model, params, sched, fused=True)
    z, mask = gen._encode(params, batch)
    conds_core = {"word": batch["word"], "audio": batch["audio"],
                  "speaker_ids": batch["speaker_ids"]}
    splice = jnp.asarray([[0, 0, 0, 1], [1, 1, 1, 1]], jnp.int32)
    gi = guidance_iters_schedule("constant", sched.num_timesteps)
    opts = InferenceOptions(use_inversion=True, insertion_guidance=True,
                            guidance_lr=0.05)
    r = jax.random.PRNGKey(11)
    named = {"inv_latents": z, "inv_mask": mask, "inv_conds": conds_core,
             "splice": splice, "num_queries": 2,
             "inv_names": ["ex_a", "ex_b"]}

    path = str(tmp_path / "inv_cache.npz")
    assert gen.save_inv_cache(path) == 0  # empty cache -> no file
    assert not (tmp_path / "inv_cache.npz").exists()

    warm = gen(batch, r, opts=opts, guidance_iters=gi, re_dict=named)
    assert gen.save_inv_cache(path) == 2

    # restart: a new generator over the same params loads the entries and
    # never touches its inversion scan (poisoned)
    gen2 = StagedGenerator(model, params, sched, fused=True)
    assert gen2.load_inv_cache(path) == 2
    assert list(gen2._inv_cache) == ["ex_a", "ex_b"]
    gen2._invert = None
    out = gen2(batch, r, opts=opts, guidance_iters=gi, re_dict=named)
    for k in warm:
        np.testing.assert_array_equal(np.asarray(warm[k]),
                                      np.asarray(out[k]))

    # different weights -> fingerprint mismatch -> file ignored
    params_b = model.init(
        {"params": jax.random.PRNGKey(7), "vae": jax.random.PRNGKey(8)},
        batch)
    gen3 = StagedGenerator(model, params_b, sched, fused=True)
    assert gen3.load_inv_cache(path) == 0
    assert gen3._inv_cache == {}
    # as does a different apply path (trajectories differ at ulp level)
    gen4 = StagedGenerator(model, params, sched, fused=False)
    assert gen4.load_inv_cache(path) == 0
    # missing file: no-op
    assert gen2.load_inv_cache(str(tmp_path / "nope.npz")) == 0

    # load truncates to capacity, keeping the most-recent entries
    gen5 = StagedGenerator(model, params, sched, fused=True)
    gen5.inv_cache_capacity = 1
    assert gen5.load_inv_cache(path) == 1
    assert list(gen5._inv_cache) == ["ex_b"]


def test_inv_cache_eviction_never_drops_requested_names():
    """At capacity, a miss-triggered eviction must not pop a name the
    CURRENT call also requested (that raised KeyError in the LRU-touch
    loop), and capacity < Q overflows temporarily instead of crashing."""
    from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
    from raggesture_tpu.models.architecture import (
        MotionDiffusionModel,
        StagedGenerator,
    )

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        batch)
    sched = cfg.diffusion_test.schedule()
    gen = StagedGenerator(model, params, sched, fused=True)
    z, mask = gen._encode(params, batch)
    core = {"word": batch["word"], "audio": batch["audio"],
            "speaker_ids": batch["speaker_ids"]}

    gen.inv_cache_capacity = 2
    stack_ab = gen._cached_inv_stack(params, z, mask, core,
                                     ["ex_a", "ex_b"], 2)
    # ex_a is the LRU-oldest entry; requesting it together with a fresh
    # miss used to evict it mid-call -> KeyError
    stack_ac = gen._cached_inv_stack(params, z, mask, core,
                                     ["ex_a", "ex_c"], 2)
    assert set(gen._inv_cache) == {"ex_a", "ex_c"}
    # the hit row is reused, not re-inverted
    np.testing.assert_array_equal(np.asarray(stack_ab[:, 0]),
                                  np.asarray(stack_ac[:, 0]))

    # capacity below Q: keep every requested row (temporary overflow)
    gen.inv_cache_capacity = 1
    gen._cached_inv_stack(params, z, mask, core, ["ex_d", "ex_e"], 2)
    assert {"ex_d", "ex_e"} <= set(gen._inv_cache)


def test_generator_bf16_conditions_cast():
    """bf16_conditions ships word/audio bf16: the (linear) condition encode
    must land within bf16 rounding of f32, and plain sampling must stay
    finite.  (No 50-step output comparison — the chain is chaotic under
    random weights, CLAUDE.md.)"""
    import ml_dtypes

    from raggesture_tpu.models.architecture import (
        MotionDiffusionModel,
        StagedGenerator,
    )

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = {k: np.asarray(v) for k, v in tiny_batch(batch=2).items()}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2))
    sched = cfg.diffusion_test.schedule()
    gen16 = StagedGenerator(model, params, sched, bf16_conditions=True)
    gen32 = StagedGenerator(model, params, sched, bf16_conditions=False)

    d16 = gen16._cast_conds({k: batch[k] for k in ("word", "audio")})
    assert d16["word"].dtype == ml_dtypes.bfloat16
    assert gen32._cast_conds(dict(batch))["word"].dtype == np.float32

    c16 = gen16._conds(params, dict(d16, speaker_ids=batch["speaker_ids"]))
    c32 = gen32._conds(params, {k: batch[k] for k in (
        "word", "audio", "speaker_ids")})
    for k in c32:
        np.testing.assert_allclose(np.asarray(c16[k]), np.asarray(c32[k]),
                                   rtol=2e-2, atol=2e-2)

    out = gen16.sample(batch, jax.random.PRNGKey(7))
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_option_guards_eta_and_ddpm():
    """StagedGenerator raises on eta>0 (its pipelines compile the RNG-free
    eta=0 chain) and generate() raises on ddpm + DDIM-only hooks instead of
    silently discarding them."""
    import dataclasses as dc

    from raggesture_tpu.models.architecture import (
        InferenceOptions,
        MotionDiffusionModel,
        StagedGenerator,
        generate,
    )

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        batch)
    sched = cfg.diffusion_test.schedule()
    gen = StagedGenerator(model, params, sched)
    with pytest.raises(NotImplementedError, match="eta"):
        gen(batch, jax.random.PRNGKey(0), opts=InferenceOptions(eta=0.5))

    ddpm_cfg = dc.replace(cfg, inference_type="ddpm")
    ddpm_model = MotionDiffusionModel(ddpm_cfg)
    z, mask = jax.jit(lambda p, b: model.apply(
        p, b, rng=None, sample=False, method=model.encode_motion))(
            params, batch)
    re_dict = {
        "inv_latents": z, "inv_mask": mask,
        "inv_conds": {"word": batch["word"], "audio": batch["audio"],
                      "speaker_ids": batch["speaker_ids"]},
        "splice": jnp.asarray([[0, 0, 0, 1]], jnp.int32)[:2],
    }
    with pytest.raises(ValueError, match="ddpm"):
        generate(ddpm_model, params, sched, batch, jax.random.PRNGKey(0),
                 opts=InferenceOptions(use_inversion=True,
                                       insertion_guidance=True),
                 re_dict=dict(re_dict, splice=jnp.asarray(
                     [[0, 0, 0, 1], [1, 0, 0, 1]], jnp.int32)))
