"""Training runtime: sampler, loader, wrappers, orbax checkpoint/resume,
and a tiny end-to-end train_model run on the virtual 8-device CPU mesh.

Covers the capabilities of the reference runtime (mogen/apis/train.py,
mogen/datasets/samplers/distributed_sampler.py, mmcv CheckpointHook)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from raggesture_tpu.datasets.sampler import DataLoader, EpochSampler, build_dataloader
from raggesture_tpu.datasets.wrappers import ConcatDataset, RepeatDataset
from raggesture_tpu.datasets.fixtures import synthetic_batch, tiny_arch_config, tiny_batch
from raggesture_tpu.models.architecture import MotionDiffusionModel
from raggesture_tpu.train.checkpoint import CheckpointManager, load_params, save_params
from raggesture_tpu.train.loop import OptimConfig, create_train_state
from raggesture_tpu.train.runner import device_batch, train_model


# ---------------------------------------------------------------- sampler --
def test_epoch_sampler_shards_and_reseeds():
    s0 = EpochSampler(10, shuffle=True, num_shards=2, shard=0, seed=7)
    s1 = EpochSampler(10, shuffle=True, num_shards=2, shard=1, seed=7)
    i0, i1 = s0.indices(), s1.indices()
    assert len(i0) == len(i1) == 5
    # shards are disjoint and cover everything (round_up with 10/2 exact)
    assert sorted(np.concatenate([i0, i1]).tolist()) == list(range(10))
    # epoch reseeds deterministically (DistSamplerSeedHook behavior)
    s0.set_epoch(1)
    i0e1 = s0.indices()
    assert not np.array_equal(i0, i0e1)
    s0.set_epoch(0)
    assert np.array_equal(i0, s0.indices())


def test_epoch_sampler_round_up():
    # 7 samples over 2 shards -> padded to 8, 4 each
    shards = [EpochSampler(7, num_shards=2, shard=r, seed=0) for r in range(2)]
    assert all(len(s) == 4 for s in shards)
    allidx = np.concatenate([s.indices() for s in shards])
    assert len(allidx) == 8
    assert set(allidx.tolist()) == set(range(7))  # padding repeats a sample


# ----------------------------------------------------------------- loader --
class _ListDataset:
    def __init__(self, records):
        self.records = records

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        return self.records[i]


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


def test_dataloader_shapes_and_drop_last():
    ds = _ListDataset(_records(7))
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True)
    batches = list(dl)
    assert len(batches) == len(dl) == 3
    assert batches[0]["motion_upper"].shape[0] == 2
    assert batches[0]["speaker_ids"].shape == (2,)
    # eval mode pads the tail and flags validity
    dl2 = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    batches = list(dl2)
    assert len(batches) == 4
    assert batches[-1]["valid_mask"].tolist() == [True, False]


def test_build_dataloader_global_batch():
    ds = _ListDataset(_records(16))
    dl = build_dataloader(ds, samples_per_device=2, num_devices=4,
                          shuffle=True, seed=3)
    b = next(iter(dl))
    assert b["motion_upper"].shape[0] == 8


# --------------------------------------------------------------- wrappers --
def test_concat_and_repeat_dataset():
    a, b = _ListDataset(_records(3)), _ListDataset(_records(2))
    cat = ConcatDataset([a, b])
    assert len(cat) == 5
    assert cat[3]["sample_name"] == b.records[0]["sample_name"]
    rep = RepeatDataset(a, 3)
    assert len(rep) == 9
    assert rep[7]["sample_name"] == a.records[1]["sample_name"]
    with pytest.raises(IndexError):
        cat[5]
    with pytest.raises(IndexError):
        rep[9]


# ------------------------------------------------------------- checkpoint --
def _tiny_state():
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2),
    )
    state, _ = create_train_state(model, params, OptimConfig(total_steps=10))
    return model, state


def test_checkpoint_save_restore_roundtrip(tmp_path):
    model, state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path), interval=2, max_to_keep=2)
    assert not mgr.maybe_save(0, state)          # (0+1) % 2 != 0
    assert mgr.maybe_save(1, state, meta={"tag": "e1"})
    mgr.wait()
    assert mgr.latest_epoch() == 1
    restored, meta = mgr.restore(state)
    assert meta["tag"] == "e1" and meta["epoch"] == 1
    chex_all = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.allclose(a, b), state.params, restored.params))
    assert chex_all
    mgr.close()


def test_params_only_save_load(tmp_path):
    model, state = _tiny_state()
    p = str(tmp_path / "params")
    save_params(p, state.params, meta={"epoch": 64})
    loaded = load_params(p, state.params)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.allclose(a, b), state.params, loaded))
    assert os.path.exists(p + ".meta.json")


# --------------------------------------------------------------- end2end --
def test_train_model_two_epochs_and_resume(tmp_path):
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2),
    )
    ds = _ListDataset(_records(16))
    dl = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True)
    wd = str(tmp_path / "run")
    state = train_model(
        model, dl, OptimConfig(total_steps=8), params=params,
        max_epochs=2, workdir=wd, checkpoint_interval=1,
        log_interval=1, tensorboard=False, seed=0,
    )
    assert int(state.step) == 4  # 2 epochs x 2 batches
    assert os.path.exists(os.path.join(wd, "metrics.jsonl"))
    # resume continues from the final checkpoint
    state2 = train_model(
        model, dl, OptimConfig(total_steps=8), params=params,
        max_epochs=3, workdir=wd, checkpoint_interval=1,
        log_interval=1, tensorboard=False, resume=True, seed=0,
    )
    assert int(state2.step) == 6  # one more epoch on top


def test_device_batch_filters_host_fields():
    b = {"motion_upper": np.zeros((2, 3)), "raw_word": ["a", "b"],
         "word": np.zeros((2, 3)), "sample_name": ["x", "y"]}
    db = device_batch(b)
    assert set(db) == {"motion_upper", "word"}


def test_bf16_train_step():
    """bf16 mixed precision (OptimConfig.bf16_compute): step runs, loss
    finite, params stay fp32 (master weights)."""
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2),
    )
    from raggesture_tpu.train.loop import make_train_step
    from raggesture_tpu.parallel.mesh import make_mesh, replicate_tree, replicated, shard_batch
    from raggesture_tpu.train.loop import jit_train_step

    state, tx = create_train_state(model, params, OptimConfig(
        total_steps=4, bf16_compute=True))
    mesh = make_mesh(1)
    step = jit_train_step(make_train_step(model, tx, cfg.diffusion_train.schedule(),
                                          bf16_compute=True), mesh)
    state = replicate_tree(state, mesh)
    batch = shard_batch(tiny_batch(batch=2), mesh)
    rng = jax.device_put(jax.random.PRNGKey(0), replicated(mesh))
    # host snapshot before the step (the jit donates the input state)
    before = jax.tree_util.tree_map(np.asarray, state.params)
    state2, logs = step(state, batch, rng)
    assert np.isfinite(float(logs["recon_loss"]))
    # master params remain fp32 and actually moved
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.dtype == jnp.float32
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state2.params, before)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_sharded_sampler_multichip():
    """Data-parallel sampling over the virtual 8-device mesh matches the
    single-device result (inference is embarrassingly data-parallel)."""
    from raggesture_tpu.models.architecture import StagedGenerator
    from raggesture_tpu.models.conditioning import (
        joint_scale_vector,
        scale_func_table,
    )
    from raggesture_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicate_tree,
        sharded_sampler,
    )

    n_dev = jax.device_count()
    assert n_dev >= 2, "conftest should provide 8 virtual devices"
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    B = n_dev  # one sample per device
    batch = tiny_batch(batch=B)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2))
    sched = cfg.diffusion_test.schedule()
    gen = StagedGenerator(model, params, sched, fused=False)

    z, mask = gen._encode(params, batch)
    conds = gen._conds(params, {"word": batch["word"],
                                "audio": batch["audio"],
                                "speaker_ids": batch["speaker_ids"]})
    coef = scale_func_table(jax.random.PRNGKey(1), sched, cfg.scale_func,
                            cfg.diffusion_train.diffusion_steps)
    js = joint_scale_vector(cfg.denoiser)
    noise = jax.random.normal(jax.random.PRNGKey(2), z.shape)

    # single-device reference
    ref = gen._ddim_plain(params, noise, jax.random.PRNGKey(3), conds, mask,
                          coef, js, jnp.zeros_like(noise), gen._pro)

    mesh = make_mesh()
    sample = sharded_sampler(gen, mesh)
    bsh = batch_sharding(mesh)
    put = lambda x: jax.device_put(x, bsh)
    out = sample(replicate_tree(params, mesh), put(noise),
                 jax.random.PRNGKey(3),
                 jax.tree_util.tree_map(put, conds), put(mask),
                 replicate_tree(coef, mesh), replicate_tree(js, mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # output really is sharded over the mesh
    assert len(out.sharding.device_set) == n_dev


def test_sharded_guided_sampler_multichip():
    """Guided (inversion-target) sampling over the virtual mesh matches the
    single-device guided loop."""
    from raggesture_tpu.models.architecture import (
        StagedGenerator,
        guidance_iters_schedule,
    )
    from raggesture_tpu.models.conditioning import (
        joint_scale_vector,
        scale_func_table,
    )
    from raggesture_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicate_tree,
        sharded_guided_sampler,
    )

    n_dev = jax.device_count()
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    B = n_dev
    batch = tiny_batch(batch=B)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2))
    sched = cfg.diffusion_test.schedule()
    gen = StagedGenerator(model, params, sched, fused=False)

    z, mask = gen._encode(params, batch)
    conds = gen._conds(params, {"word": batch["word"],
                                "audio": batch["audio"],
                                "speaker_ids": batch["speaker_ids"]})
    coef = scale_func_table(jax.random.PRNGKey(1), sched, cfg.scale_func,
                            cfg.diffusion_train.diffusion_steps)
    js = joint_scale_vector(cfg.denoiser)
    noise = jax.random.normal(jax.random.PRNGKey(2), z.shape)
    S = sched.num_timesteps
    inv_all = jax.random.normal(jax.random.PRNGKey(4),
                                (S, *z.shape)) * 0.1
    gi = guidance_iters_schedule("all_one", S)
    lr = 0.05
    in_seq = jnp.zeros_like(noise)

    ref = gen._guided(params, noise, jax.random.PRNGKey(3), conds, mask,
                      coef, js, inv_all, gi, lr, in_seq, gen._pro)

    mesh = make_mesh()
    sample = sharded_guided_sampler(gen, mesh)
    bsh = batch_sharding(mesh)
    put = lambda x: jax.device_put(x, bsh)
    out = sample(replicate_tree(params, mesh), put(noise),
                 jax.random.PRNGKey(3),
                 jax.tree_util.tree_map(put, conds), put(mask),
                 replicate_tree(coef, mesh), replicate_tree(js, mesh),
                 jax.device_put(inv_all, NamedSharding(
                     mesh, P(None, "data"))),
                 replicate_tree(gi, mesh), lr, put(in_seq))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    assert len(out.sharding.device_set) == n_dev


def test_result_blob_gather_roundtrip():
    """The multi-host result gather's pure split/pad/merge math (simulated
    3-rank allgather without multiple processes)."""
    from raggesture_tpu.train.inference import (
        encode_result_blob,
        merge_result_blobs,
        pad_result_blob,
    )

    per_rank = [
        [{"sample_name": "a", "x": np.arange(5)}],
        [{"sample_name": "b", "x": np.zeros(2)},
         {"sample_name": "c", "x": np.ones(7)}],
        [],  # a rank can legitimately produce nothing (round-up padding)
    ]
    blobs = [encode_result_blob(r) for r in per_rank]
    sizes = np.asarray([b.size for b in blobs], np.int32)
    mx = int(sizes.max())
    gathered = np.stack([pad_result_blob(b, mx) for b in blobs])
    merged = merge_result_blobs(gathered, sizes)
    assert [r["sample_name"] for r in merged] == ["a", "b", "c"]
    np.testing.assert_array_equal(merged[0]["x"], np.arange(5))
    np.testing.assert_array_equal(merged[2]["x"], np.ones(7))


def test_train_model_with_validation(tmp_path):
    """val_loader wiring: 'val'-prefixed rows land in metrics.jsonl."""
    import json

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2))
    ds = _ListDataset(_records(16))
    dl = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True)
    vdl = DataLoader(_ListDataset(_records(8)), batch_size=8, shuffle=False,
                     drop_last=True)
    wd = str(tmp_path / "run")
    train_model(model, dl, OptimConfig(total_steps=4), params=params,
                max_epochs=1, workdir=wd, checkpoint_interval=1,
                log_interval=1, tensorboard=False, val_loader=vdl)
    rows = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
    prefixes = {r["prefix"] for r in rows}
    assert "val" in prefixes and "train" in prefixes
    val_rows = [r for r in rows if r["prefix"] == "val"]
    assert np.isfinite(val_rows[0]["recon_loss"])


def test_build_optimizers_per_submodule():
    """Per-submodule optimizer cfgs (reference optimizer/builder.py:8-52):
    mapped modules get their own LR; unmapped subtrees are frozen."""
    import optax

    from raggesture_tpu.train.loop import build_optimizers

    params = {"params": {"denoiser": {"w": jnp.ones((3,))},
                         "codec": {"w": jnp.ones((3,))},
                         "other": {"w": jnp.ones((3,))}}}
    tx = build_optimizers({"denoiser": OptimConfig(lr=1e-2, total_steps=10),
                           "codec": OptimConfig(lr=1e-4, total_steps=10)},
                          params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    up = updates["params"]
    # denoiser lr >> codec lr; 'other' frozen
    assert abs(float(up["denoiser"]["w"][0])) > abs(float(up["codec"]["w"][0]))
    assert float(jnp.abs(up["other"]["w"]).max()) == 0.0


def test_prefetch_loader_matches_sync():
    from raggesture_tpu.datasets.sampler import PrefetchLoader

    ds = _ListDataset(_records(10))
    dl = DataLoader(ds, batch_size=3, shuffle=True, drop_last=False, seed=5)
    sync_batches = list(dl)
    pf = PrefetchLoader(DataLoader(ds, batch_size=3, shuffle=True,
                                   drop_last=False, seed=5), num_workers=3)
    pf_batches = list(pf)
    assert len(pf_batches) == len(sync_batches) == len(dl)
    for a, b in zip(sync_batches, pf_batches):
        assert a["sample_name"] == b["sample_name"]
        np.testing.assert_allclose(a["motion_upper"], b["motion_upper"])
        assert a["valid_mask"].tolist() == b["valid_mask"].tolist()
    # epoch reseeding changes order identically in both
    dl.set_epoch(1)
    pf.set_epoch(1)
    a1 = next(iter(dl))
    b1 = next(iter(pf))
    assert a1["sample_name"] == b1["sample_name"]


def test_load_codec_params_grafting(tmp_path):
    """vae_cfg {part}_ckpt entries graft pretrained VAE params into the
    model tree (the reference's load_vae contract)."""
    from raggesture_tpu.train.checkpoint import load_codec_params, save_params

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2))
    params = jax.tree_util.tree_map(np.asarray, params)

    # fake pretrained upper VAE: the init subtree scaled by 2
    pre = {"params": jax.tree_util.tree_map(
        lambda x: x * 2.0, params["params"]["codec"]["upper_vae"])}
    path = str(tmp_path / "upper.msgpack")
    save_params(path, pre)

    out = load_codec_params(params, {"upper_ckpt": path,
                                     "hands_ckpt": str(tmp_path / "nope")})
    # upper replaced, hands (missing file) kept
    a = jax.tree_util.tree_leaves(out["params"]["codec"]["upper_vae"])[0]
    b = jax.tree_util.tree_leaves(params["params"]["codec"]["upper_vae"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b) * 2.0, rtol=1e-6)
    c = jax.tree_util.tree_leaves(out["params"]["codec"]["hands_vae"])[0]
    d = jax.tree_util.tree_leaves(params["params"]["codec"]["hands_vae"])[0]
    np.testing.assert_allclose(np.asarray(c), np.asarray(d))
    # denoiser untouched
    e = jax.tree_util.tree_leaves(out["params"]["denoiser"])[0]
    f = jax.tree_util.tree_leaves(params["params"]["denoiser"])[0]
    np.testing.assert_allclose(np.asarray(e), np.asarray(f))


# -------------------------------------------------------------- multi-step --
def test_multi_step_matches_sequential_steps():
    """make_multi_train_step (k steps per dispatch via lax.scan) must match
    k sequential make_train_step calls exactly: the per-step rng folds
    state.step inside the step, which the scan increments identically."""
    from raggesture_tpu.parallel.mesh import (
        make_mesh, replicate_tree, replicated, shard_batch,
        stacked_batch_sharding)
    from raggesture_tpu.train.loop import (
        jit_multi_train_step, jit_train_step, make_multi_train_step,
        make_train_step)

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2))
    # host copies: the jitted steps donate their state, which would delete
    # buffers shared between the two state trees
    params = jax.tree_util.tree_map(np.asarray, params)
    sched = cfg.diffusion_train.schedule()
    mesh = make_mesh(1)
    rng = jax.device_put(jax.random.PRNGKey(3), replicated(mesh))
    K = 3
    batches = [tiny_batch(batch=2, seed=10 + i) for i in range(K)]

    state_a, tx = create_train_state(model, params, OptimConfig(total_steps=8))
    step = jit_train_step(make_train_step(model, tx, sched), mesh)
    state_a = replicate_tree(state_a, mesh)
    logs_seq = []
    for b in batches:
        state_a, logs = step(state_a, shard_batch(b, mesh), rng)
        logs_seq.append(float(logs["recon_loss"]))

    state_b, _ = create_train_state(model, params, OptimConfig(total_steps=8))
    multi = jit_multi_train_step(make_multi_train_step(model, tx, sched),
                                 mesh)
    state_b = replicate_tree(state_b, mesh)
    stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
               for k in batches[0]}
    sb = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, stacked_batch_sharding(mesh)), stacked)
    state_b, logs_k = multi(state_b, sb, rng)

    assert int(state_b.step) == int(state_a.step) == K
    np.testing.assert_allclose(np.asarray(logs_k["recon_loss"]),
                               np.asarray(logs_seq), rtol=1e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state_a.params, state_b.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_train_model_multi_step(tmp_path):
    """train_model(multi_step=2) over an epoch whose batch count isn't a
    multiple of k: stacked dispatches + single-step tail flush, correct
    final step count, metrics written."""
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2))
    ds = _ListDataset(_records(24))
    dl = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True)
    assert len(dl) == 3  # 2 stacked + 1 tail per epoch
    wd = str(tmp_path / "run")
    state = train_model(
        model, dl, OptimConfig(total_steps=6), params=params,
        max_epochs=2, workdir=wd, checkpoint_interval=2,
        log_interval=2, tensorboard=False, seed=0, multi_step=2,
    )
    assert int(state.step) == 6  # 2 epochs x 3 batches, none dropped
    assert os.path.exists(os.path.join(wd, "metrics.jsonl"))


def test_device_prefetch_matches_unprefetched(tmp_path):
    """The device-side staging thread (prefetch_iter: stack + device_put one
    batch ahead of dispatch) is pure plumbing — same seed and data order
    must give bit-identical final params with prefetch on vs off, across
    the stacked multi-step path AND the ragged single-step tail."""
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2))
    ds = _ListDataset(_records(24))

    def run(depth, wd):
        dl = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True)
        return train_model(
            model, dl, OptimConfig(total_steps=3), params=params,
            max_epochs=1, workdir=wd, checkpoint_interval=5,
            log_interval=2, tensorboard=False, seed=0, multi_step=2,
            device_prefetch=depth,
        )

    s_pre = run(2, str(tmp_path / "pre"))
    s_off = run(0, str(tmp_path / "off"))
    assert int(s_pre.step) == int(s_off.step) == 3
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s_pre.params, s_off.params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_prefetch_iter_propagates_errors():
    from raggesture_tpu.datasets.sampler import prefetch_iter

    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    out = []
    with pytest.raises(RuntimeError, match="boom"):
        for x in prefetch_iter(gen(), depth=1):
            out.append(x)
    assert out == [1, 2]


def test_device_batch_bf16_conditions():
    """bf16_conditions casts ONLY the big condition features; the training
    step runs on them and lands near the f32 loss (the cast is exactly the
    bf16 input rounding TPU matmuls apply anyway, docs/PERFORMANCE.md)."""
    import ml_dtypes

    from raggesture_tpu.train.loop import make_train_step
    from raggesture_tpu.train.runner import device_batch

    batch = {k: np.asarray(v) for k, v in tiny_batch(batch=4).items()}
    db = device_batch(batch, bf16_conditions=True)
    assert db["word"].dtype == ml_dtypes.bfloat16
    assert db["audio"].dtype == ml_dtypes.bfloat16
    assert db["motion_upper"].dtype == np.float32
    assert db["motion_mask"].dtype == np.float32
    # default stays untouched
    db32 = device_batch(batch)
    assert db32["word"].dtype == np.float32

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2))
    state, tx = create_train_state(model, params, OptimConfig(total_steps=4))
    step = jax.jit(make_train_step(model, tx, cfg.diffusion_train.schedule()))
    rng = jax.random.PRNGKey(3)
    _, logs32 = step(state, {k: jnp.asarray(v) for k, v in db32.items()}, rng)
    _, logs16 = step(state, {k: jnp.asarray(v) for k, v in db.items()}, rng)
    l32 = float(logs32["recon_loss"])
    l16 = float(logs16["recon_loss"])
    assert np.isfinite(l16)
    np.testing.assert_allclose(l16, l32, rtol=5e-2)


def test_checkpoint_save_refuses_stale_workdir(tmp_path):
    """A fresh (non-resumed) run in a workdir holding old checkpoints must
    fail loudly: orbax should_save silently refuses steps <= latest, which
    previously persisted NOTHING for the whole run.  The runner's benign
    final re-save of an interval epoch stays allowed."""
    from raggesture_tpu.train.checkpoint import CheckpointManager
    from raggesture_tpu.train.loop import TrainState

    state = TrainState(params={"w": jnp.zeros((2,))},
                       opt_state={"m": jnp.zeros((2,))},
                       step=jnp.zeros((), jnp.int32))
    wd = str(tmp_path)
    m1 = CheckpointManager(wd, interval=1, async_save=False)
    m1.save(3, state)
    m1.save(3, state)  # same-session re-save (runner final save) is fine
    m1.wait()

    m2 = CheckpointManager(wd, interval=1, async_save=False)
    with pytest.raises(RuntimeError, match="already holds step 3"):
        m2.save(0, state)
    m2.save(4, state)  # moving past the old run still works
    m2.wait()
    assert m2.latest_epoch() == 4


def test_epoch_sampler_many_shards_tiny_dataset():
    """num_shards >> num_samples: every shard still gets per_shard indices
    (the single-slice round-up used to leave trailing shards EMPTY — a
    host-count mismatch that deadlocks collective train steps)."""
    from raggesture_tpu.datasets.sampler import EpochSampler

    for n, shards in ((3, 8), (1, 4), (5, 16)):
        per = [EpochSampler(n, num_shards=shards, shard=r, seed=1)
               for r in range(shards)]
        lens = [len(s.indices()) for s in per]
        assert lens == [per[0].per_shard] * shards, (n, shards, lens)
        for s in per:
            assert all(0 <= i < n for i in s.indices())


def test_metric_writer_vector_values(tmp_path):
    """Vector-valued metrics (per-sample pre-reduce losses, the distributed
    bitness payload) serialize verbatim into metrics.jsonl; scalars keep
    the text/TB path (utils/logger.py::MetricWriter)."""
    import json

    from raggesture_tpu.utils.logger import MetricWriter

    wd = str(tmp_path / "w")
    w = MetricWriter(wd, interval=1, tensorboard=False)
    w.write(1, {"recon_loss": 1.5,
                "per_sample_loss": [0.25, 0.5, 0.125]}, epoch=0)
    w.close()
    rows = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
    assert rows[0]["recon_loss"] == 1.5
    assert rows[0]["per_sample_loss"] == [0.25, 0.5, 0.125]


def test_train_model_log_per_sample(tmp_path):
    """runner.train_model(log_per_sample=True) writes one pre-reduce loss
    per sample whose numpy mean is consistent with the logged batch mean
    up to summation order (tests/test_distributed.py proves topology
    bitness through the CLI)."""
    import json

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        tiny_batch(batch=2),
    )
    ds = _ListDataset(_records(8))
    dl = DataLoader(ds, batch_size=8, shuffle=False, drop_last=True)
    wd = str(tmp_path / "run")
    train_model(model, dl, OptimConfig(total_steps=1), params=params,
                max_epochs=1, workdir=wd, checkpoint_interval=1,
                log_interval=1, tensorboard=False, seed=0,
                log_per_sample=True)
    rows = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))
            if json.loads(l).get("prefix") == "train"]
    ps = rows[0]["per_sample_loss"]
    assert len(ps) == 8
    # per-sample losses are the pre-reduce quantities; their mean is not
    # the exact masked global mean (per-sample normalization) but must be
    # the same scale as the logged loss
    assert abs(np.mean(ps) - rows[0]["recon_loss"]) < 0.5
