"""Epoch-based training orchestration (TPU-native ``train_model``).

Capability match for /root/reference/mogen/apis/train.py:41-173 (mmcv
EpochBasedRunner + MMDistributedDataParallel + hook zoo), rebuilt around
one jitted data-parallel train step:

  - data parallelism: ``jax.sharding.Mesh`` over all local devices; the
    gradient all-reduce is compiled into the step by XLA (no DDP wrapper,
    no manual bucketing — replaces mogen/utils/dist_utils.py:12-44);
  - LR schedule: optax cosine decay inside the optimizer (the mmcv
    ``CosineAnnealing min_lr_ratio=1e-6 by_epoch=False`` policy);
  - VAE freezing: optimizer partition (loop.param_labels) — replaces
    VAE_FreezeHook (mogen/core/model_freeze_hooks.py:13-27);
  - checkpointing: orbax every ``interval`` epochs + exact resume —
    replaces CheckpointHook / runner.resume;
  - retrieval memoization persistence: JSON save-after-epoch — replaces
    DatabaseSaveHook (mogen/core/model_freeze_hooks.py:48-181);
  - logging: MetricWriter (text + JSONL + TensorBoard) — replaces
    TextLoggerHook/TensorboardLoggerHook.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets.sampler import prefetch_iter
from ..parallel.mesh import (
    make_mesh,
    put_stacked_batch,
    replicate_tree,
    shard_batch,
)
from ..utils.logger import MetricWriter, NullWriter, get_root_logger
from .checkpoint import CheckpointManager
from .loop import (
    OptimConfig,
    TrainState,
    create_train_state,
    jit_train_step,
    make_train_step,
)

# tensor fields the jitted step consumes; everything else in a collated
# batch (strings, discourse tuples, ...) stays host-side
DEVICE_BATCH_KEYS = (
    "motion_upper", "motion_lower", "motion_face", "motion_hands",
    "trans", "facial", "contact", "motion_mask", "word", "audio",
    "speaker_ids", "latent_mu", "latent_logvar",
)

# with cached latents the motion fields never reach the train step — the
# loss samples z0 from (mu, logvar) and masks via motion_mask only
_MOTION_KEYS = ("motion_upper", "motion_lower", "motion_face",
                "motion_hands", "trans", "facial", "contact")

def device_batch(batch: Dict[str, Any],
                 bf16_conditions: bool = False) -> Dict[str, np.ndarray]:
    keys = DEVICE_BATCH_KEYS
    if "latent_mu" in batch:
        keys = tuple(k for k in keys if k not in _MOTION_KEYS)
    out = {k: batch[k] for k in keys if k in batch}
    if bf16_conditions:
        # shared wire-cast policy with inference (utils/wire.py): ship the
        # big condition features bf16 — safe on TPU, halves the bytes
        from ..utils.wire import cast_condition_features

        out = cast_condition_features(out)
    return out


def train_model(
    model,
    train_loader,
    optim_cfg: OptimConfig,
    *,
    params=None,
    init_rng: Optional[jax.Array] = None,
    max_epochs: int = 500,
    workdir: str = "work_dirs/run",
    checkpoint_interval: int = 2,
    checkpoint_max_to_keep: int = 5,
    log_interval: int = 10,
    tensorboard: bool = True,
    resume: bool = False,
    resume_checkpoint: Optional[str] = None,
    seed: int = 0,
    retrieval_db=None,
    retrieval_save_dir: Optional[str] = None,
    mesh=None,
    val_loader=None,
    val_interval: int = 1,
    val_max_batches: int = 8,
    schedule_sampler: str = "uniform",
    multi_step: int = 1,
    # one step ahead is full double buffering; deeper queues hold extra
    # staged (k, batch, ...) stacks in HBM (queue + worker-held + current)
    # and depth 2 at the flagship batch-128 config RESOURCE_EXHAUSTs a v5e
    device_prefetch: int = 1,
    log_per_sample: bool = False,
    # HBM sample bank capacity (train/cond_bank.py): >0 stages each
    # sample's device fields in HBM once and ships only (k, B) slot
    # indices per steady-state step — the fix for slow-h2d hosts where
    # transfer, not compute, bounds the chain.  Requires multi_step>1,
    # a uniform schedule sampler, single-process, and sample_idx in the
    # loader batches; silently falls back to streaming otherwise.
    cond_bank: int = 0,
    # lax.scan unroll factor for the multi-step program: amortizes the
    # while-loop's per-leaf carry copies (~9 ms/step at the flagship
    # config, docs/TRAIN_DECOMP.json); compile time scales with it
    multi_step_unroll: int = 1,
) -> TrainState:
    """Run the epoch loop; returns the final TrainState (host-fetched).

    ``log_per_sample`` writes the per-sample pre-reduce losses into each
    logged metrics row (key ``per_sample_loss``, a list).  They bypass the
    batch-axis all-reduce, so they are the topology-invariant quantity the
    distributed bitness proof compares exactly (single-step path only)."""
    logger = get_root_logger()
    # host-side artifacts (metrics.jsonl, TensorBoard, retrieval memo JSONs)
    # are rank-0-only in multi-process runs — every process sees identical
    # replicated metrics, and concurrent writers would tear the files
    # (reference: mmcv logger hooks run on rank 0, mogen/apis/train.py:84-96)
    is_main = jax.process_index() == 0
    writer = (MetricWriter(workdir, interval=log_interval,
                           tensorboard=tensorboard)
              if is_main else NullWriter())
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    logger.info("training on %d device(s), %d steps/epoch, %d epochs",
                n_dev, len(train_loader), max_epochs)

    if params is None:
        raise ValueError("params required (use architecture.init_params)")
    state, tx = create_train_state(model, params, optim_cfg)

    bf16_conds = optim_cfg.bf16_conditions
    if bf16_conds is None:  # auto: free on TPU, numerics-visible on CPU
        bf16_conds = jax.default_backend() == "tpu"
    if bf16_conds:
        logger.info("shipping condition features (word/audio) as bfloat16")

    def dbatch(b):
        return device_batch(b, bf16_conditions=bf16_conds)

    ckpt = CheckpointManager(workdir, interval=checkpoint_interval,
                             max_to_keep=checkpoint_max_to_keep)
    start_epoch = 0
    if resume_checkpoint:
        # explicit checkpoint path: .../checkpoints/<epoch> or a workdir
        # (reference resume_from contract, tools/train.py:27)
        import os as _os

        path = _os.path.abspath(resume_checkpoint)
        base = _os.path.basename(path.rstrip("/"))
        if base.isdigit():
            src = CheckpointManager(_os.path.dirname(_os.path.dirname(path)),
                                    interval=checkpoint_interval)
            state, meta = src.restore(state, epoch=int(base))
        else:
            src = CheckpointManager(path, interval=checkpoint_interval)
            state, meta = src.restore(state)
        start_epoch = int(meta["epoch"]) + 1
        logger.info("resumed from %s (epoch %d, step %d)", resume_checkpoint,
                    int(meta["epoch"]), int(state.step))
    elif resume:
        latest = ckpt.latest_epoch()
        if latest is not None:
            state, meta = ckpt.restore(state)
            start_epoch = int(meta.get("epoch", latest)) + 1
            logger.info("resumed from epoch %d (step %d)", latest,
                        int(state.step))
        else:
            logger.info("resume requested but no checkpoint found; "
                        "starting fresh")
    if retrieval_db is not None and retrieval_save_dir:
        # reference DatabaseSaveHook loads memoization before the run
        # unconditionally (model_freeze_hooks.py:60-100)
        retrieval_db.load_memo(retrieval_save_dir)

    from ..diffusion.schedules import DiffusionSchedule  # noqa: F401

    sched_train = model.cfg.diffusion_train.schedule()
    # timestep schedule sampler (uniform stays fully in-graph; importance
    # samplers draw t host-side and sync per-sample losses back — inherent
    # to loss-aware resampling, same as the reference's per-step all_gather,
    # gaussian_diffusion.py:85-106)
    t_sampler = None
    if schedule_sampler != "uniform":
        from ..diffusion.samplers import build_sampler

        t_sampler = build_sampler(schedule_sampler,
                                  sched_train.num_timesteps)
        # each process draws timesteps for ITS batch shard only; decorrelate
        # the hosts' draws (the importance weights stay identical because
        # the synced resampler all-gathers every host's losses)
        t_rng = np.random.RandomState(seed + 17
                                      + 1000003 * jax.process_index())
    step_fn = jit_train_step(
        make_train_step(model, tx, sched_train,
                        bf16_compute=optim_cfg.bf16_compute,
                        with_timesteps=t_sampler is not None,
                        fused_codec=optim_cfg.fused_codec,
                        log_per_sample=log_per_sample,
                        fused_ctx=optim_cfg.fused_ctx), mesh,
        with_timesteps=t_sampler is not None)
    # multi-step dispatch (k steps per jitted call via lax.scan) amortizes
    # the per-dispatch argument marshaling — a ~2x wall win on remote-hosted
    # TPUs (loop.make_multi_train_step).  Importance samplers need a host
    # round trip per step, so they stay on the single-step path.
    multi_fn = None
    if multi_step > 1 and t_sampler is None:
        from .loop import jit_multi_train_step, make_multi_train_step

        multi_fn = jit_multi_train_step(
            make_multi_train_step(model, tx, sched_train,
                                  bf16_compute=optim_cfg.bf16_compute,
                                  fused_codec=optim_cfg.fused_codec,
                                  fused_ctx=optim_cfg.fused_ctx,
                                  unroll=multi_step_unroll),
            mesh)
    bank = banked_fn = None
    if cond_bank > 0 and multi_fn is not None:
        from ..parallel.mesh import spans_processes
        from .cond_bank import DeviceSampleBank, jit_banked_multi_step

        if spans_processes(mesh):
            logger.warning("cond_bank requested but the mesh spans "
                           "processes — falling back to streaming")
        else:
            bank = DeviceSampleBank(cond_bank, mesh)
            banked_fn = jit_banked_multi_step(
                make_multi_train_step(model, tx, sched_train,
                                      bf16_compute=optim_cfg.bf16_compute,
                                      fused_codec=optim_cfg.fused_codec,
                                      fused_ctx=optim_cfg.fused_ctx,
                                      unroll=multi_step_unroll),
                mesh)
            logger.info("device sample bank enabled (capacity %d samples)",
                        cond_bank)
    val_fn = None
    if val_loader is not None:
        from .loop import jit_val_step, make_val_step

        val_fn = jit_val_step(
            make_val_step(model, sched_train,
                          fused_ctx=optim_cfg.fused_ctx), mesh)
    state = replicate_tree(state, mesh)
    rng = replicate_tree(jax.random.PRNGKey(seed), mesh)

    # host-side step counter: fetching state.step every iteration would
    # synchronize the host with the device per step, defeating async
    # dispatch and the prefetching loader.  One fetch establishes the
    # post-resume offset; afterwards the count is deterministic.
    global_step = int(jax.device_get(state.step))
    try:
        for epoch in range(start_epoch, max_epochs):
            train_loader.set_epoch(epoch)
            t_epoch = time.time()
            n_batches = 0

            # logs are device futures tied to their step's completion —
            # fetching them immediately after dispatch stalls the host on
            # the running step and serializes compute with the next batch's
            # staging.  Defer each interval's fetch to the NEXT log event
            # (by then its step has finished), keeping the host one
            # dispatch ahead (device-side double buffering).
            pending_logs = []

            def flush_logs():
                while pending_logs:
                    step_no, lg = pending_logs.pop(0)
                    # multi-step logs carry a leading (k,) axis — log means;
                    # per-sample vectors are preserved verbatim (bitness
                    # proof payload, see log_per_sample)
                    host_logs = {
                        key: (np.asarray(v).reshape(-1).tolist()
                              if key == "per_sample_loss"
                              else float(np.mean(np.asarray(v))))
                        for key, v in lg.items()}
                    host_logs["epoch_time"] = time.time() - t_epoch
                    writer.write(step_no, host_logs, epoch=epoch,
                                 force=True)

            def log_step(logs, k=1):
                nonlocal n_batches, global_step
                n_batches += k
                prev = global_step
                global_step += k
                flush_logs()  # the previous interval's step is done by now
                if (global_step // log_interval != prev // log_interval
                        or n_batches == k):
                    # force=True (at flush): THIS interval-crossing check is
                    # the cadence — the writer's own step%interval gate
                    # would drop most lines when steps advance by k > 1
                    pending_logs.append((global_step, logs))

            if t_sampler is not None:
                for batch in train_loader:
                    # the loader batch is this process's shard; t/w are drawn
                    # per local row and assembled into the global arrays by
                    # shard_batch (multi-process aware)
                    hb = dbatch(batch)
                    B_local = next(iter(hb.values())).shape[0]
                    db = shard_batch(hb, mesh)
                    t_np, w_np = t_sampler.sample_np(t_rng, B_local)
                    state, logs = step_fn(
                        state, db, rng,
                        shard_batch(jnp.asarray(t_np), mesh),
                        shard_batch(jnp.asarray(w_np), mesh))
                    if hasattr(t_sampler, "update_with_losses"):
                        # fetch only this host's rows (a global array is not
                        # fully addressable multi-process); the resampler's
                        # synced gather re-assembles the global pairs
                        psl = logs.pop("per_sample_loss")
                        shards = sorted(psl.addressable_shards,
                                        key=lambda s: s.index[0].start or 0)
                        local_losses = np.concatenate(
                            [np.asarray(s.data) for s in shards])
                        t_sampler.update_with_losses(t_np, local_losses)
                        logs.pop("t", None)
                    log_step(logs)
            else:
                def staged_stream():
                    # host staging pipeline: collate -> (stack) -> device
                    # placement.  Runs inside prefetch_iter's worker thread,
                    # so batch j+1 is stacked and its transfer enqueued while
                    # the main thread's step j dispatch is outstanding
                    # (device-side double buffering; the loop below only
                    # dispatches).  Yields (k_steps, device_batch) — with
                    # the sample bank, device_batch is ("bank", banks, idx)
                    # and the steady-state transfer is the (k, B) idx only.
                    sbuf = []
                    slot_buf = []
                    use_bank = bank is not None

                    def drain_singly():
                        for b in sbuf:
                            yield 1, shard_batch(b, mesh)
                        sbuf.clear()
                        slot_buf.clear()

                    for batch in train_loader:
                        hb = dbatch(batch)
                        if multi_fn is None:
                            yield 1, shard_batch(hb, mesh)
                            continue
                        if sbuf and any(
                                np.shape(sbuf[0][k2]) != np.shape(hb[k2])
                                for k2 in sbuf[0]):
                            # ragged tail batch: run buffered ones singly
                            yield from drain_singly()
                        if use_bank and "sample_idx" not in batch:
                            logger.warning(
                                "cond_bank: loader batches carry no "
                                "sample_idx — falling back to streaming")
                            use_bank = False
                        if use_bank:
                            try:
                                slot_buf.append(bank.stage(
                                    hb, batch["sample_idx"]))
                            except ValueError:
                                # ragged / over-capacity batch: this one
                                # streams; buffered banked ones still run
                                # banked if a full stack forms
                                pass
                        sbuf.append(hb)
                        if len(sbuf) < multi_step:
                            continue
                        if use_bank and len(slot_buf) == multi_step:
                            idx = np.stack(slot_buf)
                            banks_now = dict(bank.banks)
                            sbuf.clear()
                            slot_buf.clear()
                            yield multi_step, ("bank", banks_now,
                                               put_stacked_batch(idx, mesh))
                            continue
                        stacked = {k2: np.stack([b[k2] for b in sbuf])
                                   for k2 in sbuf[0]}
                        sbuf.clear()
                        slot_buf.clear()
                        yield multi_step, put_stacked_batch(stacked, mesh)
                    # epoch tail shorter than multi_step
                    yield from drain_singly()

                stream = staged_stream()
                if device_prefetch > 0:
                    stream = prefetch_iter(stream, depth=device_prefetch)
                for k_steps, db in stream:
                    if isinstance(db, tuple) and db and db[0] == "bank":
                        state, logs = banked_fn(state, db[1], db[2], rng)
                    elif k_steps > 1:
                        state, logs = multi_fn(state, db, rng)
                    else:
                        state, logs = step_fn(state, db, rng)
                    log_step(logs, k=k_steps)
            flush_logs()  # drain the deferred interval before val/ckpt rows
            if val_fn is not None and (epoch + 1) % val_interval == 0:
                # validation pass (reference val workflow / val_step)
                val_logs = []
                for vb_i, vbatch in enumerate(val_loader):
                    if vb_i >= val_max_batches:
                        break
                    vdb = shard_batch(dbatch(vbatch), mesh)
                    # decorrelate the (t, noise) draw per epoch AND per val
                    # batch — one constant key would score every batch at
                    # the identical timestep vector, a biased val loss
                    vrng = jax.random.fold_in(
                        jax.random.fold_in(rng, 7919 + epoch), vb_i)
                    val_logs.append(val_fn(state, vdb, vrng))
                if val_logs:
                    agg = {k: float(np.mean([float(l[k]) for l in val_logs]))
                           for k in val_logs[0]}
                    writer.write(global_step, agg, prefix="val",
                                 epoch=epoch, force=True)
            if retrieval_db is not None and retrieval_save_dir and is_main \
                    and epoch == start_epoch:
                # reference DatabaseSaveHook: persist memoization after the
                # first train epoch (model_freeze_hooks.py:102-140)
                retrieval_db.save_memo(retrieval_save_dir)
            ckpt.maybe_save(epoch, state, meta={"workdir": workdir})
        # final checkpoint regardless of interval
        ckpt.save(max_epochs - 1, state, meta={"workdir": workdir,
                                               "final": True})
    finally:
        ckpt.wait()
        writer.close()
    return jax.device_get(state)
