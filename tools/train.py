#!/usr/bin/env python
"""Train the RAG-Gesture diffusion model on TPU.

Capability match for /root/reference/tools/train.py:69-157 (config load,
distributed init, workdir/log/meta, seed, dataset+architecture build,
train_model), rebuilt for the JAX runtime: ``jax.distributed.initialize``
replaces ``init_dist(nccl)``, a data-parallel ``jax.sharding.Mesh`` replaces
MMDistributedDataParallel, orbax replaces mmcv checkpoints.

Usage:
    python tools/train.py configs/raggesture_beatx/basegesture_len150_beat.py \
        [--work-dir DIR] [--resume-from latest] [--load-from PARAMS] \
        [--seed 0] [--options k.ey=value ...] [--distributed]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a gesture diffusion model")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", help="dir to save logs and checkpoints")
    p.add_argument("--resume-from", nargs="?", const="latest", default=None,
                   help="resume from the latest checkpoint in work-dir")
    p.add_argument("--load-from", default=None,
                   help="orbax params path to initialize from")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--options", nargs="+", default=[],
                   help="config overrides: key.subkey=value")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="with --distributed: coordinator address (default: "
                        "auto-detect from the cluster env, e.g. SLURM — the "
                        "reference's init_dist launcher contract)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="with --distributed: total process count (default: "
                        "auto-detect)")
    p.add_argument("--process-id", type=int, default=None,
                   help="with --distributed: this process's rank (default: "
                        "auto-detect)")
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--device-batch-size", type=int, default=None,
                   help="override data.samples_per_device")
    p.add_argument("--latent-cache", default=None, metavar="DIR",
                   help="precompute per-window codec latent distributions "
                        "into DIR (one frozen-codec encode pass, idempotent)"
                        " and train from them — distributionally identical "
                        "to the live encode, skips ~25 GFLOP/sample/step")
    p.add_argument("--multi-step", type=int, default=None,
                   help="train steps per jitted dispatch (lax.scan over a "
                        "stacked batch; amortizes dispatch marshaling — "
                        "~2x wall on remote-hosted TPUs). Default: "
                        "runner.multi_step from the config, else 1")
    p.add_argument("--device-prefetch", type=int, default=1,
                   help="device-side double-buffer depth: batches staged "
                        "(stacked + device_put) ahead of dispatch in a "
                        "background thread; 0 disables")
    p.add_argument("--multi-step-unroll", type=int, default=1,
                   help="lax.scan unroll for the multi-step program "
                        "(amortizes while-loop carry copies; compile time "
                        "scales with it)")
    p.add_argument("--cond-bank", type=int, default=0, metavar="CAPACITY",
                   help="HBM sample-bank capacity (samples): stage each "
                        "sample's device tensors on-chip once, then ship "
                        "only slot indices per step — removes the "
                        "host->device transfer from steady-state steps "
                        "(needs --multi-step>1; ~1.2 MB HBM/sample with "
                        "--latent-cache). 0 disables")
    p.add_argument("--schedule-sampler", default="uniform",
                   choices=["uniform", "loss-second-moment"],
                   help="diffusion timestep sampler (loss-second-moment = "
                        "importance resampling by recent loss magnitude)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of the first "
                        "training steps into <work-dir>/profile (view with "
                        "TensorBoard's profile plugin or Perfetto)")
    p.add_argument("--log-per-sample", action="store_true",
                   help="write per-sample pre-reduce losses into each "
                        "metrics.jsonl row — the topology-invariant "
                        "quantity the distributed bitness test compares")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax.debug_nans (the reference forces torch "
                        "detect_anomaly; here it is opt-in — it costs real "
                        "throughput)")
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    if args.distributed:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from raggesture_tpu.builders import (
        arch_config_from,
        beatx_config_from,
        build_architecture,
        optim_config_from,
        retrieval_config_from,
    )
    from raggesture_tpu.config import Config
    from raggesture_tpu.datasets.build import build_dataset
    from raggesture_tpu.datasets.sampler import build_dataloader
    from raggesture_tpu.models.architecture import init_params
    from raggesture_tpu.train.checkpoint import load_params
    from raggesture_tpu.train.runner import train_model
    from raggesture_tpu.utils.env import setup_compilation_cache
    from raggesture_tpu.utils.logger import collect_env, get_root_logger

    setup_compilation_cache()

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_option_strings(args.options)
    workdir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(workdir, exist_ok=True)
    # host-side workdir artifacts are rank-0-only (concurrent writers on a
    # shared workdir would tear them; reference logs/dumps on rank 0)
    is_main = jax.process_index() == 0
    if is_main:
        cfg.dump(os.path.join(workdir, "config.py"))

    timestamp = time.strftime("%Y%m%d_%H%M%S", time.localtime())
    logger = get_root_logger(
        os.path.join(workdir, f"{timestamp}.log") if is_main else None)
    for k, v in collect_env().items():
        logger.info("env: %s = %s", k, v)
    logger.info("config: %s", args.config)

    # dataset (features must be pre-extracted or HF models available);
    # featurizers are only constructed when a cache actually needs building
    from raggesture_tpu.datasets.build import cache_exists, make_default_extractor

    dcfg = beatx_config_from(cfg.data.train)
    extractor = None if cache_exists(dcfg) else make_default_extractor()
    dataset = build_dataset(dcfg, extractor)
    logger.info("train dataset: %d windows", len(dataset))

    model = build_architecture(cfg.model)
    batch_per_device = args.device_batch_size or cfg.data.get(
        "samples_per_device", 128)
    n_local = jax.local_device_count()
    workers = cfg.data.get("workers_per_device",
                           cfg.data.get("workers_per_gpu", 0))

    def make_loader(ds):
        ldr = build_dataloader(
            ds, batch_per_device, n_local,
            num_shards=jax.process_count(), shard=jax.process_index(),
            seed=args.seed,
        )
        if workers:
            from raggesture_tpu.datasets.sampler import PrefetchLoader

            ldr = PrefetchLoader(ldr, num_workers=workers)
        return ldr

    loader = make_loader(dataset)

    max_epochs = cfg.runner.get("max_epochs", 500)
    total_steps = max(len(loader) * max_epochs, 1)
    optim_cfg = optim_config_from(cfg, total_steps)

    # params: load or init (init needs one example batch)
    if args.load_from:
        import numpy as np

        first = next(iter(loader))
        from raggesture_tpu.train.runner import device_batch

        params = init_params(model, jax.random.PRNGKey(args.seed),
                             {k: v[:1] for k, v in device_batch(first).items()})
        params = load_params(args.load_from, params)
        logger.info("loaded params from %s", args.load_from)
    else:
        first = next(iter(loader))
        from raggesture_tpu.train.runner import device_batch

        params = init_params(model, jax.random.PRNGKey(args.seed),
                             {k: v[:1] for k, v in device_batch(first).items()})
        # graft pretrained frozen-codec VAEs (the reference loads them at
        # architecture build from vae_cfg, diffusion_transformer.py:137-188)
        from raggesture_tpu.train.checkpoint import load_codec_params

        params = load_codec_params(
            params, cfg.model.model.get("vae_cfg", {}), logger)

    if args.latent_cache:
        # frozen-codec latent cache: one encode pass, then train without
        # the codec forward (see raggesture_tpu/datasets/latent_cache.py)
        from raggesture_tpu.datasets.latent_cache import (
            LatentCachedDataset,
            build_latent_cache,
        )

        # multi-host: one builder, everyone else waits — concurrent writers
        # would tear the shard/index files (the cache is idempotent, so the
        # non-builders just load what process 0 wrote)
        if jax.process_index() == 0:
            build_latent_cache(dataset, model, params, args.latent_cache,
                               logger=logger)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("latent_cache_built")
        dataset = LatentCachedDataset(dataset, args.latent_cache,
                                      params=params)
        loader = make_loader(dataset)

    # optional retrieval database for memoization persistence during training
    retrieval_db = None
    retrieval_save_dir = None
    if cfg.model.model.get("retrieval_train", False):
        from raggesture_tpu.retrieval.database import (
            RetrievalCorpus,
            RetrievalDatabase,
        )

        rcfg = retrieval_config_from(cfg.model.model)
        corpus = RetrievalCorpus.build(dataset, rcfg)
        retrieval_db = RetrievalDatabase(corpus, rcfg, dataset)
        for hook in cfg.get("custom_hooks", []):
            if hook.get("type") == "DatabaseSaveHook":
                retrieval_save_dir = hook.get("save_dir")

    # validation loader (reference registers a val split; workflow runs it
    # when present — here: a few val batches per epoch unless --no-validate)
    val_loader = None
    if not args.no_validate:
        try:
            val_cfg_d = beatx_config_from(cfg.data.val)
            if extractor is None and not cache_exists(val_cfg_d):
                extractor = make_default_extractor()
            val_ds = build_dataset(val_cfg_d, extractor)
            if len(val_ds) > 0:
                val_loader = build_dataloader(
                    val_ds, batch_per_device, n_local, shuffle=False,
                    num_shards=jax.process_count(),
                    shard=jax.process_index(), seed=args.seed,
                    drop_last=True)
                logger.info("val dataset: %d windows", len(val_ds))
        except Exception as e:
            logger.warning("no validation data (%s)", e)

    ckpt_cfg = cfg.get("checkpoint_config", {}) or {}
    log_cfg = cfg.get("log_config", {}) or {}
    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        from raggesture_tpu.utils.profiling import trace

        profile_ctx = trace(os.path.join(workdir, "profile"))
        logger.info("profiling into %s", os.path.join(workdir, "profile"))

    with profile_ctx:
        state = train_model(
            model, loader, optim_cfg,
            params=params,
            max_epochs=max_epochs,
            workdir=workdir,
            checkpoint_interval=ckpt_cfg.get("interval", 2),
            checkpoint_max_to_keep=ckpt_cfg.get("max_to_keep", 5),
            log_interval=log_cfg.get("interval", 10),
            tensorboard=log_cfg.get("tensorboard", True),
            resume=args.resume_from is not None,
        resume_checkpoint=(args.resume_from
                           if args.resume_from not in (None, "latest")
                           else None),
            seed=args.seed,
            retrieval_db=retrieval_db,
            retrieval_save_dir=retrieval_save_dir,
            val_loader=val_loader,
            schedule_sampler=args.schedule_sampler,
            multi_step=(args.multi_step if args.multi_step is not None
                        else cfg.runner.get("multi_step", 1)),
            device_prefetch=args.device_prefetch,
            log_per_sample=args.log_per_sample,
            cond_bank=args.cond_bank,
            multi_step_unroll=args.multi_step_unroll,
        )
    logger.info("training done at step %d", int(state.step))


if __name__ == "__main__":
    main()
