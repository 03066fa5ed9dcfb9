#!/usr/bin/env python
"""Train one body-part TransformerVAE (the diffusion latent codec).

The reference loads four pretrained body-part VAEs from a separate run
(diffusion_transformer.py:137-167 — their training code is not in the repo);
this tool closes that gap: it trains a chunked TransformerVAE on the cached
BEAT2 windows with masked recon + velocity + KL losses and saves orbax
params compatible with the codec loader.

Usage:
    python tools/train_vae.py CONFIG --part upper [--epochs 100] \
        [--kl-weight 1e-4] [--work-dir DIR] [--options ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="train a body-part VAE")
    p.add_argument("config")
    p.add_argument("--part", default="upper",
                   choices=["upper", "hands", "face", "lowertrans"])
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--kl-weight", type=float, default=1e-4)
    p.add_argument("--vel-weight", type=float, default=1.0)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--work-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--options", nargs="+", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from raggesture_tpu.builders import arch_config_from, beatx_config_from
    from raggesture_tpu.config import Config
    from raggesture_tpu.datasets.build import build_dataset
    from raggesture_tpu.datasets.sampler import DataLoader
    from raggesture_tpu.models.vae import TransformerVAE
    from raggesture_tpu.models.vae_architecture import (
        VAETrainConfig,
        make_vae_train_step,
        part_batch_features,
    )
    from raggesture_tpu.train.checkpoint import save_params
    from raggesture_tpu.train.runner import device_batch
    from raggesture_tpu.utils.env import setup_compilation_cache
    from raggesture_tpu.utils.logger import MetricWriter, get_root_logger

    setup_compilation_cache()
    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_option_strings(args.options)
    workdir = args.work_dir or os.path.join(
        "work_dirs", f"vae_{args.part}")
    logger = get_root_logger(os.path.join(workdir, "train_vae.log"))
    writer = MetricWriter(workdir, interval=10, tensorboard=False)

    arch = arch_config_from(cfg.model)
    vcfg = arch.codec.vae_config(args.part)
    vae = TransformerVAE(vcfg)

    dataset = build_dataset(beatx_config_from(cfg.data.train))
    loader = DataLoader(dataset, args.batch_size, shuffle=True,
                        drop_last=True, seed=args.seed)
    logger.info("training %s VAE (%d feats) on %d windows", args.part,
                vcfg.nfeats, len(dataset))

    first = device_batch(next(iter(loader)))
    feats = part_batch_features(first, args.part)
    params = vae.init({"params": jax.random.PRNGKey(args.seed),
                       "vae": jax.random.PRNGKey(1)},
                      feats[:1], sample=False, method=vae.encode_to_dist)
    dec_init = vae.init({"params": jax.random.PRNGKey(args.seed)},
                        jnp.zeros((1, vcfg.num_frames // vcfg.frame_chunk_size,
                                   vcfg.latent_dim)), method=vae.decode)
    merged = dict(dec_init["params"])
    merged.update(params["params"])
    params = {"params": merged}

    total_steps = max(len(loader) * args.epochs, 1)
    tx = optax.adam(optax.cosine_decay_schedule(args.lr, total_steps,
                                                alpha=1e-6))
    opt_state = tx.init(params)
    tcfg = VAETrainConfig(part=args.part, kl_weight=args.kl_weight,
                          vel_weight=args.vel_weight)
    step_fn = jax.jit(make_vae_train_step(vae, tx, tcfg, args.part))

    rng = jax.random.PRNGKey(args.seed)
    step = 0
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        n_batches = len(loader)
        for bi, batch in enumerate(loader):
            params, opt_state, logs = step_fn(
                params, opt_state, device_batch(batch), rng,
                jnp.asarray(step))
            step += 1
            if step % 10 == 0 or bi == n_batches - 1:
                writer.write(step, {k: float(v) for k, v in logs.items()},
                             epoch=epoch, force=True)
        out = os.path.join(workdir, f"{args.part}.msgpack")
        save_params(out, params, meta={"part": args.part, "epoch": epoch})
    logger.info("saved %s VAE params to %s", args.part,
                os.path.join(workdir, f"{args.part}.msgpack"))


if __name__ == "__main__":
    main()
