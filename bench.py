"""Benchmark: 150-frame gesture clips/sec/chip at 50-step DDIM sampling.

Protocol (BASELINE.md): flagship basegesture_len150_beat model (43x512
latents, 8-layer denoiser, 2x-batch condition mixing per step, respace
"15,15,8,6,6" = 50 steps) + full 4-part VAE decode, batch 1, on one TPU chip.
Baseline obligation: >= 1 clip/s/chip (10x real-time for a 10 s clip);
``vs_baseline`` is measured clips/s divided by that 1.0 clip/s target.

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from raggesture_tpu.datasets.fixtures import full_arch_config, synthetic_batch
    from raggesture_tpu.models.architecture import (
        MotionDiffusionModel, StagedGenerator, init_params,
    )
    from raggesture_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache()
    cfg = full_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = synthetic_batch(seed=0, batch=1, frames=cfg.codec.num_frames,
                            audio_frames=499)
    params = init_params(model, jax.random.PRNGKey(0), batch)
    sched = cfg.diffusion_test.schedule()
    # fused=True: Pallas self-attention kernel + stacked adaLN (TPU only;
    # falls back to the XLA twin elsewhere)
    gen = StagedGenerator(model, params, sched,
                          fused=jax.default_backend() == "tpu")

    def run(rng):
        # single-dispatch plain-generation pipeline (conds -> scan -> decode
        # in ONE jit): one host->device round trip per clip
        out = gen.sample(batch, rng)
        return out["pred_upper"], out["pred_hands"], out["output_latents"]

    # warmup / compile
    r = jax.random.PRNGKey(0)
    jax.block_until_ready(run(r))

    # best-of-trials: the TPU host is shared, and transient load inflates a
    # single timing window by up to ~1.5x — the minimum over several short
    # windows is the reproducible number (see docs/PERFORMANCE.md)
    best_dt = float("inf")
    for trial in range(4):
        n_iters = 10
        t0 = time.perf_counter()
        for i in range(n_iters):
            out = run(jax.random.fold_in(r, trial * n_iters + i))
        jax.block_until_ready(out)
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_iters)

    clips_per_sec = 1.0 / best_dt
    print(json.dumps({
        "metric": "150-frame gesture clips/sec/chip (50-step DDIM, batch 1, incl. VAE decode)",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / 1.0, 4),
    }))


if __name__ == "__main__":
    main()
