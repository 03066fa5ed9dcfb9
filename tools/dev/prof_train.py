"""Device-trace the multi-step latent-cache train step and the fused codec
roundtrip; write xplane traces for /tmp/xsum.py analysis."""
import sys
import time

import jax
import jax.numpy as jnp

from raggesture_tpu.utils.env import setup_compilation_cache

setup_compilation_cache()

from raggesture_tpu.datasets.fixtures import full_arch_config, synthetic_batch
from raggesture_tpu.models.architecture import MotionDiffusionModel, init_params
from raggesture_tpu.train.loop import (
    OptimConfig, create_train_state, make_multi_train_step)

which = sys.argv[1] if len(sys.argv) > 1 else "train"

cfg = full_arch_config()
model = MotionDiffusionModel(cfg)
batch = synthetic_batch(seed=0, batch=1, frames=cfg.codec.num_frames,
                        audio_frames=499)
params = init_params(model, jax.random.PRNGKey(0), batch)

if which == "train":
    tb = synthetic_batch(seed=1, batch=128, frames=cfg.codec.num_frames,
                         audio_frames=499)
    mu, logvar = jax.jit(lambda p, b: model.apply(
        p, b, method=model.encode_motion_dist))(params, tb)
    jax.block_until_ready(mu)
    cached_tb = {k: v for k, v in tb.items()
                 if k not in ("motion_upper", "motion_lower", "motion_face",
                              "motion_hands", "trans", "facial", "contact")}
    cached_tb["latent_mu"] = mu
    cached_tb["latent_logvar"] = logvar
    state, tx = create_train_state(model, params,
                                   OptimConfig(total_steps=100))
    K = 8
    stc = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(v[None], (K,) + v.shape), t))(cached_tb)
    stc = jax.block_until_ready(stc)
    multi = jax.jit(
        make_multi_train_step(model, tx, cfg.diffusion_train.schedule()),
        donate_argnums=(0,))
    rng_t = jax.random.PRNGKey(5)
    state, logs = multi(state, stc, rng_t)
    jax.block_until_ready(logs["recon_loss"])
    t0 = time.perf_counter()
    state, logs = multi(state, stc, rng_t)
    jax.block_until_ready(logs["recon_loss"])
    print("ms/step warm:", (time.perf_counter() - t0) / K * 1e3)
    jax.profiler.start_trace("/tmp/trace_train")
    state, logs = multi(state, stc, rng_t)
    jax.block_until_ready(logs["recon_loss"])
    jax.profiler.stop_trace()
    print("trace -> /tmp/trace_train (divide totals by K=8)")
elif which == "codec":
    from raggesture_tpu.models.codec import part_features
    from raggesture_tpu.models.fused_codec import (
        fused_decode, fused_encode_dist, stack_codec_params)

    bb32 = synthetic_batch(seed=0, batch=32, frames=cfg.codec.num_frames,
                          audio_frames=8)
    cstack = stack_codec_params(params["params"]["codec"], cfg.codec)

    def fused_roundtrip(p, cs, b):
        cp = p["params"]["codec"]
        feats = part_features(
            b["motion_upper"], b["motion_lower"], b["motion_face"],
            b["motion_hands"], b["trans"], b["facial"], b["contact"])
        z, _ = fused_encode_dist(cfg.codec, cp, cs, feats,
                                 b.get("motion_mask"))
        return fused_decode(cfg.codec, cp, cs, z)

    fused_roundtrip = jax.jit(fused_roundtrip)
    out = fused_roundtrip(params, cstack, bb32)
    jax.block_until_ready(out["upper"])
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        out = fused_roundtrip(params, cstack, bb32)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        best = min(best, time.perf_counter() - t0)
    print("ms/roundtrip best (per-iter sync):", best * 1e3)
    jax.profiler.start_trace("/tmp/trace_codec")
    out = fused_roundtrip(params, cstack, bb32)
    jax.block_until_ready(out["upper"])
    jax.profiler.stop_trace()
    print("trace -> /tmp/trace_codec")
