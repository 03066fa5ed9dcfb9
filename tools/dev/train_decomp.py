"""Trace-backed decomposition of the training device step (VERDICT r4 #1a).

Runs the flagship train programs (multi_step=8 plain and latent-cache,
device batch 128) under the profiler, aggregates the device "XLA Ops"
timeline per HLO op (utils/profiling.py::chrome_trace_op_table), and
buckets device time via the tf_op metadata path:

  - pass:   fwd (jvp) vs bwd (transpose(jvp)) vs optimizer (named scope)
  - stage:  codec_encode / cond_encode / denoise / other (named scopes
            added in models/architecture.py::training_loss)

Writes docs/TRAIN_DECOMP.json and prints the bucket table + top ops with
per-op achieved TFLOP/s and GB/s, so "train device MFU is 0.19-0.24" has
an op-level accounting (reference hot loop this decomposes:
/root/reference/mogen/models/transformers/raggesture.py:1018-1039 +
mogen/models/utils/gaussian_diffusion.py:1432-1535).

Usage: python tools/dev/train_decomp.py [bf16][u<N>][fctx][:plain|latcache|both]
  e.g. "bf16fctxu8:latcache" — bf16 compute, fused cond-ctx kernels,
  scan unroll 8, latent-cache program only
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from raggesture_tpu.utils.env import setup_compilation_cache

setup_compilation_cache()

from raggesture_tpu.datasets.fixtures import full_arch_config, synthetic_batch
from raggesture_tpu.models.architecture import (MotionDiffusionModel,
                                                init_params)
from raggesture_tpu.train.loop import (OptimConfig, create_train_state,
                                       make_multi_train_step)
from raggesture_tpu.utils.profiling import chrome_trace_op_table, trace

K = 8
B = 128


def bucket(tf_op: str) -> tuple:
    """(pass, stage) buckets from the op-metadata path."""
    p = ("opt" if "optimizer" in tf_op else
         "bwd" if "transpose(" in tf_op else "fwd")
    s = ("codec" if "codec_encode" in tf_op or "encode_motion" in tf_op else
         "cond" if "cond_encode" in tf_op else
         "denoise" if "denoise" in tf_op else "other")
    return p, s


def decompose(name: str, run, out: dict):
    logdir = f"/tmp/decomp_{name}"
    os.makedirs(logdir, exist_ok=True)
    t0 = time.perf_counter()
    with trace(logdir):
        run()
    wall = time.perf_counter() - t0
    rows = chrome_trace_op_table(logdir)
    if rows is None:
        print(f"[{name}] no device trace rows")
        return
    total = sum(r["dur_ms"] for r in rows)
    buckets = {}
    for r in rows:
        b = bucket(r["tf_op"])
        d = buckets.setdefault("/".join(b), dict(dur_ms=0.0, gflops=0.0,
                                                 mbytes=0.0, n=0))
        d["dur_ms"] += r["dur_ms"]
        d["gflops"] += r["gflops"]
        d["mbytes"] += r["mbytes"]
        d["n"] += 1
    print(f"\n=== {name}: device total {total:.1f} ms over {K} steps "
          f"({total / K:.1f} ms/step; trace wall {wall:.1f}s) ===")
    print(f"{'bucket':<16}{'ms/step':>9}{'%':>7}{'TFLOP/s':>9}{'GB/s':>8}")
    for key, d in sorted(buckets.items(), key=lambda kv: -kv[1]["dur_ms"]):
        ms = d["dur_ms"] / K
        tf = d["gflops"] / d["dur_ms"] if d["dur_ms"] else 0.0
        gb = d["mbytes"] / d["dur_ms"] if d["dur_ms"] else 0.0
        print(f"{key:<16}{ms:9.2f}{100 * d['dur_ms'] / total:6.1f}%"
              f"{tf:9.2f}{gb:8.1f}")
    print(f"\ntop ops ({name}):")
    print(f"{'op':<44}{'cat':<22}{'ms/step':>8}{'%':>6}{'TFLOP/s':>9}"
          f"{'GB/s':>8} pass/stage")
    for r in rows[:20]:
        tf = r["gflops"] / r["dur_ms"] if r["dur_ms"] else 0.0
        gb = r["mbytes"] / r["dur_ms"] if r["dur_ms"] else 0.0
        print(f"{r['name'][:43]:<44}{r['category'][:21]:<22}"
              f"{r['dur_ms'] / K:8.3f}{100 * r['dur_ms'] / total:5.1f}%"
              f"{tf:9.2f}{gb:8.1f} {'/'.join(bucket(r['tf_op']))}")
    out[name] = {
        "device_ms_per_step": round(total / K, 2),
        "buckets": {k: {"ms_per_step": round(v["dur_ms"] / K, 3),
                        "pct": round(100 * v["dur_ms"] / total, 1),
                        "tflops_per_sec": round(
                            v["gflops"] / v["dur_ms"], 2) if v["dur_ms"]
                        else 0.0,
                        "gbytes_per_sec": round(
                            v["mbytes"] / v["dur_ms"], 1) if v["dur_ms"]
                        else 0.0,
                        "n_ops": v["n"]}
                    for k, v in buckets.items()},
        "top_ops": [{"name": r["name"], "category": r["category"],
                     "tf_op": r["tf_op"],
                     "ms_per_step": round(r["dur_ms"] / K, 3),
                     "pct": round(100 * r["dur_ms"] / total, 2),
                     "count": r["count"],
                     "tflops_per_sec": round(
                         r["gflops"] / r["dur_ms"], 2) if r["dur_ms"]
                     else 0.0,
                     "gbytes_per_sec": round(
                         r["mbytes"] / r["dur_ms"], 1) if r["dur_ms"]
                     else 0.0}
                    for r in rows[:30]],
    }


def main():
    # arg grammar: "[bf16][u<N>][:plain|latcache|both]", e.g. "bf16u8:latcache"
    import re as _re

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    mode, _, sub = which.partition(":")
    bf16 = "bf16" in mode
    fctx = "fctx" in mode
    mu_ = _re.search(r"u(\d+)", mode)
    unroll = int(mu_.group(1)) if mu_ else 1
    which = sub or ("both" if mode in ("", "bf16") or mu_ or fctx
                else mode)
    cfg = full_arch_config()
    model = MotionDiffusionModel(cfg)
    b1 = synthetic_batch(seed=0, batch=1, frames=cfg.codec.num_frames,
                         audio_frames=499)
    params = init_params(model, jax.random.PRNGKey(0), b1)
    tb = synthetic_batch(seed=1, batch=B, frames=cfg.codec.num_frames,
                         audio_frames=499)
    mu, logvar = jax.jit(lambda p, b: model.apply(
        p, b, method=model.encode_motion_dist))(params, tb)
    jax.block_until_ready(mu)
    state, tx = create_train_state(model, params, OptimConfig(total_steps=100))
    multi = jax.jit(
        make_multi_train_step(model, tx, cfg.diffusion_train.schedule(),
                              bf16_compute=bf16, unroll=unroll,
                              fused_ctx=fctx),
        donate_argnums=(0,))
    stack_k = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(v[None], (K,) + v.shape), t))
    rng = jax.random.PRNGKey(5)
    suffix = (("_bf16" if bf16 else "")
              + (f"_u{unroll}" if unroll > 1 else "")
              + ("_fctx" if fctx else ""))
    out = {}
    st = [state]

    def run_on(stacked):
        s, lg = multi(st[0], stacked, rng)
        st[0] = s
        jax.block_until_ready(lg["recon_loss"])

    if which in ("plain", "both"):
        stb = jax.block_until_ready(stack_k(tb))
        run_on(stb)  # compile
        t0 = time.perf_counter()
        run_on(stb)
        print(f"[plain] warm {1e3 * (time.perf_counter() - t0) / K:.1f} "
              f"ms/step wall")
        decompose("train_multistep8_b128" + suffix, lambda: run_on(stb), out)
        del stb

    if which in ("latcache", "both"):
        cached = {k: v for k, v in tb.items()
                  if k not in ("motion_upper", "motion_lower", "motion_face",
                               "motion_hands", "trans", "facial", "contact")}
        cached["latent_mu"] = mu
        cached["latent_logvar"] = logvar
        stc = jax.block_until_ready(stack_k(cached))
        run_on(stc)  # compile
        t0 = time.perf_counter()
        run_on(stc)
        print(f"[latcache] warm {1e3 * (time.perf_counter() - t0) / K:.1f} "
              f"ms/step wall")
        decompose("train_multistep8_latcache_b128" + suffix,
                   lambda: run_on(stc), out)

    path = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                        "..", "docs", "TRAIN_DECOMP.json"))
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(out)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"\nwrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
