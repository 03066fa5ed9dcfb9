"""Measure the 128-lane grouped context-GEMM delta on the REAL sampling path.

tools/dev/ctx_flop_tax.py showed the isolated context-apply runs 2.09x
faster as 4 diagonal 128-lane GEMMs than as the dense (D, D) GEMM it is
mathematically equal to.  This harness measures what that buys end-to-end:
two StagedGenerators over the same params — one with
fused_decoder_layer's auto grouping (the shipped default), one with
CTX_GROUPS_OVERRIDE forcing dense — timed as alternating-trial minima
(docs/PERFORMANCE.md methodology), with the bench.py sync() fetch barrier.

    python tools/dev/grouped_ctx_delta.py [--batch N]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax
import numpy as np

from raggesture_tpu.utils.env import setup_compilation_cache

setup_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", "run on the real chip"

    from raggesture_tpu.datasets.fixtures import full_arch_config, synthetic_batch
    from raggesture_tpu.models import fused_denoiser as fd
    from raggesture_tpu.models.architecture import (
        MotionDiffusionModel,
        StagedGenerator,
        init_params,
    )

    cfg = full_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = synthetic_batch(seed=0, batch=args.batch,
                            frames=cfg.codec.num_frames, audio_frames=499)
    params = init_params(model, jax.random.PRNGKey(0), batch)
    sched = cfg.diffusion_test.schedule()
    r = jax.random.PRNGKey(0)

    def sync(o):
        np.asarray(o[(0,) * o.ndim])
        return o

    gens = {}
    for name, override in (("grouped", 0), ("dense", 1)):
        fd.CTX_GROUPS_OVERRIDE[0] = override
        try:
            gens[name] = StagedGenerator(model, params, sched, fused=True)
            out = sync(gens[name].sample(batch, r)["output_latents"])
            print(f"{name}: compiled, checksum "
                  f"{float(np.abs(np.asarray(out)).sum()):.4f}")
        finally:
            fd.CTX_GROUPS_OVERRIDE[0] = 0

    best = {"grouped": float("inf"), "dense": float("inf")}
    iters = 6
    for trial in range(4):
        for name, gen in gens.items():
            t0 = time.perf_counter()
            out = None
            for i in range(iters):
                out = gen.sample(
                    batch, jax.random.fold_in(r, trial * iters + i)
                )["output_latents"]
            sync(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / iters)
    for name, dt in best.items():
        print(f"{name:8s}: {dt * 1e3:7.2f} ms/clip-batch "
              f"({args.batch / dt:7.2f} clips/s)")
    print(f"delta:    {(best['dense'] - best['grouped']) * 1e3:+7.2f} ms "
          f"({best['dense'] / best['grouped']:.3f}x)")


if __name__ == "__main__":
    main()
