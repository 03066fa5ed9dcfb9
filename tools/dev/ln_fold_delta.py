"""Measure the pack-time LayerNorm-fold delta on the real sampling path.

pack_decoder_layer(fold_ln=True) folds the pre-attention LN affines into
the q/k/v (and CA q) projection weights so the layer kernel consumes the
centered activations directly, skipping 8 (R, D) VPU passes per layer
(plus the stylize affine combine, which is unconditional).  Paired
trials, bench.py sync() barrier, two StagedGenerators traced with
LN_FOLD_OVERRIDE on/off.

    python tools/dev/ln_fold_delta.py [--batch N]
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
    for name, fold in (("folded", True), ("unfolded", False)):
        fd.LN_FOLD_OVERRIDE[0] = fold
        try:
            gens[name] = StagedGenerator(model, params, sched, fused=True)
            sync(gens[name].sample(batch, r)["output_latents"])
            print(f"{name}: compiled")
        finally:
            # restore the PRODUCTION default (False): anything traced after
            # this loop must not bake ln_folded=True against an unfolded pack
            fd.LN_FOLD_OVERRIDE[0] = False

    best = {k: float("inf") for k in gens}
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
        print(f"{name:9s}: {dt * 1e3:7.2f} ms/clip-batch "
              f"({args.batch / dt:7.2f} clips/s)")
    print(f"delta:     {(best['unfolded'] - best['folded']) * 1e3:+7.2f} ms "
          f"({best['unfolded'] / best['folded']:.3f}x)")


if __name__ == "__main__":
    main()
