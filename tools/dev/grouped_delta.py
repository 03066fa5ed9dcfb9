"""Measure the grouped-linear-attention train-step delta (VERDICT r3 §6).

The b65e5f8 snapshot landed ``grouped_linear_attention`` in the shipped
denoiser path (models/denoiser.py:154,185) without its own measured
number.  This harness isolates it: two multi-step (k=8) latent-cache
train steps at batch 64 — one traced with grouping active (the shipped
TPU path), one with ``group_size`` forced to 1 (the per-head reference
einsums) — timed as alternating-trial minima in one process so host-load
drift cancels (docs/PERFORMANCE.md methodology).

    python tools/dev/grouped_delta.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax
import jax.numpy as jnp

from raggesture_tpu.utils.env import setup_compilation_cache

setup_compilation_cache()

from raggesture_tpu.datasets.fixtures import full_arch_config, synthetic_batch
from raggesture_tpu.models.architecture import MotionDiffusionModel, init_params
from raggesture_tpu.ops import linear_attention as la
from raggesture_tpu.train.loop import (
    OptimConfig,
    create_train_state,
    make_multi_train_step,
)

K = 8


def main():
    assert jax.default_backend() == "tpu", "run on the real chip"
    cfg = full_arch_config()
    model = MotionDiffusionModel(cfg)
    b1 = synthetic_batch(seed=0, batch=1, frames=cfg.codec.num_frames,
                         audio_frames=499)
    params = init_params(model, jax.random.PRNGKey(0), b1)
    # batch 64, not the bench's 128: this harness keeps TWO multi-step
    # executables + states resident for paired trials, and 128 exceeds
    # HBM even with donated states; the grouped/ungrouped RATIO is the
    # deliverable and is batch-stable
    tb = synthetic_batch(seed=1, batch=64, frames=cfg.codec.num_frames,
                         audio_frames=499)
    mu, logvar = jax.jit(lambda p, b: model.apply(
        p, b, method=model.encode_motion_dist))(params, tb)
    cached = {k: v for k, v in tb.items()
              if k not in ("motion_upper", "motion_lower", "motion_face",
                           "motion_hands", "trans", "facial", "contact")}
    cached["latent_mu"] = mu
    cached["latent_logvar"] = logvar
    stack = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(v[None], (K,) + v.shape), t))(cached)
    jax.block_until_ready(stack["latent_mu"])

    _, tx = create_train_state(model, params, OptimConfig(total_steps=100))
    sched = cfg.diffusion_train.schedule()
    rng = jax.random.PRNGKey(5)

    # two separately traced steps: grouping is a trace-time decision
    # (group_size is called while tracing), so patching it while building
    # the second jit bakes the per-head reference einsums in
    # donate the state: two resident multi-step executables at batch 128
    # WITHOUT donation (double-buffered states + workspace) exceed the
    # chip's HBM (observed RESOURCE_EXHAUSTED); each variant evolves its
    # own state in place instead
    step_grouped = jax.jit(make_multi_train_step(model, tx, sched),
                           donate_argnums=(0,))
    orig = la.group_size
    la.group_size = lambda *a, **k: 1
    try:
        step_ungrouped = jax.jit(make_multi_train_step(model, tx, sched),
                                 donate_argnums=(0,))
        # each state gets its OWN copy of the param buffers: TrainStates
        # built from the same tree alias the same device arrays, and the
        # first donated call would invalidate the other variant's params
        # (async INVALID_ARGUMENT at the next fetch)
        copy_tree = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))
        states = {
            name: create_train_state(model, copy_tree(params),
                                     OptimConfig(total_steps=100))[0]
            for name in ("grouped", "ungrouped")
        }
        # scalar fetch as the completion barrier (bench.py sync() docstring:
        # block_until_ready can return before the device finishes on axon)
        import numpy as np

        def _sync(logs):
            return float(np.asarray(logs["recon_loss"][-1]))

        for name, fn in (("grouped", step_grouped),
                         ("ungrouped", step_ungrouped)):
            states[name], logs = fn(states[name], stack, rng)
            print(f"{name}: compiled, loss {_sync(logs):.5f}")
        best = {"grouped": float("inf"), "ungrouped": float("inf")}
        for trial in range(4):
            for name, fn in (("grouped", step_grouped),
                             ("ungrouped", step_ungrouped)):
                t0 = time.perf_counter()
                for _ in range(2):
                    states[name], logs = fn(states[name], stack, rng)
                _sync(logs)
                best[name] = min(best[name],
                                 (time.perf_counter() - t0) / (2 * K))
        print(f"grouped:   {best['grouped'] * 1e3:7.2f} ms/step")
        print(f"ungrouped: {best['ungrouped'] * 1e3:7.2f} ms/step")
        print(f"delta:     {(best['ungrouped'] - best['grouped']) * 1e3:+7.2f}"
              f" ms/step ({best['ungrouped'] / best['grouped']:.3f}x)")
    finally:
        la.group_size = orig


if __name__ == "__main__":
    main()
