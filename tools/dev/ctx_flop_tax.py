"""Quantify the dense-context FLOP tax (VERDICT r3 §7).

The fused decoder layer applies linear-attention contexts as DENSE
(D, D) GEMMs with block-diagonal structure — executing H=16x the minimal
per-head FLOPs (docs/PERFORMANCE.md "Where the serving ceiling is").  The
open question: would a head-retiled layout beat it in *time* despite
Mosaic's dislike of sub-tile layouts?  This experiment measures the
context-apply op (the layer kernel's hot GEMM shape: R=96 rows of D=512,
H=16 heads of Dh=32) in three layouts as standalone Pallas kernels:

  dense   : (96, 512) @ (512, 512)                       — 16x min FLOPs
  grouped : 4x (96, 128) @ (128, 128) 128-lane slices    —  4x min FLOPs
  perhead : 16x (96, 32) @ (32, 32) 32-lane slices       —  1x min FLOPs
            (the "(T, H, Dh) retiled" candidate — every slice is a
            sub-tile lane slice, so Mosaic pads each operand to the
            (8, 128) tile and the MXU runs nearly empty)

Method: each kernel chains ``n_iters`` applies through a data dependency
(y * 1e-9 + q0 — bounded values, not strength-reducible) inside one grid
step; per-iteration time is the SLOPE between two iteration counts, which
cancels dispatch/launch overhead (the remote-TPU tunnel RTT dwarfs one
apply).  Run on the real chip:

    python tools/dev/ctx_flop_tax.py
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

from raggesture_tpu.utils.env import setup_compilation_cache

setup_compilation_cache()

R, D, H = 96, 512, 16
Dh = D // H
G = 4  # 128-lane groups
S = D // G


def _kernel(q_ref, ctx_ref, o_ref, *, variant: str, n_iters: int):
    q0 = q_ref[:]

    def body(_, q):
        if variant == "dense":
            y = jnp.dot(q, ctx_ref[:], preferred_element_type=jnp.float32)
        elif variant == "grouped":
            y = jnp.concatenate(
                [jnp.dot(q[:, s * S:(s + 1) * S], ctx_ref[s],
                         preferred_element_type=jnp.float32)
                 for s in range(G)], axis=1)
        elif variant == "perhead":
            y = jnp.concatenate(
                [jnp.dot(q[:, h * Dh:(h + 1) * Dh], ctx_ref[h],
                         preferred_element_type=jnp.float32)
                 for h in range(H)], axis=1)
        else:
            raise ValueError(variant)
        return y * 1e-9 + q0

    o_ref[:] = jax.lax.fori_loop(0, n_iters, body, q0)


def build(variant: str, n_iters: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shapes = {"dense": (D, D), "grouped": (G, S, S), "perhead": (H, Dh, Dh)}
    ctx_shape = shapes[variant]
    fn = pl.pallas_call(
        functools.partial(_kernel, variant=variant, n_iters=n_iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
    )
    return jax.jit(fn), ctx_shape


def wall(fn, q, ctx, reps=7):
    # scalar fetch, NOT block_until_ready: on the axon plugin block returns
    # ~40us after dispatch while the kernel is still executing (bench.py
    # sync() docstring) — with it, every variant "measured" dispatch time
    # and the slopes came out negative
    def _sync(o):
        np.asarray(o[0, 0])
        return o

    _sync(fn(q, ctx))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(q, ctx))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    assert jax.default_backend() == "tpu", "run on the real chip"
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(R, D).astype(np.float32))
    # counts sized so device time dominates the ~ms tunnel dispatch: dense
    # at ~0.5 us/iter needs ~100k iters for a ~50 ms run — smaller counts
    # put the slope inside shared-host wall noise (observed: negative)
    n1, n2 = 20000, 100000
    min_flops = 2.0 * R * D * Dh  # per-head minimal apply FLOPs
    print(f"context-apply ({R}x{D}, H={H}, Dh={Dh}); per-iter times are "
          f"slopes between {n1} and {n2} chained iterations")
    rows = {}
    for variant in ("dense", "grouped", "perhead"):
        f1, ctx_shape = build(variant, n1)
        f2, _ = build(variant, n2)
        ctx = jnp.asarray(rng.randn(*ctx_shape).astype(np.float32) * 0.01)
        t1, t2 = wall(f1, q, ctx), wall(f2, q, ctx)
        per_iter = (t2 - t1) / (n2 - n1)
        executed = {"dense": 16, "grouped": 4, "perhead": 1}[variant]
        eff = executed * min_flops / per_iter
        rows[variant] = per_iter
        print(f"  {variant:8s}: {per_iter * 1e9:9.1f} ns/apply  "
              f"(executed {executed:2d}x min FLOPs, "
              f"{eff / 1e12:6.2f} TFLOP/s at executed size)")
    base = rows["dense"]
    for variant, t in rows.items():
        print(f"  {variant:8s}: {base / t:5.2f}x vs dense wall")


if __name__ == "__main__":
    main()
