"""VPU/MXU budget of the serving layer kernel (VERDICT r4 #4).

PERFORMANCE.md attributes the b32 serving headroom (device MFU 0.43) to
"VPU/MXU overlap" without counting it.  This harness measures the budget
directly: the whole fused_decoder_layer is timed in isolation at the b32
serving shapes under trace-time ablations
(ops/pallas/linear_attention_kernel.py::ABLATE):

  full       — production kernel
  no_transc  — exp/sigmoid/erf replaced by linear stand-ins (same GEMMs,
               same normalization passes, no transcendental units)
  mxu_only   — additionally strips LayerNorm/softmax normalization
               passes: (approximately) the bare GEMM chain

VPU-exposed time = full - mxu_only; the transcendental share =
full - no_transc.  The MFU ceiling at perfect VPU/MXU overlap is
flops / t(mxu_only).  Ablated kernels are NOT semantics-preserving —
timing only.  Alongside, an analytic op census (elementwise passes /
transcendental elements / GEMM FLOPs per layer) is printed so the
measured split can be sanity-checked against per-unit throughput.

Reference ops this kernel fuses:
/root/reference/mogen/models/attentions/efficient_attention.py:33-39 +
stylization_block.py:14-40.

Usage: python tools/dev/vpu_budget.py [B] [ITERS]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from raggesture_tpu.utils.env import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp

import raggesture_tpu.ops.pallas.linear_attention_kernel as lk

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
T, D, F, H = 43, 512, 1024, 16
Tp = -(-T // 8) * 8
R = B * Tp


def sync(x):
    np.asarray(x[(0,) * x.ndim])
    return x


def rand_packed(key):
    ks = jax.random.split(key, 5)
    s = 0.02
    return {
        "vecs": jax.random.normal(ks[0], (31, D), jnp.float32) * s,
        "b1": jax.random.normal(ks[1], (1, F), jnp.float32) * s,
        "mats": (jax.random.normal(ks[2], (14, D, D), jnp.float32)
                 * s).astype(jnp.bfloat16),
        "w1": (jax.random.normal(ks[3], (D, F), jnp.float32)
               * s).astype(jnp.bfloat16),
        "w2": (jax.random.normal(ks[4], (F, D), jnp.float32)
               * s).astype(jnp.bfloat16),
    }


def census():
    """Analytic per-grid-step (batch pair, Rb=2*Tp rows) op counts."""
    Rb = 2 * Tp
    GS, NG = 128, D // 128
    gemm = 0.0
    # sa q/k/v/wo + 3CA (q, wo) + mix(3) + ffn styl-out: (Rb, D) @ (D, D)
    gemm += (4 + 6 + 3 + 1) * 2 * Rb * D * D
    # ffn w1/w2
    gemm += 2 * Rb * D * F * 2
    # 4 segment-softmax denominators: grouped diag (Rb, GS)@(GS, GS) x NG
    gemm += 4 * 2 * Rb * GS * D
    # sa ctx build+apply grouped, per batch elem
    gemm += 2 * (2 * Tp * GS * D * 2)      # build (GSxTp @ TpxGS)*NG + apply
    # 3 CA cached-ctx applies grouped
    gemm += 2 * 3 * (2 * Tp * GS * D // 2) * 2  # (Tp,GS)@(GS,GS) x NG x b
    # elementwise (R, D)-shaped passes: LN centers (2: sa-in shared, h1),
    # 5 stylize (center+affine+silu ~3 passes each), masks/residuals ~6,
    # softmax sub/div ~8
    ew_passes = 2 * 3 + 5 * 3 + 6 + 8
    ew_elems = ew_passes * Rb * D
    transc = Rb * (4 * D + D + 5 * D + 2 * F)  # 4 q-exp, k-exp, 5 sigmoid, erf(2F~)
    return gemm, ew_elems, transc


def main():
    key = jax.random.PRNGKey(0)
    packed = rand_packed(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (R, D), jnp.float32)
    m_rows = jnp.ones((R, 1), jnp.float32)
    qm_rows = jnp.ones((R, 3), jnp.float32)
    scale5 = jax.random.normal(jax.random.fold_in(key, 2), (5, D)) * 0.1
    shift5 = jax.random.normal(jax.random.fold_in(key, 3), (5, D)) * 0.1
    # block-diagonal contexts like cross_context produces
    blk = jax.random.normal(jax.random.fold_in(key, 4), (B, 3, 4, 128, 128))
    eye = jnp.eye(4)
    ctx3 = ((blk[..., None, :] * eye[None, None, :, None, :, None])
            .reshape(B, 3, D, D) * 0.05).astype(jnp.bfloat16)

    gemm, ew, transc = census()
    grid = B // 2
    print(f"analytic per layer (B={B}, grid {grid} pairs): "
          f"{grid * gemm / 1e9:.2f} GFLOP MXU, "
          f"{grid * ew / 1e6:.1f}M elementwise elems, "
          f"{grid * transc / 1e6:.1f}M transcendental elems")

    # build one fresh jit per variant (ABLATE is read at trace time, and
    # each jax.jit(closure) instance caches independently), compile all
    # three, THEN time them INTERLEAVED — on this shared chip two
    # sequentially-measured variants sit in different load regimes and
    # their delta measures load, not code (docs/PERFORMANCE.md).
    loops = {}
    for abl in ("", "no_transc", "mxu_only"):
        lk.ABLATE[0] = abl

        def one_layer(h, _abl=abl):
            return lk.fused_decoder_layer.__wrapped__(
                h, m_rows, qm_rows, scale5, shift5, ctx3, packed,
                num_heads=H, ca_heads=H, batch=B)

        loop = jax.jit(lambda h, f=one_layer: jax.lax.fori_loop(
            0, ITERS, lambda i, hh: f(hh), h))
        sync(loop(x))  # compile (ABLATE bakes in here)
        loops[abl or "full"] = loop
    lk.ABLATE[0] = ""

    results = {k: float("inf") for k in loops}
    for _trial in range(6):
        for name, loop in loops.items():
            t0 = time.perf_counter()
            sync(loop(x))
            results[name] = min(results[name],
                                (time.perf_counter() - t0) / ITERS)
    fl = grid * gemm
    from raggesture_tpu.utils.profiling import traced_device_time_ms
    dev = {}
    for name, loop in loops.items():
        d = traced_device_time_ms(lambda: sync(loop(x)), iters=2)
        dev[name] = (d["busy_ms"] / ITERS * 1e3 if d else None)  # us/layer
    for name, best in results.items():
        dv = dev.get(name)
        dcol = (f"   device {dv:7.1f} us ({fl / (dv / 1e6) / 1e12:5.1f} TF/s)"
                if dv else "")
        print(f"{name:<10} {best * 1e6:9.1f} us/layer   "
              f"{fl / best / 1e12:6.1f} TFLOP/s executed{dcol}", flush=True)
    if all(dev.get(k) for k in ("full", "mxu_only", "no_transc")):
        f_, m_, n_ = dev["full"], dev["mxu_only"], dev["no_transc"]
        print(f"device-time VPU-exposed: {f_ - m_:.1f} us/layer "
              f"({100 * (f_ - m_) / f_:.0f}%), transcendental "
              f"{f_ - n_:.1f} us; overlap-bound ceiling "
              f"{fl / (m_ / 1e6) / 197e12:.3f}, full executed "
              f"{fl / (f_ / 1e6) / 197e12:.3f}")

    full, nt, mx = (results.get("full"), results.get("no_transc"),
                    results.get("mxu_only"))
    if full and mx:
        print(f"\nVPU-exposed: {1e6 * (full - mx):.1f} us/layer "
              f"({100 * (full - mx) / full:.0f}% of full)")
        print(f"transcendental share: {1e6 * (full - nt):.1f} us/layer")
        fl = grid * gemm
        print(f"overlap-bound MFU ceiling (flops / t_mxu_only / 197T): "
              f"{fl / mx / 197e12:.3f}")
        print(f"full-kernel executed MFU: {fl / full / 197e12:.3f}")


if __name__ == "__main__":
    main()
