"""Pallas TPU kernel: fused linear self-attention block.

Fuses the entire ``EfficientSelfAttention`` body (reference semantics at
/root/reference/mogen/models/attentions/efficient_attention.py:8-45 +
stylization_block.py:14-40) into ONE kernel per batch element:

    LayerNorm → q/k/v projections → feature-softmax(q) / time-softmax(k)
    → the two linear-attention contractions → adaLN stylization epilogue
    → residual add

XLA runs this as several fusions with HBM round-trips for q/k/v/y between
the matmuls; at the model's shapes (T=43→48 padded, D=512) every tensor
fits VMEM, so a single kernel does one HBM read of x and one write of out.

Two layout tricks keep the kernel reshape-free (Mosaic dislikes
(T, D) → (T, H, Dh) retiling):

  1. *Row-max segment softmax*: softmax over each head's 32-lane feature
     group equals ``exp(q - rowmax) / segsum`` because a per-row constant
     cancels within every segment.  The segment sum is one matmul with a
     block-diagonal ones matrix (built in-kernel from iota).
  2. *Block-diagonal context*: per-head ``ctx_h = k_hᵀ v_h`` stacks into the
     block-diagonal of the full ``kᵀv`` (D×D); masking the full product with
     the head-block mask and multiplying by q reproduces the per-head
     einsum pair exactly (head count never materializes as an axis).

The adaLN scale/shift (a function of the time embedding only) is
precomputed by the caller — one batched GEMM for all layers' inputs beats
re-doing the (2048 → 1024) projection inside every kernel instance.

The kernel matches the XLA path to ~1e-5 (float32); see
tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_MASK = -1_000_000.0

# trace-time ablation hook for the VPU/MXU budget harness
# (tools/dev/vpu_budget.py): "" = production; "no_transc" replaces every
# transcendental (exp/sigmoid/erf) in fused_decoder_layer with a linear
# stand-in; "mxu_only" additionally strips the LayerNorm/softmax
# normalization passes, leaving (approximately) just the GEMM chain.
# NOT semantics-preserving — measurement only; production code never sets
# it (same pattern as fused_denoiser.CTX_GROUPS_OVERRIDE).
ABLATE = [""]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _head_block_mask(D: int, Dh: int) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0) // Dh
    col = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1) // Dh
    return (row == col).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_self_attention(
    x: jnp.ndarray,          # (B, T, D)
    src_mask: jnp.ndarray,   # (B, T, 1)
    scale: jnp.ndarray,      # (B, D)  adaLN scale (fused_denoiser.adaln_table)
    shift: jnp.ndarray,      # (B, D)  adaLN shift
    params: dict,            # EfficientSelfAttention param subtree
    num_heads: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas path for EfficientSelfAttention — same math as the XLA path
    in raggesture_tpu/models/denoiser.py."""
    B, T, D = x.shape
    Tp = max(_round_up(T, 8), 8)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
        src_mask = jnp.pad(src_mask, ((0, 0), (0, Tp - T), (0, 0)))

    ln = params["norm"]
    q_, k_, v_ = params["query"], params["key"], params["value"]
    st = params["proj_out"]
    row = lambda a: jnp.asarray(a, jnp.float32).reshape(1, -1)

    def kernel(x_ref, mask_ref, scale_ref, shift_ref,
               ln_s, ln_b, wq, bq, wk, bk, wv, bv, sn_s, sn_b, wo, bo,
               out_ref):
        xb = x_ref[0]                      # (Tp, D)
        m = mask_ref[0]                    # (Tp, 1)
        Dh = D // num_heads

        mu = jnp.mean(xb, axis=-1, keepdims=True)
        var = jnp.mean((xb - mu) ** 2, axis=-1, keepdims=True)
        xn = (xb - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s[:] + ln_b[:]

        q = jnp.dot(xn, wq[:], preferred_element_type=jnp.float32) + bq[:]
        k = jnp.dot(xn, wk[:], preferred_element_type=jnp.float32) + bk[:]
        v = (jnp.dot(xn, wv[:], preferred_element_type=jnp.float32)
             + bv[:]) * m
        k = k + (1.0 - m) * NEG_MASK

        seg = _head_block_mask(D, Dh)
        # feature softmax within head groups via the row-max trick.  The
        # denominator clamp (here and in every kernel below) guards f32-exp
        # underflow of a head segment sitting ~88+ below the global row max:
        # the XLA twin's per-head softmax cannot 0/0 there, so the kernel
        # must not NaN either — the dead segment just contributes ~0.
        qe = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
        q_sm = qe / jnp.maximum(
            jnp.dot(qe, seg, preferred_element_type=jnp.float32), 1e-30)
        # time softmax per column
        ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
        k_sm = ke / jnp.sum(ke, axis=0, keepdims=True)

        ctx = jnp.dot(k_sm.T, v, preferred_element_type=jnp.float32) * seg
        y = jnp.dot(q_sm, ctx, preferred_element_type=jnp.float32)

        # stylization epilogue + residual
        ymu = jnp.mean(y, axis=-1, keepdims=True)
        yvar = jnp.mean((y - ymu) ** 2, axis=-1, keepdims=True)
        h = (y - ymu) * jax.lax.rsqrt(yvar + 1e-5) * sn_s[:] + sn_b[:]
        h = h * (1.0 + scale_ref[0]) + shift_ref[0]
        h = h * jax.nn.sigmoid(h)  # silu
        out = jnp.dot(h, wo[:], preferred_element_type=jnp.float32) + bo[:]
        out_ref[0] = xb + out

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tp, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
            out_specs=pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # 3 projections + 2 contractions + out projection, all (Tp,D,D)
            flops=B * 6 * 2 * Tp * D * D,
            bytes_accessed=B * 2 * Tp * D * 4 + 6 * D * D * 4,
            transcendentals=B * Tp * D * 3,
        ),
    )(
        x.astype(jnp.float32), src_mask.astype(jnp.float32),
        scale.astype(jnp.float32)[:, None, :],
        shift.astype(jnp.float32)[:, None, :],
        row(ln["scale"]), row(ln["bias"]),
        jnp.asarray(q_["kernel"], jnp.float32), row(q_["bias"]),
        jnp.asarray(k_["kernel"], jnp.float32), row(k_["bias"]),
        jnp.asarray(v_["kernel"], jnp.float32), row(v_["bias"]),
        row(st["norm"]["scale"]), row(st["norm"]["bias"]),
        jnp.asarray(st["out_proj"]["kernel"], jnp.float32),
        row(st["out_proj"]["bias"]),
    )
    return out[:, :T, :]


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_cross_attention(
    x: jnp.ndarray,          # (B, T, D)
    xf: jnp.ndarray,         # (B, N, D)   condition features (pre-projected)
    query_mask: jnp.ndarray, # (B, T, 1)   output-side separator mask
    cond_mask: jnp.ndarray,  # (B, 1, 1)   condition-dropout mask {0,1}
    scale: jnp.ndarray,      # (B, D)
    shift: jnp.ndarray,      # (B, D)
    params: dict,            # EfficientCrossAttention param subtree
    num_heads: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas twin of EfficientCrossAttention (denoiser.py) — same layout
    tricks as fused_self_attention; replicates the reference's output-side
    query-mask quirk (efficient_attention.py:93-98): masked (separator)
    query rows get -1e6 added to the attention readout before the
    stylization epilogue."""
    B, T, D = x.shape
    N = xf.shape[1]
    Tp = max(_round_up(T, 8), 8)
    Np = max(_round_up(N, 8), 8)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
        query_mask = jnp.pad(query_mask, ((0, 0), (0, Tp - T), (0, 0)))
    if Np != N:
        # padded condition rows are excluded by the time softmax below via
        # an explicit validity mask
        xf = jnp.pad(xf, ((0, 0), (0, Np - N), (0, 0)))
    n_valid = jnp.concatenate(
        [jnp.ones((B, N, 1)), jnp.zeros((B, Np - N, 1))], axis=1)

    ln = params["norm"]
    tn = params["text_norm"]
    q_, k_, v_ = params["query"], params["key"], params["value"]
    st = params["proj_out"]
    row = lambda a: jnp.asarray(a, jnp.float32).reshape(1, -1)

    def kernel(x_ref, xf_ref, qm_ref, cm_ref, nv_ref, scale_ref, shift_ref,
               ln_s, ln_b, tn_s, tn_b, wq, bq, wk, bk, wv, bv,
               sn_s, sn_b, wo, bo, out_ref):
        xb = x_ref[0]                      # (Tp, D)
        xfb = xf_ref[0]                    # (Np, D)
        qm = qm_ref[0]                     # (Tp, 1)
        cm = cm_ref[0]                     # (1, 1)
        nv = nv_ref[0]                     # (Np, 1)
        Dh = D // num_heads

        mu = jnp.mean(xb, axis=-1, keepdims=True)
        var = jnp.mean((xb - mu) ** 2, axis=-1, keepdims=True)
        xn = (xb - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s[:] + ln_b[:]
        fmu = jnp.mean(xfb, axis=-1, keepdims=True)
        fvar = jnp.mean((xfb - fmu) ** 2, axis=-1, keepdims=True)
        xfn = (xfb - fmu) * jax.lax.rsqrt(fvar + 1e-5) * tn_s[:] + tn_b[:]

        q = jnp.dot(xn, wq[:], preferred_element_type=jnp.float32) + bq[:]
        k = jnp.dot(xfn, wk[:], preferred_element_type=jnp.float32) + bk[:]
        # condition dropout: additive key mask + multiplicative value mask
        # BEFORE the value projection (the bias survives masking — quirk)
        k = k + (1.0 - cm) * NEG_MASK
        v = jnp.dot(xfn * cm, wv[:], preferred_element_type=jnp.float32) + bv[:]
        # padded condition rows: kill keys and values
        k = k + (1.0 - nv) * NEG_MASK
        v = v * nv

        seg = _head_block_mask(D, Dh)
        qe = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
        q_sm = qe / jnp.maximum(
            jnp.dot(qe, seg, preferred_element_type=jnp.float32), 1e-30)
        ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
        k_sm = ke / jnp.sum(ke, axis=0, keepdims=True)

        ctx = jnp.dot(k_sm.T, v, preferred_element_type=jnp.float32) * seg
        y = jnp.dot(q_sm, ctx, preferred_element_type=jnp.float32)
        y = y + (1.0 - qm) * NEG_MASK  # the output-side query-mask quirk

        ymu = jnp.mean(y, axis=-1, keepdims=True)
        yvar = jnp.mean((y - ymu) ** 2, axis=-1, keepdims=True)
        h = (y - ymu) * jax.lax.rsqrt(yvar + 1e-5) * sn_s[:] + sn_b[:]
        h = h * (1.0 + scale_ref[0]) + shift_ref[0]
        h = h * jax.nn.sigmoid(h)
        out = jnp.dot(h, wo[:], preferred_element_type=jnp.float32) + bo[:]
        out_ref[0] = xb + out

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Np, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tp, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Np, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
            out_specs=pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * 2 * (Tp * D * D + 2 * Np * D * D + Np * D * D
                           + Tp * D * D + Tp * D * D),
            bytes_accessed=B * (Tp + Np) * D * 4 * 2 + 7 * D * D * 4,
            transcendentals=B * (Tp + Np) * D * 2,
        ),
    )(
        x.astype(jnp.float32), xf.astype(jnp.float32),
        query_mask.astype(jnp.float32),
        cond_mask.astype(jnp.float32).reshape(B, 1, 1),
        n_valid.astype(jnp.float32),
        scale.astype(jnp.float32)[:, None, :],
        shift.astype(jnp.float32)[:, None, :],
        row(ln["scale"]), row(ln["bias"]), row(tn["scale"]), row(tn["bias"]),
        jnp.asarray(q_["kernel"], jnp.float32), row(q_["bias"]),
        jnp.asarray(k_["kernel"], jnp.float32), row(k_["bias"]),
        jnp.asarray(v_["kernel"], jnp.float32), row(v_["bias"]),
        row(st["norm"]["scale"]), row(st["norm"]["bias"]),
        jnp.asarray(st["out_proj"]["kernel"], jnp.float32),
        row(st["out_proj"]["bias"]),
    )
    return out[:, :T, :]


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_cross_attention_cached(
    x: jnp.ndarray,          # (B, T, D)
    ctx: jnp.ndarray,        # (B, D, D)   precomputed block-diag kᵀv context
    query_mask: jnp.ndarray, # (B, T, 1)
    scale: jnp.ndarray,      # (B, D)
    shift: jnp.ndarray,      # (B, D)
    params: dict,            # EfficientCrossAttention param subtree
    num_heads: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cross-attention with the condition context precomputed.

    In linear cross-attention the context ``ctx = softmax_time(k)ᵀ v`` is a
    function of the conditions ONLY — not of the latents or the timestep —
    so across a 50-step sampling scan it is loop-invariant.  The reference
    recomputes k/v every denoiser call (efficient_attention.py:48-102);
    here the caller computes ``ctx`` once (see
    fused_denoiser.cross_context) and each step reduces to
    q-projection → q @ ctx → stylization epilogue.
    """
    B, T, D = x.shape
    Tp = max(_round_up(T, 8), 8)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
        query_mask = jnp.pad(query_mask, ((0, 0), (0, Tp - T), (0, 0)))

    ln = params["norm"]
    q_ = params["query"]
    st = params["proj_out"]
    row = lambda a: jnp.asarray(a, jnp.float32).reshape(1, -1)

    def kernel(x_ref, ctx_ref, qm_ref, scale_ref, shift_ref,
               ln_s, ln_b, wq, bq, sn_s, sn_b, wo, bo, out_ref):
        xb = x_ref[0]
        qm = qm_ref[0]
        Dh = D // num_heads
        mu = jnp.mean(xb, axis=-1, keepdims=True)
        var = jnp.mean((xb - mu) ** 2, axis=-1, keepdims=True)
        xn = (xb - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s[:] + ln_b[:]
        q = jnp.dot(xn, wq[:], preferred_element_type=jnp.float32) + bq[:]
        seg = _head_block_mask(D, Dh)
        qe = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
        q_sm = qe / jnp.maximum(
            jnp.dot(qe, seg, preferred_element_type=jnp.float32), 1e-30)
        y = jnp.dot(q_sm, ctx_ref[0], preferred_element_type=jnp.float32)
        y = y + (1.0 - qm) * NEG_MASK
        ymu = jnp.mean(y, axis=-1, keepdims=True)
        yvar = jnp.mean((y - ymu) ** 2, axis=-1, keepdims=True)
        h = (y - ymu) * jax.lax.rsqrt(yvar + 1e-5) * sn_s[:] + sn_b[:]
        h = h * (1.0 + scale_ref[0]) + shift_ref[0]
        h = h * jax.nn.sigmoid(h)
        out = jnp.dot(h, wo[:], preferred_element_type=jnp.float32) + bo[:]
        out_ref[0] = xb + out

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tp, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * 2 * (2 * Tp * D * D + Tp * D * D),
            bytes_accessed=B * (2 * Tp * D + D * D) * 4 + 2 * D * D * 4,
            transcendentals=B * Tp * D * 2,
        ),
    )(
        x.astype(jnp.float32), ctx.astype(jnp.float32),
        query_mask.astype(jnp.float32),
        scale.astype(jnp.float32)[:, None, :],
        shift.astype(jnp.float32)[:, None, :],
        row(ln["scale"]), row(ln["bias"]),
        jnp.asarray(q_["kernel"], jnp.float32), row(q_["bias"]),
        row(st["norm"]["scale"]), row(st["norm"]["bias"]),
        jnp.asarray(st["out_proj"]["kernel"], jnp.float32),
        row(st["out_proj"]["bias"]),
    )
    return out[:, :T, :]


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_cross_block_cached(
    x: jnp.ndarray,           # (B, T, D)
    ctx3: jnp.ndarray,        # (B, 3, D, D) cached contexts (text/audio/spk)
    query_mask3: jnp.ndarray, # (B, T, 3)
    scale3: jnp.ndarray,      # (B, 3, D) adaLN scales (one per cond block)
    shift3: jnp.ndarray,      # (B, 3, D)
    ca_params: tuple,         # 3 EfficientCrossAttention param subtrees
    mix_params: dict,         # ca_mix Linear (3D -> D)
    num_heads: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """One kernel for a DecoderLayer's THREE cached-context cross-attentions
    plus the ca_mix projection (diffusion_transformer.py:105-121).

    The concat-then-mix ``[o_text; o_audio; o_spk] @ W_mix`` is computed as
    ``b_mix + Σ_i o_i @ W_mix[i·D:(i+1)·D]`` so the 3·D-wide concat never
    materializes.  Cuts the per-layer kernel count from 4 to 2 (sa + this),
    keeping every intermediate in VMEM.
    """
    B, T, D = x.shape
    Tp = max(_round_up(T, 8), 8)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
        query_mask3 = jnp.pad(query_mask3, ((0, 0), (0, Tp - T), (0, 0)))

    row = lambda a: jnp.asarray(a, jnp.float32).reshape(1, -1)
    flat_inputs = []
    for p in ca_params:
        flat_inputs += [
            row(p["norm"]["scale"]), row(p["norm"]["bias"]),
            jnp.asarray(p["query"]["kernel"], jnp.float32),
            row(p["query"]["bias"]),
            row(p["proj_out"]["norm"]["scale"]),
            row(p["proj_out"]["norm"]["bias"]),
            jnp.asarray(p["proj_out"]["out_proj"]["kernel"], jnp.float32),
            row(p["proj_out"]["out_proj"]["bias"]),
        ]
    wmix = jnp.asarray(mix_params["kernel"], jnp.float32)  # (3D, D)
    flat_inputs += [wmix[0 * D:1 * D], wmix[1 * D:2 * D], wmix[2 * D:3 * D],
                    row(mix_params["bias"])]

    def kernel(x_ref, ctx_ref, qm_ref, scale_ref, shift_ref, *refs):
        out_ref = refs[-1]
        prm = refs[:-1]
        xb = x_ref[0]
        Dh = D // num_heads
        seg = _head_block_mask(D, Dh)
        mu = jnp.mean(xb, axis=-1, keepdims=True)
        var = jnp.mean((xb - mu) ** 2, axis=-1, keepdims=True)
        xc = (xb - mu) * jax.lax.rsqrt(var + 1e-5)  # shared centered-norm

        acc = jnp.zeros((Tp, D), jnp.float32)
        for i in range(3):
            (ln_s, ln_b, wq, bq, sn_s, sn_b, wo, bo) = prm[8 * i: 8 * i + 8]
            xn = xc * ln_s[:] + ln_b[:]
            q = jnp.dot(xn, wq[:], preferred_element_type=jnp.float32) + bq[:]
            qe = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
            q_sm = qe / jnp.maximum(
                jnp.dot(qe, seg, preferred_element_type=jnp.float32), 1e-30)
            y = jnp.dot(q_sm, ctx_ref[0, i],
                        preferred_element_type=jnp.float32)
            y = y + (1.0 - qm_ref[0, :, i:i + 1]) * NEG_MASK
            ymu = jnp.mean(y, axis=-1, keepdims=True)
            yvar = jnp.mean((y - ymu) ** 2, axis=-1, keepdims=True)
            h = (y - ymu) * jax.lax.rsqrt(yvar + 1e-5) * sn_s[:] + sn_b[:]
            h = h * (1.0 + scale_ref[0, i][None, :]) + shift_ref[0, i][None, :]
            h = h * jax.nn.sigmoid(h)
            o_i = xb + jnp.dot(h, wo[:],
                               preferred_element_type=jnp.float32) + bo[:]
            wmix_i = prm[24 + i]
            acc = acc + jnp.dot(o_i, wmix_i[:],
                                preferred_element_type=jnp.float32)
        out_ref[0] = acc + prm[27][:]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, D, D), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tp, 3), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat_inputs),
            out_specs=pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * 3 * 2 * (4 * Tp * D * D),
            bytes_accessed=B * (2 * Tp * D + 3 * D * D) * 4 + 10 * D * D * 4,
            transcendentals=B * 3 * Tp * D * 2,
        ),
    )(
        x.astype(jnp.float32), ctx3.astype(jnp.float32),
        query_mask3.astype(jnp.float32),
        scale3.astype(jnp.float32), shift3.astype(jnp.float32),
        *flat_inputs,
    )
    return out[:, :T, :]


def _erf_poly(v):
    # Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7, f32-exact); Mosaic has no erf
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, pp = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(v)
    va = jnp.abs(v)
    t = 1.0 / (1.0 + pp * va)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-va * va))


def pack_decoder_layer(layer_params: dict,
                       bf16: bool = True,
                       fold_ln: bool = False) -> dict:
    """Pack one DecoderLayer's parameters into FIVE arrays for
    :func:`fused_decoder_layer`.

    54 separate kernel operands cost real per-step launch/copy overhead in
    the sampling scan; packing — pure parameter layout, done ONCE per
    StagedGenerator (NOT per clip: rebuilding these stacks inside the
    per-clip program cost ~0.7 ms/clip of concat/update-slice work) —
    gets each kernel call down to 11 operands.

    Layout:
      vecs (31, D) f32 — every D-width bias/LN vector:
        0-7   sa: ln_s, ln_b, bq, bk, bv, styl_ln_s, styl_ln_b, bo
        8-25  per CA i (6 each): ln_s, ln_b, bq, styl_ln_s, styl_ln_b, bo
        26    ca_mix bias
        27-30 ffn: b2, styl_ln_s, styl_ln_b, bo
      b1   (1, F) f32 — the one F-width bias (ffn linear1)
      mats (14, D, D) — 0-3 sa wq/wk/wv/wo, 4-9 CA (wq, wo)x3,
                        10-12 ca_mix thirds, 13 ffn stylization out
      w1 (D, F), w2 (F, D)

    The per-clip cross-attention contexts stay a separate
    fused_decoder_layer argument (they depend on the conditions).
    mats/w1/w2 are stored bf16 by default: Mosaic's default f32 matmul
    rounds MXU inputs to bf16 anyway (verified bit-identical on v5e), so
    this halves VMEM/bandwidth at zero numeric cost.

    ``fold_ln=True`` folds the pre-attention LayerNorm affines into the
    projection weights: ``(c*g + b) @ W == c @ (diag(g) W) + b @ W``, so
    the q/k/v (and each CA's q) projections consume the *centered*
    activations directly and the kernel skips 8 (R, D) VPU passes per
    layer (``fused_decoder_layer(..., ln_folded=True)`` must match).
    Measured 0.985x (slightly SLOWER) on batch-1 sampling
    (tools/dev/ln_fold_delta.py, 2026-08-21) — the removed VPU passes
    were hidden under MXU time — so the default stays False; the folded
    ln slots in ``vecs`` are written as identity (scale 1, shift 0) so
    an unfolded kernel still computes correctly against a folded pack.
    """
    cd = jnp.bfloat16 if bf16 else jnp.float32
    sa = layer_params["sa_block"]
    cas = [layer_params[f"ca_xf_{k}"] for k in ("text", "audio", "spk")]
    mix = layer_params["ca_mix"]
    ffn = layer_params["ffn"]
    D = jnp.asarray(sa["query"]["kernel"]).shape[0]

    def styl(p):
        return (p["proj_out"]["norm"]["scale"], p["proj_out"]["norm"]["bias"],
                p["proj_out"]["out_proj"]["kernel"],
                p["proj_out"]["out_proj"]["bias"])

    f32 = lambda a: jnp.asarray(a, jnp.float32)

    def fold(norm, kernels, biases):
        """Fold ln (g, b) into projections: W' = diag(g) W, b' = b@W + bias.
        Returns (identity ln vecs, folded kernels, folded biases)."""
        g, b = f32(norm["scale"]), f32(norm["bias"])
        ks = [g[:, None] * f32(w) for w in kernels]
        bs = [b @ f32(w) + f32(bias) for w, bias in zip(kernels, biases)]
        return ([jnp.ones_like(g), jnp.zeros_like(b)], ks, bs)

    sa_sn_s, sa_sn_b, sa_wo, sa_bo = styl(sa)
    sa_ks = [sa["query"]["kernel"], sa["key"]["kernel"], sa["value"]["kernel"]]
    sa_bs = [sa["query"]["bias"], sa["key"]["bias"], sa["value"]["bias"]]
    if fold_ln:
        sa_ln, sa_ks, sa_bs = fold(sa["norm"], sa_ks, sa_bs)
    else:
        sa_ln = [sa["norm"]["scale"], sa["norm"]["bias"]]
    vec_list = sa_ln + sa_bs + [sa_sn_s, sa_sn_b, sa_bo]
    mat_list = sa_ks + [sa_wo]
    for p_ca in cas:
        sn_s, sn_b, wo, bo = styl(p_ca)
        ca_ks, ca_bs = [p_ca["query"]["kernel"]], [p_ca["query"]["bias"]]
        if fold_ln:
            ca_ln, ca_ks, ca_bs = fold(p_ca["norm"], ca_ks, ca_bs)
        else:
            ca_ln = [p_ca["norm"]["scale"], p_ca["norm"]["bias"]]
        vec_list += ca_ln + ca_bs + [sn_s, sn_b, bo]
        mat_list += ca_ks + [wo]
    vec_list.append(mix["bias"])
    wmix = jnp.asarray(mix["kernel"])
    mat_list += [wmix[0 * D:1 * D], wmix[1 * D:2 * D], wmix[2 * D:3 * D]]
    ffn_sn_s, ffn_sn_b, ffn_wo, ffn_bo = styl(ffn)
    vec_list += [ffn["linear2"]["bias"], ffn_sn_s, ffn_sn_b, ffn_bo]
    mat_list.append(ffn_wo)
    return {
        "vecs": jnp.stack([jnp.asarray(v, jnp.float32) for v in vec_list]),
        "b1": jnp.asarray(ffn["linear1"]["bias"],
                          jnp.float32).reshape(1, -1),
        "mats": jnp.stack([jnp.asarray(m, cd) for m in mat_list]),
        "w1": jnp.asarray(ffn["linear1"]["kernel"], cd),
        "w2": jnp.asarray(ffn["linear2"]["kernel"], cd),
    }


@functools.partial(jax.jit, static_argnames=("num_heads", "ca_heads",
                                             "batch", "interpret",
                                             "ctx_groups", "ln_folded"))
def fused_decoder_layer(
    x: jnp.ndarray,           # (B*Tp, D) row-merged hidden states
    src_mask: jnp.ndarray,    # (B*Tp, 1)
    query_mask3: jnp.ndarray, # (B*Tp, 3)
    scale5: jnp.ndarray,      # (5, D) adaLN scales (sa, 3 CAs, ffn) —
    shift5: jnp.ndarray,      # (5, D) batch-uniform (precomputed adaLN table)
    ctx3: jnp.ndarray,        # (B, 3, D, D) cached cross-attn contexts
    packed: dict,             # pack_decoder_layer output (weights)
    num_heads: int = 16,
    ca_heads: int = 16,
    batch: int = 2,
    interpret: bool = False,
    ctx_groups: int = 0,      # 0 = auto (128-lane groups when legal),
                              # 1 = force dense (D, D) context GEMMs
    ln_folded: bool = False,  # pack used fold_ln: skip the pre-attention
                              # LN affines (pack_decoder_layer docstring;
                              # measured-neutral experiment, default off)
) -> jnp.ndarray:
    """ONE Pallas kernel for an entire DecoderLayer sampling step:

        self-attention -> 3 cached-context cross-attentions -> ca_mix -> FFN
        (each with its adaLN stylization epilogue + residual)

    vs the split path (1 sa kernel + 3 ca kernels + XLA mix/FFN fusions =
    ~8 dispatches and ~10 HBM round-trips of h per layer), everything stays
    in VMEM for the whole layer.  Two additional layout tricks on top of the
    fused_self_attention ones:

      * the batch dim folds into matmul ROWS ((B, Tp, D) -> (B*Tp, D)) so
        every projection runs at B*Tp=96 rows instead of two 48-row passes;
        the per-batch time softmax uses per-SEGMENT column maxes and sums
        (static row slices — a global max would be exact in real
        arithmetic but underflows a fully-masked segment to 0/0 NaN);
      * parameters arrive packed (pack_decoder_layer): 11 operands per
        call instead of 54, bf16 weight storage (numerically free — see
        pack_decoder_layer).

    Requires batch-uniform adaLN rows (every sampling loop shares t across
    the batch — see fused_denoiser.adaln_table).

    Scales to any batch at CONSTANT VMEM: the grid iterates over batch
    PAIRS — the packed weights use a constant index map (fetched once,
    VMEM-resident across grid steps) while activations and the (2,3,D,D)
    context slab stream per pair (~12.5 MB total, under the 16 MB/core
    VMEM budget regardless of B).
    """
    R, D = x.shape
    Tp = R // batch
    cd = packed["mats"].dtype
    # batch elements per grid step: pairs when possible, singles for odd B
    bpb = 2 if batch % 2 == 0 else 1
    grid = batch // bpb
    Rb = bpb * Tp

    # trace-time ablation (see ABLATE): production path when abl == ""
    abl = ABLATE[0]
    exp_ = jnp.exp if abl == "" else (lambda z: z * 1e-3)
    sig_ = jax.nn.sigmoid if abl == "" else (lambda z: z * 0.0 + 0.5)
    erf_ = _erf_poly if abl == "" else (lambda z: z * 0.5)
    norm_passes = abl != "mxu_only"

    def kernel(x_ref, m_ref, qm_ref, sc_ref, sh_ref,
               vecs, b1f, mats, w1, w2, ctx_ref, out_ref):
        V = lambda j: vecs[j:j + 1, :]
        M = lambda j: mats[j]

        def mm(a, b):
            return jnp.dot(a.astype(cd), b,
                           preferred_element_type=jnp.float32)

        def center(v):
            if not norm_passes:
                return v
            mu = jnp.mean(v, axis=-1, keepdims=True)
            var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
            return (v - mu) * jax.lax.rsqrt(var + 1e-5)

        def stylize(y, sn_s, sn_b, wo, bo, k):
            # styl-norm affine and adaLN affine combined into ONE (R, D)
            # pass: (c*s + b)*(1+sc) + sh == c*(s*(1+sc)) + (b*(1+sc)+sh),
            # with the combine itself on (1, D) vectors
            es = sn_s * (1.0 + sc_ref[k:k + 1, :])
            eb = sn_b * (1.0 + sc_ref[k:k + 1, :]) + sh_ref[k:k + 1, :]
            h = center(y) * es + eb
            h = h * sig_(h)
            return mm(h, wo) + bo

        xb = x_ref[:]                       # (R, D)
        m = m_ref[:]                        # (R, 1)
        Dh = D // num_heads
        seg = _head_block_mask(D, Dh)
        seg_ca = (seg if ca_heads == num_heads
                  else _head_block_mask(D, D // ca_heads))

        # every context-shaped GEMM here multiplies by a BLOCK-DIAGONAL
        # (D, D) operand (the head mask, the masked kᵀv context, or the
        # cached cross context) — executing it dense runs H=16x the
        # minimal per-head FLOPs.  When the head blocks tile into 128-lane
        # groups, the same math runs as NG diagonal (GS, GS) GEMMs at 4x
        # fewer FLOPs and measures 2.09x faster (tools/dev/ctx_flop_tax.py;
        # the fully per-head retiling is 0.63x — Mosaic pads sub-tile
        # operands to (8, 128) and starves the MXU).  Mathematically
        # identical to the dense path (the eliminated blocks are exact
        # zeros); numerically within accumulation-order ulps — a shorter
        # contraction splits the nonzero terms across the dot emitter's
        # accumulator lanes differently (measured <=5e-7 at f32).
        if ctx_groups > 1:        # forced group count (CPU tests)
            NG = ctx_groups
            GS = D // NG
        else:                     # auto: one group per 128-lane tile
            GS = 128
            NG = D // GS if D % GS == 0 else 1
        grouped = (ctx_groups != 1 and NG > 1 and D % NG == 0
                   and GS % Dh == 0 and GS % (D // ca_heads) == 0)
        gsl = lambda i: slice(i * GS, (i + 1) * GS)

        def diag_mm(a, bd):
            """a @ bd for block-diagonal bd, via NG diagonal blocks."""
            if not grouped:
                return mm(a, bd)
            return jnp.concatenate(
                [mm(a[:, gsl(i)], bd[gsl(i), gsl(i)]) for i in range(NG)],
                axis=1)

        # ---- self attention ----
        xn = center(xb) if ln_folded else center(xb) * V(0) + V(1)
        q = mm(xn, M(0)) + V(2)
        k = mm(xn, M(1)) + V(3) + (1.0 - m) * NEG_MASK
        v = (mm(xn, M(2)) + V(4)) * m
        qe = (exp_(q - jnp.max(q, axis=-1, keepdims=True)) if norm_passes
              else exp_(q))
        q_sm = (qe / jnp.maximum(diag_mm(qe, seg.astype(cd)), 1e-30)
                if norm_passes else qe)
        # per-batch time softmax via per-SEGMENT column maxes and sums
        # (static row slices, f32 VPU).  A global max would be exact in
        # real arithmetic but underflows a segment to 0/0 NaN when its
        # logits sit far below its pair partner's (e.g. a fully-padded
        # clip whose keys are all -1e6)
        per_seg = lambda red, v: jnp.concatenate(
            [jnp.broadcast_to(
                red(v[b * Tp:(b + 1) * Tp], axis=0, keepdims=True),
                (Tp, D)) for b in range(bpb)], axis=0)
        if norm_passes:
            ke = exp_(k - per_seg(jnp.max, k))
            k_sm = ke / per_seg(jnp.sum, ke)
        else:
            k_sm = exp_(k)
        ys = []
        for b in range(bpb):
            sl = slice(b * Tp, (b + 1) * Tp)
            if grouped:
                # build only the diagonal (GS, GS) context blocks — the
                # dense kᵀv entries outside them are zeroed by seg anyway
                yb = []
                for i in range(NG):
                    ctx_i = mm(k_sm[sl, gsl(i)].T,
                               v[sl, gsl(i)].astype(cd)) * seg[gsl(i), gsl(i)]
                    yb.append(mm(q_sm[sl, gsl(i)], ctx_i.astype(cd)))
                ys.append(jnp.concatenate(yb, axis=1))
            else:
                ctx = mm(k_sm[sl].T, v[sl].astype(cd)) * seg
                ys.append(mm(q_sm[sl], ctx.astype(cd)))
        y = jnp.concatenate(ys, axis=0)
        h1 = xb + stylize(y, V(5), V(6), M(3), V(7), 0)

        # ---- 3 cached-context cross attentions + ca_mix ----
        hc = center(h1)
        acc = None
        for i in range(3):
            base = 8 + 6 * i
            xn = hc if ln_folded else hc * V(base) + V(base + 1)
            q = mm(xn, M(4 + 2 * i)) + V(base + 2)
            qe = (exp_(q - jnp.max(q, axis=-1, keepdims=True))
                  if norm_passes else exp_(q))
            q_sm = (qe / jnp.maximum(diag_mm(qe, seg_ca.astype(cd)), 1e-30)
                    if norm_passes else qe)
            ys = []
            for b in range(bpb):
                sl = slice(b * Tp, (b + 1) * Tp)
                if grouped:
                    # cached contexts are stored dense but exactly
                    # block-diagonal (fused_denoiser.cross_context masks
                    # off-head blocks to 0): static diagonal slices apply
                    ctx_bi = ctx_ref[b, i]
                    ys.append(jnp.concatenate(
                        [mm(q_sm[sl, gsl(g)], ctx_bi[gsl(g), gsl(g)])
                         for g in range(NG)], axis=1))
                else:
                    ys.append(mm(q_sm[sl], ctx_ref[b, i]))
            y = jnp.concatenate(ys, axis=0)
            y = y + (1.0 - qm_ref[:, i:i + 1]) * NEG_MASK
            o_i = h1 + stylize(y, V(base + 3), V(base + 4), M(5 + 2 * i),
                               V(base + 5), 1 + i)
            term = mm(o_i, M(10 + i))
            acc = term if acc is None else acc + term
        h2 = acc + V(26)

        # ---- FFN ----
        y = mm(h2, w1[:]) + b1f[:]
        y = y * 0.5 * (1.0 + erf_(y * 0.7071067811865476))
        y = mm(y, w2[:]) + V(27)
        out_ref[:] = h2 + stylize(y, V(28), V(29), M(13), V(30), 4)

    F = packed["w1"].shape[1]
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if grid == 1:
        # single pair: plain full-VMEM blocks (no windowing machinery —
        # measured ~2 ms/scan cheaper than a 1-step grid at B=2)
        grid_spec = pl.GridSpec(in_specs=[full_spec] * 11,
                                out_specs=full_spec)
    else:
        rows_spec = lambda w: pl.BlockSpec((Rb, w), lambda g: (g, 0),
                                           memory_space=pltpu.VMEM)
        grid_spec = pl.GridSpec(
            grid=(grid,),
            in_specs=[
                rows_spec(D), rows_spec(1), rows_spec(3),
                full_spec, full_spec,                    # scale5 / shift5
                full_spec, full_spec, full_spec,         # vecs / b1 / mats
                full_spec, full_spec,                    # w1 / w2
                pl.BlockSpec((bpb, 3, D, D), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=rows_spec(D),
        )
    # resident packed weights (~9 MB) + double-buffered streamed blocks
    # exceed Mosaic's default 16 MB scoped-vmem limit at larger batches;
    # v5e has headroom above the default soft limit (single-pair calls fit
    # and keep the default — raising it perturbs Mosaic's scheduling)
    extra = {} if grid == 1 else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
        grid_spec=grid_spec,
        **extra,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # 12 (R,D,D) contractions + ffn (R,D,F)x2, + sa ctx/y per batch
            flops=2 * R * D * (12 * D + 2 * F) + 2 * batch * 2 * Tp * D * D,
            bytes_accessed=(2 * R * D * 4 + (14 * D * D + 2 * D * F
                            + batch * 3 * D * D) * packed["mats"].dtype.itemsize),
            transcendentals=R * (6 * D + 2 * F),
        ),
    )(
        x.astype(jnp.float32), src_mask.astype(jnp.float32),
        query_mask3.astype(jnp.float32),
        scale5.astype(jnp.float32), shift5.astype(jnp.float32),
        packed["vecs"], packed["b1"], packed["mats"],
        packed["w1"], packed["w2"], ctx3.astype(cd),
    )
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ffn(
    x: jnp.ndarray,          # (B, T, D)
    scale: jnp.ndarray,      # (B, D)
    shift: jnp.ndarray,      # (B, D)
    params: dict,            # FFN param subtree (linear1/linear2/proj_out)
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas twin of layers.FFN: linear1 → GELU → linear2 → adaLN
    stylization epilogue → residual, one kernel per batch element."""
    B, T, D = x.shape
    Tp = max(_round_up(T, 8), 8)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    l1, l2 = params["linear1"], params["linear2"]
    st = params["proj_out"]
    F = l1["kernel"].shape[1]
    row = lambda a: jnp.asarray(a, jnp.float32).reshape(1, -1)

    def kernel(x_ref, scale_ref, shift_ref, w1, b1, w2, b2,
               sn_s, sn_b, wo, bo, out_ref):
        xb = x_ref[0]
        y = jnp.dot(xb, w1[:], preferred_element_type=jnp.float32) + b1[:]
        # exact-GELU semantics, matching nn.gelu(approximate=False)
        y = y * 0.5 * (1.0 + _erf_poly(y * 0.7071067811865476))
        y = jnp.dot(y, w2[:], preferred_element_type=jnp.float32) + b2[:]
        ymu = jnp.mean(y, axis=-1, keepdims=True)
        yvar = jnp.mean((y - ymu) ** 2, axis=-1, keepdims=True)
        h = (y - ymu) * jax.lax.rsqrt(yvar + 1e-5) * sn_s[:] + sn_b[:]
        h = h * (1.0 + scale_ref[0]) + shift_ref[0]
        h = h * jax.nn.sigmoid(h)
        out = jnp.dot(h, wo[:], preferred_element_type=jnp.float32) + bo[:]
        out_ref[0] = xb + out

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * 2 * Tp * D * (2 * F + D),
            bytes_accessed=B * 2 * Tp * D * 4 + (2 * D * F + D * D) * 4,
            transcendentals=B * Tp * (F + D),
        ),
    )(
        x.astype(jnp.float32),
        scale.astype(jnp.float32)[:, None, :],
        shift.astype(jnp.float32)[:, None, :],
        jnp.asarray(l1["kernel"], jnp.float32), row(l1["bias"]),
        jnp.asarray(l2["kernel"], jnp.float32), row(l2["bias"]),
        row(st["norm"]["scale"]), row(st["norm"]["bias"]),
        jnp.asarray(st["out_proj"]["kernel"], jnp.float32),
        row(st["out_proj"]["bias"]),
    )
    return out[:, :T, :]
