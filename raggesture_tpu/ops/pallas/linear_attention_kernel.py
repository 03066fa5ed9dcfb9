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
    scale: jnp.ndarray,      # (B, D)  adaLN scale (see adaln_scale_shift)
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
        # feature softmax within head groups via the row-max trick
        qe = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
        q_sm = qe / jnp.dot(qe, seg, preferred_element_type=jnp.float32)
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


def adaln_scale_shift(emb: jnp.ndarray, styl_params: dict):
    """Precompute the stylization scale/shift from the time embedding
    (stylization_block.py:30-36): Linear(silu(emb)) → chunk2."""
    e = jax.nn.silu(emb)
    out = e @ jnp.asarray(styl_params["emb_layer"]["kernel"]) + jnp.asarray(
        styl_params["emb_layer"]["bias"])
    scale, shift = jnp.split(out, 2, axis=-1)
    return scale, shift
