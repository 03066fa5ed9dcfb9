"""Pallas TPU kernel: flash-style softmax multi-head attention for the
codec's many-small-head decoders.

The codec's ``all_encoder`` decoders run torch-``nn.MultiheadAttention``
softmax attention (reference /root/reference/mogen/models/utils/
detr_utils.py:335-393 via gesture_vae.py:111-239) with MANY TINY heads:
``num_heads * 8`` = 32 heads of Dh=16 for upper/hands/face and 64 heads of
Dh=8 for lowertrans.  Lowered through XLA, every decoder layer materializes
the (B, H, T, T) float32 logits tensor in HBM (314 MB at the stacked
batch-32 serving shape), then reads it back for the softmax reduction and
again for the apply einsum — a device trace shows those three
HBM-bandwidth-bound ops at ~2.1 ms/layer, ~30 ms of a 55 ms batch-32 codec
roundtrip (docs/PERFORMANCE.md).

This kernel keeps the whole per-(sample, head) attention in VMEM: one grid
step loads a sample's q/k/v rows once, loops the heads, and the (T, T)
logits never leave the core.  Layout rules that make it work:

  * **T on lanes, features on sublanes.**  A (…, T, Dh) array with Dh=16
    tiles to (8, 128) lanes → an 8× padded HBM footprint; transposed
    (D, T) blocks keep both HBM and VMEM dense.  The kernel transposes
    each (T, D) block ONCE in-core and slices heads on the sublane axis
    (Dh ∈ {8, 16, …} — any multiple of 8 — is sublane-aligned, never a
    lane-granularity relayout).
  * **Transposed logits.**  ``ltᵀ(s, t) = Σ_d k(d, s) q(d, t)`` contracts
    the sublane axis of both operands, so neither per-head slice needs a
    lane-dim reshape; the softmax then normalizes over sublanes (s = key
    position), and the apply ``out(d, t) = Σ_s v(d, s) w(s, t)`` is a
    standard MXU matmul.
  * Accumulation and softmax stay float32 (``preferred_element_type``);
    the MXU rounds matmul *inputs* to bf16 exactly as the XLA path does,
    so kernel-vs-XLA differences are reorder-level ulps (see
    tests/test_pallas_kernels.py tolerances).

Autodiff: the kernel carries a ``jax.custom_vjp`` whose backward
re-derives gradients through the reference XLA einsum path (attention is
recomputation-cheap at these shapes), so a dropout-free VAE training run
may safely route through it.  The shipped training config uses dropout and
falls back to the XLA path anyway (models/vae.py::TorchMHA gating).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Conservative per-grid-step VMEM budget: half of the 16 MB/core so the
# pipeline's double buffering and Mosaic scratch still fit.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def supported(q: jnp.ndarray, k: jnp.ndarray, num_heads: int) -> bool:
    """Shape eligibility: 3-D operands, sublane-aligned rows and heads,
    and a per-grid-step VMEM bound — one step holds the f32-transposed
    q/k/v blocks, the (D, Tq) output, and a few (Tk, Tq) f32 logits
    buffers, so an 8-aligned but LONG sequence (large n_frames decode)
    must route to the XLA path instead of failing Mosaic compilation.

    (The *backend* decision — compiled TPU path vs XLA — is the caller's;
    tests drive the kernel in interpreter mode on CPU.)"""
    if q.ndim != 3 or k.ndim != 3:
        return False
    _, Tq, D = q.shape
    Tk = k.shape[1]
    if D % num_heads:
        return False
    Dh = D // num_heads
    if not (Dh % 8 == 0 and Tq % 8 == 0 and Tk % 8 == 0 and Tk >= 8):
        return False
    f32 = 4
    vmem = (
        (Tq * D + 2 * Tk * D) * q.dtype.itemsize  # staged input blocks
        + (Tq * D + 2 * Tk * D) * f32             # in-core f32 transposes
        + D * Tq * f32                            # output block
        + 3 * Tk * Tq * f32                       # ltT / exp / weights
    )
    return vmem <= _VMEM_BUDGET_BYTES


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, scale: float):
    qT = q_ref[0].T.astype(jnp.float32) * scale   # (D, Tq)
    kT = k_ref[0].T.astype(jnp.float32)           # (D, Tk)
    vT = v_ref[0].T.astype(jnp.float32)           # (D, Tk)
    D = qT.shape[0]
    Dh = D // num_heads
    contract_rows = (((0,), (0,)), ((), ()))      # Σ over the sublane axis
    for h in range(num_heads):
        a, b = h * Dh, (h + 1) * Dh
        ltT = jax.lax.dot_general(                # (Tk, Tq)
            kT[a:b], qT[a:b], contract_rows,
            preferred_element_type=jnp.float32)
        m = jnp.max(ltT, axis=0, keepdims=True)
        e = jnp.exp(ltT - m)
        w = e / jnp.sum(e, axis=0, keepdims=True)
        o_ref[0, a:b, :] = jnp.dot(               # (Dh, Tk) @ (Tk, Tq)
            vT[a:b], w, preferred_element_type=jnp.float32)


def _mha_pallas(q, k, v, num_heads: int, scale: float, interpret: bool):
    B, Tq, D = q.shape
    Tk = k.shape[1]
    outT = pl.pallas_call(
        functools.partial(_mha_kernel, num_heads=num_heads, scale=scale),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Tq, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tk, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tk, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, D, Tq), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, Tq), jnp.float32),
        interpret=interpret,
    )(q, k, v)
    return outT.transpose(0, 2, 1)                # (B, Tq, D)


def xla_mha(q, k, v, num_heads: int, scale: float):
    """Reference einsum path (same math as models/vae.py::TorchMHA core);
    used off-TPU, for parity tests, and as the kernel's backward."""
    B, Tq, D = q.shape
    Tk = k.shape[1]
    Dh = D // num_heads
    qh = q.reshape(B, Tq, num_heads, Dh)
    kh = k.reshape(B, Tk, num_heads, Dh)
    vh = v.reshape(B, Tk, num_heads, Dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(B, Tq, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_softmax_mha(q, k, v, num_heads: int, scale: float,
                      interpret: bool = False):
    """softmax((q kᵀ) · scale) v per head, logits VMEM-resident.

    q: (B, Tq, D); k, v: (B, Tk, D) — post-projection, unmasked, no
    dropout.  Returns (B, Tq, D) float32.  Check :func:`supported` first;
    composes with ``vmap`` (the batch axis joins the kernel grid)."""
    return _mha_pallas(q, k, v, num_heads, scale, interpret)


def _fwd(q, k, v, num_heads, scale, interpret):
    return _mha_pallas(q, k, v, num_heads, scale, interpret), (q, k, v)


def _bwd(num_heads, scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: xla_mha(a, b, c, num_heads, scale),
                     q, k, v)
    return vjp(g.astype(jnp.float32))


fused_softmax_mha.defvjp(_fwd, _bwd)
