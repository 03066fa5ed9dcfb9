"""Fused all-layer cross-attention context kernels for the TRAINING step.

The training forward runs, per decoder layer l and condition stream c
(text/audio/spk), the reference chain (efficient_attention.py:48-102):

    xn_l = LayerNorm_l(xf)          # per-layer affine, SHARED input xf
    k_l  = xn_l @ Wk_l + bk_l  (+ condition-dropout / padding key masks)
    v_l  = (xn_l * cm) @ Wv_l + bv_l
    ksm  = softmax_time(k_l)
    ctx  = ksm^T v_l                # block-diagonal over heads

XLA executes this as per-layer fusions that read and write the full
(B, N, D) condition activations in HBM several times per layer — at the
flagship train shapes (B=128, N=499 audio frames) the round-4 trace
decomposition (docs/TRAIN_DECOMP.json) attributes ~60 of the 76 ms
latent-cache device step to exactly these chains (fwd+bwd).

The kernels here compute ALL L layers' contexts in ONE pass over xf per
condition stream: one HBM read of xf per batch element, weights
VMEM-resident across the batch grid, and only the small grouped
(L, G, S, S) context blocks ever leave the kernel.  The backward is
analytic (softmax/LN vjp in-kernel, recompute instead of residuals) and
split into two kernels so weight-gradient accumulation runs over
consecutive grid steps (Mosaic's output-revisiting rule):

    bwd A — grid (B,):  dxf (+ per-batch partials of d ln scale/bias)
    bwd B — grid (L,B): dWk/dbk/dWv/dbv accumulated in the output block

``cond_contexts`` wires them behind ``jax.custom_vjp``; off-TPU the pure
jnp reference (same math, differentiable by AD) runs instead, and tests
force the kernels through interpret mode and grad-check them against it.

Consumers apply the contexts with the existing cached-context math
(fused_denoiser.cross_attention_cached_* — q_sm @ ctx per 128-lane
group), which tests already hold bit-close to the flax denoiser.
Reference semantics matched: /root/reference/mogen/models/attentions/
efficient_attention.py:48-102 (masked-value bias quirk included).
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


def _group_mask(S: int, Dh: int) -> jnp.ndarray:
    """(S, S) per-head block-diagonal mask within one 128-lane group."""
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) // Dh
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1) // Dh
    return (row == col).astype(jnp.float32)


def group_shape(D: int, num_heads: int):
    """(G, S): 128-lane groups when the head blocks tile into them,
    else one dense group (S = D) — mirrors ops/linear_attention.group_size."""
    Dh = D // num_heads
    if D % 128 == 0 and 128 % Dh == 0:
        return D // 128, 128
    return 1, D


# ---------------------------------------------------------------------------
# pure jnp reference (differentiable; the off-TPU path and the test oracle)
# ---------------------------------------------------------------------------

def cond_ctx_reference(xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv,
                       num_heads: int):
    """Grouped contexts for all layers, in plain jnp.

    xf: (B, Np, D) condition features (already pre-projected to width D);
    cm: (B, 1, 1) condition-dropout mask in {0,1}; nv: (B, Np, 1) row
    validity (0 on padding); ln_g/ln_b: (L, D); wk/wv: (L, D, D);
    bk/bv: (L, D).  Returns (B, L, G, S, S) f32.
    """
    B, Np, D = xf.shape
    L = wk.shape[0]
    G, S = group_shape(D, num_heads)
    Dh = D // num_heads
    maskS = _group_mask(S, Dh)
    xf = xf.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    c = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    outs = []
    for l in range(L):
        xn = c * ln_g[l] + ln_b[l]
        k = xn @ wk[l].astype(xn.dtype) + bk[l]
        k = k + (1.0 - cm) * NEG_MASK + (1.0 - nv) * NEG_MASK
        v = (xn * cm) @ wv[l].astype(xn.dtype) + bv[l]
        v = v * nv
        ksm = jax.nn.softmax(k, axis=1)
        ctx_l = []
        for g in range(G):
            sl = slice(g * S, (g + 1) * S)
            ctx_l.append(jnp.einsum("bnd,bne->bde", ksm[..., sl],
                                    v[..., sl]) * maskS)
        outs.append(jnp.stack(ctx_l, axis=1))        # (B, G, S, S)
    return jnp.stack(outs, axis=1)                   # (B, L, G, S, S)


# ---------------------------------------------------------------------------
# shared in-kernel recompute (fwd chain up to ksm / v for one layer)
# ---------------------------------------------------------------------------

def _layer_kv(c, cm, nv_col, ln_g_l, ln_b_l, wk_l, bk_l, wv_l, bv_l):
    """xn, vin, k-softmax pieces for one layer from the centered input."""
    xn = c * ln_g_l + ln_b_l
    k = jnp.dot(xn.astype(wk_l.dtype), wk_l,
                preferred_element_type=jnp.float32) + bk_l
    k = k + (1.0 - cm) * NEG_MASK + (1.0 - nv_col) * NEG_MASK
    vin = xn * cm
    v = (jnp.dot(vin.astype(wv_l.dtype), wv_l,
                 preferred_element_type=jnp.float32) + bv_l) * nv_col
    e = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
    ksm = e / jnp.sum(e, axis=0, keepdims=True)
    return xn, vin, v, ksm


def _dk_dv(ksm, v, dctx_l, G, S, maskS):
    """dk, dv from the grouped context cotangent (softmax vjp included)."""
    parts_dksm, parts_dv = [], []
    for g in range(G):
        sl = slice(g * S, (g + 1) * S)
        dctx_m = dctx_l[g] * maskS
        parts_dksm.append(jnp.dot(v[:, sl], dctx_m.T,
                                  preferred_element_type=jnp.float32))
        parts_dv.append(jnp.dot(ksm[:, sl], dctx_m,
                                preferred_element_type=jnp.float32))
    dksm = jnp.concatenate(parts_dksm, axis=1)
    dv = jnp.concatenate(parts_dv, axis=1)
    # column softmax vjp: dk = ksm * (dksm - sum_n(dksm * ksm))
    dk = ksm * (dksm - jnp.sum(dksm * ksm, axis=0, keepdims=True))
    return dk, dv


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(num_heads, L, G, S, xf_ref, cm_ref, nv_ref,
                g_ref, b_ref, wk_ref, bk_ref, wv_ref, bv_ref, out_ref):
    D = xf_ref.shape[-1]
    Dh = D // num_heads
    maskS = _group_mask(S, Dh)
    xfb = xf_ref[0].astype(jnp.float32)
    cm = cm_ref[0]
    nv = nv_ref[0]
    mu = jnp.mean(xfb, axis=-1, keepdims=True)
    var = jnp.mean((xfb - mu) ** 2, axis=-1, keepdims=True)
    c = (xfb - mu) * jax.lax.rsqrt(var + 1e-5)
    for l in range(L):
        _, _, v, ksm = _layer_kv(c, cm, nv, g_ref[l:l + 1, :],
                                 b_ref[l:l + 1, :], wk_ref[l],
                                 bk_ref[l:l + 1, :], wv_ref[l],
                                 bv_ref[l:l + 1, :])
        for g in range(G):
            sl = slice(g * S, (g + 1) * S)
            out_ref[0, l, g] = jnp.dot(
                ksm[:, sl].T, v[:, sl],
                preferred_element_type=jnp.float32) * maskS


def _bwd_a_kernel(num_heads, L, G, S, xf_ref, cm_ref, nv_ref,
                  g_ref, b_ref, wk_ref, bk_ref, wv_ref, bv_ref, dctx_ref,
                  dxf_ref, dgb_ref):
    """dxf + per-batch partials of (d ln_g, d ln_b).  Grid (B,)."""
    D = xf_ref.shape[-1]
    Dh = D // num_heads
    maskS = _group_mask(S, Dh)
    xfb = xf_ref[0].astype(jnp.float32)
    cm = cm_ref[0]
    nv = nv_ref[0]
    mu = jnp.mean(xfb, axis=-1, keepdims=True)
    var = jnp.mean((xfb - mu) ** 2, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + 1e-5)
    c = (xfb - mu) * r
    dc = jnp.zeros_like(c)
    for l in range(L):
        gl = g_ref[l:l + 1, :]
        _, _, v, ksm = _layer_kv(c, cm, nv, gl, b_ref[l:l + 1, :],
                                 wk_ref[l], bk_ref[l:l + 1, :], wv_ref[l],
                                 bv_ref[l:l + 1, :])
        dk, dv = _dk_dv(ksm, v, dctx_ref[0, l], G, S, maskS)
        dv = dv * nv
        dxn = (jnp.dot(dk.astype(wk_ref.dtype), wk_ref[l].T,
                       preferred_element_type=jnp.float32)
               + jnp.dot(dv.astype(wv_ref.dtype), wv_ref[l].T,
                         preferred_element_type=jnp.float32) * cm)
        dgb_ref[0, l, 0] = jnp.sum(dxn * c, axis=0)
        dgb_ref[0, l, 1] = jnp.sum(dxn, axis=0)
        dc = dc + dxn * gl
    # LayerNorm center backward: y = (x - mu) * r
    dxf_ref[0] = (r * (dc - jnp.mean(dc, axis=-1, keepdims=True)
                       - c * jnp.mean(dc * c, axis=-1, keepdims=True))
                  ).astype(dxf_ref.dtype)


def _bwd_b_kernel(num_heads, G, S, B, xf_ref, cm_ref, nv_ref,
                  g_ref, b_ref, wk_ref, bk_ref, wv_ref, bv_ref, dctx_ref,
                  dwk_ref, dbk_ref, dwv_ref, dbv_ref):
    """Weight/bias grads, accumulated over the inner batch grid axis.
    Grid (L, B): the l-indexed output blocks are revisited over the
    CONSECUTIVE inner b steps (Mosaic's reduction pattern)."""
    D = xf_ref.shape[-1]
    Dh = D // num_heads
    maskS = _group_mask(S, Dh)
    b_step = pl.program_id(1)
    xfb = xf_ref[0].astype(jnp.float32)
    cm = cm_ref[0]
    nv = nv_ref[0]
    mu = jnp.mean(xfb, axis=-1, keepdims=True)
    var = jnp.mean((xfb - mu) ** 2, axis=-1, keepdims=True)
    c = (xfb - mu) * jax.lax.rsqrt(var + 1e-5)
    xn, vin, v, ksm = _layer_kv(c, cm, nv, g_ref[0], b_ref[0],
                                wk_ref[0], bk_ref[0], wv_ref[0],
                                bv_ref[0])
    dk, dv = _dk_dv(ksm, v, dctx_ref[0, 0], G, S, maskS)
    dv = dv * nv

    @pl.when(b_step == 0)
    def _init():
        dwk_ref[0] = jnp.zeros_like(dwk_ref[0])
        dbk_ref[0] = jnp.zeros_like(dbk_ref[0])
        dwv_ref[0] = jnp.zeros_like(dwv_ref[0])
        dbv_ref[0] = jnp.zeros_like(dbv_ref[0])

    dwk_ref[0] += jnp.dot(xn.astype(dk.dtype).T, dk,
                          preferred_element_type=jnp.float32)
    dbk_ref[0] += jnp.sum(dk, axis=0, keepdims=True)
    dwv_ref[0] += jnp.dot(vin.astype(dv.dtype).T, dv,
                          preferred_element_type=jnp.float32)
    dbv_ref[0] += jnp.sum(dv, axis=0, keepdims=True)


_VMEM = dict(memory_space=pltpu.VMEM)
_LIMIT = dict(compiler_params=pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024))


def _fwd_call(xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv, num_heads,
              interpret):
    B, Np, D = xf.shape
    L = wk.shape[0]
    G, S = group_shape(D, num_heads)
    kern = functools.partial(_fwd_kernel, num_heads, L, G, S)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, L, G, S, S), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Np, D), lambda b: (b, 0, 0), **_VMEM),
                pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), **_VMEM),
                pl.BlockSpec((1, Np, 1), lambda b: (b, 0, 0), **_VMEM),
            ] + [pl.BlockSpec(**_VMEM)] * 6,
            out_specs=pl.BlockSpec((1, L, G, S, S),
                                   lambda b: (b, 0, 0, 0, 0), **_VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * L * 2 * Np * D * (2 * D + S),
            bytes_accessed=B * Np * D * xf.dtype.itemsize
            + 2 * L * D * D * wk.dtype.itemsize
            + B * L * G * S * S * 4,
            transcendentals=B * L * Np * D,
        ),
        **_LIMIT,
    )(xf, cm.reshape(B, 1, 1), nv, ln_g, ln_b, wk, bk, wv, bv)


def _bwd_call(xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv, dctx, num_heads,
              interpret):
    B, Np, D = xf.shape
    L = wk.shape[0]
    G, S = group_shape(D, num_heads)
    cm3 = cm.reshape(B, 1, 1)
    ka = functools.partial(_bwd_a_kernel, num_heads, L, G, S)
    dxf, dgb = pl.pallas_call(
        ka,
        out_shape=(jax.ShapeDtypeStruct((B, Np, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, L, 2, D), jnp.float32)),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Np, D), lambda b: (b, 0, 0), **_VMEM),
                pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), **_VMEM),
                pl.BlockSpec((1, Np, 1), lambda b: (b, 0, 0), **_VMEM),
            ] + [pl.BlockSpec(**_VMEM)] * 6 + [
                pl.BlockSpec((1, L, G, S, S),
                             lambda b: (b, 0, 0, 0, 0), **_VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, Np, D), lambda b: (b, 0, 0), **_VMEM),
                pl.BlockSpec((1, L, 2, D), lambda b: (b, 0, 0, 0),
                             **_VMEM),
            ),
        ),
        interpret=interpret,
        **_LIMIT,
    )(xf, cm3, nv, ln_g, ln_b, wk, bk, wv, bv, dctx)

    kb = functools.partial(_bwd_b_kernel, num_heads, G, S, B)
    # Mosaic requires the 2nd-to-last block dim to divide 8 or equal the
    # array dim — (L, D) vectors get a singleton row axis so the per-layer
    # block is (1, 1, D)
    v3 = lambda a: a.reshape(L, 1, D)
    vec_spec = pl.BlockSpec((1, 1, D), lambda l, b: (l, 0, 0), **_VMEM)
    dwk, dbk, dwv, dbv = pl.pallas_call(
        kb,
        out_shape=(jax.ShapeDtypeStruct((L, D, D), jnp.float32),
                   jax.ShapeDtypeStruct((L, 1, D), jnp.float32),
                   jax.ShapeDtypeStruct((L, D, D), jnp.float32),
                   jax.ShapeDtypeStruct((L, 1, D), jnp.float32)),
        grid_spec=pl.GridSpec(
            grid=(L, B),
            in_specs=[
                pl.BlockSpec((1, Np, D), lambda l, b: (b, 0, 0), **_VMEM),
                pl.BlockSpec((1, 1, 1), lambda l, b: (b, 0, 0), **_VMEM),
                pl.BlockSpec((1, Np, 1), lambda l, b: (b, 0, 0), **_VMEM),
                vec_spec,
                vec_spec,
                pl.BlockSpec((1, D, D), lambda l, b: (l, 0, 0), **_VMEM),
                vec_spec,
                pl.BlockSpec((1, D, D), lambda l, b: (l, 0, 0), **_VMEM),
                vec_spec,
                pl.BlockSpec((1, 1, G, S, S),
                             lambda l, b: (b, l, 0, 0, 0), **_VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, D, D), lambda l, b: (l, 0, 0), **_VMEM),
                pl.BlockSpec((1, 1, D), lambda l, b: (l, 0, 0), **_VMEM),
                pl.BlockSpec((1, D, D), lambda l, b: (l, 0, 0), **_VMEM),
                pl.BlockSpec((1, 1, D), lambda l, b: (l, 0, 0), **_VMEM),
            ),
        ),
        interpret=interpret,
        **_LIMIT,
    )(xf, cm3, nv, v3(ln_g), v3(ln_b), wk, v3(bk), wv, v3(bv), dctx)
    dbk = dbk.reshape(L, D)
    dbv = dbv.reshape(L, D)

    dg = jnp.sum(dgb[:, :, 0, :], axis=0)
    db = jnp.sum(dgb[:, :, 1, :], axis=0)
    return dxf, dg, db, dwk, dbk, dwv, dbv


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _cond_ctx_kernel(xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv,
                     num_heads, interpret):
    return _fwd_call(xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv, num_heads,
                     interpret)


def _ctx_fwd(xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv, num_heads, interpret):
    out = _fwd_call(xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv, num_heads,
                    interpret)
    return out, (xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv)


def _ctx_bwd(num_heads, interpret, res, dctx):
    xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv = res
    dxf, dg, db, dwk, dbk, dwv, dbv = _bwd_call(
        xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv,
        dctx.astype(jnp.float32), num_heads, interpret)
    return (dxf.astype(xf.dtype), jnp.zeros_like(cm), jnp.zeros_like(nv),
            dg.astype(ln_g.dtype), db.astype(ln_b.dtype),
            dwk.astype(wk.dtype), dbk.astype(bk.dtype),
            dwv.astype(wv.dtype), dbv.astype(bv.dtype))


_cond_ctx_kernel.defvjp(_ctx_fwd, _ctx_bwd)


def cond_contexts(xf, cm, ln_g, ln_b, wk, bk, wv, bv, *, num_heads: int,
                  use_kernel=None, interpret: bool = False):
    """All-layer grouped cross-attention contexts with gradients.

    xf: (B, N, D) pre-projected condition features (N unpadded); cm:
    (B, 1, 1) condition-dropout mask or None; stacked per-layer params
    as in :func:`cond_ctx_reference`.  Returns (B, L, G, S, S) f32.

    ``use_kernel``: None = kernels on TPU / reference elsewhere;
    True = force the Pallas path (tests pass interpret=True with it);
    False = force the jnp reference."""
    B, N, D = xf.shape
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    Np = max(_round_up(N, 8), 8)
    if cm is None:
        cm = jnp.ones((B, 1, 1), jnp.float32)
    cm = cm.reshape(B, 1, 1).astype(jnp.float32)
    nv = jnp.concatenate(
        [jnp.ones((B, N, 1), jnp.float32),
         jnp.zeros((B, Np - N, 1), jnp.float32)], axis=1)
    if Np != N:
        xf = jnp.pad(xf, ((0, 0), (0, Np - N), (0, 0)))
    if not use_kernel:
        return cond_ctx_reference(xf, cm, nv, ln_g, ln_b, wk, bk, wv, bv,
                                  num_heads)
    return _cond_ctx_kernel(xf, cm, nv, ln_g.astype(jnp.float32),
                            ln_b.astype(jnp.float32), wk, bk.astype(
                                jnp.float32), wv, bv.astype(jnp.float32),
                            num_heads, interpret)
