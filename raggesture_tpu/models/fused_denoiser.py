"""Performance apply-path for the denoiser: Pallas self-attention + stacked
adaLN projections, reading the canonical flax param tree directly.

The flax ``GestureDenoiser`` (denoiser.py) stays the source of truth for
parameters and the training path; this module is a pure function with
identical math, restructured for inference speed:

  1. every layer's self-attention block runs as the fused Pallas kernel
     (ops/pallas/linear_attention_kernel.py) — one kernel instead of
     XLA's several fusions per block;
  2. the 40 StylizationBlock adaLN projections (5 per layer × 8 layers:
     sa, ca_text, ca_audio, ca_spk, ffn) collapse into ONE
     (B, 2048) @ (2048, 40·1024) GEMM per denoiser call — the reference
     (and the naive path) runs 40 separate (2048→1024) GEMMs;
  3. cross-attention / FFN stay plain XLA einsums (their shapes are tiny
     and XLA fuses them well).

Numerical parity with ``GestureDenoiser.__call__`` is tested in
tests/test_fused_denoiser.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.linear_attention import (
    NEG_MASK,
    feature_softmax_q,
    group_size,
    grouped_linear_attention,
    head_group_mask,
    time_softmax_k,
)
from ..ops.pallas.linear_attention_kernel import (
    fused_cross_attention,
    fused_self_attention,
)
from .denoiser import COND_KEYS, DenoiserConfig
from .layers import sine_position_table, timestep_embedding

STYL_SLOTS = ("sa", "xf_text", "xf_audio", "xf_spk", "ffn")

# trace-time override for fused_decoder_layer's context-GEMM grouping
# (0 = auto 128-lane groups, 1 = force dense): A/B harnesses set
# CTX_GROUPS_OVERRIDE[0] BEFORE building a StagedGenerator so the forced
# mode bakes into the traced pipelines; production leaves it at 0.
# LN_FOLD_OVERRIDE[0] likewise A/Bs the pack-time LayerNorm fold
# (pack_decoder_layer fold_ln + the kernel's ln_folded, kept in sync).
CTX_GROUPS_OVERRIDE = [0]
LN_FOLD_OVERRIDE = [False]


def _ln(x, p, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def _adaln_index(num_layers: int):
    return [(i, slot) for i in range(num_layers) for slot in STYL_SLOTS]


def _stacked_adaln_raw(params: Dict, emb: jnp.ndarray, num_layers: int):
    """silu(emb) @ [all emb_layer kernels] + biases -> (rows, n_slots*2D)."""
    kernels, biases = [], []
    for i in range(num_layers):
        blk = params[f"block_{i}"]
        for slot in STYL_SLOTS:
            sub = blk["sa_block" if slot == "sa" else
                      (f"ca_{slot}" if slot.startswith("xf") else "ffn")]
            st = sub["proj_out"]["emb_layer"]
            kernels.append(jnp.asarray(st["kernel"]))
            biases.append(jnp.asarray(st["bias"]))
    K = jnp.concatenate(kernels, axis=1)          # (E, n*2D)
    Bv = jnp.concatenate(biases, axis=0)          # (n*2D,)
    return jax.nn.silu(emb) @ K + Bv, kernels[0].shape[1]


def _split_adaln(out: jnp.ndarray, two_d: int, num_layers: int):
    D = two_d // 2
    res = {}
    for j, key in enumerate(_adaln_index(num_layers)):
        seg = out[:, j * two_d: (j + 1) * two_d]
        res[key] = (seg[:, :D], seg[:, D:])
    return res


def stacked_adaln(params: Dict, emb: jnp.ndarray, num_layers: int):
    """One GEMM for every stylization block's (scale, shift).

    Returns {(layer, slot): (scale (B,D), shift (B,D))}."""
    out, two_d = _stacked_adaln_raw(params, emb, num_layers)
    return _split_adaln(out, two_d, num_layers)


def unwrap_denoiser(params: Dict) -> Dict:
    """The denoiser parameter subtree from either the bundle tree
    ({"params": {"codec", "denoiser"}}) or a denoiser-only init tree."""
    p = params["params"]
    return p["denoiser"] if "denoiser" in p else p


def embed_inputs(p: Dict, cfg: DenoiserConfig, latents: jnp.ndarray,
                 motion_mask: jnp.ndarray):
    """Shared denoiser input prologue (fused_denoise / fused_denoise_ctx;
    flax source of truth: denoiser.py GestureDenoiser.__call__): validity
    mask, joint_embed, per-part sine positions with zero separators, learned
    global positions."""
    T = latents.shape[1]
    src_mask = motion_mask[..., None].astype(latents.dtype)
    h = _dense(latents, p["joint_embed"])
    pos = sine_position_table(cfg.tokens_per_part, cfg.latent_dim)
    sep = jnp.zeros((1, cfg.latent_dim))
    pos_cat = jnp.concatenate([pos, sep, pos, sep, pos, sep, pos], axis=0)
    h = h + pos_cat[None, :T, :]
    h = h + jnp.asarray(p["global_positional_embedding"]["pe"])[None, :T, :]
    return h, src_mask


def adaln_table(params: Dict, cfg: DenoiserConfig, t_all: jnp.ndarray
                ) -> jnp.ndarray:
    """Precompute every sampling step's adaLN row in ONE GEMM.

    In all sampling loops the original timestep is a static function of the
    step index (sampling.py::_model_call: t_orig = timestep_map[i]) and is
    shared by the whole batch, so the per-step (B, 2048) @ (2048, n·2D)
    adaLN GEMM is loop-invariant per step.  At B=2 XLA lowers that GEMM
    abysmally (~224 us/step on v5e — half the whole sampling scan); hoisting
    it out as one (S, 2048) @ (2048, n·2D) GEMM removes it (and the
    time-embed MLP) from the hot loop entirely.

    Returns (S, n_slots·2D); index with the scan's step_idx and pass the row
    to fused_denoise_ctx(adaln_row=...).
    """
    p = unwrap_denoiser(params)
    emb = timestep_embedding(t_all, cfg.latent_dim)
    emb = _dense(jax.nn.silu(_dense(emb, p["time_embed_1"])),
                 p["time_embed_2"])
    out, _ = _stacked_adaln_raw(p, emb, cfg.num_layers)
    return out


def _stylize(y, p, scale, shift):
    """StylizationBlock minus the emb projection (precomputed scale/shift)."""
    h = _ln(y, p["norm"]) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    h = jax.nn.silu(h)
    return _dense(h, p["out_proj"])


def self_attention_xla(p, x, src_mask, scale, shift, num_heads):
    B, T, D = x.shape
    xn = _ln(x, p["norm"])
    q = _dense(xn, p["query"])
    k = _dense(xn, p["key"]) + (1.0 - src_mask) * NEG_MASK
    v = _dense(xn, p["value"]) * src_mask
    H = num_heads
    q = feature_softmax_q(q.reshape(B, T, H, -1))
    k = time_softmax_k(k)
    y = grouped_linear_attention(q, k, v, H).reshape(B, T, D)
    return x + _stylize(y, p["proj_out"], scale, shift)


def cross_attention(p, x, xf, scale, shift, query_mask, cond_mask, num_heads):
    B, T, D = x.shape
    N = xf.shape[1]
    H = num_heads
    xn = _ln(x, p["norm"])
    xfn = _ln(xf, p["text_norm"])
    q = feature_softmax_q(_dense(xn, p["query"]).reshape(B, T, H, -1))
    k = _dense(xfn, p["key"])
    if cond_mask is not None:
        k = k + (1.0 - cond_mask) * NEG_MASK
        v = _dense(xfn * cond_mask, p["value"])
    else:
        v = _dense(xfn, p["value"])
    k = time_softmax_k(k)
    y = grouped_linear_attention(q, k, v, H)
    if query_mask is not None:
        y = y + (1.0 - query_mask).reshape(B, T, 1, 1) * NEG_MASK
    y = y.reshape(B, T, D)
    return x + _stylize(y, p["proj_out"], scale, shift)


def ffn(p, x, scale, shift):
    y = _dense(x, p["linear1"])
    y = jax.nn.gelu(y, approximate=False)
    y = _dense(y, p["linear2"])
    return x + _stylize(y, p["proj_out"], scale, shift)


def encode_conditions(params: Dict, cfg: DenoiserConfig, word, audio,
                      speaker_ids) -> Dict[str, jnp.ndarray]:
    """Pure-function twin of GestureDenoiser.encode_conditions (shipped
    config: 0 condition-encoder layers)."""
    assert cfg.text_num_layers == 0 and cfg.audio_num_layers == 0, \
        "fused path supports the shipped num_layers=0 condition encoders"
    xf_text = _dense(word, params["text_pre_proj"])
    xf_audio = _dense(audio, params["audio_pre_proj"])
    if speaker_ids.ndim == 1:
        speaker_ids = speaker_ids[:, None]
    xf_spk = jnp.asarray(params["speaker_embedding"]["embedding"])[speaker_ids]
    return {"xf_text": xf_text, "xf_audio": xf_audio, "xf_spk": xf_spk}


@partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def fused_denoise(
    params: Dict,
    cfg: DenoiserConfig,
    latents: jnp.ndarray,       # (B, T, D)
    t_orig: jnp.ndarray,        # (B,)
    motion_mask: jnp.ndarray,   # (B, T)
    conds: Dict[str, jnp.ndarray],
    query_masks: Dict[str, jnp.ndarray],
    cond_mask: jnp.ndarray,     # (B, 1, 1)
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Pure twin of GestureDenoiser.__call__ (denoiser.py) with the Pallas
    self-attention kernel and stacked adaLN."""
    # the Pallas kernel lowers for TPU only; everywhere else (CPU tests,
    # virtual-device dry runs) the XLA twin runs the same math
    use_pallas = use_pallas and jax.default_backend() == "tpu"
    p = unwrap_denoiser(params)
    B, T, _ = latents.shape
    c = cfg

    emb = timestep_embedding(t_orig, c.latent_dim)
    emb = _dense(jax.nn.silu(_dense(emb, p["time_embed_1"])),
                 p["time_embed_2"])

    h, src_mask = embed_inputs(p, c, latents, motion_mask)

    adaln = stacked_adaln(p, emb, c.num_layers)

    for i in range(c.num_layers):
        blk = p[f"block_{i}"]
        s, sh = adaln[(i, "sa")]
        if use_pallas:
            h = fused_self_attention(h, src_mask, s, sh, blk["sa_block"],
                                     num_heads=c.num_heads)
        else:
            h = self_attention_xla(blk["sa_block"], h, src_mask, s, sh,
                                   c.num_heads)
        outs = []
        for key in COND_KEYS:
            s, sh = adaln[(i, key)]
            qm = query_masks[key] if query_masks is not None else None
            if use_pallas:
                qm_col = (jnp.ones((B, T, 1)) if qm is None
                          else qm.reshape(B, T, 1))
                cm = (jnp.ones((B, 1, 1)) if cond_mask is None
                      else cond_mask.reshape(B, 1, 1))
                outs.append(fused_cross_attention(
                    h, conds[key], qm_col, cm, s, sh, blk[f"ca_{key}"],
                    num_heads=c.ca_heads))
            else:
                outs.append(cross_attention(
                    blk[f"ca_{key}"], h, conds[key], s, sh, qm, cond_mask,
                    c.ca_heads))
        h = _dense(jnp.concatenate(outs, axis=-1), blk["ca_mix"])
        s, sh = adaln[(i, "ffn")]
        h = ffn(blk["ffn"], h, s, sh)

    return _dense(h, p["out"])


# ---------------------------------------------------------------------------
# Cached cross-attention contexts: in linear cross-attention the context
# softmax_time(k)^T v depends on the conditions only, never on the latents
# or timestep — so across a 50-step sampling scan it is loop-invariant.
# The reference recomputes k/v in every one of the 2x50x8x3 cross-attention
# calls; caching removes all condition-side GEMMs from the hot loop.
# ---------------------------------------------------------------------------

def cross_context(p_ca: Dict, xf: jnp.ndarray, cond_mask, num_heads: int,
                  g: int = 0) -> jnp.ndarray:
    """(B, N, Dc) conditions -> (B, D, D) block-diagonal linear-attention
    context for one EfficientCrossAttention block.

    ``g`` forces a head-group size (tests exercise the grouped stack/eye
    construction on CPU); 0 = auto (grouped on TPU, per-head elsewhere)."""
    B, N, _ = xf.shape
    D = p_ca["query"]["kernel"].shape[1]
    xfn = _ln(xf, p_ca["text_norm"])
    k = _dense(xfn, p_ca["key"])
    if cond_mask is not None:
        k = k + (1.0 - cond_mask) * NEG_MASK
        v = _dense(xfn * cond_mask, p_ca["value"])
    else:
        v = _dense(xfn, p_ca["value"])
    H = num_heads
    Dh = D // H
    k_sm = time_softmax_k(k)
    if g == 0:
        g = group_size(H, Dh) if jax.default_backend() == "tpu" else 1
    G = H // g
    S = g * Dh
    # grouped contraction via tile-aligned lane slices (see
    # ops/linear_attention.py::grouped_linear_attention): full-tile MXU
    # GEMMs instead of per-head (Dh, N)·(N, Dh) slivers; the head-group
    # mask zeroes the off-head blocks so each group's (S, S) context is
    # exactly its g per-head blocks
    mask = (head_group_mask(g, Dh, Dh, k_sm.dtype) if g > 1
            else jnp.ones((S, S), k_sm.dtype))
    ctx = jnp.stack([
        jnp.einsum("bnd,bne->bde", k_sm[..., gi * S:(gi + 1) * S],
                   v[..., gi * S:(gi + 1) * S]) * mask
        for gi in range(G)
    ], axis=1)                                    # (B, G, S, S)
    # place per-group blocks on the (D, D) block diagonal in one fused
    # broadcast-multiply: full[b, g·S+d, g'·S+l] = ctx[b,g,d,l]·[g==g']
    # ((B,G,S,G,S) has exactly D·D elements — no scatter ops)
    eye = jnp.eye(G, dtype=ctx.dtype)
    full = ctx[:, :, :, None, :] * eye[None, :, None, :, None]
    return full.reshape(B, D, D)


def precompute_cross_contexts(p: Dict, cfg: DenoiserConfig,
                              conds: Dict[str, jnp.ndarray], cond_mask
                              ) -> Dict:
    return {
        (i, key): cross_context(p[f"block_{i}"][f"ca_{key}"], conds[key],
                                cond_mask, cfg.ca_heads)
        for i in range(cfg.num_layers)
        for key in COND_KEYS
    }


def cross_attention_cached_xla(p, x, ctx, scale, shift, query_mask,
                               num_heads):
    """XLA twin of the cached-context kernel (CPU tests / fallback)."""
    B, T, D = x.shape
    H = num_heads
    xn = _ln(x, p["norm"])
    q = feature_softmax_q(_dense(xn, p["query"]).reshape(B, T, H, -1))
    # the context is block-diagonal over heads, so a flat (T,D)@(D,D)
    # product equals the per-head einsum pair
    y = jnp.einsum("btd,bde->bte", q.reshape(B, T, D), ctx)
    if query_mask is not None:
        y = y + (1.0 - query_mask).reshape(B, T, 1) * NEG_MASK
    return x + _stylize(y, p["proj_out"], scale, shift)


@partial(jax.jit, static_argnames=("cfg", "use_pallas", "merged_ca",
                                   "ffn_pallas", "layer_kernel"))
def fused_denoise_ctx(
    params: Dict,
    cfg: DenoiserConfig,
    latents: jnp.ndarray,
    t_orig: jnp.ndarray,
    motion_mask: jnp.ndarray,
    ctx_cache: Dict,
    query_masks: Dict[str, jnp.ndarray],
    use_pallas: bool = True,
    merged_ca: bool = False,
    ffn_pallas: bool = False,
    adaln_row: jnp.ndarray = None,
    layer_kernel: bool = False,
    packed_layers: tuple = None,
    ctx3_list: tuple = None,
    mask_rows: jnp.ndarray = None,
    qmask_rows: jnp.ndarray = None,
) -> jnp.ndarray:
    """fused_denoise with cached cross-attention contexts (inference path:
    the conditions never change within a sampling run).

    ``adaln_row``: optional (n_slots·2D,) precomputed adaLN row for this
    step (see :func:`adaln_table`) — skips the in-loop time-embed MLP and
    adaLN GEMM; valid whenever every batch element shares the same t.

    ``layer_kernel``: run each whole DecoderLayer as ONE Pallas kernel
    (ops/pallas/linear_attention_kernel.py::fused_decoder_layer) with the
    batch folded into matmul rows; requires ``adaln_row``.  Pass
    ``packed_layers`` (one pack_decoder_layer weight dict per layer, pure
    parameter layout), ``ctx3_list`` (one stacked+cast (B, 3, D, D)
    context per layer) and ``mask_rows``/``qmask_rows``
    (layer_kernel_mask_rows) — all built once per run OUTSIDE the sampling
    scan — so no per-step operand marshaling remains beyond the
    (latents-dependent) h_rows pad.  This function runs inside the scan
    body, so any stack/cast left here repeats every step."""
    use_pallas = use_pallas and jax.default_backend() == "tpu"
    p = unwrap_denoiser(params)
    B, T, _ = latents.shape
    c = cfg

    h, src_mask = embed_inputs(p, c, latents, motion_mask)

    from ..ops.pallas.linear_attention_kernel import (
        fused_cross_attention_cached,
        fused_cross_block_cached,
        fused_decoder_layer,
    )

    if use_pallas and not layer_kernel:
        qm3 = jnp.stack(
            [jnp.ones((B, T)) if query_masks is None
             else query_masks[key].reshape(B, T) for key in COND_KEYS],
            axis=-1)

    if use_pallas and layer_kernel:
        assert adaln_row is not None, "layer_kernel requires adaln_row"
        D = c.latent_dim
        two_d = 2 * D
        Tp = -(-T // 8) * 8
        pad = Tp - T
        h_rows = jnp.pad(h, ((0, 0), (0, pad), (0, 0))).reshape(B * Tp, D)
        if mask_rows is not None and qmask_rows is not None:
            # hoisted once-per-run tables (layer_kernel_mask_rows)
            m_rows, qm_rows = mask_rows, qmask_rows
        else:
            m_rows, qm_rows = layer_kernel_mask_rows(c, motion_mask,
                                                     query_masks)
        if packed_layers is None:
            packed_layers = pack_layers(p, c)
        if ctx3_list is None:
            # keep context precision consistent with the weight packs (an
            # f32 pack must not be paired with bf16-rounded contexts)
            ctx3_list = stack_layer_contexts(
                c, ctx_cache, dtype=packed_layers[0]["mats"].dtype)
        for i in range(c.num_layers):
            seg = adaln_row[i * 5 * two_d:(i + 1) * 5 * two_d].reshape(
                5, two_d)
            h_rows = fused_decoder_layer(
                h_rows, m_rows, qm_rows, seg[:, :D], seg[:, D:],
                ctx3_list[i], packed_layers[i], num_heads=c.num_heads,
                ca_heads=c.ca_heads, batch=B,
                ctx_groups=CTX_GROUPS_OVERRIDE[0],
                ln_folded=LN_FOLD_OVERRIDE[0])
        h = h_rows.reshape(B, Tp, D)[:, :T, :]
        return _dense(h, p["out"])

    if adaln_row is not None:
        # one precomputed (n_slots*2D,) row, shared across the batch
        adaln = _split_adaln(
            jnp.broadcast_to(adaln_row[None, :], (B, adaln_row.shape[-1])),
            2 * c.latent_dim, c.num_layers)
    else:
        emb = timestep_embedding(t_orig, c.latent_dim)
        emb = _dense(jax.nn.silu(_dense(emb, p["time_embed_1"])),
                     p["time_embed_2"])
        adaln = stacked_adaln(p, emb, c.num_layers)

    for i in range(c.num_layers):
        blk = p[f"block_{i}"]
        s, sh = adaln[(i, "sa")]
        if use_pallas and merged_ca:
            h = fused_self_attention(h, src_mask, s, sh, blk["sa_block"],
                                     num_heads=c.num_heads)
            # conditions-only stack: consume the once-per-run ctx3_list when
            # provided — this function traces inside the sampling scan, and
            # XLA does not hoist ops feeding a Pallas custom-call out of the
            # loop (the in-loop stack is the fallback for direct calls)
            ctx3 = (ctx3_list[i] if ctx3_list is not None
                    else jnp.stack([ctx_cache[(i, key)] for key in COND_KEYS],
                                   axis=1))
            scale3 = jnp.stack([adaln[(i, key)][0] for key in COND_KEYS],
                               axis=1)
            shift3 = jnp.stack([adaln[(i, key)][1] for key in COND_KEYS],
                               axis=1)
            h = fused_cross_block_cached(
                h, ctx3, qm3, scale3, shift3,
                tuple(blk[f"ca_{key}"] for key in COND_KEYS),
                blk["ca_mix"], num_heads=c.ca_heads)
        elif use_pallas:
            h = fused_self_attention(h, src_mask, s, sh, blk["sa_block"],
                                     num_heads=c.num_heads)
            outs = []
            for key in COND_KEYS:
                s, sh = adaln[(i, key)]
                h_ca = fused_cross_attention_cached(
                    h, ctx_cache[(i, key)], qm3[..., COND_KEYS.index(key),
                                                 None],
                    s, sh, blk[f"ca_{key}"], num_heads=c.ca_heads)
                outs.append(h_ca)
            h = _dense(jnp.concatenate(outs, axis=-1), blk["ca_mix"])
        else:
            h = self_attention_xla(blk["sa_block"], h, src_mask, s, sh,
                                   c.num_heads)
            outs = []
            for key in COND_KEYS:
                s, sh = adaln[(i, key)]
                qm = query_masks[key] if query_masks is not None else None
                outs.append(cross_attention_cached_xla(
                    blk[f"ca_{key}"], h, ctx_cache[(i, key)], s, sh, qm,
                    c.ca_heads))
            h = _dense(jnp.concatenate(outs, axis=-1), blk["ca_mix"])
        s, sh = adaln[(i, "ffn")]
        if use_pallas and ffn_pallas:
            # measured slightly SLOWER than the in-scan XLA FFN on v5e
            # (24.9ms vs 23.5ms per 50-step loop) — available for future
            # shapes, off by default
            from ..ops.pallas.linear_attention_kernel import fused_ffn

            h = fused_ffn(h, s, sh, blk["ffn"])
        else:
            h = ffn(blk["ffn"], h, s, sh)

    return _dense(h, p["out"])


def stack_ca_params(p: Dict, cfg: DenoiserConfig, key: str):
    """Per-layer cross-attention LN/K/V parameters for one condition
    stream, stacked over layers for ops/pallas/cond_ctx_kernel: returns
    (ln_g, ln_b, wk, bk, wv, bv) with leading (L,) axes.  Pure parameter
    relayout (~8 MB concat per projection), rebuilt in-graph per step."""
    gs, bs, wks, bks, wvs, bvs = [], [], [], [], [], []
    for i in range(cfg.num_layers):
        ca = p[f"block_{i}"][f"ca_{key}"]
        gs.append(jnp.asarray(ca["text_norm"]["scale"]))
        bs.append(jnp.asarray(ca["text_norm"]["bias"]))
        wks.append(jnp.asarray(ca["key"]["kernel"]))
        bks.append(jnp.asarray(ca["key"]["bias"]))
        wvs.append(jnp.asarray(ca["value"]["kernel"]))
        bvs.append(jnp.asarray(ca["value"]["bias"]))
    return (jnp.stack(gs), jnp.stack(bs), jnp.stack(wks), jnp.stack(bks),
            jnp.stack(wvs), jnp.stack(bvs))


def cross_attention_grouped_ctx(p, x, ctx_g, scale, shift, query_mask,
                                num_heads):
    """Cached-context cross-attention apply with a GROUPED (G, S, S)
    context (the cond_ctx_kernel layout) — same math as
    :func:`cross_attention_cached_xla` (the dense block-diagonal product
    equals the per-group products on the diagonal blocks)."""
    B, T, D = x.shape
    G, S = ctx_g.shape[1], ctx_g.shape[2]
    xn = _ln(x, p["norm"])
    q = feature_softmax_q(
        _dense(xn, p["query"]).reshape(B, T, num_heads, -1)
    ).reshape(B, T, D)
    y = jnp.concatenate(
        [jnp.einsum("bts,bse->bte", q[..., g * S:(g + 1) * S], ctx_g[:, g])
         for g in range(G)], axis=-1)
    if query_mask is not None:
        y = y + (1.0 - query_mask).reshape(B, T, 1) * NEG_MASK
    return x + _stylize(y, p["proj_out"], scale, shift)


def train_denoise_ctx(params: Dict, cfg: DenoiserConfig,
                      latents: jnp.ndarray, t_orig: jnp.ndarray,
                      motion_mask: jnp.ndarray,
                      conds: Dict[str, jnp.ndarray],
                      query_masks, cond_mask,
                      use_kernel=None, interpret: bool = False
                      ) -> jnp.ndarray:
    """TRAINING-path twin of GestureDenoiser.__call__ built around the
    all-layer condition-context kernels (ops/pallas/cond_ctx_kernel.py).

    The flax forward recomputes per-layer K/V over the full condition
    timelines; this function computes every layer's grouped context in
    ONE fused pass per condition stream (with an analytic custom_vjp for
    the backward) and applies them with the T=43 cached-context math the
    inference path already uses.  Differentiable end-to-end; per-sample
    timesteps supported (unlike the sampling layer kernel, adaLN rows
    here are per-sample).  Parity vs the flax path:
    tests/test_cond_ctx.py."""
    from ..ops.pallas.cond_ctx_kernel import cond_contexts

    p = unwrap_denoiser(params)
    B, T, _ = latents.shape
    c = cfg

    emb = timestep_embedding(t_orig, c.latent_dim)
    emb = _dense(jax.nn.silu(_dense(emb, p["time_embed_1"])),
                 p["time_embed_2"])
    h, src_mask = embed_inputs(p, c, latents, motion_mask)
    adaln = stacked_adaln(p, emb, c.num_layers)

    cm = (None if cond_mask is None
          else jnp.asarray(cond_mask).reshape(B, 1, 1))
    ctx = {}
    for key in COND_KEYS:
        stacked = stack_ca_params(p, c, key)
        ctx[key] = cond_contexts(conds[key], cm, *stacked,
                                 num_heads=c.ca_heads,
                                 use_kernel=use_kernel,
                                 interpret=interpret)

    for i in range(c.num_layers):
        blk = p[f"block_{i}"]
        s, sh = adaln[(i, "sa")]
        h = self_attention_xla(blk["sa_block"], h, src_mask, s, sh,
                               c.num_heads)
        outs = []
        for key in COND_KEYS:
            s, sh = adaln[(i, key)]
            qm = query_masks[key] if query_masks is not None else None
            outs.append(cross_attention_grouped_ctx(
                blk[f"ca_{key}"], h, ctx[key][:, i], s, sh, qm,
                c.ca_heads))
        h = _dense(jnp.concatenate(outs, axis=-1), blk["ca_mix"])
        s, sh = adaln[(i, "ffn")]
        h = ffn(blk["ffn"], h, s, sh)

    return _dense(h, p["out"])


def stack_layer_contexts(dcfg: DenoiserConfig, ctx_cache: Dict,
                         dtype=jnp.bfloat16):
    """Per-layer (B, 3, D, D) context stacks for the layer kernel —
    conditions-dependent, so built once per sampling RUN (outside the
    scan), unlike the per-generator weight packs.  ``dtype`` must match the
    weight-pack precision (bf16 by default; see pack_decoder_layer)."""
    return tuple(
        jnp.stack([ctx_cache[(i, key)] for key in COND_KEYS],
                  axis=1).astype(dtype)
        for i in range(dcfg.num_layers))


def layer_kernel_mask_rows(dcfg: DenoiserConfig, motion_mask, query_masks):
    """Once-per-run (B*Tp, 1) validity and (B*Tp, 3) query-mask row tables
    for the layer kernel.  Both are conditions-only (loop-invariant across
    a sampling run), so they are built OUTSIDE the scan and passed into
    fused_denoise_ctx — the pad/stack would otherwise repeat every step
    feeding a Pallas custom-call (the op class XLA does not hoist)."""
    B, T = motion_mask.shape[:2]
    Tp = -(-T // 8) * 8
    pad = Tp - T
    src = jnp.asarray(motion_mask).reshape(B, T, 1).astype(jnp.float32)
    m_rows = jnp.pad(src, ((0, 0), (0, pad), (0, 0))).reshape(B * Tp, 1)
    qm3 = jnp.stack(
        [jnp.ones((B, T)) if query_masks is None
         else query_masks[key].reshape(B, T) for key in COND_KEYS],
        axis=-1)
    qm_rows = jnp.pad(qm3, ((0, 0), (0, pad), (0, 0))).reshape(B * Tp, 3)
    return m_rows, qm_rows


def pack_layers(pd: Dict, dcfg: DenoiserConfig, enabled: bool = True):
    """Build the per-layer packed WEIGHT dicts for the layer-kernel path
    (parameter layout only — compute ONCE per StagedGenerator, not per
    clip; see ops/pallas/linear_attention_kernel.py::pack_decoder_layer).
    Returns None when disabled or off-TPU (the kernel never runs there)."""
    if not enabled or jax.default_backend() != "tpu":
        return None
    from ..ops.pallas.linear_attention_kernel import pack_decoder_layer

    return tuple(pack_decoder_layer(pd[f"block_{i}"],
                                    fold_ln=LN_FOLD_OVERRIDE[0])
                 for i in range(dcfg.num_layers))
