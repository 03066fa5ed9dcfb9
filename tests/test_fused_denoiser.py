"""Fused (performance) denoiser path vs the canonical flax module."""

import jax
import jax.numpy as jnp
import numpy as np

from raggesture_tpu.models.denoiser import (
    DenoiserConfig,
    GestureDenoiser,
    default_query_masks,
    latent_motion_mask,
)
from raggesture_tpu.models.fused_denoiser import (
    encode_conditions,
    fused_denoise,
    stacked_adaln,
)



def parity_query_masks(cfg, B):
    """Query masks at the TRUE separator tokens — noise-free for
    cross-implementation parity comparisons.  PRODUCTION masks follow the
    reference's quirk indices [L, 2L, 3L] (default_query_masks), which put
    the -1e6 output quirk on two VALID tokens; its f32 catastrophic
    cancellation amplifies implementation ulp differences ~1e6x and then
    propagates through self-attention, so exact cross-framework comparison
    is only meaningful with the quirk confined to rows the token-validity
    mask already zeroes.  Math equivalence is mask-independent."""
    from raggesture_tpu.models.denoiser import COND_KEYS

    m = jnp.ones((B, cfg.num_tokens))
    m = m.at[:, list(cfg.sep_indices)].set(0.0)
    return {k: m for k in COND_KEYS}

def _setup(B=2, layers=2, D=32, H=4, text_dim=24):
    cfg = DenoiserConfig(latent_dim=D, time_embed_dim=4 * D,
                         num_layers=layers, num_heads=H, ff_size=2 * D,
                         dropout=0.0, text_latent_dim=text_dim,
                         audio_latent_dim=text_dim, num_speakers=5,
                         max_seq_len=30, frame_chunk_size=15)
    den = GestureDenoiser(cfg)
    rng = np.random.RandomState(0)
    word = jnp.asarray(rng.randn(B, 6, text_dim), jnp.float32)
    audio = jnp.asarray(rng.randn(B, 8, text_dim), jnp.float32)
    spk = jnp.asarray([1, 3])
    x = jnp.asarray(rng.randn(B, cfg.num_tokens, D), jnp.float32)
    t = jnp.asarray([5, 900])
    frame_mask = jnp.ones((B, cfg.max_seq_len))
    mask = latent_motion_mask(cfg, frame_mask)
    import flax.linen as nn

    def run(mdl):
        cc = mdl.encode_conditions(word, audio, spk)
        return mdl(x, t, mask, cc, parity_query_masks(cfg, B),
                   jnp.ones((B, 1, 1)))

    params = nn.init(run, den)(jax.random.PRNGKey(0))
    # randomize the zero-init layers so the whole path is exercised
    def derandomize(p, key=[0]):
        def go(tree):
            for k, v in tree.items():
                if isinstance(v, dict):
                    go(v)
                else:
                    key[0] += 1
                    if np.asarray(v).size and np.allclose(np.asarray(v), 0):
                        tree[k] = 0.05 * jax.random.normal(
                            jax.random.PRNGKey(key[0]), v.shape)
        go(p)
        return p

    params = {"params": derandomize(jax.tree_util.tree_map(np.asarray,
                                                           params)["params"])}
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return cfg, den, params, (x, t, mask, word, audio, spk)


def test_fused_denoise_matches_module():
    cfg, den, params, (x, t, mask, word, audio, spk) = _setup()
    B = x.shape[0]
    conds = den.apply(params, word, audio, spk,
                      method=den.encode_conditions)
    qm = parity_query_masks(cfg, B)
    cm = jnp.ones((B, 1, 1))
    ref = den.apply(params, x, t, mask, conds, qm, cm)
    out = fused_denoise(params, cfg, x, t, mask, conds, qm, cm,
                        use_pallas=False)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               atol=3e-5)


def test_fused_denoise_pallas_matches_module():
    cfg, den, params, (x, t, mask, word, audio, spk) = _setup()
    B = x.shape[0]
    conds = den.apply(params, word, audio, spk, method=den.encode_conditions)
    qm = parity_query_masks(cfg, B)
    cm = jnp.ones((B, 1, 1))
    ref = den.apply(params, x, t, mask, conds, qm, cm)
    # interpret-mode pallas on CPU
    import raggesture_tpu.ops.pallas.linear_attention_kernel as K

    orig = K.fused_self_attention
    try:
        import functools

        K_interp = functools.partial(orig, interpret=True)
        import raggesture_tpu.models.fused_denoiser as F

        F.fused_self_attention = K_interp
        fused_denoise_nojit = F.fused_denoise.__wrapped__
        out = fused_denoise_nojit(params, cfg, x, t, mask, conds, qm, cm,
                                  use_pallas=True)
    finally:
        import raggesture_tpu.models.fused_denoiser as F

        F.fused_self_attention = orig
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               atol=3e-5)


def test_encode_conditions_parity():
    cfg, den, params, (x, t, mask, word, audio, spk) = _setup()
    ref = den.apply(params, word, audio, spk, method=den.encode_conditions)
    out = encode_conditions(params["params"]["denoiser"]
                            if "denoiser" in params["params"]
                            else params["params"], cfg, word, audio, spk)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-6)


def test_stacked_adaln_matches_per_block():
    cfg, den, params, _ = _setup()
    p = params["params"]
    emb = jnp.asarray(np.random.RandomState(5).randn(2, cfg.time_embed_dim),
                      jnp.float32)
    table = stacked_adaln(p, emb, cfg.num_layers)
    # compare slot (0, 'ffn') against the direct projection
    st = p["block_0"]["ffn"]["proj_out"]["emb_layer"]
    direct = jax.nn.silu(emb) @ st["kernel"] + st["bias"]
    D = direct.shape[-1] // 2
    s, sh = table[(0, "ffn")]
    np.testing.assert_allclose(np.asarray(s), np.asarray(direct[:, :D]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(direct[:, D:]),
                               atol=1e-5)


def test_fused_denoise_ctx_matches_module():
    """Cached cross-attention contexts: identical output to the module."""
    from raggesture_tpu.models.fused_denoiser import (
        fused_denoise_ctx,
        precompute_cross_contexts,
    )

    cfg, den, params, (x, t, mask, word, audio, spk) = _setup()
    B = x.shape[0]
    conds = den.apply(params, word, audio, spk, method=den.encode_conditions)
    qm = parity_query_masks(cfg, B)
    cm = jnp.ones((B, 1, 1))
    ref = den.apply(params, x, t, mask, conds, qm, cm)
    ctx = precompute_cross_contexts(params["params"], cfg, conds, cm)
    out = fused_denoise_ctx(params, cfg, x, t, mask, ctx, qm,
                            use_pallas=False)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               atol=3e-5)
    # dropped conditions (cm = 0) also match
    cm0 = jnp.zeros((B, 1, 1))
    ref0 = den.apply(params, x, t, mask, conds, qm, cm0)
    ctx0 = precompute_cross_contexts(params["params"], cfg, conds, cm0)
    out0 = fused_denoise_ctx(params, cfg, x, t, mask, ctx0, qm,
                             use_pallas=False)
    np.testing.assert_allclose(np.asarray(out0)[valid],
                               np.asarray(ref0)[valid], atol=3e-5)


def test_staged_generator_fused_matches_plain_on_cpu():
    """StagedGenerator(fused=True) on CPU (XLA twins + cached contexts)
    equals the plain module path through a full sampling run."""
    from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
    from raggesture_tpu.models.architecture import (
        MotionDiffusionModel,
        StagedGenerator,
    )

    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)},
        batch)
    sched = cfg.diffusion_test.schedule()
    plain = StagedGenerator(model, params, sched, fused=False)
    fused = StagedGenerator(model, params, sched, fused=True)
    r = jax.random.PRNGKey(3)
    out_p = plain(batch, r)
    out_f = fused(batch, r)
    np.testing.assert_allclose(np.asarray(out_f["output_latents"]),
                               np.asarray(out_p["output_latents"]),
                               atol=5e-4)
    # sample() and __call__ (default options) route through the SAME
    # jitted sample_pipeline, so their outputs are bit-identical
    out_s = fused.sample(batch, r)
    np.testing.assert_array_equal(np.asarray(out_s["output_latents"]),
                                  np.asarray(out_f["output_latents"]))
    for k in out_s:
        if k.startswith("pred_"):
            np.testing.assert_array_equal(np.asarray(out_s[k]),
                                          np.asarray(out_f[k]))


def test_merged_cross_block_kernel_matches_xla():
    """fused_cross_block_cached (interpret mode) == the 3 separate
    cached-context cross attentions + ca_mix (the XLA twins)."""
    from raggesture_tpu.models.denoiser import COND_KEYS
    from raggesture_tpu.models.fused_denoiser import (
        _dense,
        cross_attention_cached_xla,
        precompute_cross_contexts,
        stacked_adaln,
    )
    from raggesture_tpu.ops.pallas.linear_attention_kernel import (
        fused_cross_block_cached,
    )

    cfg, den, params, (x, t, mask, word, audio, spk) = _setup()
    B, T = x.shape[:2]
    conds = den.apply(params, word, audio, spk, method=den.encode_conditions)
    qm = parity_query_masks(cfg, B)
    cm = jnp.ones((B, 1, 1))
    p = params["params"]
    ctx = precompute_cross_contexts(p, cfg, conds, cm)
    emb = jnp.asarray(np.random.RandomState(8).randn(
        B, cfg.time_embed_dim), jnp.float32)
    adaln = stacked_adaln(p, emb, cfg.num_layers)
    blk = p["block_0"]

    # XLA reference: 3 separate cached cross attentions + mix
    outs = [cross_attention_cached_xla(
        blk[f"ca_{k}"], x, ctx[(0, k)], adaln[(0, k)][0], adaln[(0, k)][1],
        qm[k], cfg.num_heads) for k in COND_KEYS]
    ref = _dense(jnp.concatenate(outs, axis=-1), blk["ca_mix"])

    out = fused_cross_block_cached(
        x,
        jnp.stack([ctx[(0, k)] for k in COND_KEYS], axis=1),
        jnp.stack([qm[k].reshape(B, T) for k in COND_KEYS], axis=-1),
        jnp.stack([adaln[(0, k)][0] for k in COND_KEYS], axis=1),
        jnp.stack([adaln[(0, k)][1] for k in COND_KEYS], axis=1),
        tuple(blk[f"ca_{k}"] for k in COND_KEYS),
        blk["ca_mix"], num_heads=cfg.num_heads, interpret=True)
    valid = np.asarray(qm["xf_text"]) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               atol=5e-5)


def test_fused_paths_with_distinct_ca_heads():
    """ca_block_cfg override: cross-attention with its own head count stays
    numerically identical between the module and the fused/cached paths."""
    from raggesture_tpu.models.fused_denoiser import (
        fused_denoise,
        fused_denoise_ctx,
        precompute_cross_contexts,
    )

    cfg, den, params, (x, t, mask, word, audio, spk) = _setup()
    import dataclasses

    cfg2 = dataclasses.replace(cfg, ca_num_heads=2)  # sa stays 4
    den2 = GestureDenoiser(cfg2)
    B = x.shape[0]
    conds = den2.apply(params, word, audio, spk, method=den2.encode_conditions)
    qm = parity_query_masks(cfg2, B)
    cm = jnp.ones((B, 1, 1))
    ref = den2.apply(params, x, t, mask, conds, qm, cm)
    out = fused_denoise(params, cfg2, x, t, mask, conds, qm, cm,
                        use_pallas=False)
    ctx = precompute_cross_contexts(params["params"], cfg2, conds, cm)
    out2 = fused_denoise_ctx(params, cfg2, x, t, mask, ctx, qm,
                             use_pallas=False)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out2)[valid],
                               np.asarray(ref)[valid], atol=3e-5)
    # different head counts do change the function (sanity that the knob is
    # not a no-op): compare against the ca_heads=4 output
    ref4 = den.apply(params, x, t, mask, conds, qm, cm)
    assert float(np.abs(np.asarray(ref - ref4))[valid].max()) > 1e-4


def test_fused_decoder_layer_kernel_matches_xla():
    """fused_decoder_layer (one kernel per layer, batch folded into rows,
    interpret mode) == sa + 3 cached CAs + ca_mix + FFN via the XLA twins."""
    from raggesture_tpu.models.denoiser import COND_KEYS
    from raggesture_tpu.models.fused_denoiser import (
        STYL_SLOTS,
        _dense,
        cross_attention_cached_xla,
        ffn,
        precompute_cross_contexts,
        self_attention_xla,
    )
    from raggesture_tpu.ops.pallas.linear_attention_kernel import (
        fused_decoder_layer,
        pack_decoder_layer,
    )

    cfg, den, params, (x, t, mask, word, audio, spk) = _setup()
    B, T, D = x.shape
    conds = den.apply(params, word, audio, spk, method=den.encode_conditions)
    qm = parity_query_masks(cfg, B)
    cm = jnp.ones((B, 1, 1))
    p = params["params"]
    ctx = precompute_cross_contexts(p, cfg, conds, cm)
    # batch-uniform adaLN (the layer kernel's contract: shared t per step)
    emb = jnp.broadcast_to(
        jnp.asarray(np.random.RandomState(9).randn(1, cfg.time_embed_dim),
                    jnp.float32), (B, cfg.time_embed_dim))
    adaln = stacked_adaln(p, emb, cfg.num_layers)
    blk = p["block_0"]
    src_mask = mask[..., None]

    h1 = self_attention_xla(blk["sa_block"], x, src_mask,
                            *adaln[(0, "sa")], cfg.num_heads)
    outs = [cross_attention_cached_xla(
        blk[f"ca_{k}"], h1, ctx[(0, k)], *adaln[(0, k)], qm[k], cfg.ca_heads)
        for k in COND_KEYS]
    h2 = _dense(jnp.concatenate(outs, axis=-1), blk["ca_mix"])
    ref = ffn(blk["ffn"], h2, *adaln[(0, "ffn")])

    Tp = -(-T // 8) * 8
    pad = Tp - T
    rows = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0))).reshape(
        B * Tp, a.shape[-1])
    qm3 = jnp.stack([qm[k] for k in COND_KEYS], axis=-1)
    packed = pack_decoder_layer(blk, bf16=False)
    out = fused_decoder_layer(
        rows(x), rows(src_mask), rows(qm3),
        jnp.stack([adaln[(0, s)][0][0] for s in STYL_SLOTS]),
        jnp.stack([adaln[(0, s)][1][0] for s in STYL_SLOTS]),
        jnp.stack([ctx[(0, k)] for k in COND_KEYS], axis=1), packed,
        num_heads=cfg.num_heads, ca_heads=cfg.ca_heads, batch=B,
        interpret=True)
    out = out.reshape(B, Tp, D)[:, :T]
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               atol=3e-5)

    # grouped context path (ctx_groups=N forces N diagonal groups; auto
    # needs D % 128 == 0, unreachable at this test size): the eliminated
    # blocks are exact zeros, so grouped == dense up to accumulation-order
    # ulps (the shorter contraction splits nonzeros across the dot
    # emitter's accumulator lanes differently; measured <=5e-7)
    out_dense = fused_decoder_layer(
        rows(x), rows(src_mask), rows(qm3),
        jnp.stack([adaln[(0, s)][0][0] for s in STYL_SLOTS]),
        jnp.stack([adaln[(0, s)][1][0] for s in STYL_SLOTS]),
        jnp.stack([ctx[(0, k)] for k in COND_KEYS], axis=1), packed,
        num_heads=cfg.num_heads, ca_heads=cfg.ca_heads, batch=B,
        interpret=True, ctx_groups=1)
    for ng in (2, 4):
        out_g = fused_decoder_layer(
            rows(x), rows(src_mask), rows(qm3),
            jnp.stack([adaln[(0, s)][0][0] for s in STYL_SLOTS]),
            jnp.stack([adaln[(0, s)][1][0] for s in STYL_SLOTS]),
            jnp.stack([ctx[(0, k)] for k in COND_KEYS], axis=1), packed,
            num_heads=cfg.num_heads, ca_heads=cfg.ca_heads, batch=B,
            interpret=True, ctx_groups=ng)
        np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_dense),
                                   atol=2e-6, err_msg=f"ctx_groups={ng}")

    # LN-fold A/B (measured-neutral experiment, default OFF): a
    # fold_ln=True pack through the ln_folded kernel must match the
    # default unfolded path to reassociation ulps ((c*g+b)@W vs
    # c@(gW) + b@W differ only in fp grouping)
    packed_f = pack_decoder_layer(blk, bf16=False, fold_ln=True)
    out_f = fused_decoder_layer(
        rows(x), rows(src_mask), rows(qm3),
        jnp.stack([adaln[(0, s)][0][0] for s in STYL_SLOTS]),
        jnp.stack([adaln[(0, s)][1][0] for s in STYL_SLOTS]),
        jnp.stack([ctx[(0, k)] for k in COND_KEYS], axis=1), packed_f,
        num_heads=cfg.num_heads, ca_heads=cfg.ca_heads, batch=B,
        interpret=True, ln_folded=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_dense),
                               atol=1e-5)


def test_fused_decoder_layer_kernel_grid_over_pairs():
    """B=4 (grid of two batch pairs, streamed contexts) == two independent
    B=2 kernel calls."""
    from raggesture_tpu.models.denoiser import COND_KEYS
    from raggesture_tpu.models.fused_denoiser import (
        STYL_SLOTS,
        precompute_cross_contexts,
    )
    from raggesture_tpu.ops.pallas.linear_attention_kernel import (
        fused_decoder_layer,
        pack_decoder_layer,
    )

    cfg, den, params, (x, t, mask, word, audio, spk) = _setup()
    B, T, D = x.shape
    conds = den.apply(params, word, audio, spk, method=den.encode_conditions)
    qm = parity_query_masks(cfg, B)
    p = params["params"]
    ctx = precompute_cross_contexts(p, cfg, conds, jnp.ones((B, 1, 1)))
    emb = jnp.broadcast_to(
        jnp.asarray(np.random.RandomState(9).randn(1, cfg.time_embed_dim),
                    jnp.float32), (B, cfg.time_embed_dim))
    adaln = stacked_adaln(p, emb, cfg.num_layers)
    blk = p["block_0"]
    src_mask = mask[..., None]
    Tp = -(-T // 8) * 8
    pad = Tp - T
    rows = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0))).reshape(
        a.shape[0] * Tp, a.shape[-1])
    qm3 = jnp.stack([qm[k] for k in COND_KEYS], axis=-1)
    ctx3 = jnp.stack([ctx[(0, k)] for k in COND_KEYS], axis=1)
    scale5 = jnp.stack([adaln[(0, s)][0][0] for s in STYL_SLOTS])
    shift5 = jnp.stack([adaln[(0, s)][1][0] for s in STYL_SLOTS])

    packed_w = pack_decoder_layer(blk, bf16=False)
    out2 = fused_decoder_layer(
        rows(x), rows(src_mask), rows(qm3), scale5, shift5, ctx3, packed_w,
        num_heads=cfg.num_heads, ca_heads=cfg.ca_heads, batch=B,
        interpret=True)

    # second pair: reversed batch order so the streamed contexts differ
    x4 = jnp.concatenate([x, x[::-1]], axis=0)
    sm4 = jnp.concatenate([src_mask, src_mask[::-1]], axis=0)
    qm4 = jnp.concatenate([qm3, qm3[::-1]], axis=0)
    ctx34 = jnp.concatenate([ctx3, ctx3[::-1]], axis=0)
    out4 = fused_decoder_layer(
        rows(x4), rows(sm4), rows(qm4), scale5, shift5, ctx34, packed_w,
        num_heads=cfg.num_heads, ca_heads=cfg.ca_heads, batch=2 * B,
        interpret=True)

    o2 = np.asarray(out2).reshape(B, Tp, D)
    o4 = np.asarray(out4).reshape(2 * B, Tp, D)
    np.testing.assert_allclose(o4[:B], o2, atol=1e-6)
    np.testing.assert_allclose(o4[B:], o2[::-1], atol=1e-6)


def test_fused_decoder_layer_kernel_bf16_and_distinct_ca_heads():
    """The production configuration of the layer kernel — bf16 operand
    packing and a distinct cross-attention head count — against the XLA
    twins (bf16 rounding bounds the tolerance)."""
    from raggesture_tpu.models.denoiser import COND_KEYS
    from raggesture_tpu.models.fused_denoiser import (
        STYL_SLOTS,
        _dense,
        cross_attention_cached_xla,
        ffn,
        precompute_cross_contexts,
        self_attention_xla,
    )
    from raggesture_tpu.ops.pallas.linear_attention_kernel import (
        fused_decoder_layer,
        pack_decoder_layer,
    )

    cfg, den, params, (x, t, mask, word, audio, spk) = _setup()
    cfg = cfg.__class__(**{**cfg.__dict__, "ca_num_heads": 2})
    assert cfg.ca_heads == 2 and cfg.num_heads == 4
    B, T, D = x.shape
    conds = den.apply(params, word, audio, spk, method=den.encode_conditions)
    qm = parity_query_masks(cfg, B)
    p = params["params"]
    ctx = precompute_cross_contexts(p, cfg, conds, jnp.ones((B, 1, 1)))
    emb = jnp.broadcast_to(
        jnp.asarray(np.random.RandomState(9).randn(1, cfg.time_embed_dim),
                    jnp.float32), (B, cfg.time_embed_dim))
    adaln = stacked_adaln(p, emb, cfg.num_layers)
    blk = p["block_0"]
    src_mask = mask[..., None]

    h1 = self_attention_xla(blk["sa_block"], x, src_mask,
                            *adaln[(0, "sa")], cfg.num_heads)
    outs = [cross_attention_cached_xla(
        blk[f"ca_{k}"], h1, ctx[(0, k)], *adaln[(0, k)], qm[k], cfg.ca_heads)
        for k in COND_KEYS]
    h2 = _dense(jnp.concatenate(outs, axis=-1), blk["ca_mix"])
    ref = ffn(blk["ffn"], h2, *adaln[(0, "ffn")])

    Tp = -(-T // 8) * 8
    pad = Tp - T
    rows = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0))).reshape(
        B * Tp, a.shape[-1])
    qm3 = jnp.stack([qm[k] for k in COND_KEYS], axis=-1)
    ctx3 = jnp.stack([ctx[(0, k)] for k in COND_KEYS], axis=1)
    scale5 = jnp.stack([adaln[(0, s)][0][0] for s in STYL_SLOTS])
    shift5 = jnp.stack([adaln[(0, s)][1][0] for s in STYL_SLOTS])

    for bf16, atol in ((False, 3e-5), (True, 5e-2)):
        packed = pack_decoder_layer(blk, bf16=bf16)
        out = fused_decoder_layer(
            rows(x), rows(src_mask), rows(qm3), scale5, shift5,
            ctx3.astype(jnp.bfloat16 if bf16 else jnp.float32), packed,
            num_heads=cfg.num_heads, ca_heads=cfg.ca_heads, batch=B,
            interpret=True)
        out = np.asarray(out).reshape(B, Tp, D)[:, :T]
        valid = np.asarray(mask) > 0
        np.testing.assert_allclose(out[valid], np.asarray(ref)[valid],
                                   atol=atol)


def test_fused_decoder_layer_kernel_fully_masked_pair_partner():
    """A fully-padded clip paired with a valid one stays finite (the
    per-segment time-softmax max; a global max would underflow the padded
    segment to 0/0 NaN)."""
    from raggesture_tpu.models.denoiser import COND_KEYS
    from raggesture_tpu.models.fused_denoiser import (
        STYL_SLOTS,
        precompute_cross_contexts,
    )
    from raggesture_tpu.ops.pallas.linear_attention_kernel import (
        fused_decoder_layer,
        pack_decoder_layer,
    )

    cfg, den, params, (x, t, mask, word, audio, spk) = _setup()
    B, T, D = x.shape
    conds = den.apply(params, word, audio, spk, method=den.encode_conditions)
    qm = parity_query_masks(cfg, B)
    p = params["params"]
    ctx = precompute_cross_contexts(p, cfg, conds, jnp.ones((B, 1, 1)))
    emb = jnp.broadcast_to(
        jnp.asarray(np.random.RandomState(9).randn(1, cfg.time_embed_dim),
                    jnp.float32), (B, cfg.time_embed_dim))
    adaln = stacked_adaln(p, emb, cfg.num_layers)
    blk = p["block_0"]
    # batch element 1 entirely padded
    mask0 = jnp.asarray(np.asarray(mask) * np.asarray([[1.0], [0.0]]))
    src_mask = mask0[..., None]
    Tp = -(-T // 8) * 8
    pad = Tp - T
    rows = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0))).reshape(
        B * Tp, a.shape[-1])
    qm3 = jnp.stack([qm[k] for k in COND_KEYS], axis=-1)
    packed = pack_decoder_layer(blk, bf16=False)
    out = fused_decoder_layer(
        rows(x), rows(src_mask), rows(qm3),
        jnp.stack([adaln[(0, s)][0][0] for s in STYL_SLOTS]),
        jnp.stack([adaln[(0, s)][1][0] for s in STYL_SLOTS]),
        jnp.stack([ctx[(0, k)] for k in COND_KEYS], axis=1), packed,
        num_heads=cfg.num_heads, ca_heads=cfg.ca_heads, batch=B,
        interpret=True)
    out = np.asarray(out).reshape(B, Tp, D)[:, :T]
    valid = np.asarray(mask0) > 0
    assert np.isfinite(out[valid]).all()


def test_default_query_masks_replicate_reference_quirk_indices():
    """PRODUCTION query masks zero [L, 2L, 3L] — the reference's
    off-by-part-offset 'separator' indices (diffusion_architecture.py:156),
    NOT the true layout separators [L, 2L+1, 3L+2].  The released
    checkpoints were trained with this quirk."""
    cfg = DenoiserConfig()
    m = np.asarray(default_query_masks(cfg, 1)["xf_text"])[0]
    L = cfg.tokens_per_part
    zeros = np.where(m == 0)[0].tolist()
    assert zeros == [L, 2 * L, 3 * L] == [10, 20, 30]
    assert list(cfg.sep_indices) == [10, 21, 32]  # true separators differ
