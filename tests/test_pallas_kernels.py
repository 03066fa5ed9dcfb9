"""Pallas fused linear-attention kernel vs the XLA module path.

Runs in interpreter mode on CPU (the driver/bench exercises the compiled
path on the real chip)."""

import jax
import jax.numpy as jnp
import numpy as np

from raggesture_tpu.models.denoiser import EfficientSelfAttention
from raggesture_tpu.ops.pallas.linear_attention_kernel import (
    fused_self_attention,
)


def adaln_scale_shift(emb, styl_params):
    """Test helper: one StylizationBlock's (scale, shift) from the time
    embedding (stylization_block.py:30-36) — production code batches all 40
    projections through fused_denoiser.adaln_table instead."""
    e = jax.nn.silu(emb)
    out = e @ jnp.asarray(styl_params["emb_layer"]["kernel"]) + jnp.asarray(
        styl_params["emb_layer"]["bias"])
    return jnp.split(out, 2, axis=-1)


def test_fused_self_attention_matches_xla():
    B, T, D, H, E = 2, 43, 512, 16, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32) * 0.5
    emb = jnp.asarray(rng.randn(B, E), jnp.float32)
    mask = np.ones((B, T, 1), np.float32)
    mask[:, [10, 21, 32]] = 0.0  # separators
    mask[1, 40:] = 0.0           # ragged tail
    mask = jnp.asarray(mask)

    mod = EfficientSelfAttention(D, H, 0.0)
    params = mod.init(jax.random.PRNGKey(1), x, mask, emb)
    # randomize the zero-init projections so the epilogue is exercised
    p = jax.tree_util.tree_map(lambda a: a, params)["params"]
    key = jax.random.PRNGKey(2)
    p["proj_out"]["out_proj"]["kernel"] = 0.02 * jax.random.normal(
        key, p["proj_out"]["out_proj"]["kernel"].shape)
    params = {"params": p}

    ref = mod.apply(params, x, mask, emb)

    scale, shift = adaln_scale_shift(emb, p["proj_out"])
    out = fused_self_attention(x, mask, scale, shift, p, num_heads=H,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_self_attention_padding_independence():
    """T=43 pads to 48 internally; masked rows must not leak into output."""
    B, T, D, H, E = 1, 43, 512, 16, 64
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    emb = jnp.asarray(rng.randn(B, E), jnp.float32)
    mask = jnp.ones((B, T, 1), jnp.float32)

    mod = EfficientSelfAttention(D, H, 0.0)
    params = mod.init(jax.random.PRNGKey(0), x, mask, emb)["params"]
    scale, shift = adaln_scale_shift(emb, params["proj_out"])

    out = fused_self_attention(x, mask, scale, shift, params, num_heads=H,
                               interpret=True)
    assert out.shape == (B, T, D)
    # garbage in the padded region must not change valid outputs
    x2 = jnp.concatenate([x, 100.0 + jnp.zeros((B, 5, D))], axis=1)
    m2 = jnp.concatenate([mask, jnp.zeros((B, 5, 1))], axis=1)
    out2 = fused_self_attention(x2, m2, scale, shift, params, num_heads=H,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out2[:, :T]), np.asarray(out),
                               atol=1e-5)


def test_fused_cross_attention_matches_xla():
    from raggesture_tpu.models.denoiser import EfficientCrossAttention
    from raggesture_tpu.ops.pallas.linear_attention_kernel import (
        fused_cross_attention,
    )

    B, T, N, D, H, E = 2, 43, 37, 512, 16, 128
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32) * 0.5
    xf = jnp.asarray(rng.randn(B, N, D), jnp.float32) * 0.5
    emb = jnp.asarray(rng.randn(B, E), jnp.float32)
    qm = np.ones((B, T), np.float32)
    qm[:, [10, 21, 32]] = 0.0
    qm = jnp.asarray(qm)
    cm = jnp.ones((B, 1, 1))

    mod = EfficientCrossAttention(D, H, 0.0)
    params = mod.init(jax.random.PRNGKey(6), x, xf, emb, query_mask=qm,
                      cond_mask=cm)["params"]
    params["proj_out"]["out_proj"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(7), (D, D))

    ref = mod.apply({"params": params}, x, xf, emb, query_mask=qm,
                    cond_mask=cm)
    scale, shift = adaln_scale_shift(emb, params["proj_out"])
    out = fused_cross_attention(x, xf, qm[..., None], cm, scale, shift,
                                params, num_heads=H, interpret=True)
    # valid (non-separator) tokens only: the -1e6 query-mask quirk makes
    # separator rows catastrophically cancel (framework-dependent noise)
    valid = np.asarray(qm) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               atol=2e-5)
    # condition dropout (cm=0): both paths agree on valid tokens too
    cm0 = jnp.zeros((B, 1, 1))
    ref0 = mod.apply({"params": params}, x, xf, emb, query_mask=qm,
                     cond_mask=cm0)
    out0 = fused_cross_attention(x, xf, qm[..., None], cm0, scale, shift,
                                 params, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out0)[valid],
                               np.asarray(ref0)[valid], atol=2e-5)


def test_fused_ffn_matches_xla():
    from raggesture_tpu.models.layers import FFN
    from raggesture_tpu.ops.pallas.linear_attention_kernel import fused_ffn

    B, T, D, E = 2, 43, 512, 96
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32) * 0.5
    emb = jnp.asarray(rng.randn(B, E), jnp.float32)
    mod = FFN(D, 1024, 0.0)
    params = mod.init(jax.random.PRNGKey(3), x, emb)["params"]
    params["proj_out"]["out_proj"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(4), (D, D))
    params["linear2"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(5), (1024, D))
    ref = mod.apply({"params": params}, x, emb)
    scale, shift = adaln_scale_shift(emb, params["proj_out"])
    out = fused_ffn(x, scale, shift, params, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_softmax_mha_matches_xla():
    """Flash-style codec MHA kernel vs the einsum path, at the decoder's
    many-tiny-head shapes (32 heads of Dh=16; 64 of Dh=8 for lowertrans)."""
    from raggesture_tpu.ops.pallas.mha_kernel import (
        fused_softmax_mha, supported, xla_mha)

    rng = np.random.RandomState(11)
    for B, Tq, Tk, D, H in [(2, 160, 160, 512, 32), (2, 160, 160, 512, 64),
                            (1, 24, 16, 64, 4)]:
        q = jnp.asarray(rng.randn(B, Tq, D), jnp.float32)
        k = jnp.asarray(rng.randn(B, Tk, D), jnp.float32)
        v = jnp.asarray(rng.randn(B, Tk, D), jnp.float32)
        scale = 1.0 / np.sqrt(D // H)
        assert supported(q, k, H)
        ref = xla_mha(q, k, v, H, scale)
        out = fused_softmax_mha(q, k, v, H, scale, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
    # ineligible shapes fall back in TorchMHA: rows/heads not 8-aligned
    assert not supported(jnp.zeros((1, 17, 512)), jnp.zeros((1, 17, 512)), 32)
    assert not supported(jnp.zeros((1, 16, 512)), jnp.zeros((1, 16, 512)), 7)


def test_fused_softmax_mha_vmap_and_grad():
    """The stacked 3-part codec decode vmaps TorchMHA; a dropout-free VAE
    training step may differentiate through the kernel (custom_vjp routes
    the backward through the einsum math)."""
    from raggesture_tpu.ops.pallas.mha_kernel import fused_softmax_mha, xla_mha

    rng = np.random.RandomState(12)
    q = jnp.asarray(rng.randn(3, 2, 32, 64), jnp.float32)
    k = jnp.asarray(rng.randn(3, 2, 24, 64), jnp.float32)
    v = jnp.asarray(rng.randn(3, 2, 24, 64), jnp.float32)
    H, scale = 8, 1.0 / np.sqrt(8)
    out = jax.vmap(lambda a, b, c: fused_softmax_mha(a, b, c, H, scale,
                                                     True))(q, k, v)
    ref = jax.vmap(lambda a, b, c: xla_mha(a, b, c, H, scale))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    gk = jax.grad(lambda a: fused_softmax_mha(a, k[0], v[0], H, scale,
                                              True).sum())(q[0])
    gx = jax.grad(lambda a: xla_mha(a, k[0], v[0], H, scale).sum())(q[0])
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=2e-5)
