"""Head-grouped linear-attention contraction vs the reference einsum pair.

The TPU training path packs heads into 128-lane groups
(ops/linear_attention.py::grouped_linear_attention); the masked group
context must reproduce the per-head contractions exactly.  CPU tests force
the group path via the ``g`` override (the auto path groups on TPU only).
"""

import jax
import jax.numpy as jnp
import numpy as np

from raggesture_tpu.ops.linear_attention import (
    grouped_linear_attention,
    group_size,
    linear_attention,
)


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


def test_grouped_matches_per_head():
    B, T, N, H, Dh = 2, 43, 499, 16, 32
    D = H * Dh
    q = jax.nn.softmax(_rand((B, T, H, Dh), 0), axis=-1)
    k = jax.nn.softmax(_rand((B, N, D), 1), axis=1)
    v = _rand((B, N, D), 2)
    ref = linear_attention(q, k.reshape(B, N, H, Dh), v.reshape(B, N, H, Dh))
    for g in (2, 4):
        out = grouped_linear_attention(q, k, v, H, g=g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
    # g=1 falls back to the reference einsums bit-for-bit
    out1 = grouped_linear_attention(q, k, v, H, g=1)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref))


def test_grouped_gradients_match():
    """The training step differentiates through the contraction pair."""
    B, T, N, H, Dh = 1, 8, 64, 8, 16
    D = H * Dh
    q = jax.nn.softmax(_rand((B, T, H, Dh), 3), axis=-1)
    k = jax.nn.softmax(_rand((B, N, D), 4), axis=1)
    v = _rand((B, N, D), 5)

    def loss(fn):
        return lambda kk, vv: (fn(kk, vv) ** 2).sum()

    ref_fn = loss(lambda kk, vv: linear_attention(
        q, kk.reshape(B, N, H, Dh), vv.reshape(B, N, H, Dh)))
    grp_fn = loss(lambda kk, vv: grouped_linear_attention(q, kk, vv, H, g=8))
    gr_k, gr_v = jax.grad(ref_fn, argnums=(0, 1))(k, v)
    gg_k, gg_v = jax.grad(grp_fn, argnums=(0, 1))(k, v)
    np.testing.assert_allclose(np.asarray(gg_k), np.asarray(gr_k),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg_v), np.asarray(gr_v),
                               rtol=1e-4, atol=1e-5)


def test_group_size_rules():
    assert group_size(16, 32) == 4
    assert group_size(64, 8) == 16
    assert group_size(16, 128) == 1   # head fills the tile
    assert group_size(16, 48) == 1    # 128 % 48 != 0
    assert group_size(6, 32) == 1     # H % g != 0


def test_grouped_cross_context_matches():
    """fused_denoiser.cross_context groups the same way; the (D, D)
    block-diagonal result must be unchanged."""
    from raggesture_tpu.models.fused_denoiser import cross_context

    B, N, D, H = 2, 37, 128, 4
    rng = np.random.RandomState(7)
    p_ca = {
        "text_norm": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "query": {"kernel": _rand((D, D), 8), "bias": jnp.zeros((D,))},
        "key": {"kernel": _rand((D, D), 9), "bias": jnp.zeros((D,))},
        "value": {"kernel": _rand((D, D), 10), "bias": jnp.zeros((D,))},
    }
    xf = _rand((B, N, D), 11)
    full = np.asarray(cross_context(p_ca, xf, None, H))
    # reference: per-head blocks on the diagonal, zeros elsewhere
    Dh = D // H  # 32 -> auto group size on TPU would be 128/32 = 4
    from raggesture_tpu.models.fused_denoiser import _dense, _ln
    from raggesture_tpu.ops.linear_attention import time_softmax_k
    xfn = _ln(xf, p_ca["text_norm"])
    k = time_softmax_k(_dense(xfn, p_ca["key"])).reshape(B, N, H, Dh)
    v = _dense(xfn, p_ca["value"]).reshape(B, N, H, Dh)
    ctx = np.asarray(jnp.einsum("bnhd,bnhl->bhdl", k, v))
    want = np.zeros((B, D, D), np.float32)
    for h in range(H):
        want[:, h * Dh:(h + 1) * Dh, h * Dh:(h + 1) * Dh] = ctx[:, h]
    np.testing.assert_allclose(full, want, rtol=1e-5, atol=1e-6)
    # force the GROUPED stack/eye construction (g > 1) on CPU — the auto
    # path only groups on TPU, so a regression there would otherwise
    # surface only on the shared TPU host (g=2: two 64-lane groups;
    # g=4: one 128-lane group spanning all heads)
    for g in (2, 4):
        grouped = np.asarray(cross_context(p_ca, xf, None, H, g=g))
        np.testing.assert_allclose(grouped, want, rtol=1e-5, atol=1e-6)
    # with a condition mask (the masked-k / masked-v branch) too
    cm = jnp.ones((B, 1, 1), jnp.float32)
    ref_m = np.asarray(cross_context(p_ca, xf, cm, H, g=1))
    for g in (2, 4):
        grouped = np.asarray(cross_context(p_ca, xf, cm, H, g=g))
        np.testing.assert_allclose(grouped, ref_m, rtol=1e-5, atol=1e-6)
