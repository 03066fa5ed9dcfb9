"""Fused all-layer condition-context kernels (ops/pallas/cond_ctx_kernel)
and the train_denoise_ctx training forward built on them.

Parity chain: Pallas kernels (interpret mode) == jnp reference == the
flax GestureDenoiser path, for values AND gradients — the training step
may only get faster, never different (reference semantics:
/root/reference/mogen/models/attentions/efficient_attention.py:48-102)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raggesture_tpu.datasets.fixtures import tiny_arch_config, tiny_batch
from raggesture_tpu.models.architecture import (
    MotionDiffusionModel,
    default_query_masks,
    init_params,
    training_loss,
)
from raggesture_tpu.models.fused_denoiser import train_denoise_ctx
from raggesture_tpu.ops.pallas.cond_ctx_kernel import (
    cond_contexts,
    group_shape,
)


def _inputs(key, B=2, N=13, D=64, L=3, heads=8, dtype=jnp.float32):
    ks = jax.random.split(key, 9)
    s = 0.3
    xf = jax.random.normal(ks[0], (B, N, D)) * s
    cm = (jax.random.uniform(ks[1], (B, 1, 1)) > 0.3).astype(jnp.float32)
    params = (
        1.0 + jax.random.normal(ks[2], (L, D)) * 0.1,   # ln_g
        jax.random.normal(ks[3], (L, D)) * 0.1,          # ln_b
        (jax.random.normal(ks[4], (L, D, D)) * s).astype(dtype),  # wk
        jax.random.normal(ks[5], (L, D)) * 0.1,          # bk
        (jax.random.normal(ks[6], (L, D, D)) * s).astype(dtype),  # wv
        jax.random.normal(ks[7], (L, D)) * 0.1,          # bv
    )
    return xf, cm, params


@pytest.mark.parametrize("D,heads", [(64, 8), (256, 8)])
def test_kernel_fwd_matches_reference(D, heads):
    """Interpret-mode Pallas forward == jnp reference (incl. the grouped
    (G=2, S=128) layout at D=256) with f32 weights."""
    xf, cm, params = _inputs(jax.random.PRNGKey(0), D=D, heads=heads)
    ref = cond_contexts(xf, cm, *params, num_heads=heads, use_kernel=False)
    ker = cond_contexts(xf, cm, *params, num_heads=heads, use_kernel=True,
                        interpret=True)
    G, S = group_shape(D, heads)
    assert ref.shape == ker.shape == (2, 3, G, S, S)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("D,heads", [(64, 8), (256, 8)])
def test_kernel_grads_match_reference(D, heads):
    """Analytic backward kernels == autodiff of the jnp reference for
    every differentiable input (xf, ln affines, K/V weights + biases)."""
    xf, cm, params = _inputs(jax.random.PRNGKey(1), D=D, heads=heads)
    w = jax.random.normal(jax.random.PRNGKey(2),
                          (2, 3) + group_shape(D, heads) + ())
    G, S = group_shape(D, heads)
    w = jax.random.normal(jax.random.PRNGKey(2), (2, 3, G, S, S))

    def loss(use_kernel, xf, *params):
        ctx = cond_contexts(xf, cm, *params, num_heads=heads,
                            use_kernel=use_kernel, interpret=True)
        return jnp.sum(ctx * w)

    v_ref, g_ref = jax.value_and_grad(
        lambda *a: loss(False, *a), argnums=tuple(range(7)))(xf, *params)
    v_ker, g_ker = jax.value_and_grad(
        lambda *a: loss(True, *a), argnums=tuple(range(7)))(xf, *params)
    np.testing.assert_allclose(float(v_ker), float(v_ref), rtol=1e-5)
    names = ("xf", "ln_g", "ln_b", "wk", "bk", "wv", "bv")
    for name, a, b in zip(names, g_ker, g_ref):
        # grouped-vs-dense contraction order shifts f32 accumulation;
        # tolerance covers the few-ulp tail on O(100) grads
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}")


def test_cond_mask_zero_matches_reference():
    """Fully dropped conditions (cm=0) follow the reference's uniform-
    softmax semantics in both value and gradient."""
    xf, _, params = _inputs(jax.random.PRNGKey(3))
    cm = jnp.zeros((2, 1, 1))

    def loss(use_kernel, xf):
        ctx = cond_contexts(xf, cm, *params, num_heads=8,
                            use_kernel=use_kernel, interpret=True)
        return jnp.sum(ctx ** 2)

    v_r, g_r = jax.value_and_grad(lambda a: loss(False, a))(xf)
    v_k, g_k = jax.value_and_grad(lambda a: loss(True, a))(xf)
    np.testing.assert_allclose(float(v_k), float(v_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=5e-4, atol=1e-6)


def _tiny_model():
    cfg = tiny_arch_config()
    model = MotionDiffusionModel(cfg)
    batch = tiny_batch(batch=2)
    params = init_params(model, jax.random.PRNGKey(0), batch)
    return cfg, model, batch, params


def test_train_denoise_ctx_matches_flax():
    """The restructured training forward == GestureDenoiser.__call__."""
    cfg, model, batch, params = _tiny_model()
    dn = cfg.denoiser
    B = 2
    T = dn.num_tokens
    r = jax.random.PRNGKey(7)
    x_t = jax.random.normal(r, (B, T, dn.latent_dim))
    t = jnp.asarray([3, 77])
    mask = jnp.ones((B, T))
    conds = model.apply(params, batch, method=model.encode_conditions)
    qm = default_query_masks(dn, B)
    cond_mask = jnp.asarray([1.0, 0.0]).reshape(B, 1, 1)

    ref = model.apply(params, x_t, t, mask, conds, qm, cond_mask, True,
                      method=model.denoise)
    out = train_denoise_ctx(params, dn, x_t, t, mask, conds, qm, cond_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_training_loss_fused_ctx_grads_match():
    """training_loss(fused_ctx=True) == the flax path: loss and full
    parameter gradients (the quantity the optimizer consumes)."""
    cfg, model, batch, params = _tiny_model()
    sched = cfg.diffusion_train.schedule()
    rng = jax.random.PRNGKey(11)

    def run(fused):
        def loss_fn(p):
            l, _ = training_loss(model, p, sched, batch, rng,
                                 fused_ctx=fused)
            return l
        return jax.value_and_grad(loss_fn)(params)

    v0, g0 = run(False)
    v1, g1 = run(True)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
