"""VAE training path: losses decrease, base attentions run, VLB finite."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raggesture_tpu.datasets.fixtures import synthetic_batch
from raggesture_tpu.models.vae import TransformerVAE, VAEConfig
from raggesture_tpu.models.vae_architecture import (
    VAETrainConfig,
    kl_divergence,
    make_vae_train_step,
    part_batch_features,
    vae_training_loss,
)


def test_kl_divergence_zero_at_standard_normal():
    mu = jnp.zeros((4, 8))
    logvar = jnp.zeros((4, 8))
    assert float(kl_divergence(mu, logvar)) == 0.0
    assert float(kl_divergence(mu + 1.0, logvar)) > 0.0


def test_part_batch_features_shapes():
    b = synthetic_batch(seed=0, batch=2, frames=30)
    assert part_batch_features(b, "upper").shape == (2, 30, 78)
    assert part_batch_features(b, "hands").shape == (2, 30, 180)
    assert part_batch_features(b, "face").shape == (2, 30, 106)
    assert part_batch_features(b, "lowertrans").shape == (2, 30, 61)


def test_vae_train_step_decreases_loss():
    cfg = VAEConfig(nfeats=78, latent_dim=16, num_layers=2, num_heads=2,
                    ff_size=32, dropout=0.0, frame_chunk_size=15,
                    num_frames=30, pe_max_len=64)
    vae = TransformerVAE(cfg)
    batch = synthetic_batch(seed=0, batch=4, frames=30)
    feats = part_batch_features(batch, "upper")
    params = vae.init({"params": jax.random.PRNGKey(0),
                       "vae": jax.random.PRNGKey(1)},
                      feats[:1], sample=False, method=vae.encode_to_dist)
    dec = vae.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 2, 16)), method=vae.decode)
    merged = dict(dec["params"])
    merged.update(params["params"])
    params = {"params": merged}

    tcfg = VAETrainConfig(part="upper", kl_weight=1e-5)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_vae_train_step(vae, tx, tcfg, "upper"))
    rng = jax.random.PRNGKey(2)
    losses = []
    for i in range(8):
        params, opt_state, logs = step(params, opt_state, batch, rng,
                                       jnp.asarray(i))
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_base_attentions_run():
    from raggesture_tpu.models.base_attention import (
        BaseCrossAttention,
        BaseMixedAttention,
        BaseSelfAttention,
    )

    B, T, N, D, E = 2, 11, 5, 16, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    xf = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    emb = jnp.asarray(rng.randn(B, E), jnp.float32)
    mask = jnp.ones((B, T, 1))
    sa = BaseSelfAttention(D, 2, 0.0)
    p = sa.init(jax.random.PRNGKey(0), x, mask, emb)
    out = sa.apply(p, x, mask, emb)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    # masked keys don't contribute: zero out token 3's mask, perturb it
    m2 = mask.at[:, 3].set(0.0)
    o1 = sa.apply(p, x, m2, emb)
    o2 = sa.apply(p, x.at[:, 3].add(100.0), m2, emb)
    valid = np.ones(T, bool)
    valid[3] = False
    np.testing.assert_allclose(np.asarray(o1)[:, valid],
                               np.asarray(o2)[:, valid], atol=1e-4)

    ca = BaseCrossAttention(D, 2, 0.0)
    pc = ca.init(jax.random.PRNGKey(1), x, xf, emb,
                 cond_mask=jnp.ones((B, 1, 1)))
    oc = ca.apply(pc, x, xf, emb, cond_mask=jnp.ones((B, 1, 1)))
    assert oc.shape == x.shape

    ma = BaseMixedAttention(D, 2, 0.0)
    pm = ma.init(jax.random.PRNGKey(2), x, xf, emb, src_mask=mask,
                 cond_mask=jnp.ones((B, 1, 1)))
    om = ma.apply(pm, x, xf, emb, src_mask=mask,
                  cond_mask=jnp.ones((B, 1, 1)))
    assert om.shape == x.shape and np.isfinite(np.asarray(om)).all()


def test_vlb_bpd_loop():
    from raggesture_tpu.diffusion.schedules import make_schedule
    from raggesture_tpu.diffusion.vlb import calc_bpd_loop, prior_bpd

    sched = make_schedule("scaled_linear", 50, "2,2,2,2,2", 10)
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(2, 4, 8) * 0.3, jnp.float32)

    def model_fn(x, t_orig, step_idx):
        return 0.5 * x

    out = calc_bpd_loop(model_fn, sched, x0, jax.random.PRNGKey(0))
    assert out["total_bpd"].shape == (2,)
    assert out["vb"].shape == (sched.num_timesteps, 2)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    # prior bpd small for data with |x| << 1 (q(x_T|x_0) ~ N(0,1))
    pb = np.asarray(prior_bpd(sched, x0 * 0.01))
    assert (pb >= 0).all() and (pb < 1.0).all()
