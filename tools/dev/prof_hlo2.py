import jax, jax.numpy as jnp
from raggesture_tpu.utils.env import setup_compilation_cache
setup_compilation_cache()
from raggesture_tpu.datasets.fixtures import full_arch_config, synthetic_batch
from raggesture_tpu.models.architecture import MotionDiffusionModel, init_params
from raggesture_tpu.train.loop import (OptimConfig, create_train_state, make_multi_train_step)

cfg = full_arch_config()
model = MotionDiffusionModel(cfg)
batch = synthetic_batch(seed=0, batch=1, frames=cfg.codec.num_frames, audio_frames=499)
params = init_params(model, jax.random.PRNGKey(0), batch)
tb = synthetic_batch(seed=1, batch=128, frames=cfg.codec.num_frames, audio_frames=499)
mu, logvar = jax.jit(lambda p, b: model.apply(p, b, method=model.encode_motion_dist))(params, tb)
cached_tb = {k: v for k, v in tb.items()
             if k not in ("motion_upper", "motion_lower", "motion_face",
                          "motion_hands", "trans", "facial", "contact")}
cached_tb["latent_mu"] = mu
cached_tb["latent_logvar"] = logvar
state, tx = create_train_state(model, params, OptimConfig(total_steps=100))
K = 8
stc = jax.tree_util.tree_map(lambda v: jnp.broadcast_to(v[None], (K,) + v.shape), cached_tb)
multi = make_multi_train_step(model, tx, cfg.diffusion_train.schedule())
comp = jax.jit(multi, donate_argnums=(0,)).lower(state, stc, jax.random.PRNGKey(5)).compile()
open("/tmp/train_hlo.txt", "w").write(comp.as_text())
print("ok")
