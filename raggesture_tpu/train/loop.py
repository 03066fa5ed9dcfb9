"""Training: optax optimizer, frozen-codec partition, jitted+sharded step.

Replaces the reference's mmcv EpochBasedRunner + MMDistributedDataParallel +
hooks (/root/reference/mogen/apis/train.py:41-173, mogen/core/
model_freeze_hooks.py:13-44, mogen/core/optimizer/builder.py:8-52) with:

  - optax Adam (lr 1e-4) + cosine annealing to lr*1e-6 (the mmcv
    ``CosineAnnealing, min_lr_ratio=1e-6, by_epoch=False`` policy)
  - codec freezing as a *parameter partition*: the codec subtree gets
    ``optax.set_to_zero`` and ``stop_gradient`` on its outputs — no epoch
    hook needed, XLA dead-code-eliminates the frozen backward
  - one jitted train step over a data-parallel Mesh: batch sharded on the
    ``data`` axis, params replicated, gradient all-reduce inserted by XLA
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..diffusion.schedules import DiffusionSchedule
from ..models.architecture import MotionDiffusionModel, training_loss
from ..parallel.mesh import batch_sharding, make_mesh, replicated


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """configs/raggesture_beatx/basegesture_len150_beat.py:12-17."""

    lr: float = 1e-4
    min_lr_ratio: float = 1e-6
    total_steps: int = 100_000  # max_epochs * steps_per_epoch, set by caller
    grad_clip: Optional[float] = None
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    # bf16 mixed precision: forward/backward in bfloat16 with fp32 master
    # weights and fp32 optimizer state — the TPU-native equivalent of the
    # reference's optional Fp16OptimizerHook (mogen/apis/train.py:131-139);
    # no loss scaling needed (bf16 shares fp32's exponent range)
    bf16_compute: bool = False
    # ship the big condition features (audio 499x768, word 150x768 — the
    # dominant batch bytes) to the device as bfloat16: numerically free on
    # TPU (the MXU rounds f32 matmul operands to bf16 anyway — measured
    # bit-identical, docs/PERFORMANCE.md) but HALVES the per-step
    # host->device transfer that dominates wall time on remote-hosted
    # chips.  None = auto: on for the TPU backend, off elsewhere (CPU
    # matmuls are true f32, so the cast would change test numerics).
    bf16_conditions: Optional[bool] = None
    # frozen 4-part encode through the stacked 3+1-program path
    # (models/fused_codec.py) when training WITHOUT the latent cache —
    # same latent distribution, fewer small programs per step
    fused_codec: bool = False
    # denoiser forward through fused_denoiser.train_denoise_ctx: all-layer
    # cross-attention contexts in one fused pass per condition stream
    # (Pallas custom_vjp on TPU; the jnp reference elsewhere).  Same math
    # as the flax forward (tests/test_cond_ctx.py) — the round-5 fix for
    # the cond-K/V chains that dominate the train device step.  Default ON:
    # gradients match the flax path to f32 accumulation-order ulps.
    fused_ctx: bool = True


def param_labels(params) -> Any:
    """Label the codec subtree 'frozen', everything else 'trainable'."""

    def label(path, _):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return "frozen" if "codec" in names else "trainable"

    return jax.tree_util.tree_map_with_path(label, params)


def _make_tx(cfg: OptimConfig) -> optax.GradientTransformation:
    """One optimizer chain from an OptimConfig: cosine schedule (mmcv
    CosineAnnealing min_lr_ratio, by_epoch=False) + optional global-norm
    clip + adam/adamw — shared by make_optimizer and build_optimizers."""
    schedule = optax.cosine_decay_schedule(
        init_value=cfg.lr, decay_steps=cfg.total_steps,
        alpha=cfg.min_lr_ratio,
    )
    chain = []
    if cfg.grad_clip is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(optax.adamw(schedule, b1=cfg.b1, b2=cfg.b2,
                             weight_decay=cfg.weight_decay)
                 if cfg.weight_decay > 0 else
                 optax.adam(schedule, b1=cfg.b1, b2=cfg.b2))
    return optax.chain(*chain)


def make_optimizer(cfg: OptimConfig, params) -> optax.GradientTransformation:
    return optax.multi_transform(
        {"trainable": _make_tx(cfg), "frozen": optax.set_to_zero()},
        param_labels(params),
    )


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def create_train_state(model: MotionDiffusionModel, params,
                       optim_cfg: OptimConfig) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(optim_cfg, params)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def _cast_floats(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def make_train_step(model: MotionDiffusionModel, tx,
                    sched_train: DiffusionSchedule,
                    bf16_compute: bool = False,
                    with_timesteps: bool = False,
                    fused_codec: bool = False,
                    log_per_sample: bool = False,
                    fused_ctx: bool = False):
    """Build the pure train-step fn (jit/pjit-ready).

    ``bf16_compute``: params and batch are cast to bfloat16 for the
    forward/backward; the cast's vjp accumulates gradients back into the
    fp32 master params that the optimizer updates.

    ``with_timesteps``: the step takes (t, t_weights) drawn by an external
    schedule sampler (diffusion/samplers.py) and returns per-sample losses
    in the logs for the sampler's history update.

    ``log_per_sample``: keep the per-sample (pre-reduce) losses in the
    logs.  Per-sample values never cross the batch-axis all-reduce, so they
    are bit-identical across device topologies (1×8 vs 2×4 processes) where
    the reduced scalar legitimately differs by reduce-decomposition ulps —
    the distributed bitness proof (tests/test_distributed.py) compares
    them exactly."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array, t=None, t_weights=None):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            kw = dict(t=t, t_weights=t_weights,
                      return_per_sample=with_timesteps or log_per_sample,
                      fused_codec=fused_codec, fused_ctx=fused_ctx)
            if bf16_compute:
                loss, logs = training_loss(
                    model, _cast_floats(params, jnp.bfloat16), sched_train,
                    _cast_floats(batch, jnp.bfloat16), rng, **kw)
                return loss.astype(jnp.float32), logs
            return training_loss(model, params, sched_train, batch, rng,
                                 **kw)

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # named scope -> op metadata: the trace-decomposition harness
        # (tools/dev/train_decomp.py) buckets device time by tf_op path
        with jax.named_scope("optimizer"):
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        logs = dict(logs)
        if log_per_sample and not with_timesteps:
            logs.pop("t", None)  # per_sample_loss stays; t is sampler-only
        logs["grad_norm"] = optax.global_norm(grads)
        return new_state, logs

    return train_step


def make_multi_train_step(model: MotionDiffusionModel, tx,
                          sched_train: DiffusionSchedule,
                          bf16_compute: bool = False,
                          fused_codec: bool = False,
                          unroll: int = 1,
                          fused_ctx: bool = False):
    """k train steps per dispatch via ``lax.scan`` over a stacked batch.

    One jitted call marshals the ~3000-leaf (state, batch) argument tree
    ONCE for k optimizer steps instead of once per step — on remote-hosted
    TPUs the per-dispatch marshaling costs more than the device step
    (measured: 193 ms/step per-step dispatch vs 100 ms/step at k=8 on v5e,
    docs/PERFORMANCE.md).  Equivalent to k sequential
    :func:`make_train_step` calls with the same ``rng``: the per-step rng
    is derived inside the step by folding ``state.step``, which the scan
    increments, so losses/updates match the single-step path exactly.

    The step takes (state, stacked_batch, rng) where every batch leaf has a
    leading ``k`` axis; logs come back with a leading ``(k,)`` axis.

    ``unroll``: scan unroll factor.  The XLA while loop double-buffers the
    loop carry — traced on v5e at ~9 ms/step of tiny per-leaf copies of
    every param/Adam-moment buffer (docs/TRAIN_DECOMP.json fwd/other;
    f32[2048,1024] adaLN kernels x3 state arrays each, etc.).  Unrolling k
    steps per loop iteration amortizes those copies 1/k; ``unroll=k``
    removes the while loop entirely.  Compile time scales ~linearly with
    the factor (one-time with the persistent compile cache).
    """
    step = make_train_step(model, tx, sched_train,
                           bf16_compute=bf16_compute,
                           fused_codec=fused_codec,
                           fused_ctx=fused_ctx)

    def multi_step(state: TrainState, stacked_batch, rng: jax.Array):
        def body(s, b):
            return step(s, b, rng)

        return jax.lax.scan(body, state, stacked_batch, unroll=unroll)

    return multi_step


def jit_multi_train_step(multi_step, mesh):
    """Jit with (k, batch, ...) stacks sharded on the batch dim."""
    from ..parallel.mesh import stacked_batch_sharding

    rep = replicated(mesh)
    return jax.jit(
        multi_step,
        in_shardings=(rep, stacked_batch_sharding(mesh), rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_val_step(model: MotionDiffusionModel,
                  sched_train: DiffusionSchedule,
                  fused_ctx: bool = False):
    """Validation step: the training loss without gradients (reference
    BaseArchitecture.val_step, base_architecture.py:91-135)."""

    def val_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                 rng: jax.Array):
        loss, logs = training_loss(model, state.params, sched_train, batch,
                                   rng, fused_ctx=fused_ctx)
        return dict(logs)

    return val_step


def jit_val_step(val_step, mesh):
    from ..parallel.mesh import batch_sharding, replicated

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(val_step, in_shardings=(rep, bsh, rep),
                   out_shardings=rep)


def build_optimizers(cfg_map: Dict[str, "OptimConfig"], params
                     ) -> optax.GradientTransformation:
    """Per-submodule optimizers (reference mogen/core/optimizer/builder.py:
    8-52: a dict-of-cfgs builds one optimizer per top-level submodule).

    ``cfg_map`` maps top-level param-tree keys (e.g. "denoiser", "codec")
    to their OptimConfig; keys absent from the map are frozen."""

    def label(path, _):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        for key in cfg_map:
            if key in names:
                return key
        return "__frozen__"

    labels = jax.tree_util.tree_map_with_path(label, params)
    transforms: Dict[str, optax.GradientTransformation] = {
        "__frozen__": optax.set_to_zero()
    }
    for key, cfg in cfg_map.items():
        transforms[key] = _make_tx(cfg)
    return optax.multi_transform(transforms, labels)


def jit_train_step(train_step, mesh, with_timesteps: bool = False):
    """Jit the step with data-parallel shardings: state replicated, batch
    sharded on the batch dim (XLA inserts the gradient all-reduce)."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    in_sh = (rep, bsh, rep) + ((bsh, bsh) if with_timesteps else ())
    return jax.jit(
        train_step,
        in_shardings=in_sh,
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
