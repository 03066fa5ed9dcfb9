"""Loss functions with weighted reduction (capability match for
/root/reference/mogen/models/losses/mse_loss.py:31-151 and
mogen/models/losses/utils.py:7-109).

``mse_loss`` / ``laplacian_mse_loss`` are element-wise; ``weight_reduce_loss``
applies an optional element weight then reduces by mean/sum/none with an
optional averaging factor — the mmcv ``weighted_loss`` decorator contract.
``LaplacianMSELoss`` reproduces the kornia ``laplacian_1d``-filtered variant
(registered in the reference, unused by the shipped config)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..registry import LOSSES


def reduce_loss(loss: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "none":
        return loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    raise ValueError(f"unknown reduction {reduction!r}")


def weight_reduce_loss(loss: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
                       reduction: str = "mean",
                       avg_factor: Optional[float] = None) -> jnp.ndarray:
    """mogen/models/losses/utils.py:34-76."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == "mean":
        return loss.sum() / avg_factor
    if reduction == "none":
        return loss
    raise ValueError("avg_factor only supported with mean reduction")


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
             weight: Optional[jnp.ndarray] = None, reduction: str = "mean",
             avg_factor: Optional[float] = None) -> jnp.ndarray:
    return weight_reduce_loss((pred - target) ** 2, weight, reduction,
                              avg_factor)


def laplacian_1d(window_size: int = 3) -> jnp.ndarray:
    """kornia.filters.laplacian_1d: all-ones kernel with center
    1 - window_size (sums to zero)."""
    filter_1d = jnp.ones(window_size)
    middle = window_size // 2
    return filter_1d.at[middle].set(1.0 - window_size)


def laplacian_filter_time(x: jnp.ndarray, window_size: int = 3) -> jnp.ndarray:
    """Apply the 1-d laplacian along the time axis of (B, T, D) with
    replicate padding (kornia filter1d semantics)."""
    k = laplacian_1d(window_size)
    pad = window_size // 2
    xp = jnp.concatenate(
        [jnp.repeat(x[:, :1], pad, 1), x, jnp.repeat(x[:, -1:], pad, 1)], axis=1
    )
    # (B, T+2p, D) -> windows convolved along T
    out = sum(k[i] * xp[:, i : i + x.shape[1]] for i in range(window_size))
    return out


def laplacian_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       reduction: str = "mean",
                       avg_factor: Optional[float] = None) -> jnp.ndarray:
    """MSE between laplacian-filtered (velocity-curvature) sequences
    (mse_loss.py:72-117)."""
    lp = laplacian_filter_time(pred)
    lt = laplacian_filter_time(target)
    return weight_reduce_loss((lp - lt) ** 2, weight, reduction, avg_factor)


@LOSSES.register_module()
class MSELoss:
    """mse_loss.py:31-69: configured weighted MSE callable."""

    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        assert reduction in ("none", "mean", "sum")
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * mse_loss(pred, target, weight, reduction,
                                           avg_factor)


@LOSSES.register_module()
class LaplacianMSELoss:
    """mse_loss.py:72-151."""

    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        assert reduction in ("none", "mean", "sum")
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * laplacian_mse_loss(
            pred, target, weight, reduction, avg_factor)
