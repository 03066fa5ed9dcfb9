"""Diffusion timestep schedule samplers.

Capability match for the reference's schedule-sampler zoo
(/root/reference/mogen/models/utils/gaussian_diffusion.py:16-153):
``UniformSampler`` (used by the shipped config) and
``LossSecondMomentResampler`` — importance sampling of timesteps by the
second moment of recent per-timestep losses.  The reference syncs loss
history across ranks with ``dist.all_gather`` (:85-106); here history update
happens on host after each step (losses are tiny scalars).  By default
(``synced=True``, matching the reference) every host gathers all ranks'
(t, loss) pairs before updating, so histories — and the warm-up gate —
stay bit-identical across hosts; ``synced=False`` lets each host update
from its own shard only (histories converge in distribution but warm up at
different steps).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ScheduleSampler:
    def weights(self) -> np.ndarray:
        raise NotImplementedError

    def sample(self, rng: jax.Array, batch: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (timesteps (B,), importance weights (B,))."""
        w = np.asarray(self.weights(), np.float64)
        p = w / w.sum()
        # draw on host-independent jax rng for reproducibility
        t = jax.random.choice(rng, len(p), (batch,), p=jnp.asarray(p))
        iw = 1.0 / (len(p) * p[np.asarray(t)])
        return t.astype(jnp.int32), jnp.asarray(iw, jnp.float32)

    def sample_np(self, np_rng: np.random.RandomState, batch: int):
        """Host-side draw (numpy) for the train loop: (t (B,), weights (B,))
        as numpy arrays — avoids device round-trips per step."""
        w = np.asarray(self.weights(), np.float64)
        p = w / w.sum()
        t = np_rng.choice(len(p), size=batch, p=p)
        iw = 1.0 / (len(p) * p[t])
        return t.astype(np.int32), iw.astype(np.float32)


class UniformSampler(ScheduleSampler):
    """gaussian_diffusion.py:62-74."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps
        self._weights = np.ones(num_timesteps)

    def weights(self) -> np.ndarray:
        return self._weights


def _multihost_gather(ts: np.ndarray, losses: np.ndarray):
    """Default gather for synced resampling: every process contributes its
    local (t, loss) shard; returns the concatenated global pairs in process
    order (the TPU analogue of the reference's dist.all_gather,
    gaussian_diffusion.py:85-106).  Single-process: identity."""
    if jax.process_count() == 1:
        return ts, losses
    from jax.experimental import multihost_utils

    # per-host batch shards can be ragged only on the tail step; pad to the
    # max and carry a validity count so the gather stays static-shaped
    n = np.int32(len(ts))
    cap = int(multihost_utils.process_allgather(n).max())
    pad_t = np.zeros(cap, np.int32)
    pad_l = np.zeros(cap, np.float64)
    pad_t[:len(ts)] = ts
    pad_l[:len(ts)] = losses
    all_n = np.asarray(multihost_utils.process_allgather(n))
    all_t = np.asarray(multihost_utils.process_allgather(pad_t))
    all_l = np.asarray(multihost_utils.process_allgather(pad_l))
    keep_t = np.concatenate([all_t[i, :all_n[i]] for i in range(len(all_n))])
    keep_l = np.concatenate([all_l[i, :all_n[i]] for i in range(len(all_n))])
    return keep_t, keep_l


class LossSecondMomentResampler(ScheduleSampler):
    """gaussian_diffusion.py:109-153: p(t) ∝ sqrt(E[loss_t^2]), 0.1% uniform
    floor, uniform until history_per_term samples per t are collected.

    ``synced=True`` (default, the reference's behavior): each update first
    all-gathers every host's (t, loss) pairs so all hosts apply the same
    global history in the same order — the warm-up gate and the weights stay
    identical across hosts.  ``gather_fn`` is injectable for tests."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001, synced: bool = True,
                 gather_fn=None):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self.synced = synced
        self._gather = gather_fn or _multihost_gather
        self._loss_history = np.zeros((num_timesteps, history_per_term),
                                      np.float64)
        self._loss_counts = np.zeros(num_timesteps, np.int64)

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones(self.num_timesteps, np.float64)
        w = np.sqrt(np.mean(self._loss_history ** 2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def update_with_losses(self, ts, losses):
        """Host-side history update after each train step (the reference's
        update_with_all_losses, :140-153; with ``synced`` the local shard is
        first all-gathered like its dist.all_gather at :85-106)."""
        ts = np.asarray(ts)
        losses = np.asarray(losses)
        if self.synced:
            ts, losses = self._gather(ts, losses)
        for t, loss in zip(np.asarray(ts).tolist(),
                           np.asarray(losses).tolist()):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1


def build_sampler(name: str, num_timesteps: int) -> ScheduleSampler:
    """gaussian_diffusion.py:16-36."""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
