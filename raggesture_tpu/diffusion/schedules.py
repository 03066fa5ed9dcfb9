"""Diffusion beta schedules, respacing, and precomputed schedule tables.

Design: the reference keeps an OpenAI guided-diffusion ``GaussianDiffusion``
*class* whose methods index float64 numpy tables per step inside Python loops
(``/root/reference/mogen/models/utils/gaussian_diffusion.py:382-440``).  On
TPU we instead precompute every table once in float64 on the host, pack them
into a single immutable pytree of float32 device arrays, and let ``lax.scan``
gather rows per step — everything downstream is a pure function of
``(tables, t)``.

Parity targets (reference file:line):
  - beta schedules: gaussian_diffusion.py:229-268 (linear / cosine /
    scaled_linear — shipped config uses scaled_linear)
  - zero-terminal-SNR rescale: gaussian_diffusion.py:290-326
  - respacing: space_timesteps gaussian_diffusion.py:1629-1711 (comma
    sections e.g. "15,15,8,6,6", "ddimN", "fast27", "leading", "trailing")
  - spaced-beta re-derivation + timestep_map: SpacedDiffusion
    gaussian_diffusion.py:1714-1764
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    """Return float64 betas for a named schedule (reference :229-268)."""
    if name == "linear":
        scale = 1000.0 / num_steps
        return np.linspace(scale * 0.0001, scale * 0.02, num_steps, dtype=np.float64)
    if name == "cosine":
        return betas_for_alpha_bar(
            num_steps, lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        )
    if name == "scaled_linear":
        # latent-diffusion schedule: sqrt-space linspace, squared
        beta_start, beta_end = 0.00085, 0.012
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_steps, dtype=np.float64)
            ** 2
        )
    raise NotImplementedError(f"unknown beta schedule: {name}")


def betas_for_alpha_bar(num_steps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal SNR is exactly zero (arXiv:2305.08891)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    abar_sqrt = np.sqrt(alphas_cumprod)
    abar_sqrt_0, abar_sqrt_T = abar_sqrt[0], abar_sqrt[-1]
    abar_sqrt = abar_sqrt - abar_sqrt_T
    abar_sqrt = abar_sqrt * abar_sqrt_0 / (abar_sqrt_0 - abar_sqrt_T)
    abar = abar_sqrt**2
    alphas_new = np.concatenate([abar[:1], abar[1:] / abar[:-1]])
    return 1.0 - alphas_new


def space_timesteps(
    num_timesteps: int,
    section_counts: Union[str, Sequence[int]],
    num_inference_timesteps: Optional[int] = None,
) -> set:
    """Pick the subset of original timesteps to keep when respacing.

    Supports the reference's full grammar (gaussian_diffusion.py:1629-1711):
    "ddimN", "fast27", "leading", "trailing", and comma-separated per-section
    counts (the shipped test config uses "15,15,8,6,6" -> 50 steps).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(
                f"cannot create exactly {desired} steps with an integer stride"
            )
        if section_counts == "fast27":
            steps = space_timesteps(num_timesteps, "15,15,8,6,6")
            steps.remove(num_timesteps - 1)
            steps.add(num_timesteps - 3)
            return steps
        if section_counts == "leading":
            assert num_inference_timesteps is not None
            ratio = num_timesteps // num_inference_timesteps
            return set((np.arange(num_inference_timesteps) * ratio).round().astype(int))
        if section_counts == "trailing":
            assert num_inference_timesteps is not None
            ratio = num_timesteps / num_inference_timesteps
            steps = np.round(np.arange(num_timesteps, 0, -ratio)).astype(np.int64) - 1
            steps = np.append(steps, 0)
            return set(int(s) for s in steps)
        section_counts = [int(x) for x in section_counts.split(",")]
        if num_inference_timesteps is not None:
            assert sum(section_counts) == num_inference_timesteps

    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur = 0.0
        for _ in range(section_count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable pytree of per-timestep tables (float32 on device).

    Rows are indexed by the *spaced* step index; ``timestep_map`` maps each
    row back to the original 0..999 timestep that the denoiser was trained on
    (identity when no respacing is applied).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # fixed_large variance: [posterior_variance[1], betas[1:]] (reference :564-567)
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    timestep_map: jnp.ndarray  # int32, spaced idx -> original timestep

    # static metadata (not traced)
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    original_num_steps: int = dataclasses.field(metadata=dict(static=True))

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        arrays = tuple(
            getattr(self, f.name) for f in fields if not f.metadata.get("static")
        )
        static = tuple(
            getattr(self, f.name) for f in fields if f.metadata.get("static")
        )
        return arrays, static

    @classmethod
    def tree_unflatten(cls, static, arrays):
        return cls(*arrays, *static)


def _build_tables(betas: np.ndarray) -> dict:
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    fixed_large_variance = np.append(posterior_variance[1], betas[1:])
    return dict(
        betas=betas,
        alphas_cumprod=alphas_cumprod,
        alphas_cumprod_prev=alphas_cumprod_prev,
        alphas_cumprod_next=alphas_cumprod_next,
        sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
        log_one_minus_alphas_cumprod=np.log(1.0 - alphas_cumprod),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod - 1.0),
        posterior_variance=posterior_variance,
        posterior_log_variance_clipped=np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        ),
        posterior_mean_coef1=betas
        * np.sqrt(alphas_cumprod_prev)
        / (1.0 - alphas_cumprod),
        posterior_mean_coef2=(1.0 - alphas_cumprod_prev)
        * np.sqrt(alphas)
        / (1.0 - alphas_cumprod),
        fixed_large_variance=fixed_large_variance,
        fixed_large_log_variance=np.log(fixed_large_variance),
    )


def make_schedule(
    beta_scheduler: str = "scaled_linear",
    diffusion_steps: int = 1000,
    respace: Optional[Union[str, Sequence[int]]] = None,
    num_inference_timesteps: Optional[int] = None,
    rescale_betas_zero_snr: bool = False,
    dtype=jnp.float32,
) -> DiffusionSchedule:
    """Build a (possibly respaced) :class:`DiffusionSchedule`.

    Respacing re-derives betas over the kept steps exactly as the reference
    ``SpacedDiffusion`` does (gaussian_diffusion.py:1723-1738): beta'_i =
    1 - abar_{k_i} / abar_{k_{i-1}} over the sorted kept original steps k_i.
    """
    betas = get_named_beta_schedule(beta_scheduler, diffusion_steps)
    if rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)

    if respace is not None:
        keep = space_timesteps(diffusion_steps, respace, num_inference_timesteps)
        base_abar = np.cumprod(1.0 - betas)
        timestep_map, new_betas = [], []
        last_abar = 1.0
        for i, abar in enumerate(base_abar):
            if i in keep:
                new_betas.append(1.0 - abar / last_abar)
                last_abar = abar
                timestep_map.append(i)
        betas = np.array(new_betas, dtype=np.float64)
        tmap = np.array(timestep_map, dtype=np.int32)
    else:
        tmap = np.arange(diffusion_steps, dtype=np.int32)

    tables = _build_tables(betas)
    arrays = {k: jnp.asarray(v, dtype=dtype) for k, v in tables.items()}
    return DiffusionSchedule(
        **arrays,
        timestep_map=jnp.asarray(tmap),
        num_timesteps=int(betas.shape[0]),
        original_num_steps=int(diffusion_steps),
    )
