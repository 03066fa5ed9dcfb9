"""Aux subsystems: quaternion helpers, profiling timer, dist inference
helpers, misc utils."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raggesture_tpu.ops.rotations import (
    axis_angle_to_matrix,
    axis_angle_to_quaternion,
    qinv,
    qmul,
    qrot,
    qslerp,
)
from raggesture_tpu.utils.misc import multi_apply, str2bool
from raggesture_tpu.utils.profiling import StepTimer


def test_qrot_matches_matrix_rotation():
    rng = np.random.RandomState(0)
    aa = jnp.asarray(rng.randn(5, 3) * 0.7, jnp.float32)
    v = jnp.asarray(rng.randn(5, 3), jnp.float32)
    q = axis_angle_to_quaternion(aa)
    R = axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(qrot(q, v)),
                               np.einsum("nij,nj->ni", np.asarray(R),
                                         np.asarray(v)), atol=1e-5)


def test_qmul_qinv_identity():
    rng = np.random.RandomState(1)
    aa = jnp.asarray(rng.randn(4, 3) * 0.5, jnp.float32)
    q = axis_angle_to_quaternion(aa)
    ident = qmul(q, qinv(q))
    np.testing.assert_allclose(np.asarray(ident),
                               np.tile([1, 0, 0, 0], (4, 1)), atol=1e-5)


def test_qslerp_endpoints_and_norm():
    rng = np.random.RandomState(2)
    q0 = axis_angle_to_quaternion(jnp.asarray(rng.randn(3, 3) * 0.4))
    q1 = axis_angle_to_quaternion(jnp.asarray(rng.randn(3, 3) * 0.4))
    np.testing.assert_allclose(np.asarray(qslerp(q0, q1, 0.0)),
                               np.asarray(q0), atol=1e-5)
    half = qslerp(q0, q1, 0.5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(half), axis=-1),
                               1.0, atol=1e-5)
    # antipodal safety: slerp(q, -q, t) stays unit
    s = qslerp(q0, -q0, 0.3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(s), axis=-1), 1.0,
                               atol=1e-5)


def test_step_timer():
    t = StepTimer(window=3)
    assert t.tick() is None
    for _ in range(4):
        dt = t.tick()
        assert dt is not None and dt >= 0
    assert t.mean_step_time > 0
    assert t.throughput(8) > 0


def test_misc():
    assert str2bool("yes") and not str2bool("0")
    with pytest.raises(ValueError):
        str2bool("maybe")
    a, b = multi_apply(lambda x: (x + 1, x * 2), [1, 2, 3])
    assert a == [2, 3, 4] and b == [2, 4, 6]


def test_single_device_test_helper():
    from raggesture_tpu.train.inference import single_device_test

    batches = [
        {"sample_name": ["a", "b"], "x": np.ones((2, 3)),
         "valid_mask": np.array([True, True])},
        {"sample_name": ["c", "c"], "x": np.ones((2, 3)) * 2,
         "valid_mask": np.array([True, False])},
    ]

    def gen(batch):
        return {"pred": jnp.asarray(batch["x"]) + 1}

    res = single_device_test(gen, batches)
    assert [r["sample_name"] for r in res] == ["a", "b", "c"]
    assert np.allclose(res[2]["pred"], 3.0)


def test_pin_platform_from_env(monkeypatch):
    """pin_platform_from_env re-asserts JAX_PLATFORMS through jax.config
    (the env var alone does not prevent a sitecustomize-registered remote
    plugin from initializing during backend discovery — utils/env.py)."""
    from raggesture_tpu.utils.env import pin_platform_from_env

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    pin_platform_from_env()
    assert jax.config.jax_platforms == "cpu"

    # unset/empty env leaves the current selection untouched
    monkeypatch.setenv("JAX_PLATFORMS", "")
    pin_platform_from_env()
    assert jax.config.jax_platforms == "cpu"
