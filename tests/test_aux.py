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


def test_chrome_trace_device_time_union(tmp_path):
    """The chrome-trace parser returns UNION busy time: scan/while-loop
    programs nest a whole-loop event over its per-iteration body events on
    the same "XLA Ops" line, and a plain duration sum double-counts them
    (utils/profiling.py::chrome_trace_device_time_ms)."""
    import gzip
    import json

    from raggesture_tpu.utils.profiling import chrome_trace_device_time_ms

    events = [
        {"ph": "M", "name": "process_name", "pid": 3,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "thread_name", "pid": 3, "tid": 7,
         "args": {"name": "XLA Ops"}},
        # whole-loop wrapper [0, 100) nests two body events; one separate
        # op [150, 180); an early long event outlasting a later start
        {"ph": "X", "pid": 3, "tid": 7, "ts": 0.0, "dur": 100.0,
         "name": "while"},
        {"ph": "X", "pid": 3, "tid": 7, "ts": 10.0, "dur": 30.0,
         "name": "fusion.1"},
        {"ph": "X", "pid": 3, "tid": 7, "ts": 50.0, "dur": 40.0,
         "name": "fusion.2"},
        {"ph": "X", "pid": 3, "tid": 7, "ts": 150.0, "dur": 30.0,
         "name": "fusion.3"},
        {"ph": "X", "pid": 3, "tid": 7, "ts": 160.0, "dur": 5.0,
         "name": "fusion.4"},
        # host plane noise that must be ignored
        {"ph": "M", "name": "process_name", "pid": 9,
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "name": "thread_name", "pid": 9, "tid": 1,
         "args": {"name": "XLA Ops"}},
        {"ph": "X", "pid": 9, "tid": 1, "ts": 0.0, "dur": 999.0,
         "name": "host-op"},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    stats = chrome_trace_device_time_ms(str(tmp_path))
    # union: [0,100) + [150,180) = 130 us = 0.13 ms (sum would be 0.205)
    assert stats is not None
    assert abs(stats["busy_ms"] - 0.13) < 1e-9, stats
    assert abs(stats["span_ms"] - 0.18) < 1e-9, stats
    assert stats["n_ops"] == 5
