"""Property tests for rotation conversions (pure math layer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raggesture_tpu.ops import rotations as rot


def random_aa(key, shape=(64, 3), max_angle=np.pi * 0.95):
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, shape)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jax.random.uniform(k2, shape[:-1] + (1,), minval=1e-4, maxval=max_angle)
    return axis * angle


def test_axis_angle_matrix_roundtrip():
    aa = random_aa(jax.random.PRNGKey(0))
    m = rot.axis_angle_to_matrix(aa)
    aa2 = rot.matrix_to_axis_angle(m)
    m2 = rot.axis_angle_to_matrix(aa2)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_matrices_are_rotations():
    aa = random_aa(jax.random.PRNGKey(1))
    m = rot.axis_angle_to_matrix(aa)
    eye = jnp.einsum("...ij,...kj->...ik", m, m)
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(3), eye.shape), atol=1e-5
    )
    det = jnp.linalg.det(m)
    np.testing.assert_allclose(np.asarray(det), 1.0, atol=1e-5)


def test_6d_roundtrip():
    aa = random_aa(jax.random.PRNGKey(2))
    m = rot.axis_angle_to_matrix(aa)
    d6 = rot.matrix_to_rotation_6d(m)
    m2 = rot.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_6d_is_first_two_rows():
    aa = random_aa(jax.random.PRNGKey(3), (8, 3))
    m = rot.axis_angle_to_matrix(aa)
    d6 = rot.matrix_to_rotation_6d(m)
    np.testing.assert_allclose(
        np.asarray(d6), np.asarray(m[..., :2, :].reshape(8, 6)), atol=0
    )


def test_small_angle_stability():
    aa = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    m = rot.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(
        np.asarray(m), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6
    )
    # gradients finite at zero rotation
    g = jax.grad(lambda a: rot.axis_angle_to_matrix(a).sum())(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_large_angle_quaternion_robustness():
    # angles near pi exercise all four Shepperd candidates
    aa = random_aa(jax.random.PRNGKey(4), (256, 3), max_angle=np.pi - 1e-3)
    m = rot.axis_angle_to_matrix(aa)
    m2 = rot.axis_angle_to_matrix(rot.matrix_to_axis_angle(m))
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-4)


def test_feature_conversions_shapes():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 10, 39).astype(np.float32)) * 0.3
    d6 = rot.aa_feature_to_6d(x)
    assert d6.shape == (4, 10, 78)
    aa = rot.d6_feature_to_aa(d6)
    assert aa.shape == (4, 10, 39)
    # roundtrip through the rotation manifold is identity on matrices
    m1 = rot.axis_angle_to_matrix(x.reshape(4, 10, 13, 3))
    m2 = rot.axis_angle_to_matrix(aa.reshape(4, 10, 13, 3))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)


def test_feature_conversions_match_per_rotation_path():
    """The SoA fast path (dense component planes) must match the per-rotation
    reference math exactly — including identity rotations (Shepperd candidate
    ties) and near-2*pi rotations (Taylor branch selection)."""
    rs = np.random.RandomState(1)
    x = rs.randn(3, 7, 30).astype(np.float32)
    x[0, 0, :] = 0.0                       # identity rotations
    x[1, 1, :3] = [np.pi, 0.0, 0.0]        # angle pi (q_abs tie region)
    x = jnp.asarray(x)

    j = 10
    aa = x.reshape(3, 7, j, 3)
    ref6 = rot.matrix_to_rotation_6d(rot.axis_angle_to_matrix(aa))
    got6 = rot.aa_feature_to_6d(x)
    np.testing.assert_allclose(np.asarray(got6),
                               np.asarray(ref6.reshape(3, 7, j * 6)),
                               atol=1e-6)

    ref_aa = rot.matrix_to_axis_angle(
        rot.rotation_6d_to_matrix(ref6)).reshape(3, 7, j * 3)
    got_aa = rot.d6_feature_to_aa(got6)
    np.testing.assert_allclose(np.asarray(got_aa), np.asarray(ref_aa),
                               atol=1e-5)

    # grad-safe on a batch containing exact identities
    g = jax.grad(lambda v: rot.d6_feature_to_aa(
        rot.aa_feature_to_6d(v)).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_grad_safe_at_identity_and_still_pose():
    """The module contract: every conversion is safe under jax.grad.
    sqrt'(0)=inf / arccos'(1)=-inf leaked NaNs at the IDENTITY rotation
    (three Shepperd candidates are exactly 0 there) and at slerp between
    identical quaternions (a still pose) before the double-where guards."""
    g = jax.grad(lambda m: rot.matrix_to_axis_angle(m).sum())(jnp.eye(3))
    assert np.isfinite(np.asarray(g)).all(), g

    g6 = jax.grad(lambda m: rot.matrix_to_rotation_6d(m).sum())(jnp.eye(3))
    assert np.isfinite(np.asarray(g6)).all()

    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    gs = jax.grad(lambda q: rot.qslerp(q, q0, 0.5).sum())(q0)
    assert np.isfinite(np.asarray(gs)).all(), gs


def test_quaternion_to_axis_angle_negative_w_small_vector():
    """A w<0 quaternion with a tiny vector part has angle ~2*pi — the
    Taylor branch must be selected by SMALL ANGLE (PyTorch3D semantics),
    not by small vector norm (which evaluated the expansion at 2*pi)."""
    q = jnp.asarray([-1.0, 1e-3, 0.0, 0.0])
    q = q / jnp.linalg.norm(q)
    aa = np.asarray(rot.quaternion_to_axis_angle(q))
    # rotation of ~2*pi about x
    np.testing.assert_allclose(aa[0], 2 * np.pi, rtol=1e-3)
    np.testing.assert_allclose(aa[1:], 0.0, atol=1e-6)

    # the old norm-based classifier returned ~-3e-8 here (Taylor expansion
    # evaluated at 2*pi); f32 sin near pi bounds accuracy to a few percent,
    # so assert the magnitude class only
    q = jnp.asarray([-1.0, 1e-6, 0.0, 0.0])
    q = q / jnp.linalg.norm(q)
    aa = np.asarray(rot.quaternion_to_axis_angle(q))
    assert 5.0 < aa[0] < 7.5, aa
