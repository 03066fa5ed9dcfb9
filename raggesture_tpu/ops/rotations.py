"""Rotation representation conversions in pure JAX.

Provides the conversions the gesture stack relies on everywhere (dataset
featurization, VAE encode/decode, evaluation, frame interpolation):

    axis-angle <-> rotation matrix <-> 6d continuous representation
    (via unit quaternions internally)

Behavioral parity target: the PyTorch3D-derived helpers used by the reference
(``/root/reference/mogen/models/utils/rotation_conversions.py:416,432,511,535``)
— same representation conventions (row-major 6d = first two *rows* of the
rotation matrix; wxyz quaternions), implemented fresh for jnp with
Taylor-stabilized small-angle paths so they are safe under ``jax.grad``.

All functions broadcast over arbitrary leading batch dimensions and are
jit/vmap/grad compatible (no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Convert rotations given as axis/angle to quaternions (w, x, y, z).

    axis_angle: (..., 3) rotation vector (direction = axis, norm = angle in
    radians). Returns (..., 4) unit quaternions with real part first.
    """
    # grad-safe at the zero rotation: never take sqrt of (or divide by) a
    # quantity that can be exactly 0 — use the squared norm in the Taylor
    # branch and a clamped sqrt in the generic branch (double-where trick).
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = sq < _EPS**2
    safe_sq = jnp.where(small, jnp.ones_like(sq), sq)
    angles = jnp.sqrt(safe_sq)
    half_angles = angles * 0.5
    # sin(a/2)/a with the a -> 0 limit 1/2 - a^2/48
    sin_half_over_angle = jnp.where(
        small, 0.5 - sq / 48.0, jnp.sin(half_angles) / angles
    )
    # cos(a/2) with the a -> 0 limit 1 - a^2/8
    cos_half = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half_angles))
    return jnp.concatenate([cos_half, axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 4) wxyz quaternions to (..., 3, 3) rotation matrices."""
    r, i, j, k = (
        quaternions[..., 0],
        quaternions[..., 1],
        quaternions[..., 2],
        quaternions[..., 3],
    )
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrix."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a ZERO gradient at x <= 0.

    The double-where is required: plain sqrt(maximum(x, 0)) backprops
    cotangent * sqrt'(0)=inf -> NaN at exactly x == 0, which three of the
    four Shepperd candidates hit at the IDENTITY rotation (the most common
    rotation in mocap rest poses)."""
    safe = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 3, 3) rotation matrices to (..., 4) wxyz quaternions.

    Branch-free candidate selection (numerically robust for all rotation
    angles): build the four Shepperd candidates and pick the one whose
    denominator (|q component|) is largest.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)

    flr = 0.1
    quat_candidates = quat_by_rijk / (
        2.0 * jnp.maximum(q_abs[..., None], flr)
    )

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax_one_hot(best, 4)  # (..., 4)
    out = jnp.sum(quat_candidates * onehot[..., None], axis=-2)
    return out


def jax_one_hot(indices: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return (
        indices[..., None] == jnp.arange(num_classes, dtype=indices.dtype)
    ).astype(jnp.float32)


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3) axis-angle.

    The Taylor branch is selected by SMALL ANGLE (PyTorch3D semantics), not
    by small vector norm: a w<0 quaternion with a tiny vector part has
    angle ~2*pi, where the small-angle expansion is invalid (a norm-based
    branch returned a negative, meaningless sin_half_over_angle there)."""
    sq = jnp.sum(quaternions[..., 1:] * quaternions[..., 1:], axis=-1, keepdims=True)
    # grad-safe norm (zero gradient at the zero vector)
    norms = jnp.where(sq > 0.0, jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)), 0.0)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    small = jnp.abs(angles) < _EPS
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, jnp.ones_like(angles), angles),
    )
    return quaternions[..., 1:] / sin_half_over_angle


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): the first two ROWS of the matrix, flattened.

    Same convention as the reference (Zhou et al. 2019 continuity rep, as in
    PyTorch3D: ``matrix[..., :2, :]``).
    """
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt on the two stored rows."""
    a1 = d6[..., :3]
    a2 = d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2_raw = a2 - a2_proj
    b2 = b2_raw / jnp.maximum(jnp.linalg.norm(b2_raw, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def axis_angle_to_rotation_6d(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Convenience: (..., 3) axis-angle -> (..., 6)."""
    return matrix_to_rotation_6d(axis_angle_to_matrix(axis_angle))


def rotation_6d_to_axis_angle(d6: jnp.ndarray) -> jnp.ndarray:
    """Convenience: (..., 6) -> (..., 3) axis-angle."""
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))


# -- structure-of-arrays fast path for the bulk feature conversions ---------
#
# The per-rotation API above computes on (..., 3), (..., 4) and (..., 3, 3)
# tensors.  On TPU the last two dims of every such intermediate are padded to
# the (8, 128) vector tile, so a (B, T, J, 3, 3) matrix chain moves up to two
# orders of magnitude more HBM bytes than the math needs (measured: 6.5 ms
# for a batch-32 ``part_features`` that is arithmetically ~50 MFLOP).  The
# bulk converters below therefore run the SAME math in structure-of-arrays
# form: each quaternion/matrix component is a flat dense (M,) plane, and the
# only layout-padded tensors are the function's input and output.


def _soa_planes(x: jnp.ndarray, k: int):
    """(..., J*k) -> k dense (M,) component planes, M = prod(...)*J."""
    flat = x.reshape(x.shape[:-1] + (x.shape[-1] // k, k))
    return [flat[..., c].reshape(-1) for c in range(k)]


def _soa_pack(planes, batch_shape, j: int) -> jnp.ndarray:
    """k dense (M,) planes -> (*batch_shape, J*k)."""
    k = len(planes)
    out = jnp.stack(planes, axis=-1)  # (M, k)
    return out.reshape(batch_shape + (j * k,))


def _aa_to_quat_soa(ax, ay, az):
    """Axis-angle planes -> wxyz quaternion planes (same Taylor branches as
    :func:`axis_angle_to_quaternion`)."""
    sq = ax * ax + ay * ay + az * az
    small = sq < _EPS**2
    safe_sq = jnp.where(small, 1.0, sq)
    angles = jnp.sqrt(safe_sq)
    half = 0.5 * angles
    s = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angles)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    return w, ax * s, ay * s, az * s


def _quat_to_matrix_soa(r, i, j, k):
    """wxyz quaternion planes -> 9 rotation-matrix component planes."""
    two_s = 2.0 / (r * r + i * i + j * j + k * k)
    return (
        1 - two_s * (j * j + k * k), two_s * (i * j - k * r),
        two_s * (i * k + j * r),
        two_s * (i * j + k * r), 1 - two_s * (i * i + k * k),
        two_s * (j * k - i * r),
        two_s * (i * k - j * r), two_s * (j * k + i * r),
        1 - two_s * (i * i + j * j),
    )


def _d6_to_matrix_soa(a1x, a1y, a1z, a2x, a2y, a2z):
    """Gram-Schmidt on 6d planes -> 9 matrix planes (same clamping as
    :func:`rotation_6d_to_matrix`)."""
    n1 = jnp.maximum(jnp.sqrt(a1x * a1x + a1y * a1y + a1z * a1z), _EPS)
    b1x, b1y, b1z = a1x / n1, a1y / n1, a1z / n1
    d = b1x * a2x + b1y * a2y + b1z * a2z
    r2x, r2y, r2z = a2x - d * b1x, a2y - d * b1y, a2z - d * b1z
    n2 = jnp.maximum(jnp.sqrt(r2x * r2x + r2y * r2y + r2z * r2z), _EPS)
    b2x, b2y, b2z = r2x / n2, r2y / n2, r2z / n2
    b3x = b1y * b2z - b1z * b2y
    b3y = b1z * b2x - b1x * b2z
    b3z = b1x * b2y - b1y * b2x
    return b1x, b1y, b1z, b2x, b2y, b2z, b3x, b3y, b3z


def _matrix_to_quat_soa(m00, m01, m02, m10, m11, m12, m20, m21, m22):
    """Branch-free Shepperd on planes — same candidate selection as
    :func:`matrix_to_quaternion` (argmax by largest |q component|)."""

    def sqrt_pos(x):
        safe = jnp.where(x > 0.0, x, 1.0)
        return jnp.where(x > 0.0, jnp.sqrt(safe), 0.0)

    qa_r = sqrt_pos(1.0 + m00 + m11 + m22)
    qa_i = sqrt_pos(1.0 + m00 - m11 - m22)
    qa_j = sqrt_pos(1.0 - m00 + m11 - m22)
    qa_k = sqrt_pos(1.0 - m00 - m11 + m22)

    flr = 0.1
    cands = (
        (qa_r, (qa_r * qa_r, m21 - m12, m02 - m20, m10 - m01)),
        (qa_i, (m21 - m12, qa_i * qa_i, m10 + m01, m02 + m20)),
        (qa_j, (m02 - m20, m10 + m01, qa_j * qa_j, m12 + m21)),
        (qa_k, (m10 - m01, m20 + m02, m21 + m12, qa_k * qa_k)),
    )
    # argmax over the four q_abs planes, first-match-wins like jnp.argmax
    best = jnp.zeros_like(qa_r, dtype=jnp.int32)
    cur = qa_r
    for n, (qa, _) in enumerate(cands[1:], start=1):
        take = qa > cur
        best = jnp.where(take, n, best)
        cur = jnp.maximum(cur, qa)
    out = [jnp.zeros_like(qa_r) for _ in range(4)]
    for n, (qa, cand) in enumerate(cands):
        inv = 1.0 / (2.0 * jnp.maximum(qa, flr))
        sel = best == n
        for c in range(4):
            out[c] = jnp.where(sel, cand[c] * inv, out[c])
    return tuple(out)


def _quat_to_aa_soa(r, i, j, k):
    """wxyz quaternion planes -> axis-angle planes (same angle-based Taylor
    branch as :func:`quaternion_to_axis_angle`)."""
    sq = i * i + j * j + k * k
    norms = jnp.where(sq > 0.0, jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)), 0.0)
    half = jnp.arctan2(norms, r)
    angles = 2.0 * half
    small = jnp.abs(angles) < _EPS
    s = jnp.where(small, 0.5 - (angles * angles) / 48.0,
                  jnp.sin(half) / jnp.where(small, 1.0, angles))
    return i / s, j / s, k / s


def aa_feature_to_6d(x: jnp.ndarray) -> jnp.ndarray:
    """Flattened per-frame axis-angle features (..., J*3) -> (..., J*6).

    The reference applies this reshape before every VAE encode
    (``diffusion_transformer.py:195-196`` in /root/reference).
    """
    j = x.shape[-1] // 3
    q = _aa_to_quat_soa(*_soa_planes(x, 3))
    m = _quat_to_matrix_soa(*q)
    return _soa_pack(m[:6], x.shape[:-1], j)


def d6_feature_to_aa(x: jnp.ndarray) -> jnp.ndarray:
    """Flattened per-frame 6d features (..., J*6) -> (..., J*3) axis-angle."""
    j = x.shape[-1] // 6
    m = _d6_to_matrix_soa(*_soa_planes(x, 6))
    q = _matrix_to_quat_soa(*m)
    aa = _quat_to_aa_soa(*q)
    return _soa_pack(list(aa), x.shape[:-1], j)


def slerp_6d(x0: jnp.ndarray, x1: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Linear blend of two 6d-rotation feature tensors (used by the long-form
    cross-fade, reference ``tools/longform_synthesis.py:431-518``).

    The reference cross-fades raw 6d features with linspace weights and relies
    on the Gram-Schmidt projection of ``rotation_6d_to_matrix`` to re-normalize
    — we do the same: plain lerp in 6d space.
    """
    return x0 * (1.0 - w) + x1 * w


# -- legacy quaternion helpers (reference mogen/datasets/utils/quaternion.py,
#    not on the main path; kept for API completeness) ------------------------

def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (..., 4) wxyz quaternions."""
    w1, x1, y1, z1 = jnp.split(q, 4, axis=-1)
    w2, x2, y2, z2 = jnp.split(r, 4, axis=-1)
    return jnp.concatenate([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of unit (..., 4) quaternions (conjugate)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qslerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions; antipodal-safe."""
    t = jnp.asarray(t)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    # fall back to lerp when nearly parallel.  ``near`` is decided on the
    # (clipped) dot, and arccos is evaluated on a SAFE input: arccos'(1) is
    # -inf, so without the double-where interpolating two identical
    # quaternions (a still pose) NaNs under jax.grad
    dot_c = jnp.clip(dot, -1.0, 1.0)
    near = dot_c > 1.0 - 1e-7
    theta = jnp.arccos(jnp.where(near, 0.0, dot_c))
    sin_theta = jnp.sin(theta)
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta)
                   / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta)
                   / jnp.where(near, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
