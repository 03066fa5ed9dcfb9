"""SMPL-X LBS property tests (synthetic rig) + metric golden tests."""

import jax
import jax.numpy as jnp
import numpy as np

from raggesture_tpu.eval import metrics as M
from raggesture_tpu.models import smplx as S
from raggesture_tpu.ops.rotations import axis_angle_to_matrix


def test_lbs_zero_pose_is_rest():
    model = S.synthetic_model()
    J = model.num_joints
    B = 2
    betas = jnp.zeros((B, 10))
    pose = jnp.zeros((B, J * 3))

    @jax.jit
    def run(b, p):
        return S.lbs(model, b, p)

    joints, verts = run(betas, pose)
    rest = jnp.einsum("jv,vd->jd", model.j_regressor, model.v_template)
    np.testing.assert_allclose(np.asarray(joints[0]), np.asarray(rest), atol=1e-5)
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(model.v_template),
                               atol=1e-5)


def test_lbs_global_rotation_is_rigid():
    """Rotating only the root applies one rigid rotation to everything."""
    model = S.synthetic_model()
    J = model.num_joints
    aa = jnp.zeros((1, J, 3)).at[0, 0].set(jnp.array([0.3, -0.2, 0.5]))

    @jax.jit
    def run(p):
        return S.lbs(model, jnp.zeros((1, 10)), p.reshape(1, -1))

    joints, verts = run(aa)
    R = axis_angle_to_matrix(aa[0, 0])
    rest = jnp.einsum("jv,vd->jd", model.j_regressor, model.v_template)
    root = rest[0]
    expect = (R @ (rest - root).T).T + root
    np.testing.assert_allclose(np.asarray(joints[0]), np.asarray(expect),
                               atol=1e-4)
    expect_v = (R @ (model.v_template - root).T).T + root
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(expect_v),
                               atol=1e-4)


def test_lbs_translation_and_betas():
    model = S.synthetic_model()
    J = model.num_joints

    @jax.jit
    def run(b, t):
        return S.lbs(model, b, jnp.zeros((1, J * 3)), transl=t)

    t = jnp.array([[1.0, 2.0, 3.0]])
    j0, _ = run(jnp.zeros((1, 10)), t * 0)
    j1, _ = run(jnp.zeros((1, 10)), t)
    np.testing.assert_allclose(np.asarray(j1 - j0), np.broadcast_to(
        np.array([1.0, 2.0, 3.0]), j0.shape), atol=1e-5)
    # betas change the rest shape
    j2, _ = run(jnp.ones((1, 10)), t * 0)
    assert np.abs(np.asarray(j2 - j0)).max() > 1e-4


def test_l1div_golden():
    m = M.L1div()
    x = np.array([[0.0, 0.0], [2.0, 2.0]])
    m.run(x.copy())
    # mean is (1,1); |dev| sums to 4 over 2 rows -> 2.0
    assert m.avg() == 2.0


def test_srgr_golden():
    m = M.SRGR(threshold=0.3, joints=2)
    res = np.zeros((1, 2, 3))
    tgt = np.zeros((1, 2, 3))
    sem = np.array([0.165])
    rate = m.run(res, tgt, sem)
    # all joints succeed, semantic*1/0.165 = 1 -> rate 1.0
    np.testing.assert_allclose(rate, 1.0)


def test_gahr_and_alignment():
    a = [1.0, 2.0, 3.0]
    assert M.BeatAlignment.gahr(a, a, 0.3) == 1.0
    far = M.BeatAlignment.gahr([0.0], [10.0], 0.3)
    assert far < 1e-6
    align = M.BeatAlignment(sigma=0.3, order=2, upper_body=[0],
                            mean_velocity=np.ones(1))
    t = np.linspace(0, 4 * np.pi, 60)
    joints = np.stack([np.sin(t) * 5, np.zeros_like(t), np.zeros_like(t)], -1)
    beats = align.motion_beats(joints.reshape(60, 3), pose_fps=15)
    assert len(beats) == 1 and len(beats[0]) >= 1


def test_frechet_distance_properties():
    r = np.random.RandomState(0)
    a = r.randn(500, 8)
    assert M.frechet_distance(a, a.copy()) < 1e-6
    b = a + 3.0
    d = M.frechet_distance(a, b)
    assert abs(d - 8 * 9.0) < 2.0  # ||mu diff||^2 = 8 * 3^2


def test_diversity_and_mpjpe():
    feats = np.array([[0.0, 0.0], [3.0, 4.0]])
    assert abs(M.calc_diversity(feats) - 5.0) < 1e-6
    m = M.MPJPE()
    pred = np.zeros((2, 3, 3))
    gt = np.zeros((2, 3, 3))
    gt[..., 0] = 1.0
    err = m.compute_error(pred, gt)
    assert abs(err - 1.0) < 1e-6
    assert abs(m.get_average_error() - 1.0) < 1e-6


def test_onset_detection_on_clicks():
    sr = 16000
    y = np.zeros(sr * 2, np.float32)
    for t in (0.5, 1.0, 1.5):
        i = int(t * sr)
        y[i : i + 200] = np.sign(np.sin(np.linspace(0, 80 * np.pi, 200))).astype(
            np.float32
        )
    onsets = M.detect_onsets(y, sr)
    assert len(onsets) >= 3
    for t in (0.5, 1.0, 1.5):
        assert np.min(np.abs(onsets - t)) < 0.08, (t, onsets)


def test_foot_contacts_static_pose():
    model = S.synthetic_model()
    J = model.num_joints
    T = 10
    pose = jnp.zeros((T, J * 3))
    transl = jnp.zeros((T, 3))
    betas = jnp.zeros((T, 10))

    @jax.jit
    def run(b, p, t):
        return S.foot_contacts(model, b, p, t, foot_joint_ids=(1, 2))

    c = run(betas, pose, transl)
    # static pose -> all contacts on
    np.testing.assert_allclose(np.asarray(c), 1.0)
