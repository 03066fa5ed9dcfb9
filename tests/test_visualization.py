"""Visualization: skeleton fallback, vertex-frame generation (LBS), the
software mesh rasterizer, and the shared-camera side-by-side mesh path."""

import os

import numpy as np

from raggesture_tpu.models.smplx import synthetic_faces, synthetic_model
from raggesture_tpu.utils.motion_io import save_smplx_npz
from raggesture_tpu.utils.visualization import (
    _SMPLX_PARENTS,
    active_frame_mask,
    active_frame_range,
    checkerboard_floor,
    compute_auto_framing,
    joints_from_npz,
    rasterize_mesh,
    render_gt_pred_side_by_side,
    skeleton_frames,
    smplx_active_anchor,
    software_mesh_frames,
    vertices_from_npz,
)


def _make_npz(path, T=8, dim=165):
    rng = np.random.RandomState(0)
    save_smplx_npz(path, rng.randn(T, dim).astype(np.float32) * 0.1,
                   rng.randn(T, 100).astype(np.float32),
                   rng.randn(T, 3).astype(np.float32) * 0.01)


def test_active_frame_range():
    poses = np.zeros((10, 165))
    poses[3:7] = 1.0
    r = active_frame_range(poses)
    assert (r.start, r.stop) == (3, 7)
    assert active_frame_range(np.zeros((5, 165))) == slice(0, 5)
    assert active_frame_mask(poses).sum() == 4


def test_eye_joint_parents():
    # SMPL-X parents jaw (22), leye (23), reye (24) all to the head (15)
    assert _SMPLX_PARENTS[22] == 15
    assert _SMPLX_PARENTS[23] == 15
    assert _SMPLX_PARENTS[24] == 15


def test_joints_and_render(tmp_path):
    gt = str(tmp_path / "gt.npz")
    pred = str(tmp_path / "pred.npz")
    _make_npz(gt)
    _make_npz(pred)
    j = joints_from_npz(gt)
    assert j.shape == (8, 55, 3)
    frames = skeleton_frames([j[:3]], ["x"], width=160, height=120)
    assert len(frames) == 3 and frames[0].ndim == 3
    out = render_gt_pred_side_by_side(gt, pred, str(tmp_path / "v.mp4"),
                                      fps=5, max_frames=4)
    assert os.path.exists(out)  # .gif fallback without ffmpeg


def test_vertices_from_npz_synthetic(tmp_path):
    model = synthetic_model()
    T, J = 6, 4
    poses = np.zeros((T, J * 3), np.float32)
    poses[1:] = np.random.RandomState(1).randn(T - 1, J * 3) * 0.2
    trans = np.tile(np.array([[0.1, 0.2, 0.3]], np.float32), (T, 1))
    p = str(tmp_path / "m.npz")
    save_smplx_npz(p, poses, np.zeros((T, 5), np.float32), trans)
    verts = vertices_from_npz(p, model, batch=4)  # forces a padded tail
    assert verts.shape == (T, 24, 3)
    # zero pose + zero betas -> template + translation (frame 0)
    np.testing.assert_allclose(
        verts[0], np.asarray(model.v_template) + trans[0], atol=1e-5)
    anchor = smplx_active_anchor(p, model)
    assert anchor.shape == (3,) and np.isfinite(anchor).all()


def test_compute_auto_framing():
    verts = np.random.RandomState(0).randn(5, 20, 3).astype(np.float32)
    mask = np.array([False, True, True, True, False])
    pose, floor_y = compute_auto_framing(verts, mask)
    assert pose.shape == (4, 4) and pose[3, 3] == 1.0
    assert floor_y <= verts[mask][..., 1].min()
    # camera sits 2 m behind the character's mean z
    assert abs(pose[2, 3] - (verts[mask][..., 2].mean() + 2.0)) < 1e-5


def test_checkerboard_floor():
    v, f, c = checkerboard_floor(y=0.5, length=4.0, tile=1.0)
    assert v.shape == (4 * 16, 3) and f.shape == (32, 3) and c.shape == (32, 3)
    assert np.all(v[:, 1] == 0.5)
    assert f.max() < len(v)


def test_rasterize_zbuffer_and_colors():
    # camera at origin looking down -Z; two stacked triangles, near one wins
    cam = np.eye(4, dtype=np.float32)
    verts = np.array([
        [-1, -1, -2.0], [1, -1, -2.0], [0, 1, -2.0],   # near, red
        [-1, -1, -4.0], [1, -1, -4.0], [0, 1, -4.0],   # far, green
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    colors = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    img = rasterize_mesh(verts, faces, colors, cam, 64, 64,
                         bg=(10, 10, 10))
    center = img[32, 32]
    assert center[0] > center[1], "near (red) triangle must win the z-test"
    assert tuple(img[0, 0]) == (10, 10, 10), "background preserved"


def test_software_mesh_frames_hides_inactive():
    model = synthetic_model()
    faces = synthetic_faces()
    T = 3
    verts = np.tile(np.asarray(model.v_template)[None], (T, 1, 1))
    active = np.array([True, False, True])
    cam, floor_y = compute_auto_framing(verts, active)
    frames = software_mesh_frames(verts, faces, active, cam, floor_y,
                                  width=48, height=64)
    assert len(frames) == T and frames[0].shape == (64, 48, 3)
    # the inactive frame renders floor/bg only -> differs from active frames
    assert not np.array_equal(frames[0], frames[1])
    assert np.array_equal(frames[0], frames[2])


def test_mesh_side_by_side(tmp_path):
    model = synthetic_model()
    faces = synthetic_faces()
    T, J = 4, 4
    rng = np.random.RandomState(0)
    for name in ("gt", "pred"):
        save_smplx_npz(str(tmp_path / f"{name}.npz"),
                       rng.randn(T, J * 3).astype(np.float32) * 0.1,
                       np.zeros((T, 5), np.float32),
                       np.zeros((T, 3), np.float32))
    out = render_gt_pred_side_by_side(
        str(tmp_path / "gt.npz"), str(tmp_path / "pred.npz"),
        str(tmp_path / "v.mp4"), smplx_model=model, faces=faces)
    assert os.path.exists(out)
    from PIL import Image

    img = Image.open(out)
    assert img.size[0] == 2 * 320  # two mesh panels at default panel width


def test_mesh_frames_falls_back_when_pyrender_egl_fails(monkeypatch):
    """pyrender installed but EGL context creation failing must fall back
    to the software rasterizer instead of crashing the render tool."""
    import warnings

    from raggesture_tpu.utils import visualization as V

    def boom(*a, **k):
        raise RuntimeError("EGL device query failed")

    monkeypatch.setattr(V, "HAS_PYRENDER", True)
    monkeypatch.setattr(V, "_pyrender_mesh_frames", boom)

    verts = np.zeros((2, 4, 3), np.float32)
    verts[:, 1, 0] = 0.5
    verts[:, 2, 1] = 0.5
    verts[:, 3, 2] = 0.5
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    active = np.ones((2,), bool)
    cam, floor_y = V.compute_auto_framing(verts, active)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        frames = V.mesh_frames(verts, faces, active, cam, floor_y=floor_y,
                               width=64, height=64)
    assert len(frames) == 2 and frames[0].shape == (64, 64, 3)
    assert any("falling back" in str(w.message) for w in rec)


def test_pyrender_branch_call_contract(monkeypatch):
    """Pin _pyrender_mesh_frames' scene-assembly contract with mocked
    pyrender/trimesh modules (reference render_smplx_debug_video,
    /root/reference/mogen/utils/visualization.py:339-433): gray background
    + ambient scene, checkerboard floor added flat-shaded, pi/3 camera at
    the framing pose, key/fill directional lights (3.0/1.5, fill offset
    x=1.5 y=2.0), one OffscreenRenderer(width, height) render per frame,
    the body mesh re-added smooth-shaded per ACTIVE frame and removed
    after, and renderer.delete() on exit.  pyrender is not installed in
    this image — the mock locks the interface so the only otherwise
    unexecuted branch in the repo has its argument assembly tested."""
    import sys
    import types

    from raggesture_tpu.utils import visualization as V

    calls = {"scene_adds": [], "renders": 0, "removed": [], "trimeshes": [],
             "deleted": [], "renderer_args": None, "scene_kwargs": None}

    class FakeNode:
        def __init__(self, obj):
            self.obj = obj

    class FakeScene:
        def __init__(self, **kw):
            calls["scene_kwargs"] = kw

        def add(self, obj, pose=None):
            node = FakeNode(obj)
            calls["scene_adds"].append((obj, None if pose is None
                                        else np.asarray(pose)))
            return node

        def remove_node(self, node):
            calls["removed"].append(node)

    class FakeMesh:
        def __init__(self, tm, smooth):
            self.tm, self.smooth = tm, smooth

        @staticmethod
        def from_trimesh(tm, smooth=True):
            return FakeMesh(tm, smooth)

    class FakeCamera:
        def __init__(self, yfov, aspectRatio):
            self.yfov, self.aspect = yfov, aspectRatio

    class FakeLight:
        def __init__(self, color, intensity):
            self.intensity = intensity

    class FakeRenderer:
        def __init__(self, w, h):
            calls["renderer_args"] = (w, h)
            self._w, self._h = w, h

        def render(self, scene):
            calls["renders"] += 1
            return (np.full((self._h, self._w, 3), 7, np.uint8),
                    np.zeros((self._h, self._w), np.float32))

        def delete(self):
            calls["deleted"].append(True)

    class FakeVisual:
        vertex_colors = None

    class FakeTrimesh:
        def __init__(self, vertices=None, faces=None, face_colors=None,
                     process=True):
            self.vertices = np.asarray(vertices)
            self.faces = np.asarray(faces)
            self.face_colors = face_colors
            self.process = process
            self.visual = FakeVisual()
            calls["trimeshes"].append(self)

    fake_pyrender = types.ModuleType("pyrender")
    fake_pyrender.Scene = FakeScene
    fake_pyrender.Mesh = FakeMesh
    fake_pyrender.PerspectiveCamera = FakeCamera
    fake_pyrender.DirectionalLight = FakeLight
    fake_pyrender.OffscreenRenderer = FakeRenderer
    fake_trimesh = types.ModuleType("trimesh")
    fake_trimesh.Trimesh = FakeTrimesh
    monkeypatch.setitem(sys.modules, "pyrender", fake_pyrender)
    monkeypatch.setitem(sys.modules, "trimesh", fake_trimesh)

    verts = np.zeros((3, 4, 3), np.float32)
    verts[:, 1, 0] = 0.5
    verts[:, 2, 1] = 0.5
    verts[:, 3, 2] = 0.5
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    active = np.asarray([True, False, True])
    cam, floor_y = V.compute_auto_framing(verts, active)

    frames = V._pyrender_mesh_frames(verts, faces, active, cam, floor_y,
                                     width=48, height=64,
                                     mesh_color=(10, 20, 30))

    # one rendered frame per input frame, at the renderer's size
    assert len(frames) == 3 and frames[0].shape == (64, 48, 3)
    assert calls["renders"] == 3
    assert calls["renderer_args"] == (48, 64)
    # scene construction: gray bg + ambient light
    np.testing.assert_allclose(calls["scene_kwargs"]["bg_color"],
                               [0.75, 0.75, 0.75, 1.0])
    np.testing.assert_allclose(calls["scene_kwargs"]["ambient_light"],
                               [0.35, 0.35, 0.35])
    # static adds: floor mesh (flat), camera (pi/3 at cam pose), 2 lights
    static = calls["scene_adds"][:4]
    floor_mesh = static[0][0]
    assert isinstance(floor_mesh, FakeMesh) and floor_mesh.smooth is False
    camera = static[1][0]
    assert isinstance(camera, FakeCamera)
    np.testing.assert_allclose(camera.yfov, np.pi / 3.0)
    np.testing.assert_allclose(camera.aspect, 48.0 / 64.0)
    np.testing.assert_allclose(static[1][1], cam.astype(np.float64))
    key, fill = static[2][0], static[3][0]
    assert (key.intensity, fill.intensity) == (3.0, 1.5)
    np.testing.assert_allclose(static[2][1], cam.astype(np.float64))
    fill_pose = static[3][1]
    assert (fill_pose[0, 3], fill_pose[1, 3]) == (1.5, 2.0)
    # per-frame: body mesh added smooth-shaded for the 2 ACTIVE frames
    # only, removed after each, with the RGBA vertex color applied
    body_adds = calls["scene_adds"][4:]
    assert len(body_adds) == 2 and len(calls["removed"]) == 2
    for mesh, pose in body_adds:
        assert isinstance(mesh, FakeMesh) and mesh.smooth is True
        np.testing.assert_array_equal(
            mesh.tm.visual.vertex_colors[0], [10, 20, 30, 255])
        assert mesh.tm.vertices.shape == (4, 3)
    assert calls["deleted"] == [True]
