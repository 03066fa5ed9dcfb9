"""Visualization fallback path: npz → skeleton frames → GIF."""

import os

import numpy as np

from raggesture_tpu.utils.motion_io import save_smplx_npz
from raggesture_tpu.utils.visualization import (
    active_frame_range,
    joints_from_npz,
    render_gt_pred_side_by_side,
    skeleton_frames,
)


def _make_npz(path, T=8):
    rng = np.random.RandomState(0)
    save_smplx_npz(path, rng.randn(T, 165).astype(np.float32) * 0.1,
                   rng.randn(T, 100).astype(np.float32),
                   rng.randn(T, 3).astype(np.float32) * 0.01)


def test_active_frame_range():
    poses = np.zeros((10, 165))
    poses[3:7] = 1.0
    r = active_frame_range(poses)
    assert (r.start, r.stop) == (3, 7)
    assert active_frame_range(np.zeros((5, 165))) == slice(0, 5)


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
