"""Motion rendering: SMPL-X mesh videos (pyrender EGL, with a numpy
software-rasterizer fallback) plus a dependency-free skeleton fallback
(matplotlib → GIF/mp4).

Capability match for /root/reference/mogen/utils/visualization.py:
- checkerboard floor (:26-68)
- auto-framing camera from active (nonzero-pose) frames (:302-337)
- EGL offscreen mesh render, mesh hidden on inactive frames (:339-440)
- GT-vs-pred / pred-vs-retrieval side-by-side with a SHARED camera + floor so
  both characters land in the same screen region (:443-573)
- active-anchor alignment helper for retrieval panels (:267-299)
- ffmpeg audio muxing / hstack (:71-168)

TPU-native differences: vertices come from the batched JAX LBS
(``models/smplx.py::lbs``) in fixed-size jitted batches instead of the torch
smplx package; panels are rendered to numpy frames and stitched host-side,
so side-by-side needs no ffmpeg hstack pass.  When pyrender/EGL is absent a
pure-numpy z-buffer rasterizer draws the same scene (floor + Lambert-shaded
mesh + shared camera); when matplotlib-only, a skeleton line plot; when
ffmpeg is absent, animated GIF.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import warnings
from typing import List, Optional, Tuple

import numpy as np

from .logger import get_root_logger

try:  # pragma: no cover - env dependent
    import pyrender  # noqa: F401
    import trimesh  # noqa: F401

    HAS_PYRENDER = True
except ImportError:
    HAS_PYRENDER = False

HAS_FFMPEG = shutil.which("ffmpeg") is not None

# SMPL-X kinematic bones (parent connections of the 55-joint skeleton).
# Joints 22/23/24 are jaw/leye/reye — all three parented to the head (15).
_SMPLX_PARENTS = [
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    15, 15, 15, 20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,
]

# Panel colors, RGB 0-255 (reference defaults :446-449, :513-516)
GT_COLOR = (180, 54, 54)
PRED_COLOR = (36, 73, 156)
RETR_COLOR = (54, 156, 73)


def active_frame_mask(poses: np.ndarray, tol: float = 1e-6) -> np.ndarray:
    """Frames where the pose vector has any nonzero entry (reference
    _active_frame_mask :339-347: zero-padded retrieval frames decode to the
    template at origin and would skew framing)."""
    flat = np.asarray(poses).reshape(poses.shape[0], -1)
    return np.any(np.abs(flat) > tol, axis=1)


def active_frame_range(poses: np.ndarray) -> slice:
    """Contiguous span of active frames (for trimming skeleton videos)."""
    idx = np.where(active_frame_mask(poses))[0]
    if len(idx) == 0:
        return slice(0, poses.shape[0])
    return slice(int(idx[0]), int(idx[-1]) + 1)


# ---------------------------------------------------------------------------
# Vertex / joint generation (JAX LBS)
# ---------------------------------------------------------------------------


def _lbs_batched(smplx_model, poses, trans, exps, betas, return_verts,
                 batch: int = 256):
    """Run models.smplx.lbs over (T, …) params in fixed-size jitted batches
    (pad the tail so every call hits the same compiled executable)."""
    import jax
    import jax.numpy as jnp

    from ..models.smplx import lbs

    T = poses.shape[0]
    nb = smplx_model.shapedirs.shape[-1]
    ne = smplx_model.exprdirs.shape[-1]
    b = np.zeros((T, nb), np.float32)
    if betas is not None:
        bet = np.asarray(betas, np.float32).reshape(-1)[:nb]
        b[:] = bet
    e = np.zeros((T, ne), np.float32)
    if exps is not None:
        e[:, : min(ne, exps.shape[1])] = exps[:, :ne]
    t = (np.zeros((T, 3), np.float32) if trans is None
         else np.asarray(trans, np.float32))

    fn = jax.jit(lambda bb, pp, ee, tt: lbs(
        smplx_model, bb, pp, expression=ee, transl=tt,
        return_verts=return_verts))
    joints_out, verts_out = [], []
    for s in range(0, T, batch):
        end = min(s + batch, T)
        pad = batch - (end - s)
        sl = lambda a: np.pad(a[s:end], ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        j, v = fn(jnp.asarray(sl(b)), jnp.asarray(sl(poses)),
                  jnp.asarray(sl(e)), jnp.asarray(sl(t)))
        joints_out.append(np.asarray(j)[: end - s])
        if return_verts:
            verts_out.append(np.asarray(v)[: end - s])
    joints = np.concatenate(joints_out, 0)
    verts = np.concatenate(verts_out, 0) if return_verts else None
    return joints, verts


def vertices_from_npz(npz_path: str, smplx_model, max_frames: int = 600,
                      batch: int = 256) -> np.ndarray:
    """(T, V, 3) LBS vertices from a result npz (reference
    _smplx_vertices_from_params :186-227, torch-batched there; one jitted
    JAX LBS in fixed-size batches here)."""
    d = np.load(npz_path, allow_pickle=True)
    poses = np.asarray(d["poses"], np.float32)[:max_frames]
    trans = np.asarray(d["trans"], np.float32)[:max_frames]
    exps = (np.asarray(d["expressions"], np.float32)[:max_frames]
            if "expressions" in d else None)
    betas = np.asarray(d["betas"], np.float32) if "betas" in d else None
    _, verts = _lbs_batched(smplx_model, poses, trans, exps, betas,
                            return_verts=True, batch=batch)
    return verts


def smplx_active_anchor(npz_path: str, smplx_model,
                        max_frames: int = 600) -> np.ndarray:
    """[mean_x, min_y, mean_z] of active-frame vertices (reference
    smplx_active_anchor :267-299) — subtract a retrieval clip's anchor from
    the pred clip's anchor and add the delta to the retrieval translation to
    co-locate both characters on screen."""
    d = np.load(npz_path, allow_pickle=True)
    verts = vertices_from_npz(npz_path, smplx_model, max_frames)
    mask = active_frame_mask(np.asarray(d["poses"])[:max_frames])
    if mask.any():
        verts = verts[mask]
    return np.array([float(verts[..., 0].mean()), float(verts[..., 1].min()),
                     float(verts[..., 2].mean())], np.float32)


def joints_from_npz(npz_path: str, smplx_model=None, max_frames: int = 600
                    ) -> np.ndarray:
    """(T, 55, 3) joints from a result npz — SMPL-X FK when a model is
    given, otherwise a zero-shape FK surrogate (bone offsets from pose only,
    adequate for motion visualization)."""
    d = np.load(npz_path, allow_pickle=True)
    poses = np.asarray(d["poses"], np.float32)[:max_frames]
    trans = np.asarray(d["trans"], np.float32)[:max_frames]
    if smplx_model is not None:
        exps = (np.asarray(d["expressions"], np.float32)[:max_frames]
                if "expressions" in d else None)
        betas = np.asarray(d["betas"], np.float32) if "betas" in d else None
        joints, _ = _lbs_batched(smplx_model, poses, trans, exps, betas,
                                 return_verts=False)
        return joints
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


# ---------------------------------------------------------------------------
# Camera / floor (shared by pyrender and software paths)
# ---------------------------------------------------------------------------


def compute_auto_framing(vertices: np.ndarray,
                         active_mask: Optional[np.ndarray] = None,
                         cam_y_offset: float = 0.4
                         ) -> Tuple[np.ndarray, float]:
    """(camera_pose 4x4 cam→world, floor_y) from a vertex sequence.

    Behavioral constants match the reference renderer (compute_auto_framing
    :302-337) for pixel parity: floor 2 cm below the lowest active vertex,
    eye at body mid-height + ``cam_y_offset`` and 2 m behind the centroid,
    −8° pitch about x. The pose is composed here (R_x(pitch) ∘ translate)
    rather than written out entrywise.
    """
    fv = vertices
    if active_mask is not None and active_mask.any():
        fv = vertices[active_mask]
    lo_y, hi_y = float(fv[..., 1].min()), float(fv[..., 1].max())
    floor_y = lo_y - 0.02
    eye = np.array([fv[..., 0].mean(),
                    0.5 * (floor_y + hi_y) + cam_y_offset,
                    fv[..., 2].mean() + 2.0], np.float64)
    pitch = np.deg2rad(-8.0)
    pose = np.eye(4, dtype=np.float32)
    pose[1:3, 1:3] = [[np.cos(pitch), -np.sin(pitch)],
                      [np.sin(pitch), np.cos(pitch)]]
    pose[:3, 3] = eye
    return pose, floor_y


# one quad per tile, fanned into two CCW-up triangles (winding matches the
# reference floor so back-face culling behaves identically)
_TILE_CORNER_XZ = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
_TILE_TRIS = np.array([[0, 2, 1], [0, 3, 2]], np.int32)


def checkerboard_floor(y: float, length: float = 12.0, tile: float = 1.0,
                       color_a=(170, 170, 170), color_b=(120, 120, 120)
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(verts (N,3), faces (M,3), face_colors (M,3) uint8): an n×n
    checkerboard in the y plane, built as one vectorized lattice pass.
    Tile size/colors are the reference's (create_checkerboard_floor :26-68).
    """
    n = max(1, int(length / tile))
    ij = np.stack(np.meshgrid(np.arange(n), np.arange(n), indexing="ij"),
                  axis=-1).reshape(-1, 2)                       # (n², 2) tile ids
    corner_xz = (ij[:, None, :] + _TILE_CORNER_XZ) * tile - length * 0.5
    verts = np.concatenate(
        [corner_xz[..., :1],
         np.full((n * n, 4, 1), y, np.float32),
         corner_xz[..., 1:]], axis=-1).astype(np.float32).reshape(-1, 3)
    faces = (np.arange(n * n, dtype=np.int32)[:, None, None] * 4
             + _TILE_TRIS).reshape(-1, 3)
    even = (ij.sum(axis=1) % 2 == 0)
    tile_rgb = np.where(even[:, None], np.asarray(color_a, np.uint8),
                        np.asarray(color_b, np.uint8))
    return verts, faces, np.repeat(tile_rgb, 2, axis=0).astype(np.uint8)


# ---------------------------------------------------------------------------
# Software rasterizer (numpy z-buffer, Lambert shading)
# ---------------------------------------------------------------------------


def rasterize_mesh(verts: np.ndarray, faces: np.ndarray,
                   face_colors: np.ndarray, camera_pose: np.ndarray,
                   width: int, height: int, yfov: float = np.pi / 3.0,
                   bg=(191, 191, 191),
                   light_dir=(0.3, -0.8, -0.5)) -> np.ndarray:
    """One frame: z-buffered perspective rasterization, fully vectorized
    (per-triangle bbox pixels flattened into one barycentric pass + a
    minimum.at depth resolve) — no per-pixel Python loops.

    verts: (V, 3) world;  faces: (F, 3);  face_colors: (F, 3) uint8 base
    colors (two-sided Lambert-shaded);  camera_pose: 4x4 cam→world, OpenGL
    convention (camera looks along -Z).  Returns (H, W, 3) uint8.
    """
    R, t = camera_pose[:3, :3], camera_pose[:3, 3]
    vc = (verts - t) @ R  # world → camera
    f = 0.5 * height / np.tan(0.5 * yfov)
    z = -vc[:, 2]
    z = np.maximum(z, 1e-6)
    sx = 0.5 * width + f * vc[:, 0] / z
    sy = 0.5 * height - f * vc[:, 1] / z

    tri = faces
    # two-sided Lambert shading per face (world-space normals)
    e1 = verts[tri[:, 1]] - verts[tri[:, 0]]
    e2 = verts[tri[:, 2]] - verts[tri[:, 0]]
    n = np.cross(e1, e2)
    nn = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(nn, 1e-12)
    ld = np.asarray(light_dir, np.float32)
    ld = ld / np.linalg.norm(ld)
    lam = np.abs(n @ ld)
    shade = np.clip(0.35 + 0.65 * lam, 0.0, 1.0)
    shaded = (face_colors.astype(np.float32) * shade[:, None]).astype(np.uint8)

    # visible faces: all three verts in front of the camera
    infront = (-vc[:, 2] > 0.05)[tri].all(axis=1)
    x0 = np.clip(np.floor(np.minimum.reduce(
        [sx[tri[:, k]] for k in range(3)])), 0, width - 1).astype(np.int64)
    x1 = np.clip(np.ceil(np.maximum.reduce(
        [sx[tri[:, k]] for k in range(3)])), 0, width - 1).astype(np.int64)
    y0 = np.clip(np.floor(np.minimum.reduce(
        [sy[tri[:, k]] for k in range(3)])), 0, height - 1).astype(np.int64)
    y1 = np.clip(np.ceil(np.maximum.reduce(
        [sy[tri[:, k]] for k in range(3)])), 0, height - 1).astype(np.int64)
    w = np.where(infront, x1 - x0 + 1, 0)
    h = np.where(infront, y1 - y0 + 1, 0)
    area = w * h
    keep = area > 0
    if not keep.any():
        img = np.empty((height, width, 3), np.uint8)
        img[:] = bg
        return img
    tri_idx = np.where(keep)[0]
    area_k = area[tri_idx]
    starts = np.concatenate([[0], np.cumsum(area_k)[:-1]])
    N = int(area_k.sum())
    owner = np.repeat(np.arange(len(tri_idx)), area_k)
    local = np.arange(N) - starts[owner]
    tid = tri_idx[owner]
    px = x0[tid] + local % w[tid]
    py = y0[tid] + local // w[tid]

    ax, ay = sx[tri[tid, 0]], sy[tri[tid, 0]]
    bx, by = sx[tri[tid, 1]], sy[tri[tid, 1]]
    cx, cy = sx[tri[tid, 2]], sy[tri[tid, 2]]
    fx, fy = px + 0.5, py + 0.5
    d = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
    w0 = (bx - fx) * (cy - fy) - (cx - fx) * (by - fy)
    w1 = (cx - fx) * (ay - fy) - (ax - fx) * (cy - fy)
    w2 = d - w0 - w1
    nondeg = np.abs(d) > 1e-9
    inside = nondeg & (
        ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) |
        ((w0 <= 0) & (w1 <= 0) & (w2 <= 0)))
    dsafe = np.where(nondeg, d, 1.0)
    b0, b1, b2 = w0 / dsafe, w1 / dsafe, w2 / dsafe
    # perspective-correct depth: interpolate 1/z
    iz = (b0 / z[tri[tid, 0]] + b1 / z[tri[tid, 1]] + b2 / z[tri[tid, 2]])
    depth = 1.0 / np.maximum(iz, 1e-9)

    pix = (py * width + px)[inside]
    dep = depth[inside]
    col = shaded[tid[inside]]
    zbuf = np.full(width * height, np.inf, np.float32)
    np.minimum.at(zbuf, pix, dep)
    win = dep <= zbuf[pix] * (1 + 1e-6)
    pix, dep, col = pix[win], dep[win], col[win]
    order = np.argsort(-dep, kind="stable")  # paint far→near; nearest last
    img = np.empty((height * width, 3), np.uint8)
    img[:] = bg
    img[pix[order]] = col[order]
    return img.reshape(height, width, 3)


def software_mesh_frames(verts_seq: np.ndarray, faces: np.ndarray,
                         active: np.ndarray, camera_pose: np.ndarray,
                         floor_y: float, width: int, height: int,
                         mesh_color=PRED_COLOR) -> List[np.ndarray]:
    """Render a vertex sequence with the checkerboard floor; the mesh is
    hidden on inactive frames, matching the reference render loop
    (:412-433)."""
    fverts, ffaces, fcolors = checkerboard_floor(floor_y)
    mcolors = np.tile(np.asarray(mesh_color, np.uint8), (faces.shape[0], 1))
    frames = []
    for ti in range(verts_seq.shape[0]):
        if bool(active[ti]):
            av = np.concatenate([fverts, verts_seq[ti]], 0)
            af = np.concatenate([ffaces, faces + fverts.shape[0]], 0)
            ac = np.concatenate([fcolors, mcolors], 0)
        else:
            av, af, ac = fverts, ffaces, fcolors
        frames.append(rasterize_mesh(av, af, ac, camera_pose, width, height))
    return frames


def _pyrender_mesh_frames(verts_seq, faces, active, camera_pose, floor_y,
                          width, height, mesh_color=PRED_COLOR
                          ) -> List[np.ndarray]:  # pragma: no cover
    """EGL offscreen pyrender path (reference render_smplx_debug_video
    :339-440): gray background, ambient + key/fill directional lights,
    trimesh checkerboard floor, smooth-shaded mesh re-added per frame and
    hidden on inactive frames."""
    os.environ.setdefault("PYOPENGL_PLATFORM", "egl")
    import pyrender
    import trimesh

    scene = pyrender.Scene(bg_color=np.array([0.75, 0.75, 0.75, 1.0]),
                           ambient_light=np.array([0.35, 0.35, 0.35]))
    fverts, ffaces, fcolors = checkerboard_floor(floor_y)
    floor = trimesh.Trimesh(vertices=fverts, faces=ffaces,
                            face_colors=np.concatenate(
                                [fcolors, np.full((len(fcolors), 1), 255,
                                                  np.uint8)], 1),
                            process=False)
    scene.add(pyrender.Mesh.from_trimesh(floor, smooth=False))
    camera = pyrender.PerspectiveCamera(
        yfov=np.pi / 3.0, aspectRatio=float(width) / float(height))
    scene.add(camera, pose=camera_pose.astype(np.float64))
    key = pyrender.DirectionalLight(color=np.ones(3), intensity=3.0)
    fill = pyrender.DirectionalLight(color=np.ones(3), intensity=1.5)
    scene.add(key, pose=camera_pose.astype(np.float64))
    fill_pose = camera_pose.astype(np.float64).copy()
    fill_pose[0, 3], fill_pose[1, 3] = 1.5, 2.0
    scene.add(fill, pose=fill_pose)

    renderer = pyrender.OffscreenRenderer(width, height)
    rgba = np.concatenate(
        [np.asarray(mesh_color, np.uint8), [255]]).astype(np.uint8)
    frames = []
    try:
        for ti in range(verts_seq.shape[0]):
            node = None
            if bool(active[ti]):
                mesh = trimesh.Trimesh(vertices=verts_seq[ti], faces=faces,
                                       process=False)
                mesh.visual.vertex_colors = np.tile(
                    rgba, (mesh.vertices.shape[0], 1))
                node = scene.add(pyrender.Mesh.from_trimesh(mesh, smooth=True))
            color, _ = renderer.render(scene)
            frames.append(np.asarray(color, np.uint8))
            if node is not None:
                scene.remove_node(node)
    finally:
        renderer.delete()
    return frames


def mesh_frames(verts_seq: np.ndarray, faces: np.ndarray,
                active: np.ndarray, camera_pose: np.ndarray, floor_y: float,
                width: int = 320, height: int = 480,
                mesh_color=PRED_COLOR) -> List[np.ndarray]:
    """Dispatch: pyrender EGL when installed, else the numpy rasterizer."""
    if HAS_PYRENDER:
        try:
            return _pyrender_mesh_frames(verts_seq, faces, active,
                                         camera_pose, floor_y, width, height,
                                         mesh_color=mesh_color)
        except Exception as e:  # pyrender installed but EGL unusable
            # OffscreenRenderer raises at context creation on headless hosts
            # without a GPU/EGL device — fall back, don't crash the tool
            warnings.warn(f"pyrender EGL rendering failed ({e!r}); "
                          "falling back to the software rasterizer")
    return software_mesh_frames(verts_seq, faces, active, camera_pose,
                                floor_y, width, height,
                                mesh_color=mesh_color)


# ---------------------------------------------------------------------------
# Skeleton fallback
# ---------------------------------------------------------------------------


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


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def _mesh_side_by_side(npz_paths, colors, smplx_model, faces, max_frames,
                       panel_width, panel_height):
    """Shared-camera multi-panel mesh frames: framing comes from panel 0's
    active vertices (reference :471-483 uses GT/pred as the framing panel)
    and every panel reuses that camera + floor."""
    verts, masks = [], []
    for p in npz_paths:
        d = np.load(p, allow_pickle=True)
        masks.append(active_frame_mask(
            np.asarray(d["poses"])[:max_frames]))
        verts.append(vertices_from_npz(p, smplx_model, max_frames))
    T = min(v.shape[0] for v in verts)
    verts = [v[:T] for v in verts]
    masks = [m[:T] for m in masks]
    camera_pose, floor_y = compute_auto_framing(verts[0], masks[0])
    panels = [
        mesh_frames(v, faces, m, camera_pose, floor_y,
                    width=panel_width, height=panel_height, mesh_color=c)
        for v, m, c in zip(verts, masks, colors)
    ]
    return [np.concatenate([p[t] for p in panels], axis=1)
            for t in range(T)]


def render_side_by_side(npz_paths: List[str], titles: List[str],
                        out_path: str, smplx_model=None, fps: int = 30,
                        audio_path: Optional[str] = None,
                        max_frames: int = 600, faces=None,
                        colors: Optional[List[tuple]] = None,
                        panel_width: int = 320,
                        panel_height: int = 480) -> str:
    """N-way side-by-side video of result npz files with a shared camera
    frame (reference render_gt_pred_side_by_side :443 /
    render_pred_vs_retrieval_side_by_side :507).  Mesh path when an SMPL-X
    model + faces are given; skeleton line plot otherwise."""
    if smplx_model is not None and faces is not None:
        colors = colors or ([GT_COLOR, PRED_COLOR, RETR_COLOR]
                            [: len(npz_paths)])
        frames = _mesh_side_by_side(npz_paths, colors, smplx_model, faces,
                                    max_frames, panel_width, panel_height)
        return write_video(frames, out_path, fps=fps, audio_path=audio_path)
    joints = [joints_from_npz(p, smplx_model, max_frames) for p in npz_paths]
    rng = active_frame_range(np.load(npz_paths[0], allow_pickle=True)["poses"]
                             [:max_frames])
    joints = [j[rng] for j in joints]
    frames = skeleton_frames(joints, titles)
    return write_video(frames, out_path, fps=fps, audio_path=audio_path)


def render_gt_pred_side_by_side(gt_npz: str, pred_npz: str, out_path: str,
                                smplx_model=None, audio_path=None,
                                fps: int = 30, max_frames: int = 600,
                                faces=None) -> str:
    return render_side_by_side([gt_npz, pred_npz], ["GT", "Prediction"],
                               out_path, smplx_model, fps, audio_path,
                               max_frames, faces=faces,
                               colors=[GT_COLOR, PRED_COLOR])


def render_pred_vs_retrieval_side_by_side(pred_npz: str, retr_npz: str,
                                          out_path: str, smplx_model=None,
                                          audio_path=None, fps: int = 30,
                                          max_frames: int = 600,
                                          faces=None) -> str:
    return render_side_by_side([pred_npz, retr_npz],
                               ["Prediction", "Retrieval"], out_path,
                               smplx_model, fps, audio_path, max_frames,
                               faces=faces, colors=[PRED_COLOR, RETR_COLOR])


def render_smplx_debug_video(npz_path: str, out_path: str, smplx_model=None,
                             fps: int = 30, max_frames: int = 600,
                             faces=None) -> str:
    """Single-sequence debug video (reference :339)."""
    return render_side_by_side([npz_path], ["motion"], out_path, smplx_model,
                               fps, max_frames=max_frames, faces=faces,
                               colors=[PRED_COLOR])
