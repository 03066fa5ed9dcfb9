"""Evaluator over synthetic result dirs: all metric paths (FGD, align,
L1div, diversity, retrieval-MPJPE, face) + multimodality."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raggesture_tpu.eval.evaluator import (
    EvalConfig,
    Evaluator,
    find_result_dirs,
    multimodality,
)
from raggesture_tpu.utils.motion_io import save_smplx_npz


def _write_result_dir(d, seed, T=64, with_retrieval=True, with_audio=True):
    rng = np.random.RandomState(seed)
    os.makedirs(d, exist_ok=True)

    def npz(path, scale=0.1, active=None):
        poses = rng.randn(T, 165).astype(np.float32) * scale
        if active is not None:
            mask = np.zeros((T, 1), np.float32)
            mask[active] = 1.0
            poses = poses * mask
        save_smplx_npz(path, poses, rng.randn(T, 100).astype(np.float32),
                       rng.randn(T, 3).astype(np.float32) * 0.01)

    npz(os.path.join(d, "pred_motion.npz"))
    npz(os.path.join(d, "gt_motion.npz"))
    if with_retrieval:
        npz(os.path.join(d, "retrieval_0.npz"), active=slice(10, 30))
    if with_audio:
        from scipy.io import wavfile

        wave = (rng.randn(T * 533) * 3000).astype(np.int16)
        wavfile.write(os.path.join(d, "gt_audio.wav"), 16000, wave)


def _fk_fn():
    from raggesture_tpu.models.smplx import lbs, synthetic_model

    model = synthetic_model(num_joints=55, verts_per_joint=2)

    @jax.jit
    def fk(pose_aa, trans, exps):
        n = pose_aa.shape[0]
        joints, _ = lbs(model, jnp.zeros((n, model.shapedirs.shape[-1])),
                        pose_aa, transl=trans, return_verts=False)
        return joints

    return fk


def _fgd_fn():
    from raggesture_tpu.models.eval_fgd import FGDConfig, FGDEmbedder

    m = FGDEmbedder(FGDConfig())
    params = m.init({"params": jax.random.PRNGKey(0),
                     "vae": jax.random.PRNGKey(1)},
                    jnp.zeros((1, 32, 330)))

    @jax.jit
    def embed(p6):
        return m.apply(params, p6, method=m.map2latent,
                       rngs={"vae": jax.random.PRNGKey(2)})

    return embed


@pytest.fixture(scope="module")
def result_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("results"))
    for i, name in enumerate(["clip_a/0", "clip_b/0"]):
        _write_result_dir(os.path.join(root, name), seed=i)
    return root


def test_find_result_dirs(result_root):
    dirs = find_result_dirs(result_root)
    assert len(dirs) == 2


def test_evaluator_face_only(result_root):
    ev = Evaluator(EvalConfig(eval_n=64, compute_fgd=False))
    s = ev.evaluate(result_root)
    assert "face_l2" in s and s["face_l2"] > 0
    assert "face_lvd" in s


def test_evaluator_full(result_root):
    cfg = EvalConfig(eval_n=64)
    ev = Evaluator(cfg, fgd_embed_fn=_fgd_fn(), fk_fn=_fk_fn())
    s = ev.evaluate(result_root)
    for key in ("fgd", "l1div", "l1div_gt", "diversity", "mpjpe_retrieval",
                "face_l2", "align"):
        assert key in s, f"missing {key}: {sorted(s)}"
    assert s["fgd"] >= 0 and s["l1div"] > 0 and s["diversity"] > 0
    # align is a GAHR mean in [0, 1] (motion_beats consumes 2D (T, J*3)
    # joints — 3D input silently computed joint-axis 'velocities')
    assert 0.0 <= s["align"] <= 1.0
    # identical pred/gt would give fgd ~0; random differ
    assert np.isfinite(list(s.values())).all()


def test_evaluator_face_vertex_space(tmp_path):
    """Vertex-space face metrics via jaw+expression-only FK (reference
    evaluate.py:329-367): body-pose differences must NOT affect face_l2."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from raggesture_tpu.models.smplx import synthetic_model
    from tools.evaluate import build_face_fk_fn

    model = synthetic_model(num_joints=55, verts_per_joint=2)
    face_fk = build_face_fk_fn("", model=model)

    T = 16
    rng = np.random.RandomState(3)
    jaw = rng.randn(T, 3).astype(np.float32) * 0.2
    exps = rng.randn(T, 100).astype(np.float32)

    def npz(path, body_seed):
        r2 = np.random.RandomState(body_seed)
        poses = r2.randn(T, 165).astype(np.float32) * 0.2
        poses[:, 66:69] = jaw  # same jaw on both sides
        save_smplx_npz(path, poses, exps, np.zeros((T, 3), np.float32))

    d = str(tmp_path / "clip/0")
    os.makedirs(d)
    npz(os.path.join(d, "pred_motion.npz"), body_seed=1)
    npz(os.path.join(d, "gt_motion.npz"), body_seed=2)

    ev = Evaluator(EvalConfig(eval_n=T, compute_fgd=False),
                   face_fk_fn=face_fk)
    s = ev.evaluate(str(tmp_path))
    assert s["face_l2"] < 1e-10 and s["face_lvd"] < 1e-6
    assert ev.face_space == "vertex"

    # differing jaw poses must register
    d2 = str(tmp_path / "clip2/0")
    os.makedirs(d2)
    npz(os.path.join(d2, "pred_motion.npz"), body_seed=1)
    gt2 = np.load(os.path.join(d, "gt_motion.npz"), allow_pickle=True)
    poses2 = np.asarray(gt2["poses"]).copy()
    poses2[:, 66:69] += 0.5
    save_smplx_npz(os.path.join(d2, "gt_motion.npz"), poses2, exps,
                   np.zeros((T, 3), np.float32))
    ev2 = Evaluator(EvalConfig(eval_n=T, compute_fgd=False),
                    face_fk_fn=face_fk)
    ev2.add_result_dir(d2)
    assert ev2.summarize()["face_l2"] > 1e-8


def test_multimodality(tmp_path):
    roots = []
    for rep in range(3):
        root = str(tmp_path / f"res_rep{rep}")
        _write_result_dir(os.path.join(root, "clip/0"), seed=100 + rep,
                          with_retrieval=False, with_audio=False)
        roots.append(root)
    mm = multimodality(roots, eval_n=64)
    assert mm > 0
    # identical reps -> 0
    same = []
    for rep in range(2):
        root = str(tmp_path / f"same_rep{rep}")
        _write_result_dir(os.path.join(root, "clip/0"), seed=7,
                          with_retrieval=False, with_audio=False)
        same.append(root)
    assert multimodality(same, eval_n=64) == 0.0


def test_evaluator_srgr(result_root, tmp_path):
    # add sem_score sidecars and enable SRGR
    import shutil

    root = str(tmp_path / "with_sem")
    shutil.copytree(result_root, root)
    rng = np.random.RandomState(9)
    for d in find_result_dirs(root):
        np.save(os.path.join(d, "sem_score.npy"),
                rng.rand(64, 1).astype(np.float32))
    cfg = EvalConfig(eval_n=64, compute_fgd=False, compute_srgr=True)
    ev = Evaluator(cfg, fk_fn=_fk_fn())
    s = ev.evaluate(root)
    assert "srgr" in s and s["srgr"] >= 0
