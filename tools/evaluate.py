#!/usr/bin/env python
"""Full metric suite over saved result directories.

Capability match for /root/reference/tools/evaluate.py: FGD (VAESKConv
240-d latents over 32-frame 6d-pose windows), BeatAlign, L1div, diversity,
retrieval-MPJPE, SRGR (optional), face metrics — printed and written to
``metrics.json``.

Usage:
    python tools/evaluate.py RESULT_DIR [--eval-n 300] \
        [--fgd-weights experiments/fgd/aesconv.msgpack] \
        [--smplx datasets/assets_deps/smplx_models/SMPLX_NEUTRAL_2020.npz] \
        [--no-fgd]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="evaluate gesture results")
    p.add_argument("result_dir")
    p.add_argument("--eval-n", type=int, default=300)
    p.add_argument("--fgd-weights", default="experiments/fgd/aesconv.msgpack",
                   help="converted AESKConv_240_100 params (orbax)")
    p.add_argument("--smplx",
                   default="datasets/assets_deps/smplx_models/smplx/"
                           "SMPLX_NEUTRAL_2020.npz")
    p.add_argument("--no-fgd", action="store_true")
    p.add_argument("--avg-vel", default=None,
                   help="per-joint dataset mean-velocity .npy for beat-align "
                        "normalization (reference --avg_vel_path)")
    p.add_argument("--align-mask", type=int, default=10,
                   help="frames trimmed from each end for beat alignment")
    p.add_argument("--srgr", action="store_true")
    p.add_argument("--out", default=None, help="metrics.json path")
    return p.parse_args()


def build_fk_fn(smplx_path: str, model=None):
    import jax
    import jax.numpy as jnp

    from raggesture_tpu.models.smplx import lbs, load_smplx

    model = model or load_smplx(smplx_path)

    @jax.jit
    def fk(pose_aa, trans, exps, betas=None):
        n = pose_aa.shape[0]
        if betas is None:
            b = jnp.zeros((n, model.shapedirs.shape[-1]))
        else:
            # GT betas (the reference FKs with tar_beta, evaluate.py:286)
            b = jnp.broadcast_to(
                jnp.asarray(betas)[: model.shapedirs.shape[-1]],
                (n, model.shapedirs.shape[-1]))
        joints, _ = lbs(model, b, pose_aa,
                        expression=exps[:, : model.exprdirs.shape[-1]],
                        transl=trans, return_verts=False)
        return joints

    return fk


def build_face_fk_fn(smplx_path: str, model=None, jaw_joint: int = 22):
    """Jaw+expression-only FK to full vertices for the face L2/LVD metrics
    (reference tools/evaluate.py:329-355: every rotation except jaw_pose and
    every translation zeroed, GT betas + per-side expressions active)."""
    import jax
    import jax.numpy as jnp

    from raggesture_tpu.models.smplx import lbs, load_smplx

    model = model or load_smplx(smplx_path)

    @jax.jit
    def face_fk(pose_aa, exps, betas):
        n = pose_aa.shape[0]
        nj = model.num_joints
        face_pose = jnp.zeros((n, nj, 3), pose_aa.dtype)
        face_pose = face_pose.at[:, jaw_joint].set(
            pose_aa.reshape(n, nj, 3)[:, jaw_joint])
        b = jnp.broadcast_to(betas[: model.shapedirs.shape[-1]],
                             (n, model.shapedirs.shape[-1]))
        _, verts = lbs(model, b, face_pose.reshape(n, nj * 3),
                       expression=exps[:, : model.exprdirs.shape[-1]],
                       transl=None, return_verts=True)
        return verts.reshape(n, -1)

    return face_fk


def build_fgd_fn(weights_path: str):
    import jax

    from raggesture_tpu.models.eval_fgd import FGDConfig, FGDEmbedder
    from raggesture_tpu.train.checkpoint import load_params

    model = FGDEmbedder(FGDConfig())
    params = load_params(weights_path)

    @jax.jit
    def embed(poses_6d):
        return model.apply(params, poses_6d, method=model.map2latent)

    return embed


def main():
    args = parse_args()
    from raggesture_tpu.eval.evaluator import EvalConfig, Evaluator
    from raggesture_tpu.utils.env import setup_compilation_cache
    from raggesture_tpu.utils.logger import get_root_logger

    setup_compilation_cache()
    logger = get_root_logger()

    fk_fn, face_fk_fn = None, None
    if os.path.exists(args.smplx):
        from raggesture_tpu.models.smplx import load_smplx

        smplx_model = load_smplx(args.smplx)
        fk_fn = build_fk_fn(args.smplx, model=smplx_model)
        face_fk_fn = build_face_fk_fn(args.smplx, model=smplx_model)
    else:
        logger.warning("SMPL-X asset %s missing — kinematic metrics skipped",
                       args.smplx)
    fgd_fn = None
    if not args.no_fgd and os.path.exists(args.fgd_weights):
        fgd_fn = build_fgd_fn(args.fgd_weights)
    elif not args.no_fgd:
        logger.warning("FGD weights %s missing — FGD skipped",
                       args.fgd_weights)

    cfg = EvalConfig(eval_n=args.eval_n, compute_fgd=fgd_fn is not None,
                     compute_srgr=args.srgr, avg_vel_path=args.avg_vel,
                     align_mask=args.align_mask)
    ev = Evaluator(cfg, fgd_embed_fn=fgd_fn, fk_fn=fk_fn,
                   face_fk_fn=face_fk_fn)
    summary = ev.evaluate(args.result_dir)
    print(json.dumps(summary, indent=1))
    out = args.out or os.path.join(args.result_dir, "metrics.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
