#!/usr/bin/env python
"""Retrieval-guided inference + result export (+ optional rendering).

Capability match for /root/reference/tools/visualize.py: windowed-test
inference with retrieval (discourse / gesture_type / llm), DDIM inversion +
insertion guidance, full-pose reassembly from the 4 body parts, 15→30 fps
interpolation in 6d rotation space, and per-sample result directories with
the smplx2020 npz schema (pred_motion.npz / gt_motion.npz / retrieval_0.npz
+ gt_text.txt + gt_audio.wav + retrieval_list.txt) and optional pyrender
side-by-side mp4s.

Usage:
    python tools/visualize.py CONFIG CKPT --out-dir DIR \
        [--retrieval-method discourse|gesture_type|llm] \
        [--use-inversion] [--insertion-guidance] \
        [--guidance-iters decreasing_till_25] [--guidance-lr 0.1] \
        [--test-batchsize 16] [--seed 0] [--render]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="RAG-Gesture inference")
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax params path")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--retrieval-method", default="gesture_type",
                   choices=["discourse", "gesture_type", "llm", "none"])
    p.add_argument("--use-inversion", action="store_true")
    p.add_argument("--insertion-guidance", action="store_true")
    p.add_argument("--guidance-iters", default="decreasing_till_25",
                   help="schedule name (tools/visualize.py:74-95) or "
                        "comma list of ints")
    p.add_argument("--guidance-lr", type=float, default=0.1)
    p.add_argument("--inv-cache", default=None, metavar="PATH",
                   help="persist the exemplar-inversion cache here (.npz): "
                        "loaded at start, saved at exit, so restarts hit "
                        "warm-path guided throughput from clip 1")
    p.add_argument("--outpaint", action="store_true")
    p.add_argument("--visualize-inversion", action="store_true",
                   help="run the DDIM inversion round-trip self-check and "
                        "save the reconstructed exemplars (reference "
                        "--visualize_inversion)")
    p.add_argument("--test-batchsize", type=int, default=16)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render", action="store_true",
                   help="side-by-side videos: SMPL-X mesh (pyrender EGL or "
                        "the numpy rasterizer) when --smplx-asset is given, "
                        "skeleton plots otherwise")
    p.add_argument("--smplx-asset", default=None,
                   help="SMPLX_NEUTRAL_2020.npz path enabling mesh renders "
                        "(reference visualize.py uses test_dataset.smplx)")
    p.add_argument("--options", nargs="+", default=[])
    args = p.parse_args()
    if args.retrieval_method == "none" and (args.use_inversion
                                            or args.outpaint):
        p.error("--use-inversion/--outpaint need retrieved exemplars; "
                "pick a --retrieval-method other than 'none'")
    if args.insertion_guidance and not args.use_inversion:
        p.error("--insertion-guidance requires --use-inversion "
                "(reference inference_kwargs contract)")
    return args


def parse_guidance_iters(spec: str, num_steps: int):
    """--guidance-iters: a named schedule or a comma list of ints (shared
    by visualize.py and longform_synthesis.py)."""
    from raggesture_tpu.models.architecture import guidance_iters_schedule

    if "," in spec:
        return guidance_iters_schedule([int(v) for v in spec.split(",")],
                                       num_steps)
    return guidance_iters_schedule(spec, num_steps)


def build_retrieval_db(cfg, train_ds, logger):
    """RetrievalDatabase with the corpus cache + DatabaseSaveHook memo
    loading the reference performs at tool startup (shared by visualize.py
    and longform_synthesis.py)."""
    import os as _os

    from raggesture_tpu.builders import retrieval_config_from
    from raggesture_tpu.retrieval.database import (
        RetrievalCorpus,
        RetrievalDatabase,
    )

    rcfg = retrieval_config_from(cfg.model.model)
    rcache = cfg.model.model.retrieval_cfg.get("cache_path")
    if rcache and _os.path.exists(_os.path.join(rcache, "meta.json")) \
            and not cfg.model.model.retrieval_cfg.get("new_cache", False):
        corpus = RetrievalCorpus.load(rcache)
        logger.info("loaded retrieval corpus from %s", rcache)
    else:
        corpus = RetrievalCorpus.build(train_ds, rcfg)
        if rcache:
            corpus.save(rcache)
    db = RetrievalDatabase(corpus, rcfg, train_ds)
    for hook in cfg.get("custom_hooks", []):
        if hook.get("type") == "DatabaseSaveHook" and hook.get("save_dir"):
            db.load_memo(hook["save_dir"])
    return db


def main():
    args = parse_args()

    import jax

    from raggesture_tpu.builders import (
        beatx_config_from,
        build_architecture,
    )
    from raggesture_tpu.config import Config
    from raggesture_tpu.datasets.build import (
        build_dataset,
        cache_exists,
        make_default_extractor,
    )
    from raggesture_tpu.datasets.sampler import DataLoader
    from raggesture_tpu.models.architecture import (
        InferenceOptions,
        StagedGenerator,
        init_params,
    )
    from raggesture_tpu.retrieval.database import host_batch_from_records
    from raggesture_tpu.train.checkpoint import load_params
    from raggesture_tpu.train.runner import device_batch
    from raggesture_tpu.utils.env import setup_compilation_cache
    from raggesture_tpu.utils.logger import get_root_logger
    from raggesture_tpu.utils.motion_io import (
        reassemble_full_pose,
        save_smplx_npz,
        upsample_pose_aa,
        linear_resample,
    )

    setup_compilation_cache()
    logger = get_root_logger()
    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_option_strings(args.options)

    model = build_architecture(cfg.model)
    # the tool processes the TEST dataset — its fps decides the 30fps
    # upsample factor (longform_synthesis.py does the same)
    fps = cfg.data.test.get("pose_fps", 15)

    render_model, render_faces = None, None
    if args.render and args.smplx_asset:
        from raggesture_tpu.models.smplx import load_smplx, load_smplx_faces

        render_model = load_smplx(args.smplx_asset)
        render_faces = load_smplx_faces(args.smplx_asset)
        logger.info("mesh rendering enabled (%d faces)",
                    render_faces.shape[0])

    _ext = [None, False]

    def _dataset(dcfg):
        """build_dataset with lazy real-featurizer construction (only when a
        cache is actually missing)."""
        if not cache_exists(dcfg) and not _ext[1]:
            _ext[0] = make_default_extractor()
            _ext[1] = True
        return build_dataset(dcfg, _ext[0])

    # datasets: train = retrieval corpus (reference visualize.py:132), test
    test_dcfg = beatx_config_from(cfg.data.test)
    test_ds = _dataset(test_dcfg)
    logger.info("test dataset: %d windows", len(test_ds))

    db = None
    if args.retrieval_method != "none":
        train_ds = _dataset(beatx_config_from(cfg.data.train))
        db = build_retrieval_db(cfg, train_ds, logger)

    # params
    ex = test_ds[0]
    from raggesture_tpu.datasets.beatx import collate

    ex_batch = device_batch(collate([ex]))
    params = init_params(model, jax.random.PRNGKey(0), ex_batch)
    params = load_params(args.checkpoint, params)
    logger.info("loaded checkpoint %s", args.checkpoint)

    sched = model.cfg.diffusion_test.schedule()
    gen = StagedGenerator(model, params, sched)
    if args.inv_cache:
        n_inv = gen.load_inv_cache(args.inv_cache)
        logger.info("inversion cache: %d entries loaded from %s",
                    n_inv, args.inv_cache)
    encode_fn = jax.jit(
        lambda b: model.apply(params, b, rng=None, sample=False,
                              method=model.encode_motion))

    gi = None
    if args.insertion_guidance:
        gi = parse_guidance_iters(args.guidance_iters, sched.num_timesteps)
    opts = InferenceOptions(
        use_inversion=args.use_inversion,
        insertion_guidance=args.insertion_guidance,
        guidance_lr=args.guidance_lr,
        outpaint=args.outpaint,
    )
    opts.validate()

    loader = DataLoader(test_ds, args.test_batchsize, shuffle=True,
                        drop_last=False, seed=args.seed)
    rng = jax.random.PRNGKey(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    factor = 30 // fps

    for bi, batch in enumerate(loader):
        if args.max_batches is not None and bi >= args.max_batches:
            break
        names = batch["sample_name"]
        records = [test_ds[n] for n in names]
        re_dict = None
        if db is not None:
            hb = host_batch_from_records(records)
            re_dict = db(hb, names, encode_fn,
                         method=args.retrieval_method)
        if (args.visualize_inversion and re_dict is not None
                and re_dict["num_queries"] > 0):
            chk = gen.inversion_self_check(re_dict)
            curve = np.asarray(chk["error_curve"])  # (S, Q)
            logger.info("inversion error curve (should grow with t): %s",
                        np.round(curve.mean(axis=1), 3).tolist())
            logger.info("inversion round-trip recon error (should be "
                        "small): %s",
                        np.round(np.asarray(chk["recon_error"]), 5).tolist())
            inv_pose = reassemble_full_pose(chk["recon_decoded"])
            inv_dir = os.path.join(args.out_dir, f"inversion_check_b{bi}")
            os.makedirs(inv_dir, exist_ok=True)
            for q in range(inv_pose.shape[0]):
                save_smplx_npz(
                    os.path.join(inv_dir, f"inv_recon_{q}.npz"),
                    upsample_pose_aa(inv_pose[q], factor) if factor > 1
                    else inv_pose[q],
                    linear_resample(np.asarray(
                        chk["recon_decoded"]["pred_exps"])[q], factor),
                    linear_resample(np.asarray(
                        chk["recon_decoded"]["pred_transl"])[q], factor),
                    fps=30)
            np.save(os.path.join(inv_dir, "error_curve.npy"), curve)

        rng, r = jax.random.split(rng)
        out = gen(device_batch(batch), r, opts=opts, re_dict=re_dict,
                  guidance_iters=gi)

        pred_pose = reassemble_full_pose(out)           # (B, T, 165)
        pred_exps = np.asarray(out["pred_exps"])
        pred_trans = np.asarray(out["pred_transl"])
        valid = batch.get("valid_mask", np.ones(len(names), bool))

        for j, name in enumerate(names):
            if not valid[j]:
                continue
            smp_dir = os.path.join(args.out_dir, name)
            os.makedirs(smp_dir, exist_ok=True)
            # 15 -> 30 fps in 6d space (visualize.py:265-291)
            pp = upsample_pose_aa(pred_pose[j], factor) if factor > 1 \
                else pred_pose[j]
            pe = linear_resample(pred_exps[j], factor) if factor > 1 \
                else pred_exps[j]
            pt = linear_resample(pred_trans[j], factor) if factor > 1 \
                else pred_trans[j]
            save_smplx_npz(os.path.join(smp_dir, "pred_motion.npz"),
                           pp, pe, pt, fps=30)
            rec = records[j]
            gp = upsample_pose_aa(np.asarray(rec["motion"]), factor)
            ge = linear_resample(np.asarray(rec["facial"]), factor)
            gt = linear_resample(np.asarray(rec["trans"]), factor)
            save_smplx_npz(os.path.join(smp_dir, "gt_motion.npz"),
                           gp, ge, gt, betas=rec.get("beta", [None])[0],
                           fps=30)
            with open(os.path.join(smp_dir, "gt_text.txt"), "w") as f:
                f.write(str(rec.get("raw_word", "")))
            if "sem_score" in rec:
                # per-frame semantic scores for SRGR, interpolated to 30 fps
                np.save(os.path.join(smp_dir, "sem_score.npy"),
                        linear_resample(np.asarray(rec["sem_score"],
                                                   np.float32), factor))
            raw_audio = rec.get("raw_audio")
            if raw_audio is not None and np.asarray(raw_audio).size:
                from scipy.io import wavfile

                wavfile.write(os.path.join(smp_dir, "gt_audio.wav"), 16000,
                              (np.asarray(raw_audio) * 32767).astype(np.int16))
            if re_dict is not None and re_dict["num_queries"] > 0:
                rm = np.asarray(re_dict["raw_motion"])[j, 0]
                rt = np.asarray(re_dict["raw_trans"])[j, 0]
                rf = np.asarray(re_dict["raw_facial"])[j, 0]
                rm_pose = rm[:, :165]
                save_smplx_npz(os.path.join(smp_dir, "retrieval_0.npz"),
                               upsample_pose_aa(rm_pose, factor),
                               linear_resample(rf, factor),
                               linear_resample(rt, factor), fps=30)
                with open(os.path.join(smp_dir, "retrieval_list.txt"), "w") as f:
                    json.dump({
                        "names": re_dict["raw_sample_names"][j],
                        "type2words": {
                            str(k): list(v) for k, v in
                            re_dict["raw_type2words"][j].items()},
                        "query_startends": {
                            str(k): list(v) for k, v in
                            re_dict["query_startends"][j].items()},
                    }, f, indent=1)
            if args.render:
                from raggesture_tpu.utils.visualization import (
                    render_gt_pred_side_by_side,
                    render_pred_vs_retrieval_side_by_side,
                )

                render_gt_pred_side_by_side(
                    os.path.join(smp_dir, "gt_motion.npz"),
                    os.path.join(smp_dir, "pred_motion.npz"),
                    os.path.join(smp_dir, "side_by_side.mp4"),
                    smplx_model=render_model, faces=render_faces,
                    audio_path=os.path.join(smp_dir, "gt_audio.wav"),
                )
                # Pred (blue) vs retrieval (green); the retrieval panel
                # auto-hides the mesh on zero-padded frames (reference
                # visualize.py:588-608).
                retr_npz = os.path.join(smp_dir, "retrieval_0.npz")
                if os.path.exists(retr_npz):
                    render_pred_vs_retrieval_side_by_side(
                        os.path.join(smp_dir, "pred_motion.npz"), retr_npz,
                        os.path.join(smp_dir, "pred_vs_retrieval.mp4"),
                        smplx_model=render_model, faces=render_faces,
                        audio_path=os.path.join(smp_dir, "gt_audio.wav"),
                    )
        logger.info("batch %d: wrote %d samples", bi, int(np.sum(valid)))

    # persist retrieval memoization (DatabaseSaveHook after test epoch)
    if db is not None:
        for hook in cfg.get("custom_hooks", []):
            if hook.get("type") == "DatabaseSaveHook" and hook.get("save_dir"):
                db.save_memo(hook["save_dir"])
    if args.inv_cache:
        n_inv = gen.save_inv_cache(args.inv_cache)
        logger.info("inversion cache: %d entries saved to %s",
                    n_inv, args.inv_cache)
    logger.info("results in %s", args.out_dir)


if __name__ == "__main__":
    main()
