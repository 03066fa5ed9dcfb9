#!/usr/bin/env python
"""Arbitrary-length gesture synthesis by overlapped window chunking.

Capability match for /root/reference/tools/longform_synthesis.py: full-clip
test cache, chunk starts ``[0] + range(150-15, L, 150-15)`` with tail
padding, per-chunk modality slicing, ``use_prev_latent`` handoff (the
previous chunk's final latent tokens seed the next chunk's first tokens),
cross-fade of the 15-frame overlap in 6d rotation space, and stitched
``full_pred_motion.npz`` / ``full_gt_motion.npz`` outputs.

Usage:
    python tools/longform_synthesis.py CONFIG CKPT --out-dir DIR \
        [--retrieval-method gesture_type] [--use-inversion] \
        [--insertion-guidance] [--max-clips 10] [--seed 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="long-form gesture synthesis")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--retrieval-method", default="none",
                   choices=["discourse", "gesture_type", "llm", "none"])
    p.add_argument("--use-inversion", action="store_true")
    p.add_argument("--insertion-guidance", action="store_true")
    p.add_argument("--guidance-iters", default="decreasing_till_25")
    p.add_argument("--guidance-lr", type=float, default=0.1)
    p.add_argument("--inv-cache", default=None, metavar="PATH",
                   help="persist the exemplar-inversion cache here (.npz): "
                        "loaded at start, saved at exit")
    p.add_argument("--max-clips", type=int, default=10)
    p.add_argument("--clip-batch", type=int, default=1,
                   help="synthesize N independent clips as one batched "
                        "dispatch chain (wave-batching): at chunk position "
                        "k, all active clips' k-th chunks run as ONE "
                        "sample/sample_inseq call. The prev-latent handoff "
                        "serializes chunks WITHIN a clip, so batch-1 "
                        "long-form pays a full host->device round trip per "
                        "chunk; batching across clips amortizes it (the "
                        "reference tool is strictly one clip at a time, "
                        "longform_synthesis.py:256-403)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--refeaturize-chunks", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="re-run the audio/text extractors on each chunk's raw "
                        "audio/transcript (reference longform_synthesis.py:"
                        "64-94,322-344; wav2vec2/BERT features are context-"
                        "dependent, so slicing full-clip features differs); "
                        "--no-refeaturize-chunks keeps the "
                        "proportional-slice path — note its chunk audio "
                        "length varies per clip, so the jitted pipelines "
                        "recompile per distinct clip length")
    p.add_argument("--options", nargs="+", default=[])
    return p.parse_args()


def chunk_starts(n_frames: int, window: int, overlap: int):
    """Reference chunking (longform_synthesis.py:262-287):
    starts = [0] + range(window-overlap, L, window-overlap)."""
    stride = window - overlap
    starts = [0] + list(range(stride, max(n_frames - overlap, 1), stride))
    return starts


def plan_waves(chunk_counts, clip_batch: int):
    """Wave-batching schedule: group clips into batches of ``clip_batch``
    and, per group, list which clips are active at each chunk position.

    Clips are ordered by DESCENDING chunk count so a group's active set
    only shrinks at its tail waves; tail waves are padded back up to the
    group size by the caller (repeating the last active row), so each group
    runs every wave at ONE batch shape — at most two compiled pipeline
    shapes per whole run (full groups of ``clip_batch`` + one remainder
    group), no matter how ragged the clip lengths are.

    Returns ``[(group, waves)]`` where ``group`` is a list of clip indices
    and ``waves[k]`` is the sub-list of ``group`` that has a k-th chunk
    (never empty; always a prefix of ``group`` thanks to the sort).
    """
    if clip_batch < 1:
        raise ValueError(f"clip_batch must be >= 1, got {clip_batch}")
    if clip_batch == 1:
        # no padding to optimize away — keep dataset order so the default
        # path processes clips (and draws rng) in the same sequence as the
        # reference's strictly sequential protocol
        return [([i], [[i]] * c) for i, c in enumerate(chunk_counts)]
    order = sorted(range(len(chunk_counts)), key=lambda i: -chunk_counts[i])
    groups = []
    for g0 in range(0, len(order), clip_batch):
        group = order[g0:g0 + clip_batch]
        waves = [[ci for ci in group if k < chunk_counts[ci]]
                 for k in range(chunk_counts[group[0]])]
        groups.append((group, waves))
    return groups


def run_group_waves(group, waves, make_chunk, run_wave, on_chunk):
    """Dispatch one wave-batched group, threading per-clip prev latents.

    Pure orchestration (unit-tested without a model): pads tail waves back
    to the group size by repeating the last active row, calls ``run_wave``
    once per chunk position, and scatters each row's output back to its
    clip.

    - ``make_chunk(ci, k)`` -> host chunk record for clip ``ci``'s k-th
      chunk (only called for active clips).
    - ``run_wave(k, chunks_padded, prev_rows, n_active)`` ->
      ``(prev_out, payload)`` where ``prev_out`` is row-indexable
      (``prev_out[i:i+1]`` is clip i's handoff latent) and ``payload`` is
      passed through to ``on_chunk``.  ``prev_rows`` is None for the first
      wave, else a list of per-row arrays aligned with ``chunks_padded``;
      rows ``>= n_active`` are padding whose outputs are discarded.
    - ``on_chunk(ci, k, row, payload)`` consumes clip ``ci``'s output at
      batch row ``row``.
    """
    B = len(group)
    prev = {ci: None for ci in group}
    for k, active in enumerate(waves):
        chunks = [make_chunk(ci, k) for ci in active]
        pad = B - len(active)
        chunks_p = chunks + [chunks[-1]] * pad
        prev_rows = None
        if k > 0:
            rows = [prev[ci] for ci in active]
            prev_rows = rows + [rows[-1]] * pad
        prev_out, payload = run_wave(k, chunks_p, prev_rows, len(active))
        for bi, ci in enumerate(active):
            prev[ci] = prev_out[bi:bi + 1]
            on_chunk(ci, k, bi, payload)


def slice_chunk(rec, s: int, e: int, fps: int, audio_sr: int = 16000):
    """Slice every modality of a full-clip record to [s, e) frames, padding
    the tail with zeros (reference :267-287, :300-383)."""
    T = e - s
    start_sec, end_sec = s / fps, e / fps
    out = {}
    for k in ("motion", "motion_upper", "motion_face", "motion_lower",
              "motion_hands", "trans", "facial", "contact", "word", "emo",
              "sem_score", "beta"):
        if k not in rec:
            continue
        a = np.asarray(rec[k])[s:e]
        if a.shape[0] < T:
            a = np.concatenate(
                [a, np.zeros((T - a.shape[0],) + a.shape[1:], a.dtype)])
        out[k] = a
    # audio features: proportional slice of the feature timeline
    af = np.asarray(rec["audio"])
    n_clip_frames = np.asarray(rec["motion"]).shape[0]
    fs = int(round(af.shape[0] * s / max(n_clip_frames, 1)))
    fe = int(round(af.shape[0] * e / max(n_clip_frames, 1)))
    a = af[fs:fe]
    want = fe - fs
    if a.shape[0] < want:
        a = np.concatenate([a, np.zeros((want - a.shape[0], af.shape[1]),
                                        af.dtype)])
    out["audio"] = a
    raw_audio = np.asarray(rec.get("raw_audio", np.zeros(0, np.float32)))
    a_s, a_e = int(start_sec * audio_sr), int(end_sec * audio_sr)
    ra = raw_audio[a_s:a_e]
    if ra.shape[0] < (a_e - a_s):
        ra = np.concatenate([ra, np.full((a_e - a_s) - ra.shape[0], 1e-4,
                                         np.float32)])
    out["raw_audio"] = ra
    out["motion_mask"] = np.ones((T,), np.float32)
    out["motion_length"] = np.asarray(T, np.int32)
    out["speaker_id"] = np.asarray(rec["speaker_id"]).reshape(-1)[:1]
    out["raw_word"] = rec.get("raw_word", "")
    out["text_feature"] = np.asarray(rec.get("text_feature",
                                             np.zeros((1, 768), np.float32)))
    # window-relative second re-alignment of ragged annotations (:300-383)
    out["text_segments"] = [
        [[t[0][0] - start_sec, t[0][1] - start_sec], t[1]]
        for t in rec.get("text_segments", [])
        if t[0][0] >= start_sec and t[0][1] <= end_sec
    ]
    out["discourse"] = [
        tuple(d[:4]) + (d[4] - start_sec, d[5] - start_sec,
                        d[6] - start_sec, d[7] - start_sec)
        for d in rec.get("discourse", [])
        if len(d) >= 8 and d[4] >= start_sec and d[5] <= end_sec
    ]
    out["prominence"] = [
        (w, ps - start_sec, pe - start_sec, pv)
        for (w, ps, pe, pv) in rec.get("prominence", [])
        if ps >= start_sec and pe <= end_sec
    ]
    out["gesture_labels"] = [
        dict(g, start=g["start"] - start_sec, end=g["end"] - start_sec)
        for g in rec.get("gesture_labels", [])
        if g["start"] >= start_sec and g["end"] <= end_sec
    ]
    out["sample_name"] = f"{rec['sample_name']}@{s}"
    return out


def refeaturize_chunk(chunk, extractor, audio_sr: int = 16000):
    """Replace the proportionally-sliced audio features and the full-clip
    text feature with per-chunk extractor outputs (reference
    longform_synthesis.py:322-344: wav2vec2 on the chunk's raw audio, BERT
    on the chunk's merged text segments).  The frame-aligned ``word``
    features stay sliced, exactly like the reference's
    ``data["word"][:, chunk_start:chunk_end]`` (:332)."""
    from raggesture_tpu.datasets.disco import merge_textsegs

    ra = np.asarray(chunk["raw_audio"])
    chunk["audio"] = (
        np.asarray(extractor.audio_features(ra, audio_sr), np.float32)
        if ra.size else np.zeros((1, extractor.audio_dim), np.float32))
    merged = merge_textsegs(chunk.get("text_segments", []))
    sentence = " ".join(t[1] for t in merged).strip()
    # encode EVEN an empty sentence (CLS/SEP-only rows): a silent chunk
    # must not inherit the FULL-CLIP transcript's text_feature/raw_word —
    # the reference re-runs BERT per chunk unconditionally (:64-81)
    _, tf = extractor.word_embeddings(sentence)
    if tf is not None:
        chunk["text_feature"] = np.asarray(tf, np.float32)
        chunk["raw_word"] = sentence
    return chunk


def main():
    args = parse_args()
    if args.clip_batch > 1 and not args.refeaturize_chunks:
        # proportionally-sliced audio features vary in length per clip;
        # collate would zero-pad the shorter rows to the wave max and
        # cross-attention has no per-frame audio mask, so a clip's output
        # would silently depend on which clips share its wave (and every
        # distinct per-wave max would recompile the pipeline)
        raise SystemExit(
            "--no-refeaturize-chunks is incompatible with --clip-batch > 1:"
            " per-clip sliced audio feature lengths differ and zero-padded"
            " frames would condition the shorter clips; use the default"
            " per-chunk re-extraction (fixed-length chunks) for batching")

    import jax
    import jax.numpy as jnp

    from raggesture_tpu.builders import (
        beatx_config_from,
        build_architecture,
    )
    from raggesture_tpu.config import Config
    from raggesture_tpu.datasets.beatx import collate
    from raggesture_tpu.datasets.build import (
        build_dataset,
        cache_exists,
        make_default_extractor,
    )
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
        crossfade_linear,
        crossfade_pose_aa,
        linear_resample,
        reassemble_full_pose,
        save_smplx_npz,
        upsample_pose_aa,
    )

    setup_compilation_cache()
    logger = get_root_logger()
    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_option_strings(args.options)

    model = build_architecture(cfg.model)
    window = model.cfg.denoiser.max_seq_len        # 150
    overlap = model.cfg.denoiser.frame_chunk_size  # 15
    fps = cfg.data.test.get("pose_fps", 15)

    _ext = [None, False]

    def _dataset(dcfg):
        """build_dataset with lazy real-featurizer construction (only when a
        cache is actually missing)."""
        if not cache_exists(dcfg) and not _ext[1]:
            _ext[0] = make_default_extractor()
            _ext[1] = True
        return build_dataset(dcfg, _ext[0])

    # full-clip test cache (reference pins test_cache_mode="full", :203)
    import dataclasses as _dc

    test_dcfg = _dc.replace(beatx_config_from(cfg.data.test),
                            test_cache_mode="full")
    test_ds = _dataset(test_dcfg)
    logger.info("test dataset (full clips): %d", len(test_ds))

    db = None
    if args.retrieval_method != "none":
        from tools.visualize import build_retrieval_db

        train_ds = _dataset(beatx_config_from(cfg.data.train))
        db = build_retrieval_db(cfg, train_ds, logger)

    chunk_ext = None
    if args.refeaturize_chunks:
        from raggesture_tpu.datasets.beatx import StubFeatureExtractor

        cache_ext = getattr(getattr(test_ds, "cache", None),
                            "extractor_name", None)
        if cache_ext == "StubFeatureExtractor":
            # stub-built caches (hermetic tests): re-featurizing with real
            # HF models would condition chunks on a DIFFERENT feature space
            # than the corpus/checkpoint — stay in the stub space
            chunk_ext = StubFeatureExtractor()
        else:
            chunk_ext = _ext[0] or make_default_extractor()
        if chunk_ext is None:
            logger.warning(
                "no HF featurizers available — per-chunk re-extraction uses "
                "the deterministic stub (consistent with stub-built caches)")
            chunk_ext = StubFeatureExtractor()
        if cache_ext and type(chunk_ext).__name__ != cache_ext:
            logger.warning(
                "per-chunk featurizer %s differs from the cache's %s — "
                "chunk conditioning will live in a different feature space "
                "than the corpus/checkpoint",
                type(chunk_ext).__name__, cache_ext)

    ex = slice_chunk(test_ds[0], 0, window, fps)
    ex_batch = device_batch(collate([ex]))
    params = init_params(model, jax.random.PRNGKey(0), ex_batch)
    params = load_params(args.checkpoint, params)
    sched = model.cfg.diffusion_test.schedule()
    gen = StagedGenerator(model, params, sched)
    if args.inv_cache:
        logger.info("inversion cache: %d entries loaded from %s",
                    gen.load_inv_cache(args.inv_cache), args.inv_cache)
    encode_fn = jax.jit(
        lambda b: model.apply(params, b, rng=None, sample=False,
                              method=model.encode_motion))

    from tools.visualize import parse_guidance_iters

    gi = parse_guidance_iters(args.guidance_iters, sched.num_timesteps) \
        if args.insertion_guidance else None

    rng = jax.random.PRNGKey(args.seed)
    factor = 30 // fps

    def stitch(state, pose, exps, trans):
        """Append one chunk to a clip's stitched buffers, cross-fading the
        15-frame overlap in 6d rotation space (:431-518)."""
        if state["pose"] is None:
            state["pose"], state["exps"], state["trans"] = pose, exps, trans
            return
        faded = crossfade_pose_aa(state["pose"][-overlap:], pose[:overlap])
        state["pose"] = np.concatenate(
            [state["pose"][:-overlap], faded, pose[overlap:]])
        state["exps"] = np.concatenate(
            [state["exps"][:-overlap],
             crossfade_linear(state["exps"][-overlap:], exps[:overlap]),
             exps[overlap:]])
        state["trans"] = np.concatenate(
            [state["trans"][:-overlap],
             crossfade_linear(state["trans"][-overlap:], trans[:overlap]),
             trans[overlap:]])

    # planning pass reads each record once just for its length (grouping
    # needs all lengths up front); records are re-read per group below so
    # at most one group's full clips are resident at a time
    n_clips = min(len(test_ds), args.max_clips)
    plans = []
    for ci in range(n_clips):
        n_frames = int(np.asarray(test_ds[ci]["motion"]).shape[0])
        plans.append(chunk_starts(n_frames, window, overlap))

    for group, waves in plan_waves([len(p) for p in plans],
                                   args.clip_batch):
        recs = {ci: test_ds[ci] for ci in group}
        st = {}
        for ci in group:
            name = recs[ci]["sample_name"].split("/")[0]
            logger.info("clip %s: %d frames -> %d chunks", name,
                        np.asarray(recs[ci]["motion"]).shape[0],
                        len(plans[ci]))
            clip_dir = os.path.join(args.out_dir, name)
            os.makedirs(clip_dir, exist_ok=True)
            st[ci] = {"pose": None, "exps": None, "trans": None,
                      "dir": clip_dir}

        def make_chunk(ci, k):
            s = plans[ci][k]
            chunk = slice_chunk(recs[ci], s, s + window, fps)
            if chunk_ext is not None:
                refeaturize_chunk(chunk, chunk_ext)
            return chunk

        def run_wave(k, chunks_p, prev_rows, n_active):
            nonlocal rng
            batch = device_batch(collate(chunks_p))
            re_dict = None
            if db is not None:
                # retrieve for the ACTIVE rows only: padded duplicate rows
                # would otherwise inflate Q with exemplar encodes +
                # 50-step inversions whose outputs are discarded.  Padding
                # appends at the end, so splice batch_idx values
                # (0..n_active-1) address the same rows in the padded batch
                # and pad rows simply run unspliced.
                act = chunks_p[:n_active]
                hb = host_batch_from_records(act)
                re_dict = db(hb, [c["sample_name"] for c in act],
                             encode_fn, method=args.retrieval_method)
            # prev rows stay on device (jnp.concatenate of device slices):
            # a host round trip here would reintroduce the per-chunk
            # transfer latency wave-batching exists to amortize
            prev_latent = (jnp.concatenate(prev_rows, axis=0)
                           if prev_rows is not None else None)
            opts = InferenceOptions(
                use_inversion=args.use_inversion and re_dict is not None,
                insertion_guidance=args.insertion_guidance
                and re_dict is not None,
                guidance_lr=args.guidance_lr,
                use_prev_latent=prev_latent is not None,
            )
            rng, r = jax.random.split(rng)
            out = gen(batch, r, opts=opts, re_dict=re_dict,
                      guidance_iters=gi, prev_latent=prev_latent)
            payload = (reassemble_full_pose(out),      # (B, window, 165)
                       np.asarray(out["pred_exps"]),
                       np.asarray(out["pred_transl"]))
            return out["prev_latentout"], payload

        def on_chunk(ci, k, row, payload):
            poses, exps_all, trans_all = payload
            pose, exps, trans = poses[row], exps_all[row], trans_all[row]
            stitch(st[ci], pose, exps, trans)
            save_smplx_npz(
                os.path.join(st[ci]["dir"], f"chunk_{k:03d}.npz"),
                upsample_pose_aa(pose, factor),
                linear_resample(exps, factor),
                linear_resample(trans, factor), fps=30)

        run_group_waves(group, waves, make_chunk, run_wave, on_chunk)

        for ci in group:
            rec, s = recs[ci], st[ci]
            n_frames = np.asarray(rec["motion"]).shape[0]
            save_smplx_npz(os.path.join(s["dir"], "full_pred_motion.npz"),
                           upsample_pose_aa(s["pose"][:n_frames], factor),
                           linear_resample(s["exps"][:n_frames], factor),
                           linear_resample(s["trans"][:n_frames], factor),
                           fps=30)
            save_smplx_npz(os.path.join(s["dir"], "full_gt_motion.npz"),
                           upsample_pose_aa(np.asarray(rec["motion"]),
                                            factor),
                           linear_resample(np.asarray(rec["facial"]),
                                           factor),
                           linear_resample(np.asarray(rec["trans"]), factor),
                           fps=30)
            raw_audio = np.asarray(rec.get("raw_audio", np.zeros(0)))
            if raw_audio.size:
                from scipy.io import wavfile

                wavfile.write(os.path.join(s["dir"], "gt_audio.wav"), 16000,
                              (raw_audio * 32767).astype(np.int16))
    if args.inv_cache:
        logger.info("inversion cache: %d entries saved to %s",
                    gen.save_inv_cache(args.inv_cache), args.inv_cache)
    logger.info("long-form results in %s", args.out_dir)


if __name__ == "__main__":
    main()
