"""Long-form chunk slicing + per-chunk feature re-extraction (reference
tools/longform_synthesis.py:64-94,300-383)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pytest

from raggesture_tpu.datasets.beatx import StubFeatureExtractor
from tools.longform_synthesis import (
    chunk_starts,
    plan_waves,
    refeaturize_chunk,
    slice_chunk,
)

FPS = 15


def _full_record(T=300, sr=16000):
    rng = np.random.RandomState(0)
    dur = T / FPS
    rec = {
        "motion": rng.randn(T, 169).astype(np.float32),
        "trans": rng.randn(T, 3).astype(np.float32),
        "facial": rng.randn(T, 100).astype(np.float32),
        "contact": np.ones((T, 4), np.float32),
        "word": rng.randn(T, 768).astype(np.float32),
        "audio": rng.randn(2 * T, 768).astype(np.float32),
        "raw_audio": rng.randn(int(dur * sr)).astype(np.float32) * 0.1,
        "speaker_id": np.asarray([3]),
        "raw_word": "hello world again and again",
        "text_feature": rng.randn(5, 768).astype(np.float32),
        "text_segments": [[[1.0, 2.0], "hello"], [[2.0, 3.0], "world"],
                          [[12.0, 13.0], "later"]],
        "prominence": [("hello", 1.0, 2.0, 0.5)],
        "discourse": [],
        "gesture_labels": [{"start": 1.0, "end": 2.0, "name": "beat",
                            "word": "hello"}],
        "sample_name": "clip/0",
    }
    return rec


def test_chunk_starts():
    assert chunk_starts(300, 150, 15) == [0, 135, 270]


def test_plan_waves_groups_and_active_sets():
    """Wave-batching schedule for ragged clip lengths: descending-length
    sort, groups of clip_batch, per-wave active sets that shrink only at
    the tail (so padded waves keep one batch shape per group size)."""
    counts = [2, 5, 3, 1, 4]       # clip i has counts[i] chunks
    groups = plan_waves(counts, clip_batch=2)
    # sort by -count: order = [1 (5), 4 (4), 2 (3), 0 (2), 3 (1)]
    assert [g for g, _ in groups] == [[1, 4], [2, 0], [3]]
    g0_waves = groups[0][1]
    assert g0_waves == [[1, 4], [1, 4], [1, 4], [1, 4], [1]]
    g1_waves = groups[1][1]
    assert g1_waves == [[2, 0], [2, 0], [2]]
    assert groups[2][1] == [[3]]
    # every clip appears in exactly counts[i] waves
    seen = {i: 0 for i in range(len(counts))}
    for _, waves in groups:
        for wave in waves:
            assert wave, "waves are never empty"
            for ci in wave:
                seen[ci] += 1
    assert seen == {i: c for i, c in enumerate(counts)}


def test_plan_waves_batch1_is_sequential():
    counts = [3, 2]
    groups = plan_waves(counts, clip_batch=1)
    assert groups == [([0], [[0], [0], [0]]), ([1], [[1], [1]])]


def test_plan_waves_batch1_keeps_dataset_order():
    """The default --clip-batch 1 path must process clips in dataset
    order (the reference's sequential protocol), NOT longest-first."""
    counts = [2, 5, 1]
    groups = plan_waves(counts, clip_batch=1)
    assert [g for g, _ in groups] == [[0], [1], [2]]


def test_plan_waves_rejects_bad_batch():
    with pytest.raises(ValueError):
        plan_waves([1, 2], clip_batch=0)


def test_run_group_waves_padding_and_prev_threading():
    """The wave dispatcher pads tail waves to the group size (one compiled
    batch shape), threads each clip's prev-latent row from the previous
    wave, and scatters outputs to the right (clip, chunk)."""
    from tools.longform_synthesis import run_group_waves

    counts = [3, 1]
    [(group, waves)] = plan_waves(counts, clip_batch=2)
    assert group == [0, 1] and waves == [[0, 1], [0], [0]]

    calls = []
    emitted = []

    def make_chunk(ci, k):
        return {"clip": ci, "k": k}

    def run_wave(k, chunks_p, prev_rows, n_active):
        calls.append((k, [c["clip"] for c in chunks_p],
                      None if prev_rows is None else list(prev_rows),
                      n_active))
        # per-row handoff token identifies (wave, row)
        prev_out = np.asarray([[k * 10 + i] for i in range(len(chunks_p))])
        return prev_out, f"payload{k}"

    def on_chunk(ci, k, row, payload):
        emitted.append((ci, k, row, payload))

    run_group_waves(group, waves, make_chunk, run_wave, on_chunk)

    # wave 0: both clips, no prev; waves 1-2: clip 0 active, padded to B=2
    assert [c[0] for c in calls] == [0, 1, 2]
    assert calls[0][1] == [0, 1] and calls[0][2] is None
    assert calls[1][1] == [0, 0] and calls[2][1] == [0, 0]
    assert [c[3] for c in calls] == [2, 1, 1]  # n_active per wave
    # wave 1's prev rows are wave 0's row 0 (clip 0), padded by repetition
    np.testing.assert_array_equal(np.concatenate(calls[1][2]), [[0], [0]])
    # wave 2's prev rows come from wave 1's row 0
    np.testing.assert_array_equal(np.concatenate(calls[2][2]), [[10], [10]])
    assert emitted == [(0, 0, 0, "payload0"), (1, 0, 1, "payload0"),
                       (0, 1, 0, "payload1"), (0, 2, 0, "payload2")]


def test_slice_then_refeaturize():
    rec = _full_record()
    chunk = slice_chunk(rec, 0, 150, FPS)
    sliced_audio = chunk["audio"].copy()
    sliced_tf = chunk["text_feature"].copy()

    ext = StubFeatureExtractor()
    refeaturize_chunk(chunk, ext)

    # audio features now come from the extractor run on the chunk's raw
    # audio — identical to a direct extractor call, different from slicing
    direct = ext.audio_features(np.asarray(chunk["raw_audio"]), 16000)
    np.testing.assert_array_equal(chunk["audio"], direct)
    assert chunk["audio"].shape != sliced_audio.shape or \
        not np.allclose(chunk["audio"], sliced_audio)

    # text feature comes from the chunk's own segments ("hello world";
    # "later" at 12-13 s is inside this 0-10 s window? no -> excluded)
    _, tf = ext.word_embeddings("hello world")
    np.testing.assert_array_equal(chunk["text_feature"], tf)
    assert chunk["raw_word"] == "hello world"
    assert not np.array_equal(chunk["text_feature"], sliced_tf)

    # frame-aligned word features stay sliced (reference :332)
    np.testing.assert_array_equal(chunk["word"], rec["word"][:150])


def test_refeaturize_empty_text_reencodes_not_full_clip():
    """A silent chunk must NOT inherit the full-clip transcript features:
    the reference re-runs BERT per chunk unconditionally (even on an empty
    sentence, longform_synthesis.py:64-81)."""
    rec = _full_record()
    chunk = slice_chunk(rec, 270, 420, FPS)  # tail: no segments in window
    full_clip_feats = chunk["text_feature"].copy()  # sliced-in full-clip
    refeaturize_chunk(chunk, StubFeatureExtractor())
    # no transcript in this chunk -> encoded EMPTY sentence, not the clip's
    assert chunk["raw_word"] == ""
    assert not np.array_equal(chunk["text_feature"], full_clip_feats)
    # audio still re-extracted (padded raw audio)
    assert chunk["audio"].shape[1] == 768
