"""Long-form chunk slicing + per-chunk feature re-extraction (reference
tools/longform_synthesis.py:64-94,300-383)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raggesture_tpu.datasets.beatx import StubFeatureExtractor
from tools.longform_synthesis import (
    chunk_starts,
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
