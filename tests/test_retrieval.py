"""Retrieval subsystem tests on a synthetic corpus (pure host-side +
one tiny device encode)."""

import numpy as np
import pytest

from raggesture_tpu.retrieval import scoring
from raggesture_tpu.retrieval.database import (
    RetrievalConfig,
    RetrievalCorpus,
    RetrievalDatabase,
    bounds_to_latent_window,
    place_window,
)
from raggesture_tpu.retrieval.discourse import discourse_retrieval
from raggesture_tpu.retrieval.gesture_type import gesture_type_retrieval
from raggesture_tpu.retrieval.llm import (
    align_labels_to_times,
    heuristic_labeler,
    llm_retrieval,
    parse_gesture_labels,
)

R = np.random.RandomState(0)


def feat(n_tokens=5, d=8, seed=0):
    f = np.random.RandomState(seed).randn(n_tokens, d).astype(np.float32)
    return f / np.linalg.norm(f, axis=-1, keepdims=True)


def make_sample(name, seed, spk=2, frames=150):
    r = np.random.RandomState(seed)
    return {
        "sample_name": name,
        "speaker_id": np.array([spk]),
        "text_feature": feat(seed=seed),
        # discourse rows: (conn, sense, arg1, arg2, d_start, d_end, c_start, c_end)
        "discourse": [("because", "Contingency.Cause", "a", "b",
                       1.0, 3.0, 1.5, 2.0)],
        "prominence": [("because", 1.5, 2.0, 0.5 + 0.1 * seed),
                       ("house", 4.0, 4.5, 1.0)],
        "gesture_labels": [
            {"name": "iconic", "word": "house", "start": 4.0, "end": 4.5},
            {"name": "beat", "word": "uh", "start": 0.5, "end": 0.7},
        ],
        "motion": r.randn(frames, 165).astype(np.float32),
        "motion_upper": r.randn(frames, 39).astype(np.float32) * 0.2,
        "motion_lower": r.randn(frames, 27).astype(np.float32) * 0.2,
        "motion_face": r.randn(frames, 3).astype(np.float32) * 0.2,
        "motion_hands": r.randn(frames, 90).astype(np.float32) * 0.2,
        "trans": r.randn(frames, 3).astype(np.float32) * 0.1,
        "facial": r.randn(frames, 100).astype(np.float32) * 0.1,
        "contact": np.ones((frames, 4), np.float32),
        "motion_mask": np.ones((frames,), np.float32),
        "word": r.randn(frames, 24).astype(np.float32),
        "audio": r.randn(8, 24).astype(np.float32),
    }


class ToyDataset:
    def __init__(self, samples):
        self.samples = samples
        self.by_name = {s["sample_name"]: s for s in samples}

    def __iter__(self):
        return iter(self.samples)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.by_name[key]
        return self.samples[key]


@pytest.fixture(scope="module")
def corpus_and_ds():
    samples = [make_sample(f"f{i}/{j}", seed=i * 31 + j, spk=2 + (i % 2))
               for i in range(3) for j in (0, 15)]
    ds = ToyDataset(samples)
    cfg = RetrievalConfig(max_seq_len=150, stratification_interval=15)
    corpus = RetrievalCorpus.build(ds, cfg)
    return corpus, ds, cfg


def test_partial_ratio_matches_fuzzy_definition():
    assert scoring.partial_ratio("abc", "abc") == 100
    assert scoring.partial_ratio("abc", "xxabcxx") == 100
    assert scoring.partial_ratio("", "abc") == 0
    assert 0 < scoring.partial_ratio("house", "mouse") < 100


def test_map_conns_to_prominence():
    conns = ["because of", "so"]
    prom = [("because", 0, 1, 0.4), ("of", 1, 2, 0.6), ("so", 3, 4, 0.9)]
    out = scoring.map_conns_to_prominence(conns, prom)
    assert out[0][0] == "because of"
    np.testing.assert_allclose(out[0][1], 0.5)
    assert out[1] == ("so", 0.9)


def test_corpus_build_stratified(corpus_and_ds):
    corpus, ds, cfg = corpus_and_ds
    # both window 0 and 15 pass index % 15 == 0
    assert len(corpus.idx_2_text) == 6
    tf, spk = corpus.idx_2_text["f0/0"]
    np.testing.assert_allclose(np.linalg.norm(tf, axis=-1), 1.0, atol=1e-5)


def test_corpus_save_load(tmp_path, corpus_and_ds):
    corpus, _, _ = corpus_and_ds
    corpus.save(str(tmp_path / "corpus"))
    loaded = RetrievalCorpus.load(str(tmp_path / "corpus"))
    assert set(loaded.idx_2_text) == set(corpus.idx_2_text)
    assert loaded.idx_2_sense["f0/0"] == corpus.idx_2_sense["f0/0"]
    assert loaded.idx_2_prominence["f0/0"] == corpus.idx_2_prominence["f0/0"]


def test_discourse_retrieval_scoring(corpus_and_ds):
    corpus, _, _ = corpus_and_ds
    q = make_sample("q/0", seed=99, spk=2)
    si, db, qb = discourse_retrieval(
        "because the house", q["discourse"], q["prominence"], 2,
        corpus.idx_2_sense, corpus.idx_2_discbounds, corpus.idx_2_prominence,
        feat(seed=99), corpus.idx_2_text,
    )
    assert 0 in si and len(si[0]) > 0
    # same-speaker samples (spk=2, i even) must outrank spk=3 ones:
    # both match sense+text+prominence, speaker adds +3
    top = si[0][0]
    assert corpus.idx_2_sense[top][0] == 2
    # bounds rows are (conn, sense, start, end)
    conn, sense, s, e = db[0][top]
    assert sense == "Contingency.Cause" and conn == "because"
    assert qb[0][0] == "because"


def test_gesture_type_retrieval_scoring(corpus_and_ds):
    corpus, _, _ = corpus_and_ds
    labels = [{"name": "iconic", "word": "house", "start": 4.0, "end": 4.5}]
    si, db, qb = gesture_type_retrieval(
        "the house", labels, 3, corpus.idx_2_gesture_labels,
        feat(seed=98), corpus.idx_2_text,
    )
    assert 0 in si and len(si[0]) > 0
    top = si[0][0]
    # exact word + type match everywhere; speaker (+2) decides the top
    assert corpus.idx_2_gesture_labels[top][0] == 3
    word, typ, s, e = db[0][top]
    assert typ == "iconic" and word == "house"


def test_llm_parse_and_align():
    labels = parse_gesture_labels("[('hello', 'beat'), ('big house', 'iconic')]")
    assert labels == [{"word": "big house", "name": "iconic"}]
    tt = [((0.0, 0.5), "the"), ((0.5, 1.0), "big"), ((1.0, 1.6), "house")]
    qb = align_labels_to_times(labels, tt)
    assert qb[0] == ("big house", "iconic", 0.5, 1.6)


def test_llm_retrieval_offline(corpus_and_ds):
    corpus, _, _ = corpus_and_ds
    tt = [((0.0, 0.5), "this"), ((0.5, 1.0), "big"), ((1.0, 1.6), "house")]
    si, db, qb = llm_retrieval(
        "this big house", tt, 2,
        [("this", 0.0, 0.5, 0.3), ("house", 1.0, 1.6, 0.8)],
        corpus.idx_2_gesture_labels, corpus.idx_2_gestprom,
        feat(seed=97), corpus.idx_2_text,
        llm_fn=lambda text: "[('house', 'iconic')]",
    )
    assert len(si) >= 0  # parses and runs; bounds keyed consistently
    if si:
        assert set(si) == set(db) == set(qb)


def test_place_window_cases():
    # centered odd
    assert place_window(3, 5, 10, -1) == (3, 6, 3)
    # centered even
    assert place_window(4, 5, 10, -1) == (3, 7, 4)
    # len 1 / len 2 anchored at midpoint
    assert place_window(1, 5, 10, -1) == (5, 6, 1)
    assert place_window(2, 5, 10, -1) == (5, 7, 2)
    # left clamp
    assert place_window(4, 0, 10, -1) == (0, 4, 4)
    # right clamp
    assert place_window(4, 9, 10, -1) == (6, 10, 4)
    # overlap push + trim at the end
    s, e, kept = place_window(4, 1, 10, 8)
    assert s == 8 and e == 10 and kept == 2
    # fully squeezed out
    assert place_window(3, 5, 10, 10)[2] <= 0


def test_bounds_to_latent_window():
    cfg = RetrievalConfig()
    # 2.0-3.0s with default padding -> (1.334s, 3.333s) -> frames (20, 49)
    win = bounds_to_latent_window(2.0, 3.0, cfg, pad_small=False)
    assert win == (20 // 15, 49 // 15 + 1)
    # end at clip end gets pulled in one frame
    win2 = bounds_to_latent_window(9.0, 10.0, cfg, pad_small=True)
    assert win2 is not None and win2[1] <= 10


def test_database_forward(corpus_and_ds):
    corpus, ds, cfg = corpus_and_ds
    db = RetrievalDatabase(corpus, cfg, ds)

    def fake_encode(batch):
        n = batch["motion_upper"].shape[0]
        lat = np.arange(n * cfg.num_tokens * cfg.latent_dim, dtype=np.float32)
        lat = lat.reshape(n, cfg.num_tokens, cfg.latent_dim) / lat.size + 1.0
        return lat, np.ones((n, cfg.num_tokens), np.float32)

    host_batch = {
        "text": ["the house is big"],
        "text_features": [feat(seed=7)],
        "discourse": [[("because", "Contingency.Cause", "a", "b", 1.0, 3.0, 1.5, 2.0)]],
        "gesture_labels": [[{"name": "iconic", "word": "house", "start": 4.0, "end": 4.5}]],
        "text_times": [[((4.0, 4.5), "house")]],
        "prominence": [[("house", 4.0, 4.5, 0.7)]],
        "speaker_ids": [2],
    }
    re_dict = db(host_batch, ["q/0"], fake_encode, method="gesture_type")
    assert re_dict["num_queries"] == 1
    T = cfg.num_tokens
    L = cfg.latent_len
    # face + lowertrans rows zeroed in raw_motion_latents
    rml = re_dict["raw_motion_latents"][0, 0]
    assert np.abs(rml[2 * L + 2:]).sum() == 0
    # upper rows contain the splice
    b, qs, rs, ln = re_dict["splice"][0]
    assert ln > 0
    assert np.abs(rml[qs:qs + ln]).sum() > 0
    # memoization: second call hits cache and returns identical plan
    re_dict2 = db(host_batch, ["q/0"], fake_encode, method="gesture_type")
    assert re_dict2["retr_startends"] == re_dict["retr_startends"]
    assert re_dict2["query_startends"] == re_dict["query_startends"]


def test_database_device_payload_bank(corpus_and_ds):
    """device_payloads=True stages exemplar word/audio/latents on the device
    at retrieval time (transfer-free guided dispatch on remote-TPU rigs):
    re_dict carries jax Arrays numerically equal to the host path, and the
    per-name bank caches rows across calls (second retrieve reuses the same
    device buffers instead of re-staging)."""
    import jax

    corpus, ds, cfg = corpus_and_ds

    def fake_encode(batch):
        n = batch["motion_upper"].shape[0]
        lat = np.arange(n * cfg.num_tokens * cfg.latent_dim, dtype=np.float32)
        lat = lat.reshape(n, cfg.num_tokens, cfg.latent_dim) / lat.size + 1.0
        return lat, np.ones((n, cfg.num_tokens), np.float32)

    host_batch = {
        "text": ["the house is big"],
        "text_features": [feat(seed=7)],
        "discourse": [[("because", "Contingency.Cause", "a", "b",
                        1.0, 3.0, 1.5, 2.0)]],
        "gesture_labels": [[{"name": "iconic", "word": "house",
                             "start": 4.0, "end": 4.5}]],
        "text_times": [[((4.0, 4.5), "house")]],
        "prominence": [[("house", 4.0, 4.5, 0.7)]],
        "speaker_ids": [2],
    }
    db_host = RetrievalDatabase(corpus, cfg, ds, device_payloads=False)
    db_dev = RetrievalDatabase(corpus, cfg, ds, device_payloads=True)
    rd_host = db_host(host_batch, ["q/0"], fake_encode, method="gesture_type")
    rd_dev = db_dev(host_batch, ["q/0"], fake_encode, method="gesture_type")
    assert rd_dev["num_queries"] == rd_host["num_queries"] >= 1

    for key in ("inv_latents", "inv_mask"):
        assert isinstance(rd_dev[key], jax.Array)
        np.testing.assert_array_equal(np.asarray(rd_dev[key]), rd_host[key])
    for key in ("word", "audio", "speaker_ids"):
        assert isinstance(rd_dev["inv_conds"][key], jax.Array)
        np.testing.assert_array_equal(
            np.asarray(rd_dev["inv_conds"][key], np.float32),
            np.asarray(rd_host["inv_conds"][key], np.float32))

    # bank hit: the second retrieve returns rows staged from the SAME
    # device buffers (get-or-insert by exemplar name)
    names = rd_dev["inv_names"]
    assert names and all(n in db_dev._payload_bank for n in names)
    before = {n: db_dev._payload_bank[n]["audio"] for n in names}
    rd_dev2 = db_dev(host_batch, ["q/0"], fake_encode, method="gesture_type")
    assert rd_dev2["inv_names"] == names
    for n in names:
        assert db_dev._payload_bank[n]["audio"] is before[n]

    # _inv_conds_core passes device arrays through untouched (no host pull)
    from raggesture_tpu.models.architecture import _inv_conds_core

    core = _inv_conds_core(rd_dev)
    assert core["audio"] is rd_dev["inv_conds"]["audio"]

    # LRU eviction keeps the bank bounded
    db_dev.payload_bank_capacity = 1
    db_dev._payload_bank.clear()
    db_dev(host_batch, ["q/0"], fake_encode, method="gesture_type")
    assert len(db_dev._payload_bank) <= 1


def test_memo_save_load(tmp_path, corpus_and_ds):
    corpus, ds, cfg = corpus_and_ds
    db = RetrievalDatabase(corpus, cfg, ds)
    db.test_indexes = {"q/0": {"gesture_type": {0: ["f0/0"]}}}
    db.test_dbounds = {"q/0": {"gesture_type": {0: {"f0/0": ("w", "iconic", 1.0, 2.0)}}}}
    db.test_qbounds = {"q/0": {"gesture_type": {0: ("w", "iconic", 1.0, 2.0)}}}
    db.save_memo(str(tmp_path))
    db2 = RetrievalDatabase(corpus, cfg, ds)
    db2.load_memo(str(tmp_path))
    assert 0 in db2.test_indexes["q/0"]["gesture_type"]
