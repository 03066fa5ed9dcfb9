"""Raw-BEAT2 → cache build pipeline over a synthetic dataset directory.

Exercises split selection, modality loading (npz/wav/sem/prom/discourse),
featurization, cache idempotency, and record schema — the capability of
the reference's cache_generation (beatx_dataset.py:291-988) without the
40 GB download."""

import json
import os

import numpy as np
import pytest

from raggesture_tpu.datasets.beatx import BeatXConfig, StubFeatureExtractor
from raggesture_tpu.datasets.build import (
    build_cache,
    build_dataset,
    load_wav,
    parse_prom,
    parse_sem_txt,
    read_split_csv,
    select_files,
)
from raggesture_tpu.datasets.joints import POSE_DIM


def make_raw_beat2(root, file_ids, n_sec=12, fps30=30, sr=16000):
    """file_ids entries are (fid, split) or (fid, split, n_sec) — the
    3-tuple form gives that clip its own duration (ragged-length clips for
    the wave-batched long-form path)."""
    os.makedirs(os.path.join(root, "smplxflame_30"), exist_ok=True)
    os.makedirs(os.path.join(root, "wave16k"), exist_ok=True)
    os.makedirs(os.path.join(root, "sem"), exist_ok=True)
    os.makedirs(os.path.join(root, "prom"), exist_ok=True)
    os.makedirs(os.path.join(root, "discourse_rels"), exist_ok=True)
    rows = ["id,type"]
    for i, entry in enumerate(file_ids):
        fid, typ = entry[0], entry[1]
        sec = entry[2] if len(entry) > 2 else n_sec
        rows.append(f"{fid},{typ}")
        T = sec * fps30
        rng = np.random.RandomState(i)
        np.savez(
            os.path.join(root, "smplxflame_30", fid + ".npz"),
            poses=rng.randn(T, 165).astype(np.float32) * 0.1,
            trans=rng.randn(T, 3).astype(np.float32) * 0.05,
            betas=rng.randn(300).astype(np.float32) * 0.1,
            expressions=rng.randn(T, 100).astype(np.float32) * 0.1,
        )
        from scipy.io import wavfile

        wave = (rng.randn(sec * sr) * 3000).astype(np.int16)
        wavfile.write(os.path.join(root, "wave16k", fid + ".wav"), sr, wave)
        with open(os.path.join(root, "sem", fid + ".txt"), "w") as f:
            f.write("beat_align\t0.5\t1.5\t1.0\t0.3\thello\n")
            f.write("iconic_high\t4.0\t6.0\t2.0\t0.9\tworld\n")
            f.write("junk_class\t7.0\t8.0\t1.0\t0.1\tx\n")
        with open(os.path.join(root, "prom", fid + ".prom"), "w") as f:
            f.write(f"{fid}\t0.4\t0.9\thello\t1.2\t0.0\n")
            f.write(f"{fid}\t4.1\t4.6\tworld\t2.5\t1.0\n")
        tokens = [
            {"surface": "hello", "startSec": 0.4, "endSec": 0.9},
            {"surface": "big", "startSec": 2.0, "endSec": 2.4},
            {"surface": "world", "startSec": 4.1, "endSec": 4.6},
            {"surface": "because", "startSec": 6.0, "endSec": 6.5},
            {"surface": "reasons", "startSec": 7.0, "endSec": 7.6},
        ]
        ann = {
            "sentences": [{"tokens": tokens}],
            "relations": [{
                "Connective": {"TokenList": [3], "RawText": "because"},
                "Sense": ["Contingency.Cause.Reason"],
                "Arg1": {"TokenList": [0, 1, 2], "RawText": "hello big world"},
                "Arg2": {"TokenList": [4], "RawText": "reasons"},
            }],
        }
        with open(os.path.join(
                root, "discourse_rels", fid + "_whisper_relations.json"),
                "w") as f:
            json.dump(ann, f)
    with open(os.path.join(root, "train_test_split.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


@pytest.fixture(scope="module")
def beat2_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("beat2"))
    make_raw_beat2(root, [
        ("2_scott_0_1_1", "train"),
        ("2_scott_0_2_2", "train"),
        ("2_scott_0_3_3", "test"),
        ("4_lawrence_0_1_1", "additional"),
        ("99_other_0_1_1", "train"),  # speaker 99 excluded by filter
    ])
    return root


def _cfg(root, tmp, **kw):
    kw.setdefault("allow_fake_contacts", True)  # no SMPL-X asset in tests
    return BeatXConfig(data_root=root, cache_dir=os.path.join(tmp, "cache"),
                       **kw)


def test_split_selection(beat2_root, tmp_path):
    rows = read_split_csv(beat2_root)
    assert len(rows) == 5
    cfg = _cfg(beat2_root, str(tmp_path), split="train",
               training_speakers=tuple(range(1, 31)))
    files = select_files(cfg)
    # 2 train + 1 additional; speaker 99 excluded
    assert sorted(files) == ["2_scott_0_1_1", "2_scott_0_2_2",
                             "4_lawrence_0_1_1"]
    tiny = select_files(_cfg(beat2_root, str(tmp_path), split="train",
                             tiny=True))
    assert len(tiny) == 1


def test_parsers(beat2_root):
    sem = parse_sem_txt(os.path.join(beat2_root, "sem", "2_scott_0_1_1.txt"))
    assert [s["name"] for s in sem] == ["beat", "iconic"]  # junk dropped
    assert sem[1]["word"] == "world" and sem[1]["score"] == 0.9
    prom = parse_prom(os.path.join(beat2_root, "prom", "2_scott_0_1_1.prom"))
    assert prom[0] == ("hello", 0.4, 0.9, 1.2)
    wave = load_wav(os.path.join(beat2_root, "wave16k", "2_scott_0_1_1.wav"))
    assert wave.dtype == np.float32 and abs(wave).max() <= 1.0


def test_missing_contacts_hard_fail(beat2_root, tmp_path):
    """A cache build without an SMPL-X model must refuse to degrade contacts
    silently (all-ones bits would corrupt training)."""
    import pytest

    cfg = _cfg(beat2_root, str(tmp_path), split="train", pose_length=150,
               stride=75, allow_fake_contacts=False)
    with pytest.raises(RuntimeError, match="foot-contact"):
        build_dataset(cfg, StubFeatureExtractor())
    # and a configured-but-missing asset path fails fast
    cfg2 = _cfg(beat2_root, str(tmp_path) + "2", split="train",
                pose_length=150, stride=75, allow_fake_contacts=False,
                smplx_asset="/nonexistent/SMPLX.npz")
    with pytest.raises(FileNotFoundError, match="smplx_asset"):
        build_dataset(cfg2, StubFeatureExtractor())


def test_build_cache_and_serve(beat2_root, tmp_path):
    cfg = _cfg(beat2_root, str(tmp_path), split="train", pose_length=150,
               stride=75)  # large stride: few windows, fast test
    ds = build_dataset(cfg, StubFeatureExtractor())
    assert len(ds) > 0
    rec = ds[0]
    # reference record schema (beatx_dataset.py:1262-1295)
    assert rec["motion"].shape[1] == POSE_DIM
    assert rec["contact"].shape[1] == 4
    assert rec["motion_upper"].shape == (150, 39)
    assert rec["motion_hands"].shape == (150, 90)
    assert rec["motion_lower"].shape == (150, 27)
    assert rec["motion_face"].shape == (150, 3)
    assert rec["facial"].shape == (150, 100)
    assert rec["word"].shape[0] == 150
    assert rec["audio"].ndim == 2
    assert isinstance(rec["sample_name"], str)
    assert rec["speaker_id"][0] == 1  # idmapping(2) -> 1
    assert len(rec["discourse"]) >= 0
    # string-keyed access (needed by the retrieval corpus)
    by_name = ds[rec["sample_name"]]
    assert np.allclose(by_name["motion"], rec["motion"])
    # idempotent rebuild: same windows, no re-featurize
    ds2 = build_dataset(cfg, StubFeatureExtractor())
    assert len(ds2) == len(ds)


def test_build_cache_test_split_modes(beat2_root, tmp_path):
    cfg = _cfg(beat2_root, str(tmp_path), split="test", pose_length=150)
    ds = build_dataset(cfg, StubFeatureExtractor())
    assert len(ds) >= 1
    # windowed mode: fixed 150-frame windows
    assert ds[0]["motion"].shape[0] == 150
    cfg_full = _cfg(beat2_root, str(tmp_path), split="test",
                    test_cache_mode="full")
    ds_full = build_dataset(cfg_full, StubFeatureExtractor())
    # full mode: whole clip (12s @ 15fps = 180 frames)
    assert ds_full[0]["motion"].shape[0] == 180


def test_melspec_and_onset_audio_reps(beat2_root, tmp_path):
    """audio_rep='melspec' / 'onset+amplitude' featurization (reference
    beatx_dataset.py:476-496), librosa-free."""
    from raggesture_tpu.datasets.beatx import MelFeatureExtractor

    mel = MelFeatureExtractor("melspec", num_mels=40)
    wave = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(
        np.float32)
    feats = mel.audio_features(wave, 16000)
    assert feats.shape[1] == 40 and feats.shape[0] > 20
    assert np.isfinite(feats).all() and feats.min() >= 0
    # 440 Hz should concentrate energy in a low-mel band
    assert feats.mean(0).argmax() < 20

    oa = MelFeatureExtractor("onset+amplitude")
    feats2 = oa.audio_features(wave, 16000)
    assert feats2.shape == (16000, 2)
    assert feats2[:, 0].max() <= 1.0 + 1e-5  # amplitude envelope of a sine

    # end-to-end: cache build with melspec config
    cfg = _cfg(beat2_root, str(tmp_path), split="train", pose_length=150,
               stride=75, audio_rep="melspec", num_mels=40)
    ds = build_dataset(cfg)
    assert ds[0]["audio"].shape[1] == 40
