"""HF feature-extractor numerics: the torch (HFFeatureExtractor) and Flax
(FlaxHFFeatureExtractor) variants must be interchangeable — same last-4-sum
BERT features, same word-piece averaging/frame alignment, same wav2vec2
frame counts — proven on tiny synthetic-weight models saved locally (no
egress).  Reference behavior: beatx_dataset.py:1115-1179 (BERT last-4 sum +
word-piece mean), :501-506 (wav2vec2 last_hidden_state)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "hello", "world", "aga", "##in", "and", "big", "##ger", "words",
         ",", "."]


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_bert"))
    from transformers import BertConfig, BertModel, BertTokenizerFast

    vocab_path = os.path.join(d, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(VOCAB))
    tok = BertTokenizerFast(vocab_file=vocab_path, do_lower_case=True)
    tok.save_pretrained(d)

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=len(VOCAB), hidden_size=32,
                     num_hidden_layers=5, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=64)
    BertModel(cfg).eval().save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def tiny_w2v_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_w2v"))
    import json

    from transformers import (
        Wav2Vec2Config,
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2Model,
        Wav2Vec2Processor,
    )

    vocab = {c: i for i, c in enumerate(
        ["<pad>", "<s>", "</s>", "<unk>", "|", "a", "b"])}
    vpath = os.path.join(d, "vocab.json")
    os.makedirs(d, exist_ok=True)
    with open(vpath, "w") as f:
        json.dump(vocab, f)
    proc = Wav2Vec2Processor(
        feature_extractor=Wav2Vec2FeatureExtractor(do_normalize=True,
                                                   return_attention_mask=False),
        tokenizer=Wav2Vec2CTCTokenizer(vpath))
    proc.save_pretrained(d)

    torch.manual_seed(1)
    # do_stable_layer_norm=True/"layer": the only flavor transformers'
    # FlaxWav2Vec2Model supports (base-960h's False raises — covered by the
    # construction-time probe + torch fallback in make_default_extractor)
    cfg = Wav2Vec2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16), conv_stride=(5, 4), conv_kernel=(10, 3),
        num_feat_extract_layers=2, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=True,
        feat_extract_norm="layer")
    Wav2Vec2Model(cfg).eval().save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def extractors(tiny_bert_dir, tiny_w2v_dir):
    from raggesture_tpu.datasets.beatx import (
        FlaxHFFeatureExtractor,
        HFFeatureExtractor,
    )

    th = HFFeatureExtractor(wav2vec_name=tiny_w2v_dir,
                            bert_name=tiny_bert_dir)
    fx = FlaxHFFeatureExtractor(wav2vec_name=tiny_w2v_dir,
                                bert_name=tiny_bert_dir)
    return th, fx


def test_word_embeddings_torch_flax_equal(extractors):
    th, fx = extractors
    sentence = "hello world again and bigger words zzz"
    tvecs, tfeats = th.word_embeddings(sentence)
    fvecs, ffeats = fx.word_embeddings(sentence)
    assert len(tvecs) == len(fvecs) == len(sentence.split())
    np.testing.assert_allclose(np.asarray(tfeats), np.asarray(ffeats),
                               atol=2e-4)
    for tv, fv in zip(tvecs, fvecs):
        np.testing.assert_allclose(np.asarray(tv), np.asarray(fv), atol=2e-4)


def test_word_embeddings_last4_sum_and_piece_mean(tiny_bert_dir, extractors):
    """The per-word vectors are the mean over that word's word-piece rows of
    the last-4-layer hidden-state sum (reference :1115-1179)."""
    th, fx = extractors
    sentence = "again bigger"
    _, feats = th.word_embeddings(sentence)

    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tiny_bert_dir)
    bert = AutoModel.from_pretrained(tiny_bert_dir,
                                     output_hidden_states=True).eval()
    enc = tok(sentence, return_tensors="pt")
    with torch.no_grad():
        out = bert(**enc)
    manual = torch.stack(out.hidden_states[-4:]).sum(0).squeeze(0).numpy()
    np.testing.assert_allclose(np.asarray(feats), manual, atol=1e-5)

    # "again" -> pieces [aga, ##in]: mean of rows 1,2 (row 0 is [CLS])
    tvecs, _ = th.word_embeddings(sentence)
    np.testing.assert_allclose(tvecs[0], manual[1:3].mean(0), atol=1e-5)
    np.testing.assert_allclose(tvecs[1], manual[3:5].mean(0), atol=1e-5)
    fvecs, _ = fx.word_embeddings(sentence)
    np.testing.assert_allclose(fvecs[0], manual[1:3].mean(0), atol=2e-4)


def test_word_embeddings_too_long_returns_none(extractors):
    th, fx = extractors
    long_sentence = " ".join(["hello"] * 100)  # > 64 positions
    assert th.word_embeddings(long_sentence) == (None, None)
    assert fx.word_embeddings(long_sentence) == (None, None)


def test_audio_features_torch_flax_equal(extractors):
    th, fx = extractors
    rng = np.random.RandomState(2)
    wave = rng.randn(24000).astype(np.float32) * 0.1  # 1.5 s -> pads to 2 s
    ta = th.audio_features(wave, 16000)
    fa = fx.audio_features(wave, 16000)
    # identical frame counts (flax path computes real length from the
    # unpadded sample count) and matching values
    assert ta.shape == fa.shape
    np.testing.assert_allclose(ta, fa, atol=2e-3)


def test_word_embeddings_punctuation_merges_into_word(extractors):
    """Attached punctuation must merge into its whitespace word's vector and
    not shift later words (reference beatx_dataset.py:1126-1160 walks
    tokenizer.tokenize(word) per whitespace word; fast-tokenizer word_ids()
    index punctuation-split pre-tokens and used to shift everything after a
    comma by one)."""
    from raggesture_tpu.datasets.beatx import _tokens_per_whitespace_word

    th, fx = extractors
    sentence = "hello, world again."
    tok = th.tokenizer(sentence, return_offsets_mapping=True)
    groups = _tokens_per_whitespace_word(sentence, tok["offset_mapping"])
    toks = tok.tokens()
    assert len(groups) == 3
    assert [toks[i] for i in groups[0]] == ["hello", ","]
    assert [toks[i] for i in groups[1]] == ["world"]
    assert [toks[i] for i in groups[2]] == ["aga", "##in", "."]

    vecs, states = th.word_embeddings(sentence)
    assert len(vecs) == 3
    np.testing.assert_allclose(vecs[1], states[groups[1]].mean(0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vecs[2], states[groups[2]].mean(0),
                               rtol=1e-5, atol=1e-6)

    fvecs, _ = fx.word_embeddings(sentence)
    for a, b in zip(vecs, fvecs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
