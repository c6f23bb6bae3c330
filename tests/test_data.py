"""Data-layer unit tests: samplers (incl. the distributed wrapper's lossless
partition property, mirroring test/test_sampler.py:21-28), tokenizers,
collate bucketing, wav IO."""

import numpy as np
import pytest

from s3prl_tpu.data import Buckets, CharacterTokenizer, DistributedBatchSamplerWrapper, MaxTimestampBatchSampler, SortedBucketingSampler, WordTokenizer, load_wav, pad_collate
from s3prl_tpu.metric import cer, compute_eer, edit_distance, wer
from s3prl_tpu.util.pseudo_data import pseudo_audio


def test_distributed_wrapper_lossless_partition():
    lengths = np.random.RandomState(0).randint(100, 1000, size=53)
    base = SortedBucketingSampler(lengths, batch_size=8)
    for world_size in range(1, 9):
        seen = []
        counts = set()
        for rank in range(world_size):
            wrapper = DistributedBatchSamplerWrapper(base, world_size, rank)
            batches = list(wrapper)
            counts.add(len(batches))
            for b in batches:
                seen.extend(b)
        assert len(counts) == 1, f"ranks disagree on step count at ws={world_size}"
        assert set(seen) == set(range(53)), f"lost indices at ws={world_size}"


def test_sorted_bucketing_sorts_by_length():
    lengths = [10, 500, 20, 400, 30]
    s = SortedBucketingSampler(lengths, batch_size=2)
    batches = list(s)
    assert batches[0] == [1, 3]  # two longest first


def test_max_timestamp_budget():
    lengths = [100, 90, 80, 10, 10]
    s = MaxTimestampBatchSampler(lengths, max_timestamp=200)
    for batch in s:
        mx = max(lengths[i] for i in batch)
        assert mx * len(batch) <= 200
    all_idx = [i for b in s for i in b]
    assert sorted(all_idx) == list(range(5))


def test_character_tokenizer_roundtrip():
    tok = CharacterTokenizer.from_text(["hello world", "abc"])
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "HELLO WORLD"
    # ctc-style decode collapses repeats but keeps blank-separated repeats
    c = tok.tokens[4]
    assert tok.decode([4, 4, 0, 4], ignore_repeat=True) == (c + c)


def test_word_tokenizer():
    tok = WordTokenizer.from_text(["a b c", "a b"], vocab_size=10)
    assert tok.decode(tok.encode("a b c")) == "a b c"
    assert tok.encode("zzz") == [tok.unk_idx]


def test_collate_buckets():
    items = [
        {"x": np.zeros(5000, np.float32), "class_id": 1, "label": "a"},
        {"x": np.zeros(12000, np.float32), "class_id": 0, "label": "b"},
    ]
    buckets = Buckets.linear(16000, 32000)
    batch = pad_collate(items, buckets)
    assert batch["x"].shape == (2, 16000)  # padded up to bucket boundary
    np.testing.assert_array_equal(batch["x_len"], [5000, 12000])
    assert batch["label"] == ["a", "b"]


def test_load_wav_roundtrip():
    with pseudo_audio([1.0]) as (paths, lens):
        wav, sr = load_wav(paths[0])
        assert sr == 16000
        assert abs(len(wav) - lens[0]) <= 1
        wav2, _ = load_wav(paths[0], start_sec=0.25, end_sec=0.75)
        assert abs(len(wav2) - 8000) <= 1


def test_edit_distance_and_rates():
    assert edit_distance("kitten", "sitting") == 3
    assert wer(["a b c"], ["a b c"]) == 0.0
    assert wer(["a x c"], ["a b c"]) == pytest.approx(1 / 3)
    assert cer(["abc"], ["adc"]) == pytest.approx(1 / 3)


def test_eer_separable():
    scores = [0.9, 0.8, 0.7, 0.2, 0.1, 0.0]
    labels = [1, 1, 1, 0, 0, 0]
    eer, _ = compute_eer(labels, scores)
    assert eer == 0.0
    # fully random
    eer2, _ = compute_eer([1, 0, 1, 0], [0.6, 0.6, 0.4, 0.4])
    assert 0.0 <= eer2 <= 1.0


def test_slot_tokenizer_roundtrip():
    from s3prl_tpu.data.encoder import CharacterSlotTokenizer

    sents = ["play some music", "turn on the light"]
    iobs = ["O O B-genre", "O O O B-device"]
    tok = CharacterSlotTokenizer.from_text(sents, iobs)
    ids = tok.encode_iob("play some music", "O O B-genre")
    text = tok.decode(ids)
    assert "B-B-genre" not in text
    assert "B-genre" in text and "E-genre" in text
    assert "MUSIC" in text
    # parses with the slot metric
    from s3prl_tpu.metric.slot_filling import slot_type_f1

    assert slot_type_f1([text], [text]) == 1.0


def test_bpe_tokenizer_roundtrip(tmp_path):
    from s3prl_tpu.data.bpe import SubwordTokenizer
    from s3prl_tpu.data.encoder import load_tokenizer

    lines = ["the quick brown fox", "the lazy dog", "the quick dog"] * 5
    tok = SubwordTokenizer.from_text(lines, vocab_size=40)
    ids = tok.encode("the quick dog")
    assert tok.decode(ids) == "the quick dog"
    # frequent word becomes a single subword
    assert len(tok.encode("the")) <= 2
    tok.save(tmp_path / "bpe.json")
    tok2 = load_tokenizer(tmp_path / "bpe.json")
    assert tok2.encode("the quick dog") == ids


def test_corpus_bleu():
    from s3prl_tpu.metric.bleu import corpus_bleu

    assert corpus_bleu(["the cat sat on the mat"], ["the cat sat on the mat"]) == pytest.approx(100.0)
    assert corpus_bleu(["a b c d e"], ["v w x y z"]) == 0.0
    mid = corpus_bleu(["the cat sat on a mat"], ["the cat sat on the mat"])
    assert 0 < mid < 100


def test_ge2e_loss_prefers_clustered_embeddings():
    import jax.numpy as jnp

    from s3prl_tpu.task.speaker_verification import ge2e_loss

    rng = np.random.RandomState(0)
    centers = rng.randn(4, 1, 16) * 3
    clustered = jnp.asarray((centers + rng.randn(4, 5, 16) * 0.1).astype(np.float32))
    random = jnp.asarray(rng.randn(4, 5, 16).astype(np.float32))
    w, b = jnp.float32(10.0), jnp.float32(-5.0)
    assert float(ge2e_loss(clustered, w, b)) < float(ge2e_loss(random, w, b))


def test_time_warp_preserves_shape_and_mass():
    import jax
    import jax.numpy as jnp

    from s3prl_tpu.nn.specaug import time_warp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 50, 8).astype(np.float32))
    y = time_warp(jax.random.key(0), x, warp_window=5)
    assert y.shape == x.shape
    # endpoints are fixed points of the warp
    np.testing.assert_allclose(np.asarray(y)[:, 0], np.asarray(x)[:, 0], atol=1e-5)
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_bert_tokenizer_shift(tmp_path):
    """BertTokenizer windowing (reference tokenizer.py:448-500): ids shift by
    BERT_FIRST_IDX, out-of-window ids map to <unk>, decode inverts."""
    transformers = pytest.importorskip("transformers")
    from s3prl_tpu.data.encoder import BERT_FIRST_IDX, BertTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    # raw ids 998/999 (shifted 1/2) are sacrificed as <eos>/<unk>
    # (reference tokenizer.py:16-18); real wordpieces start at raw 1000
    vocab += [f"tok{i}" for i in range(BERT_FIRST_IDX + 3 - len(vocab))]
    vocab += ["hello", "world"]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n")

    hf = transformers.BertTokenizer(str(vf), do_lower_case=True)
    tok = BertTokenizer(hf)
    assert tok.eos_idx == 1 and tok.unk_idx == 2 and tok.pad_idx == 0
    ids = tok.encode("hello world")
    assert ids[-1] == tok.eos_idx
    # "world" sits at raw id BERT_FIRST_IDX+4 -> shifted id 4
    assert 4 in ids
    assert "world" in tok.decode(ids)
    # [CLS] (raw id 2) falls outside the window -> <unk>
    assert ids[0] == tok.unk_idx
    # ids never leave [0, vocab_size) even for real BERT vocab layouts
    assert all(0 <= i < tok.vocab_size for i in ids)
