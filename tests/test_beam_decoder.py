"""Native CTC beam decoder tests: parity with a numpy prefix beam search,
greedy agreement on peaked posteriors, and LM rescoring behavior."""

import math

import numpy as np
import pytest

from s3prl_tpu.data.encoder import CharacterTokenizer
from s3prl_tpu.nn.beam_decoder import BeamDecoder


def numpy_prefix_beam(log_probs, blank, beam_size):
    """Reference prefix beam search (no LM), Hannun et al. 2014."""
    T, V = log_probs.shape
    NEG = -1e30

    def logadd(a, b):
        if a < b:
            a, b = b, a
        if b <= NEG:
            return a
        return a + math.log1p(math.exp(b - a))

    beams = {(): (0.0, NEG)}  # prefix -> (p_blank, p_no_blank)
    for t in range(T):
        next_beams = {}
        for prefix, (pb, pnb) in beams.items():
            total = logadd(pb, pnb)
            # blank
            b0, n0 = next_beams.get(prefix, (NEG, NEG))
            next_beams[prefix] = (logadd(b0, total + log_probs[t, blank]), n0)
            for c in range(V):
                if c == blank:
                    continue
                p = log_probs[t, c]
                if prefix and prefix[-1] == c:
                    b0, n0 = next_beams.get(prefix, (NEG, NEG))
                    next_beams[prefix] = (b0, logadd(n0, pnb + p))
                    np_ = prefix + (c,)
                    b1, n1 = next_beams.get(np_, (NEG, NEG))
                    next_beams[np_] = (b1, logadd(n1, pb + p))
                else:
                    np_ = prefix + (c,)
                    b1, n1 = next_beams.get(np_, (NEG, NEG))
                    next_beams[np_] = (b1, logadd(n1, total + p))
        items = sorted(next_beams.items(), key=lambda kv: -logadd(*kv[1]))
        beams = dict(items[:beam_size])
    best = max(beams.items(), key=lambda kv: logadd(*kv[1]))
    return list(best[0])


@pytest.fixture(scope="module")
def tokenizer():
    return CharacterTokenizer.from_text(["hello world", "abc def"])


def test_beam_matches_numpy_reference(tokenizer):
    rng = np.random.RandomState(0)
    V = tokenizer.vocab_size
    logits = rng.randn(12, V).astype(np.float32) * 2
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    dec = BeamDecoder(tokenizer, beam_size=8)
    got = dec.decode_ids(log_probs)
    want = numpy_prefix_beam(log_probs.astype(np.float64), tokenizer.pad_idx, 8)
    assert got == want


def test_beam_equals_greedy_on_peaked(tokenizer):
    """With near-one-hot posteriors the beam result is the greedy collapse."""
    V = tokenizer.vocab_size
    ids = [tokenizer._index["H"], tokenizer._index["H"], 0, tokenizer._index["E"], 0]
    log_probs = np.full((len(ids), V), -20.0, np.float32)
    for t, i in enumerate(ids):
        log_probs[t, i] = -0.01
    dec = BeamDecoder(tokenizer, beam_size=4)
    assert dec.decode(log_probs) == "HE"


def test_lm_rescoring_changes_ranking(tokenizer, tmp_path):
    """An LM strongly preferring 'AB' must flip a near-tie toward it."""
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=3\n\n\\1-grams:\n-0.05 AB\n-3.0 AC\n-3.0 <unk>\n\n\\end\\\n"
    )
    V = tokenizer.vocab_size
    a, b, c = tokenizer._index["A"], tokenizer._index["B"], tokenizer._index["C"]
    space = tokenizer._index["<space>"]
    # frame 1: A certain; frame 2: B vs C near-tie (C slightly better);
    # frame 3: space (word boundary -> LM fires)
    log_probs = np.full((3, V), -15.0, np.float32)
    log_probs[0, a] = -0.01
    log_probs[1, b] = -0.75
    log_probs[1, c] = -0.65
    log_probs[2, space] = -0.01
    no_lm = BeamDecoder(tokenizer, beam_size=8)
    assert no_lm.decode(log_probs) == "AC"
    with_lm = BeamDecoder(tokenizer, beam_size=8, lm_path=arpa, lm_weight=1.0, word_score=0.0)
    assert with_lm.decode(log_probs) == "AB"
