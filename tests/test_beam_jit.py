"""Batched jit beam search must reproduce the host prefix beam search
(the semantic ground truth pinned to the reference algorithm) exactly."""

import numpy as np
import pytest

from mdd_tpu.data.vocab import Vocab
from mdd_tpu.decode.arpa import ArpaBigramLM
from mdd_tpu.decode.beam import BeamSearchDecoder
from mdd_tpu.decode.beam_jit import BatchedBeamDecoder
from mdd_tpu.decode.lm_train import BigramCounts, witten_bell_bigram, write_arpa


def _random_probs(rng, b, t, c, blank_boost=0.0):
    logits = rng.standard_normal((b, t, c)).astype(np.float32)
    logits[:, :, 0] += blank_boost
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


@pytest.fixture(scope="module")
def vocab():
    return Vocab(["sil", "aa", "bb", "cc", "dd"])


def _check_equiv(vocab, probs, lengths, beam_width, lm=None, lm_alpha=0.0):
    host = BeamSearchDecoder(vocab.index2word, beam_width=beam_width,
                             lm=lm, lm_alpha=lm_alpha)
    jit = BatchedBeamDecoder(vocab.index2word, beam_width=beam_width,
                             lm=lm, lm_alpha=lm_alpha)
    got = jit.decode(probs, lengths)
    want = host.decode(probs, lengths)
    assert got == want


def test_beam_jit_matches_host_no_lm(vocab):
    rng = np.random.default_rng(0)
    probs = _random_probs(rng, 8, 24, vocab.n_words)
    lengths = [24, 20, 24, 5, 24, 17, 24, 1]
    _check_equiv(vocab, probs, lengths, beam_width=4)


def test_beam_jit_matches_host_blank_heavy(vocab):
    """Blank-dominated frames exercise both the frame-skip and the
    repeat-vs-blank gate."""
    rng = np.random.default_rng(1)
    probs = _random_probs(rng, 6, 30, vocab.n_words, blank_boost=2.5)
    lengths = [30] * 6
    _check_equiv(vocab, probs, lengths, beam_width=4)


def test_beam_jit_matches_host_wide_beam(vocab):
    rng = np.random.default_rng(2)
    probs = _random_probs(rng, 4, 16, vocab.n_words)
    _check_equiv(vocab, probs, [16] * 4, beam_width=10)


def test_beam_jit_matches_host_with_lm(vocab, tmp_path):
    counts = BigramCounts()
    rng = np.random.default_rng(3)
    units = vocab.units()
    for _ in range(50):
        n = rng.integers(2, 8)
        counts.add_sentence([units[i] for i in
                             rng.integers(0, len(units), n)])
    uni, bi = witten_bell_bigram(counts)
    arpa = tmp_path / "lm.arpa"
    write_arpa(uni, bi, str(arpa))
    lm = ArpaBigramLM(str(arpa))

    probs = _random_probs(rng, 6, 20, vocab.n_words)
    _check_equiv(vocab, probs, [20] * 6, beam_width=5, lm=lm, lm_alpha=0.5)


def test_beam_jit_peaky_equals_greedy(vocab):
    from mdd_tpu.decode.greedy import greedy_decode

    rng = np.random.default_rng(4)
    t, c = 15, vocab.n_words
    ids = rng.integers(0, c, t)
    probs = np.full((t, c), 1e-5, np.float32)
    probs[np.arange(t), ids] = 1.0
    probs /= probs.sum(-1, keepdims=True)

    jit = BatchedBeamDecoder(vocab.index2word, beam_width=4)
    beam = jit.decode(probs[None], [t])[0]
    greedy = greedy_decode(np.log(probs)[:, None, :], np.asarray([t]))[0]
    assert beam == greedy


def test_beam_jit_statistical_agreement_at_scale():
    """At realistic scale (C=43, T=150, K=10) float32 accumulation can
    reorder near-tied beams versus the float64 host decoder; agreement
    must still be near-total (the divergent paths score within ~3e-4
    per-label log-prob of each other)."""
    from mdd_tpu.align.levenshtein import edit_distance

    vocab = Vocab([f"p{i}" for i in range(41)])
    rng = np.random.default_rng(0)
    B, T, C = 16, 150, vocab.n_words
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    logits[:, :, 0] += 1.5
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)

    host = BeamSearchDecoder(vocab.index2word, beam_width=10)
    jit = BatchedBeamDecoder(vocab.index2word, beam_width=10)
    a = jit.decode(probs, [T] * B)
    b = host.decode(probs, [T] * B)
    exact = sum(x == y for x, y in zip(a, b))
    errs = sum(edit_distance(x, y)[0] for x, y in zip(a, b))
    toks = sum(len(y) for y in b)
    assert exact >= B - 1
    assert errs / toks < 0.002


def test_beam_jit_empty_and_padded_frames(vocab):
    """length=0 gives an empty sequence; padding beyond length is inert."""
    rng = np.random.default_rng(5)
    probs = _random_probs(rng, 2, 12, vocab.n_words)
    jit = BatchedBeamDecoder(vocab.index2word, beam_width=4)
    out = jit.decode(probs, [0, 12])
    assert out[0] == []
    # same content, shorter padding -> same answer
    out2 = jit.decode(probs[1:2, :12], [12])
    assert out[1] == out2[0]
