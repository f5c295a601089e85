"""Bigram LM trainer tests: normalization, ARPA round-trip through our
loader, scoring sanity against the committed reference LM."""

import math

import numpy as np
import pytest

from mdd_tpu.decode.arpa import ArpaBigramLM
from mdd_tpu.decode.lm_train import (
    BigramCounts,
    train_phone_lm,
    witten_bell_bigram,
    write_arpa,
)


def _toy_counts():
    c = BigramCounts()
    c.add_corpus([
        "a b c".split(), "a b".split(), "b c a".split(), "a c".split(),
    ])
    return c


def test_bigram_model_normalizes():
    """Sum over P(w2|w1) must be 1 for every history (seen via bigrams,
    unseen via backoff*unigram)."""
    counts = _toy_counts()
    unigrams, bigrams = witten_bell_bigram(counts)
    vocab = [w for w in unigrams if w != "<s>"]
    p_uni = {w: 10 ** unigrams[w][0] for w in vocab}
    for w1 in unigrams:
        if w1 == "</s>":
            continue
        bow = 10 ** unigrams[w1][1]
        total = 0.0
        for w2 in vocab:
            if (w1, w2) in bigrams:
                total += 10 ** bigrams[(w1, w2)]
            else:
                total += bow * p_uni[w2]
        assert total == pytest.approx(1.0, abs=1e-6), w1


def test_arpa_roundtrip(tmp_path):
    counts = _toy_counts()
    unigrams, bigrams = witten_bell_bigram(counts)
    path = tmp_path / "lm.arpa"
    write_arpa(unigrams, bigrams, str(path))

    lm = ArpaBigramLM(str(path))
    assert set(lm.unigram) >= {"a", "b", "c", "<s>", "</s>"}
    # seen bigram: natural-log prob matches the table
    assert lm.bi_prob("a", "b") == pytest.approx(
        bigrams[("a", "b")] * math.log(10), abs=1e-5)
    # unseen bigram backs off
    backed = lm.bi_prob("c", "c")
    assert backed == pytest.approx(
        (unigrams["c"][1] + unigrams["c"][0]) * math.log(10), abs=1e-5)


def test_train_phone_lm_from_file(tmp_path):
    phn = tmp_path / "phn_text"
    phn.write_text("u1 sil aa bb sil\nu2 aa bb cc\nu3 bb cc aa\n")
    out = tmp_path / "lm.arpa"
    n = train_phone_lm(str(phn), str(out))
    assert n == 3
    lm = ArpaBigramLM(str(out))
    # a full sentence scores finite
    s = lm.score_sentence(["sil", "aa", "bb"])
    assert np.isfinite(s) and s < 0


def test_scoring_close_to_committed_reference_lm(reference_dir, tmp_path):
    """Train on sentences drawn from the committed human_seq dump and
    compare scores against the committed IRSTLM ARPA: same smoothing
    family (Witten-Bell), so per-token scores should land close."""
    committed = (reference_dir / "egs" / "attention_aug" / "data"
                 / "lm_phone_bg.arpa")
    human = reference_dir / "egs" / "attention_aug" / "result" / "human_seq"
    if not committed.exists() or not human.exists():
        pytest.skip("reference artifacts missing")

    phn = tmp_path / "phn_text"
    phn.write_text(human.read_text())
    out = tmp_path / "lm.arpa"
    train_phone_lm(str(phn), str(out))

    ours = ArpaBigramLM(str(out))
    theirs = ArpaBigramLM(str(committed))
    sents = [l.split()[1:] for l in
             human.read_text().splitlines()[:50] if len(l.split()) > 3]
    ours_scores = np.array([ours.score_sentence(s) / len(s) for s in sents])
    theirs_scores = np.array([theirs.score_sentence(s) / len(s)
                              for s in sents])
    # different training data (test-set dump vs the reference's train
    # set) but same domain: correlation should be strong and the
    # per-token log-prob scale comparable
    corr = np.corrcoef(ours_scores, theirs_scores)[0, 1]
    assert corr > 0.7
    assert abs(ours_scores.mean() - theirs_scores.mean()) < 1.0
