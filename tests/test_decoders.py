"""Decoder tests: greedy collapse, beam search vs exhaustive search,
ARPA LM parity with the committed phone bigram LM."""

import itertools
import math

import numpy as np
import pytest

from mdd_tpu.decode.arpa import ArpaBigramLM, UniformLM
from mdd_tpu.decode.beam import BeamSearchDecoder
from mdd_tpu.decode.greedy import collapse_ctc, greedy_decode


def test_greedy_collapse_semantics():
    assert collapse_ctc(np.asarray([0, 1, 1, 0, 1, 2, 2]), 7) == [1, 1, 2]
    assert collapse_ctc(np.asarray([1, 1, 1]), 3) == [1]
    assert collapse_ctc(np.asarray([0, 0]), 2) == []
    # length truncation
    assert collapse_ctc(np.asarray([1, 0, 2, 3]), 2) == [1]


def test_greedy_decode_batched():
    # (T=4, B=2, C=3)
    lp = np.full((4, 2, 3), -10.0, dtype=np.float32)
    # sample 0: ids 1,1,0,2 -> [1, 2]
    for t, c in enumerate([1, 1, 0, 2]):
        lp[t, 0, c] = 0.0
    # sample 1: ids 2,0,2,1 but length 3 -> [2, 2]
    for t, c in enumerate([2, 0, 2, 1]):
        lp[t, 1, c] = 0.0
    res = greedy_decode(lp, [4, 3])
    assert res == [[1, 2], [2, 2]]


def brute_force_best_label(probs, blank=0, lm=None, alpha=0.0, id2word=None):
    """Enumerate all label sequences up to length T and pick the best
    total (length-normalized) probability — ground truth for tiny inputs."""
    t, c = probs.shape
    log_probs = np.log(probs)
    scores = {}
    for path in itertools.product(range(c), repeat=t):
        collapsed = []
        prev = None
        for p in path:
            if p != prev:
                collapsed.append(p)
            prev = p
        label = tuple(p for p in collapsed if p != blank)
        lp = sum(log_probs[i, p] for i, p in enumerate(path))
        scores[label] = np.logaddexp(scores.get(label, -np.inf), lp)
    best, bestv = None, -np.inf
    for label, lp in scores.items():
        if lm is not None and alpha and label:
            words = [id2word[i] for i in label]
            lp = lp + alpha * (lm.score_sentence(words))
        norm = lp / (len(label) if label else 1)
        if norm > bestv:
            best, bestv = label, norm
    return list(best)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beam_matches_exhaustive_no_lm(seed):
    rng = np.random.default_rng(seed)
    t, c = 4, 3
    probs = rng.dirichlet(np.ones(c) * 1.2, size=t).astype(np.float64)
    # keep blank non-dominant so no frames are skipped
    probs[:, 0] = np.minimum(probs[:, 0], 0.6)
    probs /= probs.sum(1, keepdims=True)
    id2word = {0: "blank", 1: "a", 2: "b"}
    dec = BeamSearchDecoder(id2word, beam_width=64, blank=0)
    got = dec.decode_single(probs, t)
    want = brute_force_best_label(probs)
    assert got == want


def test_beam_blank_skip():
    # frames where p(blank) > 0.9 must be skipped entirely
    probs = np.asarray([
        [0.95, 0.03, 0.02],
        [0.05, 0.90, 0.05],
        [0.95, 0.02, 0.03],
        [0.10, 0.10, 0.80],
    ])
    dec = BeamSearchDecoder({0: "blank", 1: "a", 2: "b"}, beam_width=8)
    assert dec.decode_single(probs, 4) == [1, 2]


def test_arpa_lm_committed_file(reference_dir):
    path = reference_dir / "egs" / "attention_aug" / "data" / "lm_phone_bg.arpa"
    lm = ArpaBigramLM(str(path))
    assert len(lm.unigram) == 44 + 1  # 44 + UNK alias
    assert len(lm.bigram) == 1529
    # spot values from the file: "-0.74142 sil -3.12805"
    assert abs(lm.uni_prob("sil") - math.log(10) * -0.74142) < 1e-6
    # backoff path: an unseen bigram must equal backoff(w1) + uni(w2)
    some_unseen = None
    for w1 in ["sil", "sh", "iy"]:
        for w2 in ["zh", "oy", "th"]:
            if w1 + " " + w2 not in lm.bigram:
                some_unseen = (w1, w2)
                break
        if some_unseen:
            break
    if some_unseen:
        w1, w2 = some_unseen
        assert abs(lm.bi_prob(w1, w2)
                   - (lm.unigram[w1][1] + lm.unigram[w2][0])) < 1e-9
    # sentence scoring runs
    assert lm.score_sentence(["sil", "dh", "ah", "sil"]) < 0


def test_lm_dense_matrix(reference_dir):
    path = reference_dir / "egs" / "attention_aug" / "data" / "lm_phone_bg.arpa"
    lm = ArpaBigramLM(str(path))
    id2word = {0: "blank", 1: "UNK", 2: "sil", 3: "sh", 4: "iy"}
    mat = lm.dense_matrix(id2word)
    v = 5
    assert mat.shape == (v + 1, v + 1)
    assert abs(mat[2, 3] - lm.bi_prob("sil", "sh")) < 1e-6
    assert abs(mat[v, 2] - lm.bi_prob("", "sil")) < 1e-6       # <s> row
    assert abs(mat[2, v] - lm.bi_prob("sil", "")) < 1e-6       # </s> col


def test_beam_with_lm_matches_exhaustive(reference_dir):
    path = reference_dir / "egs" / "attention_aug" / "data" / "lm_phone_bg.arpa"
    lm = ArpaBigramLM(str(path))
    id2word = {0: "blank", 1: "sil", 2: "dh", 3: "ah"}
    rng = np.random.default_rng(7)
    t = 4
    probs = rng.dirichlet(np.ones(4), size=t)
    probs[:, 0] = np.minimum(probs[:, 0], 0.5)
    probs /= probs.sum(1, keepdims=True)
    dec = BeamSearchDecoder(id2word, beam_width=128, lm=lm, lm_alpha=0.3)
    got = dec.decode_single(probs, t)
    want = brute_force_best_label(probs, lm=lm, alpha=0.3, id2word=id2word)
    assert got == want
