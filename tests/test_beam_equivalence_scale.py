"""Host-vs-jit beam search equivalence at PRODUCTION scale.

C=43 (the committed `units` vocabulary), T=220, K=10, with the committed
bigram phone LM (data/lm_phone_bg.arpa) fused at lm_alpha>0 — the exact
operating point of the reference decoder (utils/BeamSearch.py:35-153,
conf/ctc_config.yaml beam_width 10).

Equivalence criterion.  Beam search over dense near-uniform posteriors is
chaotic: float32 (jit) vs float64 (host) accumulation reorders near-tied
beams at pruning boundaries, and a dropped lineage's final score is not
bounded by the tie gap — so bitwise equality is unattainable on
worst-case inputs BY ANY implementation pair that differs in summation
precision, in either direction.  The pinned invariants, grounded in the
1000-matrix sweep (tools/beam_equivalence_sweep.py, results in
VALIDATION.md: 99.6% exact, token disagreement 1.8e-4, divergences split
2 jit-better / 2 host-better):

  * exact-match rate high (>= 90% even on worst-case random inputs;
    realistic blank-heavy posteriors decode identically);
  * every divergence is sane — both sequences score within GAP_LIMIT
    under an *unpruned float64 constrained-forward scorer* (the exact
    posterior of a fixed label sequence under the same frame-skip /
    repeat-gate / LM semantics), i.e. the gap is pruning noise, not a
    semantic bug;
  * aggregate token disagreement < 0.5%.
"""

import math
import os

import numpy as np
import pytest

from mdd_tpu.data.vocab import Vocab
from mdd_tpu.decode.arpa import ArpaBigramLM
from mdd_tpu.decode.beam import BeamSearchDecoder
from mdd_tpu.decode.beam_jit import BatchedBeamDecoder

T = 220
K = 10
LM_ALPHA = 0.5
SCORE_TOL = 2e-3          # per-label normalized log-prob (exact ties)
GAP_LIMIT = 0.5           # max sane pruning-noise gap (observed max 0.31)
MAX_DIVERGENCE_RATE = 0.10
MAX_TOKEN_ERR_RATE = 0.005
N_RANDOM = int(os.environ.get("MDD_EQUIV_N", "48"))


@pytest.fixture(scope="module")
def vocab(reference_dir):
    return Vocab.from_units_file(
        str(reference_dir / "egs" / "attention_aug" / "data" / "units"))


@pytest.fixture(scope="module")
def lm(reference_dir):
    return ArpaBigramLM(
        str(reference_dir / "egs" / "attention_aug" / "data"
            / "lm_phone_bg.arpa"))


def constrained_score(probs, length, seq, id2word, lm, lm_alpha,
                      blank=0, blank_skip_threshold=0.1):
    """Unpruned float64 log P(seq) / len under the beam-search semantics.

    States i = 0..L track the prefix seq[:i] with blank/non-blank split;
    frames with 1 - p(blank) < threshold are skipped; repeats extend from
    the blank path unless p_{t-1}(blank) >= 0.9; LM terms are added on
    extension and at EOS, exactly as in decode.beam.BeamSearchDecoder.
    """
    LOG_ZERO = -1e30
    lp = np.log(np.maximum(probs.astype(np.float64), 1e-38))
    L = len(seq)
    pb = np.full(L + 1, LOG_ZERO)
    pnb = np.full(L + 1, LOG_ZERO)
    pb[0] = 0.0

    def ladd(x, y):
        if x <= LOG_ZERO:
            return y
        if y <= LOG_ZERO:
            return x
        m = max(x, y)
        return m + math.log1p(math.exp(min(x, y) - m))

    lm_terms = []
    for i, k in enumerate(seq):
        w1 = id2word[seq[i - 1]] if i else ""
        lm_terms.append(lm.bi_prob(w1, id2word[k]) * lm_alpha
                        if lm_alpha else 0.0)

    for t in range(length):
        if (1.0 - float(probs[t, blank])) < blank_skip_threshold:
            continue
        prev_blank_dominant = t > 0 and float(probs[t - 1, blank]) >= 0.9
        new_pb = np.full(L + 1, LOG_ZERO)
        new_pnb = np.full(L + 1, LOG_ZERO)
        for i in range(L + 1):
            pt = ladd(pb[i], pnb[i])
            if pt > LOG_ZERO:
                new_pb[i] = pt + lp[t, blank]
            if i >= 1 and pnb[i] > LOG_ZERO:
                new_pnb[i] = pnb[i] + lp[t, seq[i - 1]]
            if i >= 1:
                k = seq[i - 1]
                repeat = i >= 2 and seq[i - 2] == k
                base = (pb[i - 1] if (repeat and not prev_blank_dominant)
                        else ladd(pb[i - 1], pnb[i - 1]))
                if base > LOG_ZERO:
                    new_pnb[i] = ladd(new_pnb[i],
                                      base + lp[t, k] + lm_terms[i - 1])
        pb, pnb = new_pb, new_pnb

    total = ladd(pb[L], pnb[L])
    if L and lm_alpha:
        total += lm.bi_prob(id2word[seq[-1]], "") * lm_alpha
    return total / max(L, 1)


def _softmax(logits):
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _sweep(vocab, lm, probs_list, lm_alpha=LM_ALPHA):
    """Run both decoders over a list of (T, C) matrices; return
    (n_exact, divergences) where each divergence carries both scores."""
    host = BeamSearchDecoder(vocab.index2word, beam_width=K, lm=lm,
                             lm_alpha=lm_alpha)
    jit = BatchedBeamDecoder(vocab.index2word, beam_width=K, lm=lm,
                             lm_alpha=lm_alpha)
    probs = np.stack(probs_list)
    lengths = [T] * len(probs_list)
    got = jit.decode(probs, lengths)
    want = host.decode(probs, lengths)
    n_exact, divergences = 0, []
    for i, (a, b) in enumerate(zip(got, want)):
        if a == b:
            n_exact += 1
            continue
        sa = constrained_score(probs[i], T, a, vocab.index2word, lm,
                               lm_alpha)
        sb = constrained_score(probs[i], T, b, vocab.index2word, lm,
                               lm_alpha)
        divergences.append((i, sa, sb, a, b))
    return n_exact, divergences


def _assert_quality(n_total, n_exact, divergences, gap_limit=GAP_LIMIT):
    from mdd_tpu.align.levenshtein import edit_distance

    for i, sa, sb, a, b in divergences:
        assert abs(sa - sb) < gap_limit, (
            f"case {i}: catastrophic divergence jit={sa:.6f} "
            f"host={sb:.6f} (diff {abs(sa - sb):.2e})\n jit ={a}\n host={b}")
    assert len(divergences) <= max(1, int(MAX_DIVERGENCE_RATE * n_total)), (
        f"{len(divergences)}/{n_total} divergences — rate exceeds "
        f"{MAX_DIVERGENCE_RATE:.0%}")
    errs = sum(edit_distance(a, b)[0] for _, _, _, a, b in divergences)
    toks = n_total * 100  # sequences run ~100-120 labels at T=220
    assert errs / toks < MAX_TOKEN_ERR_RATE


def test_beam_equivalence_production_scale_random(vocab, lm):
    rng = np.random.default_rng(2024)
    mats = [_softmax(rng.standard_normal((T, vocab.n_words))
                     .astype(np.float32) * 1.5)
            for _ in range(N_RANDOM)]
    n_exact, div = _sweep(vocab, lm, mats)
    _assert_quality(N_RANDOM, n_exact, div)


def test_beam_equivalence_blank_heavy(vocab, lm):
    """Blank-dominated frames exercise the frame-skip (1-p_b < 0.1) and
    the repeat-vs-blank 0.9 gate at realistic sparsity: real CTC output
    is ~80-90% blank frames."""
    rng = np.random.default_rng(7)
    mats = []
    for j in range(16):
        logits = rng.standard_normal((T, vocab.n_words)).astype(np.float32)
        logits[:, 0] += rng.uniform(2.0, 5.0)     # mostly-blank
        # a few decisive emission frames
        hot = rng.integers(0, T, 25)
        logits[hot, 0] -= 6.0
        mats.append(_softmax(logits * 1.5))
    n_exact, div = _sweep(vocab, lm, mats)
    # realistic posteriors: expect identity (allow one tie divergence)
    assert n_exact >= len(mats) - 1
    _assert_quality(len(mats), n_exact, div, gap_limit=SCORE_TOL)


def test_beam_equivalence_exact_ties(vocab, lm):
    """Adversarial exact ties: two phone columns made bit-identical, so
    mirror-image prefixes carry exactly equal probability.  Order of the
    returned sequence may legitimately differ between tie-break rules;
    the scores must be equal (that's what the tie adjudicator checks)."""
    rng = np.random.default_rng(11)
    mats = []
    for j in range(8):
        logits = rng.standard_normal((T, vocab.n_words)).astype(np.float32)
        logits[:, 3] = logits[:, 4]               # identical columns
        logits[:, 0] += 1.0
        mats.append(_softmax(logits))
    # lm_alpha=0: the LM would break column symmetry
    n_exact, div = _sweep(vocab, lm, mats, lm_alpha=0.0)
    for i, sa, sb, a, b in div:
        assert abs(sa - sb) < SCORE_TOL
    # ties are *expected* here — no divergence-rate cap


def test_constrained_scorer_matches_host_winner(vocab, lm):
    """The adjudicator itself is validated: on an unambiguous matrix the
    host winner's constrained score must beat every other beam-K
    candidate's (sanity that the scorer ranks like the decoder)."""
    rng = np.random.default_rng(3)
    probs = _softmax(rng.standard_normal((T, vocab.n_words))
                     .astype(np.float32) * 2.0)
    host = BeamSearchDecoder(vocab.index2word, beam_width=K, lm=lm,
                             lm_alpha=LM_ALPHA)
    win = host.decode_single(probs, T)
    s_win = constrained_score(probs, T, win, vocab.index2word, lm, LM_ALPHA)
    # perturbations of the winner must not out-score it materially
    for drop in range(min(3, len(win))):
        alt = win[:drop] + win[drop + 1:]
        s_alt = constrained_score(probs, T, alt, vocab.index2word, lm,
                                  LM_ALPHA)
        assert s_alt <= s_win + SCORE_TOL
