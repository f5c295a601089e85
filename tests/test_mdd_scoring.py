"""Tests for MDD slot accounting, product diagnosis, and the hierarchical
three-way analysis, pinned to reference semantics and artifacts."""

import pytest

from mdd_tpu.align.levenshtein import align
from mdd_tpu.align.mdd import (
    MddCounts,
    align_canonical_decoded,
    alignment_to_slots,
    fault_statistics,
    mdd_accumulate,
    word_score,
)
from mdd_tpu.evals.analysis import hierarchical_mdd_analysis
from mdd_tpu.evals.wer import read_trn


def slots(hyp, canonical):
    _, ops = align(hyp, canonical)
    return alignment_to_slots(hyp, canonical, ops)


def test_alignment_to_slots_basic():
    # canonical a b c; human said a x c => slot 1 is a substitution.
    d = slots(["a", "x", "c"], ["a", "b", "c"])
    assert d[0] == "-" and d[1] == "Sx" and d[2] == "-" and d["I"] == []
    # deletion: human dropped b.
    d = slots(["a", "c"], ["a", "b", "c"])
    assert d[1] == "D"
    # insertion between slots 0 and 1.
    d = slots(["a", "x", "b"], ["a", "b"])
    assert d["I"] == ["01"]


def test_mdd_accounting_cases():
    canonical = ["a", "b", "c"]
    # human matched canonical everywhere; decoder substituted slot 1 -> FR.
    d1 = slots(["a", "b", "c"], canonical)
    d2 = slots(["a", "x", "c"], canonical)
    c = MddCounts()
    mdd_accumulate(d1, d2, c)
    assert (c.true_accept, c.false_rejection, c.false_accept) == (2, 1, 0)

    # human mispronounced slot 1 (said x); decoder heard x -> TR correct.
    d1 = slots(["a", "x", "c"], canonical)
    d2 = slots(["a", "x", "c"], canonical)
    c = MddCounts()
    mdd_accumulate(d1, d2, c)
    assert c.tr_correct_diag == 1 and c.true_accept == 2

    # human mispronounced slot 1 (said x); decoder heard y -> TR wrong diag.
    d1 = slots(["a", "x", "c"], canonical)
    d2 = slots(["a", "y", "c"], canonical)
    c = MddCounts()
    mdd_accumulate(d1, d2, c)
    assert c.tr_wrong_diag == 1

    # human mispronounced slot 1 but decoder heard canonical -> FA.
    d1 = slots(["a", "x", "c"], canonical)
    d2 = slots(["a", "b", "c"], canonical)
    c = MddCounts()
    mdd_accumulate(d1, d2, c)
    assert c.false_accept == 1

    # insertion agreement -> TR correct via the 'I' list path.
    d1 = slots(["a", "q", "b"], ["a", "b"])
    d2 = slots(["a", "q", "b"], ["a", "b"])
    c = MddCounts()
    mdd_accumulate(d1, d2, c)
    assert c.tr_correct_diag == 1 and c.false_accept == 0 and c.false_rejection == 0


def test_align_canonical_decoded_placeholders():
    decoded = ["a", "x", "c"]
    canonical = ["a", "b", "c"]
    _, ops = align(decoded, canonical)
    d, c, l = align_canonical_decoded(decoded, canonical, ops)
    assert len(d) == len(c) == len(l)
    ins, sub, dele = fault_statistics(l, c, d)
    assert sub == ["b"] and ins == [] and dele == []

    # deletion placeholder
    decoded = ["a", "c"]
    _, ops = align(decoded, canonical)
    d, c, l = align_canonical_decoded(decoded, canonical, ops)
    assert "D" in d and len(d) == len(c) == len(l)
    ins, sub, dele = fault_statistics(l, c, d)
    assert dele == ["b"]


def test_align_canonical_decoded_leading_insertion_trim():
    # Decoder emitted junk before the word: leading insertions are trimmed
    # down to one (infer.py:187-201 semantics).
    canonical = ["k", "ae", "t"]
    decoded = ["s", "s", "k", "ae", "t"]
    _, ops = align(decoded, canonical)
    d, c, l = align_canonical_decoded(decoded, canonical, ops)
    assert l.count("I") == 1
    assert len(d) == len(c) == len(l)


def test_word_score_formula():
    # perfect -> 100
    score, correct, total = word_score(["-", "-", "-"], 0)
    assert (score, correct, total) == (100, 3, 3)
    # one sub of three, no insertions: ceil((1 - 1/3)*100) = 67
    score, _, _ = word_score(["-", "S", "-"], 0)
    assert score == 67
    # insertion penalty capped at 10% of slot count
    score_capped, _, _ = word_score(["-", "-", "-"], 40)
    assert score_capped == 90


def test_hierarchical_analysis_on_committed_dumps(attention_result_dir):
    ref = read_trn(str(attention_result_dir / "ref"))
    human = read_trn(str(attention_result_dir / "human_seq"))
    ours = read_trn(str(attention_result_dir / "hyp"))
    m = hierarchical_mdd_analysis(ref, human, ours)
    # The learner-error statistics depend only on ref vs human_seq: fixed.
    assert m.cor + m.sub + m.delete == sum(len(v) for v in ref.values())
    # Frozen operating point of the reference best model measured with our
    # scorer (BASELINE.md: "no F1 value committed — regenerate from dumps").
    assert round(m.recall, 4) == 0.5540
    assert round(m.precision, 4) == 0.5650
    assert round(m.f1, 4) == 0.5594
    assert (m.cor_cor, m.cor_nocor) == (23898, 1830)
    assert (m.correct_diag, m.error_diag, m.fn) == (1843, 534, 1914)


def test_mdd_corpus_totals_on_committed_dumps(attention_result_dir):
    """End-to-end slot accounting over the committed 900-utt dumps.

    This is the test_ctc_nosil.py:218-298 pipeline (strip-sil already
    applied in the dumps).  Freezes the corpus-level TA/FR/FA/TR counts so
    scorer changes cannot silently drift.
    """
    ref = read_trn(str(attention_result_dir / "ref"))
    human = read_trn(str(attention_result_dir / "human_seq"))
    ours = read_trn(str(attention_result_dir / "hyp"))
    counts = MddCounts()
    for utt in human:
        _, lc = align(human[utt], ref[utt])
        _, dc = align(ours[utt], ref[utt])
        d1 = alignment_to_slots(human[utt], ref[utt], lc)
        d2 = alignment_to_slots(ours[utt], ref[utt], dc)
        mdd_accumulate(d1, d2, counts)
    assert counts.total_canonical_phones == sum(len(v) for v in ref.values())
    # Frozen slot-accounting operating point (test_ctc_nosil semantics) of
    # the reference best model, measured with our scorer.
    assert counts.true_accept == 23887
    assert counts.false_rejection == 2062
    assert counts.false_accept == 2083
    assert (counts.tr_correct_diag, counts.tr_wrong_diag) == (1712, 496)
    assert round(counts.f1, 4) == 0.5158


def test_forgiveness_pairs_merge_levels():
    from mdd_tpu.align.mdd import forgiveness_pairs

    p0 = forgiveness_pairs(0)
    assert p0 == {"ah": ["ae"]}
    p1 = forgiveness_pairs(1)
    # level-0 and level-1 entries merge ('ah' collects all three)
    assert p1["ah"] == ["ae", "ao", "ow"]
    assert p1["er"] == ["ah", "aa"]
    assert "z" not in p1
    p2 = forgiveness_pairs(2)
    assert p2["z"] == ["s"]


def test_apply_forgiveness_rewrites_confusable_subs():
    from mdd_tpu.align.mdd import apply_forgiveness

    #          forgiven   kept       forgiven(l2 only)
    decoded = ["eh",      "k",       "s",  "D"]
    canonical = ["ae",    "t",       "z",  "m"]
    ops = ["S", "S", "S", "D"]
    dec, can, op = apply_forgiveness(decoded, canonical, ops, level=1)
    assert op == ["-", "S", "S", "D"]
    assert dec == ["ae", "k", "s", "D"]       # rewritten to canonical
    assert can == canonical
    dec2, _, op2 = apply_forgiveness(decoded, canonical, ops, level=2)
    assert op2 == ["-", "S", "-", "D"]
    assert dec2 == ["ae", "k", "z", "D"]


def test_apply_forgiveness_improves_word_score():
    from mdd_tpu.align.mdd import apply_forgiveness, word_score

    decoded = ["ih", "n", "s"]
    canonical = ["iy", "n", "s"]
    ops = ["S", "-", "-"]
    strict_score, _, _ = word_score(ops, 0)
    dec, can, op = apply_forgiveness(decoded, canonical, ops, level=1)
    forgiving_score, _, _ = word_score(op, 0)
    assert forgiving_score > strict_score
    assert forgiving_score == 100
