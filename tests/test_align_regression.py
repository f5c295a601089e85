"""Regression tests pinning alignment/scoring to the reference artifacts.

The committed 900-utterance decode dumps of the reference
(egs/attention_aug/result/{hyp,human_seq,ref,per}) define exact targets:
scoring hyp against human_seq must reproduce
`%WER 15.21 [ 4423 / 29087, 597 ins, 852 del, 2974 sub ]` (result/per:1-3),
and the cnn-rnn-ctc dump must reproduce 27.28%.
"""

import pytest

from mdd_tpu.align.levenshtein import (
    align,
    backtrace_ops,
    edit_distance,
    kaldi_alignment,
    kaldi_edit_distance,
)
from mdd_tpu.evals.wer import corpus_wer, format_per_report, read_trn


def test_edit_distance_basic():
    dist, _ = edit_distance(list("kitten"), list("sitting"))
    assert dist == 3
    dist, _ = edit_distance([], list("abc"))
    assert dist == 3
    dist, _ = edit_distance(list("abc"), [])
    assert dist == 3
    dist, _ = edit_distance(list("abc"), list("abc"))
    assert dist == 0


def test_backtrace_tie_order():
    # hyp = [a, b], ref = [a, c, b]: one deletion (ref 'c' missing).
    dist, ops = align(["a", "b"], ["a", "c", "b"])
    assert dist == 1
    assert ops == ["-", "D", "-"]
    # hyp = [a, x, b], ref = [a, b]: one insertion (extra hyp 'x').
    dist, ops = align(["a", "x", "b"], ["a", "b"])
    assert dist == 1
    assert ops == ["-", "I", "-"]
    # substitution preferred over I+D on ties
    dist, ops = align(["a", "x"], ["a", "y"])
    assert dist == 1
    assert ops == ["-", "S"]


def test_ops_are_consistent_with_distance():
    import random

    rng = random.Random(0)
    alpha = list("abcde")
    for _ in range(200):
        s1 = [rng.choice(alpha) for _ in range(rng.randint(0, 12))]
        s2 = [rng.choice(alpha) for _ in range(rng.randint(0, 12))]
        dist, ops = align(s1, s2)
        assert sum(1 for o in ops if o != "-") == dist
        assert sum(1 for o in ops if o in ("-", "S", "I")) == len(s1)
        assert sum(1 for o in ops if o in ("-", "S", "D")) == len(s2)


def test_kaldi_edit_distance_matches_committed_per(attention_result_dir):
    hyp = read_trn(str(attention_result_dir / "hyp"))
    human = read_trn(str(attention_result_dir / "human_seq"))
    stats = corpus_wer(human, hyp)
    assert stats.tokens == 29087
    assert stats.errors == 4423
    assert stats.ins == 597
    assert stats.dele == 852
    assert stats.sub == 2974
    assert stats.sentences == 900
    assert stats.wrong_sentences == 881
    assert abs(stats.wer - 15.21) < 0.005
    report = format_per_report(stats)
    assert report.splitlines()[0] == \
        "%WER 15.21 [ 4423 / 29087, 597 ins, 852 del, 2974 sub ]"
    assert report.splitlines()[1] == "%SER 97.89 [ 881 / 900 ]"


def test_kaldi_edit_distance_matches_committed_per_baseline(reference_dir):
    d = reference_dir / "egs" / "cnn-rnn-ctc" / "result"
    if not (d / "hyp").exists():
        pytest.skip("cnn-rnn-ctc dumps missing")
    hyp = read_trn(str(d / "hyp"))
    human = read_trn(str(d / "human_seq"))
    stats = corpus_wer(human, hyp)
    assert stats.errors == 7934
    assert stats.ins == 811
    assert stats.dele == 1708
    assert stats.sub == 5415
    assert abs(stats.wer - 27.28) < 0.005


def test_kaldi_alignment_roundtrip():
    pairs = kaldi_alignment(["a", "b", "c"], ["a", "c"])
    assert [p for p in pairs if p[0] != "<eps>"] and len(pairs) == 3
    ref_side = [r for r, h in pairs if r != "<eps>"]
    hyp_side = [h for r, h in pairs if h != "<eps>"]
    assert ref_side == ["a", "b", "c"]
    assert hyp_side == ["a", "c"]
    ins, dele, sub, tot = kaldi_edit_distance(["a", "b", "c"], ["a", "c"])
    assert (ins, dele, sub, tot) == (0, 1, 0, 1)
