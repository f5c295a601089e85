"""mdd_result driver and per-utterance detail emission tests."""

import pytest

from mdd_tpu.evals.analysis import mdd_result, write_per_utt_details
from mdd_tpu.evals.wer import read_trn


def test_write_per_utt_details_format(tmp_path):
    ref = {"u1": ["a", "b", "c"]}
    hyp = {"u1": ["a", "x", "b", "c"]}
    path = tmp_path / "detail"
    write_per_utt_details(ref, hyp, str(path))
    lines = path.read_text().splitlines()
    assert lines[0].startswith("u1 ref")
    assert "<eps>" in lines[0]           # insertion shows as ref <eps>
    assert lines[1].startswith("u1 hyp")
    assert lines[2].startswith("u1 op")
    assert "I" in lines[2]
    assert lines[3] == "u1 #csid 3 0 1 0"


def test_mdd_result_pipeline_on_committed_dumps(attention_result_dir,
                                                tmp_path):
    ref = read_trn(str(attention_result_dir / "ref"))
    human = read_trn(str(attention_result_dir / "human_seq"))
    hyp = read_trn(str(attention_result_dir / "hyp"))
    logs = []
    m = mdd_result(ref, human, hyp, out_dir=str(tmp_path),
                   log=logs.append)
    # compute-wer parity line present
    assert any("%WER 15.21 [ 4423 / 29087" in l for l in logs)
    # hierarchical pins (regenerated targets; see BASELINE.md)
    assert m.cor == 25728 and m.sub == 3126
    assert m.f1 == pytest.approx(0.5594, abs=2e-4)
    for name in ("ref_human_detail", "human_our_detail", "ref_our_detail"):
        assert (tmp_path / name).stat().st_size > 100000


def test_wer_ops_details_example():
    """The wer_ops_details.pl documentation example
    (result/utils/scoring/wer_ops_details.pl:165-176)."""
    from mdd_tpu.evals.analysis import wer_ops_details

    ref = {"UTT-A": ["word-A", "word-B", "word-C", "word-D", "word-E"]}
    hyp = {"UTT-A": ["word-A", "word-A", "word-B", "word-D", "word-X"]}
    counts, text = wer_ops_details(ref, hyp)
    assert counts[("word-A", "word-A")] == 1
    assert counts[("word-B", "word-B")] == 1
    assert counts[("word-D", "word-D")] == 1
    assert counts[("word-C", "<eps>")] == 1
    assert counts[("<eps>", "word-A")] == 1
    assert counts[("word-E", "word-X")] == 1
    lines = text.splitlines()
    # sorted by (ref, hyp); label column is 14 chars, tokens right-just 6
    assert lines[0] == "insertion      <eps>    word-A    1"
    assert "deletion      word-C     <eps>    1" in lines
    assert "substitution  word-E    word-X    1" in lines


def test_wer_ops_details_committed_dumps(attention_result_dir):
    """Aggregate op totals over the committed 900-utt dumps.

    wer_ops_details.pl consumes align-text alignments, whose optimal-path
    tie-breaking decomposes the same total distance slightly differently
    from compute-wer (the committed result/per says 597/852/2974; the
    align-text path gives 596/851/2976 — one ins+del traded for sub +1,
    total errors identical at 4423/29087 = %WER 15.21)."""
    from mdd_tpu.evals.analysis import wer_ops_details

    human = read_trn(str(attention_result_dir / "human_seq"))
    hyp = read_trn(str(attention_result_dir / "hyp"))
    counts, text = wer_ops_details(human, hyp)
    ins = sum(c for (r, h), c in counts.items() if r == "<eps>")
    dele = sum(c for (r, h), c in counts.items() if h == "<eps>")
    sub = sum(c for (r, h), c in counts.items()
              if r != h and r != "<eps>" and h != "<eps>")
    cor = sum(c for (r, h), c in counts.items() if r == h)
    assert (ins, dele, sub) == (596, 851, 2976)
    assert ins + dele + sub == 4423          # == committed %WER 15.21
    assert cor + dele + sub == 29087
    # every line is one of the four ops with aligned columns
    for line in text.splitlines():
        assert line.split()[0] in ("correct", "insertion", "deletion",
                                   "substitution")


def test_mdd_result_emits_ops_files(attention_result_dir, tmp_path):
    ref = read_trn(str(attention_result_dir / "ref"))
    human = read_trn(str(attention_result_dir / "human_seq"))
    hyp = read_trn(str(attention_result_dir / "hyp"))
    sub = {u: ref[u] for u in list(ref)[:20]}
    mdd_result(sub, {u: human[u] for u in sub}, {u: hyp[u] for u in sub},
               out_dir=str(tmp_path), log=lambda *_: None)
    for name in ("ref_human_ops", "human_our_ops", "ref_our_ops"):
        assert (tmp_path / name).exists()
        assert (tmp_path / name).read_text().strip()
