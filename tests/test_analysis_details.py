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
