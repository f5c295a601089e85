"""Corpus-prep tests: TextGrid parser, L2-ARCTIC prep, TIMIT prep,
merge, units — against synthetic fixtures that exercise the reference
semantics (l2arctic_prep.py / timit_data_prep.sh / get_model_units.py)."""

import os
import textwrap

import pytest

from mdd_tpu.data.prepare import (
    build_units,
    merge_data_dirs,
    prepare_l2arctic,
    prepare_timit,
    split_timit_speakers,
)
from mdd_tpu.data.textgrid import TextGrid

LONG_TG = textwrap.dedent('''\
    File type = "ooTextFile"
    Object class = "TextGrid"

    xmin = 0
    xmax = 1.0
    tiers? <exists>
    size = 2
    item []:
        item [1]:
            class = "IntervalTier"
            name = "words"
            xmin = 0
            xmax = 1.0
            intervals: size = 1
            intervals [1]:
                xmin = 0
                xmax = 1.0
                text = "hello"
        item [2]:
            class = "IntervalTier"
            name = "phones"
            xmin = 0
            xmax = 1.0
            intervals: size = 4
            intervals [1]:
                xmin = 0
                xmax = 0.2
                text = ""
            intervals [2]:
                xmin = 0.2
                xmax = 0.5
                text = "HH"
            intervals [3]:
                xmin = 0.5
                xmax = 0.8
                text = "AH0,AA,s"
            intervals [4]:
                xmin = 0.8
                xmax = 1.0
                text = "L OW1"
''')

SHORT_TG = textwrap.dedent('''\
    File type = "ooTextFile"
    Object class = "TextGrid"

    0
    1.0
    <exists>
    1
    "IntervalTier"
    "phones"
    0
    1.0
    2
    0
    0.5
    "HH"
    0.5
    1.0
    "OW1"
''')


def test_textgrid_long_format():
    tg = TextGrid.parse(LONG_TG)
    assert len(tg) == 2
    assert tg[0].name == "words"
    assert tg[1].name == "phones"
    assert len(tg[1]) == 4
    assert tg[1][0].mark == ""
    assert tg[1][2].mark == "AH0,AA,s"
    assert tg[1][3].minTime == pytest.approx(0.8)
    assert tg.get_tier_by_name("phones") is tg.tiers[1]


def test_textgrid_short_format():
    tg = TextGrid.parse(SHORT_TG)
    assert len(tg) == 1
    assert [iv.mark for iv in tg[0]] == ["HH", "OW1"]
    assert tg[0][1].maxTime == pytest.approx(1.0)


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text)


def _make_l2_fixture(root, spk="NJS", utt="arctic_a0001"):
    """Annotated: sil hh [AA for AH0] l+ow -> actual `sil hh aa low...`."""
    ann = textwrap.dedent('''\
        File type = "ooTextFile"
        Object class = "TextGrid"

        xmin = 0
        xmax = 1.0
        tiers? <exists>
        size = 2
        item []:
            item [1]:
                class = "IntervalTier"
                name = "words"
                xmin = 0
                xmax = 1.0
                intervals: size = 1
                intervals [1]:
                    xmin = 0
                    xmax = 1.0
                    text = "hello"
            item [2]:
                class = "IntervalTier"
                name = "phones"
                xmin = 0
                xmax = 1.0
                intervals: size = 5
                intervals [1]:
                    xmin = 0
                    xmax = 0.2
                    text = ""
                intervals [2]:
                    xmin = 0.2
                    xmax = 0.3
                    text = "sp"
                intervals [3]:
                    xmin = 0.3
                    xmax = 0.5
                    text = "HH1"
                intervals [4]:
                    xmin = 0.5
                    xmax = 0.8
                    text = "AH0,AA2*,s"
                intervals [5]:
                    xmin = 0.8
                    xmax = 1.0
                    text = "ER0"
    ''')
    can = textwrap.dedent('''\
        File type = "ooTextFile"
        Object class = "TextGrid"

        xmin = 0
        xmax = 1.0
        tiers? <exists>
        size = 2
        item []:
            item [1]:
                class = "IntervalTier"
                name = "words"
                xmin = 0
                xmax = 1.0
                intervals: size = 1
                intervals [1]:
                    xmin = 0
                    xmax = 1.0
                    text = "hello"
            item [2]:
                class = "IntervalTier"
                name = "phones"
                xmin = 0
                xmax = 1.0
                intervals: size = 4
                intervals [1]:
                    xmin = 0
                    xmax = 0.2
                    text = ""
                intervals [2]:
                    xmin = 0.2
                    xmax = 0.5
                    text = "HH1"
                intervals [3]:
                    xmin = 0.5
                    xmax = 0.8
                    text = "AH0"
                intervals [4]:
                    xmin = 0.8
                    xmax = 1.0
                    text = "ER0"
    ''')
    _write(root / spk / "annotation" / f"{utt}.TextGrid", ann)
    _write(root / spk / "arpa_textgrid" / f"{utt}.TextGrid", can)
    _write(root / spk / "transcript" / f"{utt}.txt", "Hello\n")
    _write(root / spk / "wav" / f"{utt}.wav", "")


def test_prepare_l2arctic(tmp_path):
    root = tmp_path / "l2"
    _make_l2_fixture(root)
    out = tmp_path / "l2_test"
    n = prepare_l2arctic(str(root), str(out), "test")
    assert n == 1
    phn = (out / "phn_text").read_text().strip()
    # "" -> sil, "sp" -> sil (collapsed), HH1 -> hh, actual AA2* -> aa,
    # ER0 -> er0
    assert phn == "NJS_arctic_a0001 sil hh aa er0"
    can = (out / "transcript_phn_text").read_text().strip()
    assert can == "NJS_arctic_a0001 sil hh ah0 er0"
    a_can = (out / "a_transcript_phn_text").read_text().strip()
    assert a_can == "NJS_arctic_a0001 sil hh ah0 er0"
    wrd = (out / "wrd_text").read_text().strip()
    assert wrd == "NJS_arctic_a0001 hello"


def test_prepare_l2arctic_speaker_filter_and_folding(tmp_path):
    root = tmp_path / "l2"
    _make_l2_fixture(root, spk="NJS")
    _make_l2_fixture(root, spk="ABA")  # train speaker — excluded from test
    out = tmp_path / "out"
    n = prepare_l2arctic(str(root), str(out), "test", keep_reduced=False)
    assert n == 1
    phn = (out / "phn_text").read_text().strip()
    assert phn == "NJS_arctic_a0001 sil hh aa er"  # er0 folded


def _make_timit_fixture(root):
    spk_dir = root / "TRAIN" / "DR1" / "FAKS0"
    _write(spk_dir / "SI1234.PHN",
           "0 100 h#\n100 200 sh\n200 300 ix\n300 400 q\n400 500 h#\n")
    _write(spk_dir / "SI1234.WRD", "100 300 she\n")
    _write(spk_dir / "SI1234.WAV.wav", "")
    # SA sentence must be skipped
    _write(spk_dir / "SA1.PHN", "0 100 h#\n")
    _write(spk_dir / "SA1.WAV.wav", "")


def test_prepare_timit(tmp_path):
    root = tmp_path / "timit"
    _make_timit_fixture(root)
    out = tmp_path / "timit_prep"
    n = prepare_timit(str(root), str(out), speakers=["FAKS0"])
    assert n == 1
    phn = (out / "phn_text").read_text().strip()
    # h#->sil, sh->sh, ix->ih, q dropped
    assert phn == "FAKS0_SI1234 sil sh ih sil"
    assert (out / "transcript_phn_text").read_text() == \
        (out / "phn_text").read_text()
    assert (out / "wrd_text").read_text().strip() == "FAKS0_SI1234 she"


def test_prepare_timit_speaker_exclusion(tmp_path):
    root = tmp_path / "timit"
    _make_timit_fixture(root)
    out = tmp_path / "none"
    n = prepare_timit(str(root), str(out), speakers=["OTHER"])
    assert n == 0


def test_merge_and_units(tmp_path):
    d1, d2 = tmp_path / "a", tmp_path / "b"
    for d, utt, phones in ((d1, "u1", "sil aa bb"), (d2, "u2", "bb cc")):
        d.mkdir()
        for name in ("phn_text", "transcript_phn_text", "wav.scp",
                     "wav_sph.scp", "wrd_text"):
            (d / name).write_text(f"{utt} {phones}\n")
    out = tmp_path / "merged"
    merge_data_dirs([str(d1), str(d2)], str(out))
    assert (out / "phn_text").read_text() == "u1 sil aa bb\nu2 bb cc\n"

    units = build_units(str(out / "phn_text"), str(tmp_path / "units"))
    assert units == ["sil", "aa", "bb", "cc"]  # first-seen order
    assert (tmp_path / "units").read_text() == "sil\naa\nbb\ncc\n"


def test_split_timit_speakers_deterministic():
    spk = {"DR1": [f"S{i}" for i in range(10)],
           "DR2": [f"T{i}" for i in range(9)]}
    a = split_timit_speakers(spk, seed=7)
    b = split_timit_speakers(spk, seed=7)
    assert a == b
    assert len(a["dev"]) == 8 and len(a["test"]) == 8
    assert len(a["train"]) == 19 - 16
    all_spk = sorted(a["train"] + a["dev"] + a["test"])
    assert all_spk == sorted(spk["DR1"] + spk["DR2"])
