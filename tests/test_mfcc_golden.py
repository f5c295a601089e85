"""Golden-fixture parity for the Kaldi-compatible MFCC front-end (A8).

tests/fixtures/mfcc_goldens.npz holds features computed by
tools/kaldi_mfcc_golden.py — an independent scalar-NumPy transcription
of Kaldi's feature-mfcc.cc / matrix-functions.cc ComputeDctMatrix /
mel-computations.cc ComputeLifterCoeffs, sharing no code with the
production matmul path (mdd_tpu/frontend/mfcc.py).  Options mirror the
reference runner's mfcc branch (steps/make_feat.sh:25-39 with
conf/mfcc.conf: --use-energy=false, everything else Kaldi defaults —
23 mel bins, 13 cepstra, povey window, lifter 22).

The analytic tests pin hand-derived DCT/lifter constants so the
fixtures are cross-checked against math, not just
implementation-vs-implementation agreement.
"""

import math
import pathlib

import numpy as np
import pytest

from mdd_tpu.frontend.mfcc import MfccConfig, compute_mfcc

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "mfcc_goldens.npz"


@pytest.fixture(scope="module")
def goldens():
    if not FIXTURES.exists():
        pytest.skip("mfcc golden fixtures missing — run "
                    "tools/kaldi_mfcc_golden.py")
    return np.load(FIXTURES)


@pytest.mark.parametrize("name", ["synthetic", "demo1", "demo2", "demo3"])
def test_mfcc_matches_kaldi_golden(goldens, name):
    wave = goldens[f"{name}_wave"]
    gold = goldens[f"{name}_feats"]
    ours = np.asarray(compute_mfcc(wave, MfccConfig()))
    assert ours.shape == gold.shape == (gold.shape[0], 13)
    np.testing.assert_allclose(ours, gold, atol=5e-4)


def test_mfcc_use_energy_substitutes_c0(goldens):
    """The use-energy branch (Kaldi default; the committed mfcc.conf
    disables it) replaces the liftered C0 with the raw log energy and
    leaves every other cepstrum untouched."""
    wave = goldens["synthetic_wave"]
    gold = goldens["synthetic_feats_energy"]
    ours = np.asarray(compute_mfcc(wave, MfccConfig(use_energy=True)))
    np.testing.assert_allclose(ours, gold, atol=5e-4)
    plain = np.asarray(compute_mfcc(wave, MfccConfig()))
    np.testing.assert_allclose(ours[:, 1:], plain[:, 1:], atol=1e-5)
    assert not np.allclose(ours[:, 0], plain[:, 0])


def test_dct_matrix_is_orthonormal_and_analytic():
    """Kaldi's ComputeDctMatrix is the orthonormal DCT-II: row 0 is
    1/sqrt(N) (so C0 = sum(logmel)/sqrt(23) before liftering) and
    M @ M.T = I.  Pins our transposed right-multiply basis."""
    from mdd_tpu.frontend.mfcc import _dct_and_lifter

    dct, lifter = _dct_and_lifter(23, 13, 22.0)
    assert dct.shape == (23, 13)
    np.testing.assert_allclose(dct[:, 0], 1.0 / math.sqrt(23), atol=1e-6)
    # columns (Kaldi's rows) are orthonormal
    np.testing.assert_allclose(dct.T @ dct, np.eye(13), atol=1e-5)
    # lifter: 1 + 11*sin(pi*j/22); j=0 -> 1, j=11 -> 12 (sin(pi/2)=1)
    np.testing.assert_allclose(lifter[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(lifter[11], 12.0, atol=1e-5)


def test_constant_frame_hits_floor_everywhere():
    """Constant signal: DC removal zeroes the frame, every mel bin
    floors to log(eps), so the cepstrum is the DCT of a constant
    vector: C0 = sqrt(23)*log(eps), higher cepstra 0 (orthogonality)."""
    from mdd_tpu.frontend.fbank import FLT_EPS

    wave = np.full(400, 777.0, np.float32)
    feats = np.asarray(compute_mfcc(wave, MfccConfig()))
    assert feats.shape == (1, 13)
    np.testing.assert_allclose(
        feats[0, 0], math.sqrt(23.0) * math.log(FLT_EPS), rtol=1e-5)
    np.testing.assert_allclose(feats[0, 1:], 0.0, atol=1e-3)


def test_golden_generator_self_check(goldens):
    from tools.kaldi_mfcc_golden import compute_mfcc_golden

    regen = compute_mfcc_golden(goldens["synthetic_wave"])
    np.testing.assert_array_equal(regen, goldens["synthetic_feats"])


def test_cli_feat_type_mfcc(tmp_path, reference_dir):
    """`feat --feat-type mfcc` produces a 13-dim CMVN'd ark/scp split
    (make_feat.sh feat_type=mfcc parity)."""
    from mdd_tpu.cli import main
    from mdd_tpu.frontend import kaldi_io

    demo = reference_dir / "egs" / "vocabulary" / "single"
    scp = tmp_path / "wav.scp"
    scp.write_text("".join(f"w{i} {demo}/{i}.wav\n" for i in (1, 2)))
    rc = main(["feat", "--wav-scp", str(scp), "--out-dir", str(tmp_path),
               "--feat-type", "mfcc"])
    assert rc == 0
    feats = kaldi_io.read_scp(str(tmp_path / "mfcc.scp"))
    assert sorted(feats) == ["w1", "w2"]
    m = kaldi_io.load_mat(feats["w1"])
    assert m.shape[1] == 13
    # CMVN trained on this split: global mean ~0, var ~1
    allm = np.concatenate([kaldi_io.load_mat(rx) for rx in feats.values()])
    np.testing.assert_allclose(allm.mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(allm.var(0), 1.0, atol=1e-2)
