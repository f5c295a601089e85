"""Golden-fixture parity for the Kaldi-compatible fbank front-end.

tests/fixtures/fbank_goldens.npz holds features computed by
tools/kaldi_fbank_golden.py — an independent scalar-NumPy transcription
of Kaldi's feature-window.cc / feature-fbank.cc / mel-computations.cc
written directly from the C++ semantics, sharing no code with the
production matmul-DFT path (mdd_tpu/frontend/fbank.py).  Inputs cover a
deterministic synthetic multi-tone signal and the first 60 frames of
three real demo recordings (egs/vocabulary/single/{1,2,3}.wav).

Any drift in windowing, preemphasis, DC removal, energy, FFT padding,
mel-bank edges, or log flooring in the production path fails here.
The analytic tests additionally pin hand-derived constants (documented
inline) so the *fixtures themselves* are cross-checked against math,
not just implementation-vs-implementation agreement.
"""

import math
import pathlib

import numpy as np
import pytest

from mdd_tpu.frontend.cmvn import apply_cmvn, parse_kaldi_cmvn_text
from mdd_tpu.frontend.fbank import FLT_EPS, FbankConfig, compute_fbank

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "fbank_goldens.npz"


@pytest.fixture(scope="module")
def goldens():
    if not FIXTURES.exists():
        pytest.skip("fbank golden fixtures missing — run "
                    "tools/kaldi_fbank_golden.py")
    return np.load(FIXTURES)


@pytest.mark.parametrize("name", ["synthetic", "demo1", "demo2", "demo3"])
def test_fbank_matches_kaldi_golden(goldens, name):
    wave = goldens[f"{name}_wave"]
    gold = goldens[f"{name}_feats"]
    ours = np.asarray(compute_fbank(wave, FbankConfig()))
    assert ours.shape == gold.shape
    np.testing.assert_allclose(ours, gold, atol=5e-4)


def test_cmvn_normalized_fbank_matches_golden(goldens, reference_dir):
    """After global CMVN (the committed training stats) the features the
    model actually consumes must match the golden path within 2e-4."""
    stats = parse_kaldi_cmvn_text(
        str(reference_dir / "egs" / "attention_aug" / "data"
            / "global_fbank_cmvn.txt"))
    for name in ("demo1", "demo2", "demo3"):
        gold = apply_cmvn(goldens[f"{name}_feats"], stats)
        ours = apply_cmvn(
            np.asarray(compute_fbank(goldens[f"{name}_wave"],
                                     FbankConfig())), stats)
        np.testing.assert_allclose(ours, gold, atol=2e-4)


def test_constant_frame_is_floored():
    """A constant signal: DC removal zeroes the frame, so raw energy and
    every mel bin hit the float-epsilon floor -> all entries log(eps).
    Pins remove_dc_offset-before-energy ordering and both floors."""
    wave = np.full(400, 1234.0, np.float32)
    feats = np.asarray(compute_fbank(wave, FbankConfig()))
    assert feats.shape == (1, 81)
    np.testing.assert_allclose(feats, math.log(FLT_EPS), atol=1e-4)


def test_pure_tone_raw_energy_is_analytic():
    """1 kHz tone = exactly 25 cycles per 400-sample frame @16 kHz, so the
    sampled mean is exactly 0 (DC removal is a no-op) and
    sum(x^2) = A^2 * N/2.  Raw energy is computed BEFORE preemphasis and
    windowing (feature-window.cc ProcessWindow), so
    feats[:, 0] == log(A^2 * 200) exactly."""
    a = 1000.0
    n = 400 + 160 * 3
    t = np.arange(n) / 16000.0
    wave = (a * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    feats = np.asarray(compute_fbank(wave, FbankConfig()))
    expect = math.log(a * a * 200.0)
    np.testing.assert_allclose(feats[:, 0], expect, atol=1e-3)


def test_golden_generator_self_check(goldens):
    """Regenerating one fixture from the committed waveform must
    reproduce the committed features bit-for-bit (guards against a
    stale/corrupted fixture file)."""
    from tools.kaldi_fbank_golden import compute_fbank_golden

    regen = compute_fbank_golden(goldens["synthetic_wave"])
    np.testing.assert_array_equal(regen, goldens["synthetic_feats"])


def test_frame_count_matches_kaldi_snip_edges():
    cfg = FbankConfig()
    from mdd_tpu.frontend.fbank import num_frames
    assert num_frames(399, cfg) == 0
    assert num_frames(400, cfg) == 1
    assert num_frames(559, cfg) == 1
    assert num_frames(560, cfg) == 2
    assert num_frames(16000, cfg) == 1 + (16000 - 400) // 160
