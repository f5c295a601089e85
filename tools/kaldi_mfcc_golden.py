"""Independent scalar-NumPy transcription of Kaldi's MFCC computation.

Golden-fixture generator for tests/test_mfcc_golden.py, in the same
spirit as tools/kaldi_fbank_golden.py: a naive loop-per-frame
implementation written directly from the Kaldi C++ sources' semantics
(feat/feature-mfcc.cc, matrix/matrix-functions.cc ComputeDctMatrix,
mel-computations.cc ComputeLifterCoeffs), sharing NO code with the
production jnp path (mdd_tpu/frontend/mfcc.py, matmul DCT).

Options mirror the reference mfcc runner (egs/attention_aug/steps/
make_feat.sh with feat_type=mfcc + conf/mfcc.conf: --use-energy=false,
everything else at Kaldi defaults — 23 mel bins, 13 cepstra, povey
window, lifter 22), dither forced to 0 for determinism.

Run as a script to (re)generate tests/fixtures/mfcc_goldens.npz.
"""

from __future__ import annotations

import math
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.kaldi_fbank_golden import (  # scalar frame/mel machinery
    FLT_EPS,
    mel_banks,
    num_frames,
    process_window,
)


def povey_window(n: int) -> np.ndarray:
    # feature-window.cc FeatureWindowFunction, window_type == "povey":
    # (0.5 - 0.5*cos(a*i))^0.85, a = 2*pi/(frame_length-1).
    a = 2.0 * math.pi / (n - 1)
    return np.array([(0.5 - 0.5 * math.cos(a * i)) ** 0.85
                     for i in range(n)], dtype=np.float64)


def dct_matrix(num_rows: int, num_cols: int) -> np.ndarray:
    # matrix-functions.cc ComputeDctMatrix (orthonormal DCT-II):
    # M(0, n) = 1/sqrt(N); M(k, n) = sqrt(2/N) * cos(pi/N * (n+0.5) * k).
    m = np.zeros((num_rows, num_cols), dtype=np.float64)
    for n in range(num_cols):
        m[0, n] = 1.0 / math.sqrt(num_cols)
    for k in range(1, num_rows):
        for n in range(num_cols):
            m[k, n] = math.sqrt(2.0 / num_cols) * math.cos(
                math.pi / num_cols * (n + 0.5) * k)
    return m


def lifter_coeffs(num_ceps: int, q: float) -> np.ndarray:
    # mel-computations.cc ComputeLifterCoeffs: 1 + Q/2 * sin(pi*i/Q).
    return np.array([1.0 + 0.5 * q * math.sin(math.pi * i / q)
                     for i in range(num_ceps)], dtype=np.float64)


def compute_mfcc_golden(
    waveform: np.ndarray,
    sample_freq: float = 16000.0,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    num_bins: int = 23,
    num_ceps: int = 13,
    use_energy: bool = False,
    cepstral_lifter: float = 22.0,
) -> np.ndarray:
    """(num_samples,) int16-scale float -> (T, num_ceps) Kaldi MFCCs.

    feature-mfcc.cc MfccComputer::Compute per frame: processed povey
    window -> power spectrum -> mel triangle sums -> epsilon floor ->
    log -> DCT rows 0..num_ceps-1 -> cepstral liftering -> (use_energy
    only) feature 0 := raw log energy."""
    frame_length = int(sample_freq * frame_length_ms / 1000)   # 400
    frame_shift = int(sample_freq * frame_shift_ms / 1000)     # 160
    padded = 1
    while padded < frame_length:
        padded *= 2                                            # 512
    t = num_frames(len(waveform), frame_length, frame_shift)
    win_func = povey_window(frame_length)
    banks = mel_banks(num_bins, padded, sample_freq)
    dct = dct_matrix(num_ceps, num_bins)
    lifter = lifter_coeffs(num_ceps, cepstral_lifter)

    out = np.zeros((t, num_ceps), dtype=np.float64)
    for f in range(t):
        start = f * frame_shift
        frame = waveform[start:start + frame_length]
        w, log_energy = process_window(frame, win_func)
        padded_frame = np.zeros(padded, dtype=np.float64)
        padded_frame[:frame_length] = w
        spec = np.fft.rfft(padded_frame)
        power = (spec.real ** 2 + spec.imag ** 2)[: padded // 2]
        mel = np.zeros(num_bins, dtype=np.float64)
        for b, (first, weights) in enumerate(banks):
            mel[b] = float(np.dot(weights,
                                  power[first:first + len(weights)]))
        mel = np.log(np.maximum(mel, FLT_EPS))
        ceps = dct @ mel
        if cepstral_lifter != 0.0:
            ceps *= lifter
        if use_energy:
            ceps[0] = log_energy
        out[f] = ceps
    return out.astype(np.float32)


def main() -> None:
    from tools.kaldi_fbank_golden import _synthetic_signal

    from mdd_tpu.frontend.wav import read_audio

    fixtures = {}
    fixtures["synthetic_wave"] = _synthetic_signal()
    fixtures["synthetic_feats"] = compute_mfcc_golden(
        fixtures["synthetic_wave"])
    # the use-energy=true variant pins the energy-substitution branch
    fixtures["synthetic_feats_energy"] = compute_mfcc_golden(
        fixtures["synthetic_wave"], use_energy=True)

    demo = pathlib.Path("/root/reference/egs/vocabulary/single")
    max_frames = 60
    for i in (1, 2, 3):
        wav, sr = read_audio(str(demo / f"{i}.wav"))
        assert sr == 16000, sr
        n_samp = 400 + (max_frames - 1) * 160
        wav = wav[:n_samp]
        fixtures[f"demo{i}_wave"] = wav.astype(np.float32)
        fixtures[f"demo{i}_feats"] = compute_mfcc_golden(wav)

    out = (pathlib.Path(__file__).resolve().parents[1]
           / "tests" / "fixtures" / "mfcc_goldens.npz")
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **fixtures)
    total = sum(v.size for v in fixtures.values())
    print(f"wrote {out} ({len(fixtures)} arrays, {total} values)")


if __name__ == "__main__":
    main()
