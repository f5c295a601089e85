"""Independent scalar-NumPy transcription of Kaldi's fbank computation.

This is the GOLDEN-FIXTURE GENERATOR for tests/test_fbank_golden.py: a
deliberately naive, loop-per-frame implementation written directly from
the Kaldi C++ sources' semantics (kaldi/src/feat/feature-window.{h,cc},
feature-fbank.cc, mel-computations.cc), sharing NO code with the
production jnp front-end (mdd_tpu/frontend/fbank.py, matmul-DFT).  The
two implementations were authored from the algorithm description
independently; agreement pins every windowing/mel/energy detail, and any
future drift in the production path fails the golden test.

Every step cites the Kaldi function it transcribes.  Options mirror the
reference binaries' configuration (egs/attention_aug/conf/fbank.conf:
--window-type=hamming --num-mel-bins=80 --use-energy; all other options
at Kaldi defaults) with dither forced to 0 for determinism, per the
driver's recommendation (features are deterministic at inference; the
training pipeline re-enables dither through its own rng).

Run as a script to (re)generate tests/fixtures/fbank_goldens.npz.
"""

from __future__ import annotations

import math

import numpy as np

FLT_EPS = float(np.finfo(np.float32).eps)


def num_frames(num_samples: int, frame_length: int, frame_shift: int) -> int:
    # feature-window.h NumFrames, snip_edges=true branch.
    if num_samples < frame_length:
        return 0
    return 1 + (num_samples - frame_length) // frame_shift


def hamming_window(n: int) -> np.ndarray:
    # feature-window.cc FeatureWindowFunction, window_type == "hamming":
    # 0.54 - 0.46*cos(a*i), a = 2*pi/(frame_length-1).
    a = 2.0 * math.pi / (n - 1)
    return np.array([0.54 - 0.46 * math.cos(a * i) for i in range(n)],
                    dtype=np.float64)


def mel_scale(freq: float) -> float:
    # mel-computations.h MelScale: 1127 * ln(1 + f/700).
    return 1127.0 * math.log(1.0 + freq / 700.0)


def mel_banks(num_bins: int, padded_length: int, sample_freq: float,
              low_freq: float = 20.0, high_freq: float = 0.0) -> list:
    """mel-computations.cc MelBanks::MelBanks -> list of (first_index,
    weights) per mel bin, evaluated on fft bins 0..padded/2-1."""
    num_fft_bins = padded_length // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_freq / padded_length
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_freq_delta = (mel_high - mel_low) / (num_bins + 1)
    banks = []
    for b in range(num_bins):
        left_mel = mel_low + b * mel_freq_delta
        center_mel = mel_low + (b + 1) * mel_freq_delta
        right_mel = mel_low + (b + 2) * mel_freq_delta
        first_index = -1
        weights = []
        for i in range(num_fft_bins):
            mel = mel_scale(fft_bin_width * i)
            if left_mel < mel < right_mel:
                if mel <= center_mel:
                    w = (mel - left_mel) / (center_mel - left_mel)
                else:
                    w = (right_mel - mel) / (right_mel - center_mel)
                if first_index == -1:
                    first_index = i
                weights.append(w)
        banks.append((first_index, np.array(weights, dtype=np.float64)))
    return banks


def process_window(window: np.ndarray, win_func: np.ndarray,
                   preemph: float = 0.97, remove_dc: bool = True,
                   raw_energy: bool = True):
    """feature-window.cc ProcessWindow on one frame (dither = 0).

    Returns (processed window, raw log energy or None).  Operates on the
    frame_length prefix only (ExtractWindow zero-pads afterwards).
    """
    w = window.astype(np.float64).copy()
    n = len(w)
    if remove_dc:
        w -= w.sum() / n                       # window->Add(-sum/n)
    log_energy = None
    if raw_energy:
        # Log(max(VecVec(window, window), epsilon)) BEFORE preemphasis.
        log_energy = math.log(max(float(np.dot(w, w)), FLT_EPS))
    if preemph != 0.0:
        # Preemphasize: i = n-1..1: w[i] -= coeff*w[i-1]; w[0] -= coeff*w[0]
        for i in range(n - 1, 0, -1):
            w[i] -= preemph * w[i - 1]
        w[0] -= preemph * w[0]
    w *= win_func
    return w, log_energy


def compute_fbank_golden(
    waveform: np.ndarray,
    sample_freq: float = 16000.0,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    num_bins: int = 80,
    use_energy: bool = True,
) -> np.ndarray:
    """(num_samples,) int16-scale float -> (T, 81) Kaldi fbank features.

    feature-fbank.cc FbankComputer::Compute per frame: power spectrum of
    the processed, zero-padded window over fft bins 0..padded/2-1 (the
    nyquist bin is excluded by MelBanks), mel triangle sums, epsilon
    floor, log, energy at feature index 0 (non-HTK layout).
    """
    frame_length = int(sample_freq * frame_length_ms / 1000)   # 400
    frame_shift = int(sample_freq * frame_shift_ms / 1000)     # 160
    padded = 1
    while padded < frame_length:
        padded *= 2                                            # 512
    t = num_frames(len(waveform), frame_length, frame_shift)
    win_func = hamming_window(frame_length)
    banks = mel_banks(num_bins, padded, sample_freq)

    feat_dim = num_bins + (1 if use_energy else 0)
    out = np.zeros((t, feat_dim), dtype=np.float64)
    for f in range(t):
        start = f * frame_shift                  # FirstSampleOfFrame
        frame = waveform[start:start + frame_length]
        w, log_energy = process_window(frame, win_func)
        padded_frame = np.zeros(padded, dtype=np.float64)
        padded_frame[:frame_length] = w
        spec = np.fft.rfft(padded_frame)         # srfft equivalent (exact)
        power = (spec.real ** 2 + spec.imag ** 2)[: padded // 2]
        mel = np.zeros(num_bins, dtype=np.float64)
        for b, (first, weights) in enumerate(banks):
            mel[b] = float(np.dot(weights,
                                  power[first:first + len(weights)]))
        mel = np.log(np.maximum(mel, FLT_EPS))   # ApplyFloor + ApplyLog
        if use_energy:
            out[f, 0] = log_energy
            out[f, 1:] = mel
        else:
            out[f] = mel
    return out.astype(np.float32)


def _synthetic_signal(n: int = 4000) -> np.ndarray:
    """Deterministic multi-tone + ramp test signal in int16 scale."""
    t = np.arange(n, dtype=np.float64) / 16000.0
    sig = (8000.0 * np.sin(2 * np.pi * 440.0 * t)
           + 4000.0 * np.sin(2 * np.pi * 1333.0 * t + 0.7)
           + 1500.0 * np.sin(2 * np.pi * 6100.0 * t + 1.3)
           + 500.0 * (np.arange(n) % 97) / 97.0)
    return np.round(sig).astype(np.float32)


def main() -> None:
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from mdd_tpu.frontend.wav import read_audio

    fixtures = {}
    fixtures["synthetic_wave"] = _synthetic_signal()
    fixtures["synthetic_feats"] = compute_fbank_golden(
        fixtures["synthetic_wave"])

    demo = pathlib.Path("/root/reference/egs/vocabulary/single")
    max_frames = 60
    for i in (1, 2, 3):
        wav, sr = read_audio(str(demo / f"{i}.wav"))
        assert sr == 16000, sr
        n_samp = 400 + (max_frames - 1) * 160
        wav = wav[:n_samp]
        fixtures[f"demo{i}_wave"] = wav.astype(np.float32)
        fixtures[f"demo{i}_feats"] = compute_fbank_golden(wav)

    out = (pathlib.Path(__file__).resolve().parents[1]
           / "tests" / "fixtures" / "fbank_goldens.npz")
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **fixtures)
    total = sum(v.size for v in fixtures.values())
    print(f"wrote {out} ({len(fixtures)} arrays, {total} values)")


if __name__ == "__main__":
    main()
