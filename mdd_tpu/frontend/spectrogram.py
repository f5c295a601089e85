"""Log-magnitude spectrogram front-end (the legacy alternative feature).

Replaces the reference's librosa/torchaudio path
(egs/attention_aug/local/make_spectrum.py:54-97): STFT magnitude ->
log1p -> per-utterance mean/variance normalization, using the same
framing as our fbank (jit-compiled, no librosa dependency).  Selected by
`feature_type: spectrogram` in the config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mdd_tpu.frontend.fbank import FbankConfig, _window_function
from mdd_tpu.frontend import kaldi_io
from mdd_tpu.frontend.wav import read_audio, resample


def compute_spectrogram(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    window_size: float = 0.025,
    window_stride: float = 0.01,
    window: str = "hamming",
    normalize: bool = True,
) -> jnp.ndarray:
    """(num_samples,) -> (T, n_fft//2 + 1) log1p magnitude spectrogram.

    Matches make_spectrum.parse_audio:54-80 semantics: centered STFT is
    not used (frames from sample 0), magnitude (not power), log1p, and
    per-utterance global mean/std normalization.
    """
    n_fft = int(sample_rate * window_size)
    hop = int(sample_rate * window_stride)
    n = waveform.shape[0]
    t = 1 + max(0, (n - n_fft)) // hop
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = waveform[jnp.clip(idx, 0, n - 1)]

    cfg = FbankConfig(sample_rate=sample_rate,
                      frame_length_ms=window_size * 1000.0,
                      window_type=window)
    frames = frames * jnp.asarray(_window_function(cfg))[None, :]

    padded = 1
    while padded < n_fft:
        padded *= 2
    nbins = padded // 2 + 1
    k = np.arange(padded)[:, None]
    f = np.arange(nbins)[None, :]
    ang = 2.0 * np.pi * k * f / padded
    dft = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(
        np.float32)

    frames = jnp.pad(frames, ((0, 0), (0, padded - n_fft)))
    spec = jnp.dot(frames, dft, preferred_element_type=jnp.float32)
    mag = jnp.sqrt(spec[:, :nbins] ** 2 + spec[:, nbins:] ** 2)
    out = jnp.log1p(mag)
    if normalize:
        out = (out - out.mean()) / jnp.maximum(out.std(), 1e-8)
    return out


def mel_warp(spec, sample_rate: int = 16000, window_size: float = 0.025):
    """Resample a linear-frequency log spectrogram onto the mel scale by
    linear interpolation between fft bins (reference utils/tools.F_Mel
  :184-205, librosa.mel_frequencies semantics), vectorized.

    Args: spec (T, n_bins).  Returns (T, n_bins) mel-warped.
    """
    spec = jnp.asarray(spec)
    n_mels = spec.shape[1]
    fmax = sample_rate / 2.0
    # librosa mel_frequencies: mel-spaced points converted back to Hz
    min_mel = 0.0
    max_mel = 2595.0 * np.log10(1.0 + fmax / 700.0)
    mels = np.linspace(min_mel, max_mel, n_mels)
    freqs = 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    mel_bin = freqs * window_size           # fractional fft-bin index
    left = np.floor(mel_bin).astype(np.int32)
    right = np.clip(left + 1, 0, n_mels - 1)
    frac = jnp.asarray((mel_bin - left).astype(np.float32))
    left = np.clip(left, 0, n_mels - 1)
    return (spec[:, right] - spec[:, left]) * frac[None, :] + spec[:, left]


def make_spectrum(wav_scp: str, ark_file: str, scp_file: str,
                  log=print) -> int:
    """wav.scp -> normalized spectrogram ark/scp (make_spectrum.py CLI
    semantics). Returns utterance count."""
    fn = jax.jit(compute_spectrogram)
    n = 0
    with kaldi_io.ArkScpWriter(ark_file, scp_file) as w:
        with open(wav_scp, "r", encoding="utf-8") as f:
            for line in f:
                utt, path = line.strip().split(maxsplit=1)
                data, sr = read_audio(path)
                if data.ndim > 1:
                    data = data.mean(axis=1)
                if sr != 16000:
                    data = resample(data, sr, 16000)
                mat = np.asarray(fn(jnp.asarray(data, jnp.float32)))
                w.write(utt, mat)
                n += 1
                if n % 10 == 0:
                    log(f"Processed {n} sentences...")
    log(f"Done. Processed {n} sentences...")
    return n
