"""Kaldi-compatible MFCC features, TPU-native.

Completes the reference feature runner's third `feat_type`
(egs/attention_aug/steps/make_feat.sh:25-39 accepts fbank / mfcc /
spectrogram; egs/attention_aug/conf/mfcc.conf sets `--use-energy=false`
with every other option at Kaldi defaults).  Built on the matmul-DFT
front-end (frontend/fbank.py): log-mel energies come from the same three
fused GEMMs, and the cepstral transform is one more (T, num_bins) @
(num_bins, num_ceps) matmul against a precomputed orthonormal DCT-II
basis — the whole feature is MXU work, no scalar loops.

Algorithmic parity with Kaldi's MfccComputer (feat/feature-mfcc.cc +
matrix/matrix-functions.cc ComputeDctMatrix + mel-computations.cc
ComputeLifterCoeffs), at Kaldi defaults except where mfcc.conf
overrides:
  23 mel bins (MfccOptions mel_opts(23)), 13 cepstra, povey window
  (frame_opts default — fbank.conf's hamming override does NOT apply
  to the mfcc path), cepstral lifter Q=22 (coeff_j = 1 + Q/2 *
  sin(pi*j/Q)), orthonormal DCT-II (row 0 = 1/sqrt(N), row k =
  sqrt(2/N)*cos(pi/N*(n+0.5)*k)), use_energy=false per mfcc.conf so
  C0 is kept (liftered by coeff 1.0) instead of being replaced by the
  raw log energy.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mdd_tpu.frontend.fbank import FbankConfig, compute_fbank, num_frames


@dataclasses.dataclass(frozen=True)
class MfccConfig:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 23       # MfccOptions default (vs fbank's 80)
    num_ceps: int = 13
    use_energy: bool = False     # conf/mfcc.conf --use-energy=false
    raw_energy: bool = True
    cepstral_lifter: float = 22.0
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"   # frame_opts default; fbank.conf's
    # hamming override is fbank-path-only
    dither: float = 0.0
    low_freq: float = 20.0
    high_freq: float = 0.0
    snip_edges: bool = True

    @property
    def feat_dim(self) -> int:
        return self.num_ceps

    def fbank_config(self) -> FbankConfig:
        """The mel front-end this MFCC rides on: log-mels + raw energy."""
        return FbankConfig(
            sample_rate=self.sample_rate,
            frame_length_ms=self.frame_length_ms,
            frame_shift_ms=self.frame_shift_ms,
            num_mel_bins=self.num_mel_bins,
            use_energy=self.use_energy,
            raw_energy=self.raw_energy,
            preemphasis=self.preemphasis,
            remove_dc_offset=self.remove_dc_offset,
            window_type=self.window_type,
            dither=self.dither,
            low_freq=self.low_freq,
            high_freq=self.high_freq,
            snip_edges=self.snip_edges,
        )


@functools.lru_cache(maxsize=8)
def _dct_and_lifter(num_bins: int, num_ceps: int, lifter_q: float):
    """((num_bins, num_ceps) DCT-II basis, (num_ceps,) lifter coeffs).

    matrix-functions.cc ComputeDctMatrix (orthonormal) transposed for a
    right-multiply, and mel-computations.cc ComputeLifterCoeffs.
    Returns numpy (lru_cached — a traced constant must not leak)."""
    n = np.arange(num_bins, dtype=np.float64)
    k = np.arange(num_ceps, dtype=np.float64)
    dct = np.sqrt(2.0 / num_bins) * np.cos(
        np.pi / num_bins * np.outer(n + 0.5, k))
    dct[:, 0] = 1.0 / np.sqrt(num_bins)
    if lifter_q != 0.0:
        lifter = 1.0 + 0.5 * lifter_q * np.sin(np.pi * k / lifter_q)
    else:
        lifter = np.ones(num_ceps)
    return dct.astype(np.float32), lifter.astype(np.float32)


def compute_mfcc(
    waveform: jnp.ndarray,
    cfg: MfccConfig = MfccConfig(),
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """(num_samples,) float32 in int16 scale -> (T, num_ceps) MFCCs.

    feature-mfcc.cc MfccComputer::Compute: log-mel energies -> DCT ->
    cepstral liftering -> (use_energy only) C0 := raw log energy."""
    fb = compute_fbank(waveform, cfg.fbank_config(), key)
    if cfg.use_energy:
        log_energy, log_mels = fb[:, 0], fb[:, 1:]
    else:
        log_mels = fb
    dct, lifter = _dct_and_lifter(
        cfg.num_mel_bins, cfg.num_ceps, cfg.cepstral_lifter)
    ceps = jnp.dot(log_mels, dct,
                   preferred_element_type=jnp.float32) * lifter[None, :]
    if cfg.use_energy:
        ceps = jnp.concatenate([log_energy[:, None], ceps[:, 1:]], axis=1)
    return ceps


def compute_mfcc_batch(
    waveforms: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: MfccConfig = MfccConfig(),
    key: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched MFCC over zero-padded waveforms -> (feats, frame_counts)."""
    from mdd_tpu.frontend.fbank import frame_counts

    feats = jax.vmap(lambda w: compute_mfcc(w, cfg, key))(waveforms)
    return feats, frame_counts(lengths, cfg)


__all__ = ["MfccConfig", "compute_mfcc", "compute_mfcc_batch", "num_frames"]
