"""Batch feature extraction pipeline: wav.scp -> fbank ark/scp + CMVN.

The TPU-native replacement for the reference's Kaldi-binary feature stage
(steps/make_feat.sh:25-39: compute-fbank-feats | compute-cmvn-stats |
apply-cmvn --norm-vars=true | copy-feats): audio is read directly (wav or
NIST SPHERE — no sph2pipe), fbank runs as a jit-compiled batched program
on the accelerator with length-bucketed padding (a small closed set of
shapes), CMVN stats accumulate on host in float64, and normalized
features land in our binary ark/scp store (kaldiio-compatible).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdd_tpu.frontend import kaldi_io
from mdd_tpu.frontend.cmvn import (
    CmvnStats,
    apply_cmvn,
    parse_kaldi_cmvn_text,
    write_kaldi_cmvn_text,
)
from mdd_tpu.frontend.fbank import FbankConfig, compute_fbank_batch, num_frames
from mdd_tpu.frontend.wav import read_audio, resample


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _BatchedFbank:
    """jit-compiled feature extractor over (B, S) padded waveforms.

    Dispatches on the config type: FbankConfig -> compute_fbank_batch,
    MfccConfig -> compute_mfcc_batch (the `feat_type` switch of the
    reference runner, steps/make_feat.sh:25-39)."""

    def __init__(self, cfg):
        self.cfg = cfg
        from mdd_tpu.frontend.mfcc import MfccConfig, compute_mfcc_batch

        batch_fn = (compute_mfcc_batch if isinstance(cfg, MfccConfig)
                    else compute_fbank_batch)
        self._fn = jax.jit(lambda w, l: batch_fn(w, l, cfg))

    def __call__(self, wavs: Sequence[np.ndarray]) -> List[np.ndarray]:
        lengths = np.asarray([len(w) for w in wavs], np.int32)
        s_max = _round_up(int(lengths.max()), 8000)  # 0.5 s sample quantum
        batch = np.zeros((len(wavs), s_max), np.float32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
        feats, counts = self._fn(jnp.asarray(batch), jnp.asarray(lengths))
        feats = np.asarray(feats)
        counts = np.asarray(counts)
        return [feats[i, : counts[i]] for i in range(len(wavs))]


def _load_waveform(path: str, sample_rate: int) -> np.ndarray:
    data, sr = read_audio(path)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if sr != sample_rate:
        data = resample(data, sr, sample_rate)
    return data.astype(np.float32)


def extract_split(
    wav_scp: str,
    out_dir: str,
    name: str = "fbank",
    cfg: FbankConfig = FbankConfig(),
    cmvn: CmvnStats | None = None,
    batch_size: int = 16,
    sample_rate: int = 16000,
) -> Tuple[str, CmvnStats]:
    """Extract features for one split.

    If `cmvn` is None (training split), stats are accumulated over this
    split and written to `<out_dir>/global_<name>_cmvn.txt` — the
    reference trains CMVN on train and applies it everywhere
    (make_feat.sh:29-33, infer.py:570).

    Returns (scp_path, cmvn_stats).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    scp = kaldi_io.read_scp(wav_scp)
    utts = sorted(scp)
    # Sort by file size as a cheap length proxy -> tight padding buckets.
    utts.sort(key=lambda u: os.path.getsize(scp[u])
              if os.path.exists(scp[u]) else 0)

    fbank = _BatchedFbank(cfg)
    raw: Dict[str, np.ndarray] = {}
    stats_acc = None if cmvn is not None else CmvnStats(
        np.zeros(cfg.feat_dim), np.zeros(cfg.feat_dim), 0.0)

    for start in range(0, len(utts), batch_size):
        chunk = utts[start : start + batch_size]
        wavs = [_load_waveform(scp[u], sample_rate) for u in chunk]
        for u, f in zip(chunk, fbank(wavs)):
            raw[u] = f
            if stats_acc is not None:
                f64 = f.astype(np.float64)
                stats_acc.sum += f64.sum(axis=0)
                stats_acc.sum_sq += (f64 ** 2).sum(axis=0)
                stats_acc.count += f.shape[0]

    if stats_acc is not None:
        cmvn = stats_acc
        write_kaldi_cmvn_text(cmvn, str(out / f"global_{name}_cmvn.txt"))

    ark_path = str(out / f"{name}.ark")
    scp_path = str(out / f"{name}.scp")
    with kaldi_io.ArkScpWriter(ark_path, scp_path) as w:
        for u in sorted(raw):
            w.write(u, np.asarray(apply_cmvn(raw[u], cmvn)))
    return scp_path, cmvn


def featurize_wavs(
    paths: Dict[str, str],
    cmvn: CmvnStats,
    cfg: FbankConfig = FbankConfig(),
    sample_rate: int = 16000,
) -> Dict[str, np.ndarray]:
    """In-memory feature extraction for the product-inference path
    (infer.py:567-574 semantics, committed training CMVN applied)."""
    fbank = _BatchedFbank(cfg)
    utts = sorted(paths)
    out: Dict[str, np.ndarray] = {}
    for start in range(0, len(utts), 16):
        chunk = utts[start : start + 16]
        wavs = [_load_waveform(paths[u], sample_rate) for u in chunk]
        for u, f in zip(chunk, fbank(wavs)):
            out[u] = np.asarray(apply_cmvn(f, cmvn))
    return out
