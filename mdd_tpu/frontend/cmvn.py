"""Global cepstral mean/variance normalization (Kaldi apply-cmvn parity).

Replaces `compute-cmvn-stats` + `apply-cmvn --norm-vars=true` and reads the
committed Kaldi text stats format (a 2 x (dim+1) matrix: row0 = per-dim
sums then frame count, row1 = per-dim sum-of-squares then 0 — the format of
egs/attention_aug/data/global_fbank_cmvn.txt).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CmvnStats:
    sum: np.ndarray        # (dim,)
    sum_sq: np.ndarray     # (dim,)
    count: float

    @property
    def dim(self) -> int:
        return int(self.sum.shape[0])

    @property
    def mean(self) -> np.ndarray:
        return self.sum / self.count

    @property
    def var(self) -> np.ndarray:
        v = self.sum_sq / self.count - self.mean ** 2
        return np.maximum(v, 1e-20)

    @classmethod
    def accumulate(cls, feats_iter) -> "CmvnStats":
        """Accumulate stats from an iterable of (T, dim) matrices."""
        s = None
        for f in feats_iter:
            f = np.asarray(f, dtype=np.float64)
            if s is None:
                s = cls(np.zeros(f.shape[1]), np.zeros(f.shape[1]), 0.0)
            s.sum += f.sum(axis=0)
            s.sum_sq += (f ** 2).sum(axis=0)
            s.count += f.shape[0]
        if s is None:
            raise ValueError("no features to accumulate")
        return s


def parse_kaldi_cmvn_text(path: str) -> CmvnStats:
    """Parse a Kaldi text-matrix CMVN stats file."""
    with open(path, "r", encoding="utf-8") as f:
        text = f.read()
    text = text.replace("[", " ").replace("]", " ")
    values = [float(v) for v in text.split()]
    n = len(values) // 2
    row0, row1 = values[:n], values[n:]
    return CmvnStats(
        sum=np.asarray(row0[:-1], dtype=np.float64),
        sum_sq=np.asarray(row1[:-1], dtype=np.float64),
        count=row0[-1],
    )


def write_kaldi_cmvn_text(stats: CmvnStats, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(" [\n  ")
        f.write(" ".join("%.6g" % v for v in stats.sum))
        f.write(" %.6g \n  " % stats.count)
        f.write(" ".join("%.6g" % v for v in stats.sum_sq))
        f.write(" 0 ]\n")


def apply_cmvn(feats, stats: CmvnStats, norm_vars: bool = True):
    """Normalize (..., dim) features; works on numpy or jnp arrays."""
    xp = jnp if isinstance(feats, jnp.ndarray) else np
    mean = xp.asarray(stats.mean, dtype=feats.dtype)
    if norm_vars:
        scale = xp.asarray(1.0 / np.sqrt(stats.var), dtype=feats.dtype)
        return (feats - mean) * scale
    return feats - mean
