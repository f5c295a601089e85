"""Greedy (best-path) CTC decoding, batched and jit-compatible.

Framewise argmax -> collapse repeats -> drop blanks, the semantics of the
reference GreedyDecoder (utils/ctcDecoder.py:186-200) and of the training
WER computation (model_ctc.compute_wer:227-244, which keeps the frame-0
token even when the next frame repeats it — reproduced in
`collapse_ctc`).  The argmax/compare runs on device; the final ragged
gather happens on host where the ragged outputs are consumed anyway.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _argmax_and_keep(log_probs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(T, B, C) -> best ids (B, T) and keep mask (non-blank, non-repeat)."""
    ids = jnp.argmax(log_probs, axis=-1).swapaxes(0, 1)  # (B, T)
    prev = jnp.pad(ids, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    keep = (ids != 0) & (ids != prev)
    return ids, keep


def collapse_ctc(ids: np.ndarray, length: int, blank: int = 0) -> List[int]:
    """Collapse one framewise id sequence (reference compute_wer semantics)."""
    out: List[int] = []
    for j in range(min(length, len(ids))):
        if ids[j] == blank:
            continue
        if j == 0:
            out.append(int(ids[j]))
        elif ids[j] != ids[j - 1]:
            out.append(int(ids[j]))
    return out


def greedy_decode(log_probs, lengths) -> List[List[int]]:
    """(T, B, C) log-probs + (B,) frame counts -> list of id sequences."""
    ids, keep = _argmax_and_keep(jnp.asarray(log_probs))
    ids = np.asarray(ids)
    keep = np.asarray(keep)
    lengths = np.asarray(lengths)
    res = []
    for b in range(ids.shape[0]):
        t = int(lengths[b])
        res.append([int(i) for i in ids[b, :t][keep[b, :t]]])
    return res
