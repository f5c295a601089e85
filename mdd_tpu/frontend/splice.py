"""Context splicing, frame skipping, and downsample padding.

Semantics mirror the reference data pipeline (utils/tools.py:207-227 and
utils/data_loader.py:138-142): splice left/right context with edge
replication, keep every k-th frame, and pad the time axis to a multiple of
the model's time downsampling factor.  Implemented for both numpy (host
data pipeline) and jnp (on-device jit path) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _xp(x):
    return jnp if isinstance(x, jnp.ndarray) else np


def make_context(feature, left: int, right: int):
    """(T, D) -> (T, (left+1+right)*D) with edge-replicated shifts.

    Column order matches the reference: [left_k..left_1, x, right_1..right_k].
    """
    if left == 0 and right == 0:
        return feature
    xp = _xp(feature)
    t = feature.shape[0]
    idx = xp.arange(t)
    cols = []
    for k in range(left, 0, -1):
        cols.append(feature[xp.maximum(idx - k, 0)])
    cols.append(feature)
    for k in range(1, right + 1):
        cols.append(feature[xp.minimum(idx + k, t - 1)])
    return xp.concatenate(cols, axis=1)


def skip_frames(feature, skip: int):
    """Keep frames 0, skip, 2*skip, ... (reference skip_feat:218-227)."""
    if skip in (0, 1):
        return feature
    return feature[::skip]


def pad_to_multiple(feature, multiple: int):
    """Zero-pad the time axis so T % multiple == 0."""
    t = feature.shape[0]
    rem = t % multiple
    if rem == 0:
        return feature
    pad = multiple - rem
    xp = _xp(feature)
    widths = [(0, pad)] + [(0, 0)] * (feature.ndim - 1)
    return xp.pad(feature, widths)


def output_frames(t_in: int, skip: int, multiple: int) -> int:
    """Frame count after skip + pad (the dataset-side length bookkeeping)."""
    t = (t_in + skip - 1) // skip if skip > 1 else t_in
    rem = t % multiple
    return t + (multiple - rem if rem else 0)


def batched_splice_skip(raw, lengths, left: int, right: int,
                        skip: int, multiple: int):
    """On-device splice + frame-skip for a zero-padded raw batch.

    The host pipeline splices features to (left+1+right)*D and THEN ships
    them to the device — 3x the wire bytes for the default (0, 2) context.
    This jit-path equivalent takes the raw (B, T_raw, D) batch plus true
    per-item frame counts and reproduces, bit-for-bit in the same dtype,
    host `make_context` -> `skip_frames` -> `pad_to_multiple` -> batch
    zero-padding (reference utils/tools.py:207-227 semantics: clamped
    edge replication per item, zeros past each item's length).

    T_raw must be divisible by skip * multiple (the raw-grid bucket
    quantum guarantees it).  Returns (spliced (B, T_raw//skip, C*D),
    model_frames (B,) int32 = post-skip-and-pad valid frame counts).
    """
    b, t_raw, d = raw.shape
    assert t_raw % (max(skip, 1) * multiple) == 0, (t_raw, skip, multiple)
    skip = max(skip, 1)
    t_out = t_raw // skip
    base = jnp.arange(t_out, dtype=jnp.int32) * skip          # (t_out,)
    len_b = lengths.astype(jnp.int32)[:, None]                # (B, 1)
    cols = []
    for k in range(left, 0, -1):
        cols.append(jnp.broadcast_to(jnp.maximum(base - k, 0)[None],
                                     (b, t_out)))
    cols.append(jnp.broadcast_to(base[None], (b, t_out)))
    for k in range(1, right + 1):
        cols.append(jnp.minimum(base[None] + k, len_b - 1))
    n_ctx = len(cols)
    idx = jnp.clip(jnp.stack(cols, axis=2), 0, t_raw - 1)     # (B, t_out, C)
    gathered = jnp.take_along_axis(
        raw, idx.reshape(b, t_out * n_ctx)[..., None], axis=1)
    spliced = gathered.reshape(b, t_out, n_ctx * d)
    valid = (base[None] < len_b)                              # (B, t_out)
    spliced = spliced * valid[..., None].astype(raw.dtype)
    n = (lengths.astype(jnp.int32) + skip - 1) // skip
    model_frames = ((n + multiple - 1) // multiple) * multiple
    return spliced, model_frames
