"""On-device greedy train-WER: batched CTC collapse + Levenshtein DP.

The reference computes its per-step training WER on host
(model_ctc.compute_wer:227-244: greedy collapse, editdistance per
utterance).  Fetching the (B, T') argmax ids off a remote-attached TPU
costs ~100 ms of round-trips per step — far more than the step itself —
so the whole computation moves into the jit program:

  * collapse: keep = non-blank & != previous frame id (the exact
    reference semantics, decode/greedy.collapse_ctc), compacted into a
    dense (B, T) token array via a cumsum-scatter;
  * edit distance: one lax.scan over pred positions carrying the
    (B, L+1) DP row.  The insertion recurrence along the row (new[j]
    depends on new[j-1]) is vectorized with the min-plus trick:
    new[j] = min_{k<=j}(c[k] + (j-k)) = cummin(c[k]-k) + j, an
    associative scan;
  * per-utterance distances are gathered at each row's true label
    length, masked by batch validity, and summed — the step returns two
    scalars which the Trainer accumulates in a device-resident metric
    vector (zero per-step host traffic).

Equality with the host path (collapse_ctc + align.levenshtein) is pinned
by tests/test_wer_device.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batched_edit_distance(pred: jnp.ndarray, pred_len: jnp.ndarray,
                          targets: jnp.ndarray,
                          target_sizes: jnp.ndarray) -> jnp.ndarray:
    """Levenshtein distance per row.

    pred: (B, T) token ids, valid prefix per pred_len; targets: (B, L)
    with valid prefix per target_sizes.  -> (B,) int32 distances.
    """
    b, t = pred.shape
    l = targets.shape[1]
    jrange = jnp.arange(l + 1, dtype=jnp.int32)
    row0 = jnp.broadcast_to(jrange, (b, l + 1)).astype(jnp.int32)
    step_mask = (jnp.arange(t)[:, None] < pred_len[None, :])  # (T, B)

    def step(row, xs):
        x_t, m = xs                                   # (B,), (B,) bool
        cost = (targets != x_t[:, None]).astype(jnp.int32)     # (B, L)
        cand = jnp.minimum(row[:, 1:] + 1, row[:, :-1] + cost)
        c = jnp.concatenate([row[:, :1] + 1, cand], axis=1)    # (B, L+1)
        # insertion chain new[j] = min(c[j], new[j-1]+1) as a cummin
        new = jax.lax.associative_scan(
            jnp.minimum, c - jrange[None], axis=1) + jrange[None]
        return jnp.where(m[:, None], new, row), None

    row, _ = jax.lax.scan(step, row0,
                          (pred.swapaxes(0, 1), step_mask))
    return row[jnp.arange(b), target_sizes]


def greedy_wer_counts(ids: jnp.ndarray, frames: jnp.ndarray,
                      targets: jnp.ndarray, target_sizes: jnp.ndarray,
                      valid: jnp.ndarray, blank: int = 0):
    """-> (errors, tokens) int32 scalars over the valid rows.

    ids: (B, T) framewise argmax ids; frames: (B,) true frame counts;
    collapse semantics identical to decode/greedy.collapse_ctc.
    """
    b, t = ids.shape
    ids = ids.astype(jnp.int32)
    tvalid = jnp.arange(t)[None, :] < frames[:, None]
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    keep = tvalid & (ids != blank) & (ids != prev)
    pos = jnp.cumsum(keep, axis=1) - 1
    pred_len = keep.sum(axis=1)
    # compact kept tokens to the row head; dropped lanes scatter out of
    # bounds (mode='drop')
    scatter_pos = jnp.where(keep, pos, t)
    pred = jnp.zeros((b, t), jnp.int32).at[
        jnp.arange(b)[:, None], scatter_pos].set(ids, mode="drop")
    dist = batched_edit_distance(pred, pred_len, targets.astype(jnp.int32),
                                 target_sizes.astype(jnp.int32))
    errs = jnp.sum(jnp.where(valid, dist, 0))
    tokens = jnp.sum(jnp.where(valid, target_sizes, 0))
    return errs, tokens
