"""CTC loss as a log-space forward scan (lax.scan over time).

A from-scratch batched implementation of the CTC forward algorithm over
the extended (blank-interleaved) label sequence, matching
torch.nn.CTCLoss(reduction='sum') semantics used by the reference trainer
(train_ctc.py:186, :72-74: sum over batch / batch_size).

Shapes are static: (T, B, C) log-probs, (B, L) labels; per-sample lengths
select the correct termination cells.  Gradients come from autodiff
through the scan (XLA turns this into the standard beta recursion).
Cross-validated against optax.ctc_loss and brute-force path enumeration
in tests/test_ctc_loss.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_EPS = -1e30


def _extended_labels(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, L) -> (B, 2L+1) blank-interleaved: [b, y1, b, y2, ..., b]."""
    b, l = labels.shape
    ext = jnp.full((b, 2 * l + 1), blank, labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_loss(
    log_probs: jnp.ndarray,
    input_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-sample negative log likelihood.

    Args:
      log_probs: (T, B, C) log-softmax outputs.
      input_lengths: (B,) valid frame counts (<= T).
      labels: (B, L) label ids, zero-padded (padding ignored via lengths).
      label_lengths: (B,) valid label counts (<= L).
    Returns:
      (B,) negative log likelihoods.
    """
    t_max, b, _ = log_probs.shape
    l_max = labels.shape[1]
    s = 2 * l_max + 1

    ext = _extended_labels(labels, blank)                      # (B, S)
    pos = jnp.arange(s)[None, :]                               # (1, S)
    valid_s = pos < (2 * label_lengths[:, None] + 1)           # (B, S)

    # Emission lookup as a batched matvec instead of a (B, S) gather:
    # gathers serialize on the TPU VPU; one_hot @ lp_t runs on the MXU.
    c = log_probs.shape[2]
    ext_onehot = jax.nn.one_hot(ext, c, dtype=log_probs.dtype)  # (B, S, C)

    # Skip-transition allowed where ext[s] != blank and ext[s] != ext[s-2].
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :s]
    can_skip = (ext != blank) & (ext != ext_m2) & (pos >= 2)

    # alpha_0
    alpha0 = jnp.full((b, s), LOG_EPS)
    alpha0 = alpha0.at[:, 0].set(log_probs[0, jnp.arange(b), ext[:, 0]])
    has_label = label_lengths > 0
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(has_label, log_probs[0, jnp.arange(b), ext[:, 1]], LOG_EPS))

    batch_idx = jnp.arange(b)

    def step(alpha, inputs):
        lp_t, t = inputs                                       # (B, C), scalar
        a_m1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=LOG_EPS)[:, :s]
        a_m2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=LOG_EPS)[:, :s]
        a_m2 = jnp.where(can_skip, a_m2, LOG_EPS)
        stacked = jnp.stack([alpha, a_m1, a_m2])
        m = jnp.max(stacked, axis=0)
        summed = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
        summed = jnp.where(m <= LOG_EPS / 2, LOG_EPS, summed)
        emit = jnp.einsum("bsc,bc->bs", ext_onehot, lp_t)      # (B, S)
        new_alpha = jnp.where(valid_s, summed + emit, LOG_EPS)
        # Freeze alpha for samples whose input already ended.
        new_alpha = jnp.where((t < input_lengths)[:, None], new_alpha, alpha)
        return new_alpha, None

    ts = jnp.arange(1, t_max)
    alpha, _ = jax.lax.scan(step, alpha0, (log_probs[1:], ts))

    end = 2 * label_lengths                                    # (B,)
    last = alpha[batch_idx, end]
    second = jnp.where(end >= 1, alpha[batch_idx, jnp.maximum(end - 1, 0)], LOG_EPS)
    m = jnp.maximum(last, second)
    ll = m + jnp.log(jnp.exp(last - m) + jnp.exp(second - m))
    ll = jnp.where(m <= LOG_EPS / 2, LOG_EPS, ll)
    return -ll


def ctc_loss_sum_mean(
    log_probs: jnp.ndarray,
    input_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """sum-over-batch / batch_size — the reference's training objective
    (nn.CTCLoss(reduction='sum') / batch_size, train_ctc.py:72-74)."""
    nll = ctc_loss(log_probs, input_lengths, labels, label_lengths, blank)
    return jnp.sum(nll) / log_probs.shape[1]
