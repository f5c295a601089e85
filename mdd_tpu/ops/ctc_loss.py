"""CTC loss: log-space forward/backward (alpha-beta) recursions.

A from-scratch batched implementation of the CTC forward algorithm over
the extended (blank-interleaved) label sequence, matching
torch.nn.CTCLoss(reduction='sum') semantics used by the reference trainer
(train_ctc.py:186, :72-74: sum over batch / batch_size).

Shapes are static: (T, B, C) log-probs, (B, L) labels; per-sample lengths
select the correct termination cells.

`ctc_loss` carries a custom VJP: the gradient is the classic analytic
alpha-beta posterior (Graves 2006, eq. 7.31) —

    d nll / d logp_t(k) = -(1/p) * sum_{s: ext[s]=k} alpha_t(s) beta_t(s)
                                                     / p_t(ext[s])

computed with one extra reverse-time scan (beta) instead of autodiff
through the forward scan.  On TPU this roughly halves the loss
backward cost and frees the autodiff residuals of the scan.
`ctc_loss_scan` is the plain autodiff version kept for cross-validation.

Both are cross-checked against optax.ctc_loss, brute-force path
enumeration, and each other (loss and gradients) in
tests/test_ctc_loss.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LOG_EPS = -1e30


def _extended_labels(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, L) -> (B, 2L+1) blank-interleaved: [b, y1, b, y2, ..., b]."""
    b, l = labels.shape
    ext = jnp.full((b, 2 * l + 1), blank, labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _prep(log_probs, labels, label_lengths, blank):
    """Shared precomputation: extended labels, masks, one-hot emission."""
    s = 2 * labels.shape[1] + 1
    c = log_probs.shape[2]
    ext = _extended_labels(labels, blank)                      # (B, S)
    pos = jnp.arange(s)[None, :]                               # (1, S)
    valid_s = pos < (2 * label_lengths[:, None] + 1)           # (B, S)
    # Emission lookup as a batched matvec instead of a (B, S) gather:
    # gathers serialize on the TPU VPU; one_hot @ lp_t runs on the MXU.
    ext_onehot = jax.nn.one_hot(ext, c, dtype=log_probs.dtype)  # (B, S, C)
    # Skip-transition allowed into slot s iff ext[s] != blank and
    # ext[s] != ext[s-2].
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :s]
    can_skip = (ext != blank) & (ext != ext_m2) & (pos >= 2)
    return ext, valid_s, ext_onehot, can_skip


def _logsumexp3(a, b, c):
    stacked = jnp.stack([a, b, c])
    m = jnp.max(stacked, axis=0)
    out = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
    return jnp.where(m <= LOG_EPS / 2, LOG_EPS, out)


def _alpha_scan(log_probs, input_lengths, label_lengths, ext, valid_s,
                ext_onehot, can_skip):
    """Forward recursion -> (alphas (T, B, S), nll (B,))."""
    t_max, b, _ = log_probs.shape
    s = ext.shape[1]
    batch_idx = jnp.arange(b)

    # Emission lookup for ALL timesteps as one big MXU contraction
    # (T*B, C) @ (B, C, S)-style — hoisting it out of the scan leaves the
    # scan body pure VPU work (pads + logsumexp), which roughly halves
    # the scan's per-step cost on TPU.
    emit_all = jnp.einsum("bsc,tbc->tbs", ext_onehot, log_probs)  # (T, B, S)

    alpha0 = jnp.full((b, s), LOG_EPS)
    alpha0 = alpha0.at[:, 0].set(log_probs[0, batch_idx, ext[:, 0]])
    has_label = label_lengths > 0
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(has_label, log_probs[0, batch_idx, ext[:, 1]], LOG_EPS))

    def step(alpha, inputs):
        emit, t = inputs                                       # (B, S), scalar
        a_m1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=LOG_EPS)[:, :s]
        a_m2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=LOG_EPS)[:, :s]
        a_m2 = jnp.where(can_skip, a_m2, LOG_EPS)
        summed = _logsumexp3(alpha, a_m1, a_m2)
        new_alpha = jnp.where(valid_s, summed + emit, LOG_EPS)
        # Freeze alpha for samples whose input already ended.
        new_alpha = jnp.where((t < input_lengths)[:, None], new_alpha, alpha)
        return new_alpha, new_alpha

    ts = jnp.arange(1, t_max)
    alpha_last, alphas_rest = jax.lax.scan(step, alpha0, (emit_all[1:], ts))
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)

    end = 2 * label_lengths                                    # (B,)
    last = alpha_last[batch_idx, end]
    second = jnp.where(end >= 1,
                       alpha_last[batch_idx, jnp.maximum(end - 1, 0)], LOG_EPS)
    m = jnp.maximum(last, second)
    ll = m + jnp.log(jnp.exp(last - m) + jnp.exp(second - m))
    ll = jnp.where(m <= LOG_EPS / 2, LOG_EPS, ll)
    return alphas, -ll


def _beta_scan(log_probs, input_lengths, label_lengths, valid_s, ext_onehot,
               can_skip):
    """Reverse recursion -> betas (T, B, S), emission included at t."""
    t_max = log_probs.shape[0]
    s = valid_s.shape[1]
    pos = jnp.arange(s)[None, :]
    end = 2 * label_lengths[:, None]                           # (B, 1)
    # Transition s -> s+2 allowed iff a skip into slot s+2 is legal.
    can_skip_p2 = jnp.pad(can_skip, ((0, 0), (0, 2)))[:, 2:]

    init = jnp.full(valid_s.shape, LOG_EPS)
    # hoisted all-timestep emission lookup (see _alpha_scan)
    emit_all = jnp.einsum("bsc,tbc->tbs", ext_onehot, log_probs)

    def step(beta, inputs):
        emit, t = inputs                                       # (B, S)
        b_p1 = jnp.pad(beta, ((0, 0), (0, 1)),
                       constant_values=LOG_EPS)[:, 1:]
        b_p2 = jnp.pad(beta, ((0, 0), (0, 2)),
                       constant_values=LOG_EPS)[:, 2:]
        b_p2 = jnp.where(can_skip_p2, b_p2, LOG_EPS)
        summed = _logsumexp3(beta, b_p1, b_p2) + emit
        # Terminal condition at the last valid frame: paths must sit on
        # the final blank (s = 2L) or final label (s = 2L - 1).
        terminal = jnp.where((pos == end) |
                             ((pos == end - 1) & (end >= 1)),
                             emit, LOG_EPS)
        is_last = (t == input_lengths - 1)[:, None]
        new_beta = jnp.where(is_last, terminal, summed)
        new_beta = jnp.where(valid_s, new_beta, LOG_EPS)
        new_beta = jnp.where((t < input_lengths)[:, None], new_beta, LOG_EPS)
        return new_beta, new_beta

    ts = jnp.arange(t_max)
    _, betas = jax.lax.scan(step, init, (emit_all, ts), reverse=True)
    return betas


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_loss_vjp(log_probs, input_lengths, labels, label_lengths, blank):
    ext, valid_s, ext_onehot, can_skip = _prep(
        log_probs, labels, label_lengths, blank)
    _, nll = _alpha_scan(log_probs, input_lengths, label_lengths, ext,
                         valid_s, ext_onehot, can_skip)
    return nll


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

    Thin wrapper so `blank` always reaches the custom_vjp positionally:
    jax.custom_vjp does not apply Python defaults when binding
    nondiff_argnums, so a 4-positional-arg call would shift every operand
    by one inside fwd/bwd.
    """
    return _ctc_loss_vjp(log_probs, input_lengths, labels, label_lengths,
                         int(blank))


def _ctc_fwd(log_probs, input_lengths, labels, label_lengths, blank):
    # NB: under jax>=0.9 custom_vjp passes nondiff_argnums to fwd at their
    # ORIGINAL positions (bwd still receives them leading).
    ext, valid_s, ext_onehot, can_skip = _prep(
        log_probs, labels, label_lengths, blank)
    alphas, nll = _alpha_scan(log_probs, input_lengths, label_lengths, ext,
                              valid_s, ext_onehot, can_skip)
    return nll, (log_probs, input_lengths, labels, label_lengths, alphas, nll)


def _ctc_bwd(blank, res, g):
    log_probs, input_lengths, labels, label_lengths, alphas, nll = res
    _, valid_s, ext_onehot, can_skip = _prep(
        log_probs, labels, label_lengths, blank)
    betas = _beta_scan(log_probs, input_lengths, label_lengths, valid_s,
                       ext_onehot, can_skip)

    # Emission at (t, s) — subtract once (alpha and beta both include it).
    emit = jnp.einsum("bsc,tbc->tbs", ext_onehot, log_probs)
    gamma = alphas + betas - emit                              # (T, B, S)
    # Posterior weight of slot s at time t (<= 1 up to rounding).
    w = jnp.exp(jnp.minimum(gamma + nll[None, :, None], 20.0))
    w = jnp.where((alphas <= LOG_EPS / 2) | (betas <= LOG_EPS / 2), 0.0, w)
    dlp = -jnp.einsum("tbs,bsc->tbc", w, ext_onehot)

    t_idx = jnp.arange(log_probs.shape[0])[:, None]
    valid_t = (t_idx < input_lengths[None, :])                 # (T, B)
    feasible = nll < -LOG_EPS / 2                              # p > 0
    dlp = jnp.where((valid_t & feasible[None, :])[..., None], dlp, 0.0)
    dlp = dlp * g[None, :, None]

    zero_int = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dlp.astype(log_probs.dtype), zero_int(input_lengths),
            zero_int(labels), zero_int(label_lengths))


_ctc_loss_vjp.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_scan(
    log_probs: jnp.ndarray,
    input_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """The same forward recursion with gradients from autodiff through the
    scan — kept as the cross-validation reference for the custom VJP."""
    ext, valid_s, ext_onehot, can_skip = _prep(
        log_probs, labels, label_lengths, blank)
    _, nll = _alpha_scan(log_probs, input_lengths, label_lengths, ext,
                         valid_s, ext_onehot, can_skip)
    return nll


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
