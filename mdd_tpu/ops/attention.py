"""Dot-product text attention (acoustic queries over canonical-phone keys).

The reference computes attn = softmax(x @ key^T) and context = attn @ value
with key = Linear(value) over the text-encoder output (model_ctc.py:201-207)
— unmasked, so padded text positions participate in the softmax.  We default
to masked attention (padded canonical positions excluded) because it is
strictly more correct for variable-length prompts, with an escape hatch for
bug-parity experiments.

No custom kernel needed here: at L ~= 48 canonical positions the score
and context matmuls are small enough that XLA fuses the whole
softmax-attention into a handful of MXU ops — a Pallas/flash-style
kernel only pays off when the L x T score matrix stops fitting VMEM.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn


def dot_attention(
    queries: jnp.ndarray,
    keys: jnp.ndarray,
    values: jnp.ndarray,
    key_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, D) x (B, L, D) x (B, L, V) -> context (B, T, V), weights (B, T, L)."""
    scores = jnp.einsum("btd,bld->btl", queries, keys,
                        preferred_element_type=jnp.float32)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, :], scores, -1e30)
    weights = nn.softmax(scores, axis=-1)
    context = jnp.einsum("btl,blv->btv", weights, values,
                         preferred_element_type=jnp.float32)
    return context.astype(values.dtype), weights
