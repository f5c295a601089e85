"""Fused dropout: TPU-PRNG mask generated and applied inside one kernel.

XLA's dropout lowers to RngBitGenerator + compare + select; the random
bits are a separate HLO whose uint32 output (4 bytes per masked element)
round-trips HBM, and the bool mask is saved as an autodiff residual for
the backward pass.  At this model's scale (~500M masked elements per
training step across the conv and BiLSTM dropout sites — VALIDATION.md
round-2 accounting put the cost at ~14 ms of an 81 ms step) those streams
are pure bandwidth waste: the mask is a deterministic function of a
32-bit seed.

This op regenerates the mask from the seed on both passes:

  forward:   out = where(bits(seed) < keep_threshold, x / keep, 0)
  backward:  dx  = where(bits(seed) < keep_threshold, dy / keep, 0)

so the only residual is the scalar seed — no mask tensor, no bits tensor,
no extra HBM traffic beyond the unavoidable read-x/write-out.  The input
is viewed as (M, 128) lanes and processed in VMEM blocks; each grid block
seeds its own PRNG stream (seed + block index) so masks are independent
across blocks and reproducible across passes.

Off-TPU (CPU tests) falls back to the numerically-equivalent
jax.random.bernoulli formulation — identical contract, different mask
pattern (dropout is stochastic; no caller depends on the exact pattern).

MEASURED OUTCOME (v5e, round 3 — see VALIDATION.md "Dropout roofline"):
this kernel is correct but SLOWER than XLA's rbg dropout — Mosaic's
`prng_random_bits` lowers to a software PRNG (~18-22 ms to mask the
320M-element conv activation at any block geometry) while XLA's
RngBitGenerator uses the dedicated hardware RNG (~4 ms for the same
masking, fused into the elementwise chain).  Total dropout cost in the
production step is 9.6 ms of 81.7 (measured dropout=0 floor: 72.1 ms),
dominated by the unavoidable activation read/write around each site,
not by mask generation.  `ModelConfig.use_fused_dropout` therefore
defaults to False; the kernel is kept as the reference implementation
for hardware generations where the tradeoff flips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 1024      # (1024, 128) block: 256 KB f32 / 128 KB bf16


def _kernel(seed_ref, x_ref, o_ref, *, threshold: int, inv_keep: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = bits < jnp.uint32(threshold)
    o_ref[:] = jnp.where(keep, x_ref[:] * jnp.asarray(inv_keep, x_ref.dtype),
                         jnp.zeros((), x_ref.dtype))


def _apply(x: jnp.ndarray, seed: jnp.ndarray, rate: float) -> jnp.ndarray:
    keep = 1.0 - rate
    # P(keep) = threshold / 2^32 over uniform uint32 bits
    threshold = min(int(round(keep * 2.0 ** 32)), 2 ** 32 - 1)
    shape = x.shape
    flat = x.reshape(-1)
    n = flat.shape[0]
    block = _BLOCK_ROWS * _LANES
    pad = (-n) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    m = flat.shape[0] // _LANES
    view = flat.reshape(m, _LANES)
    grid = m // _BLOCK_ROWS
    out = pl.pallas_call(
        functools.partial(_kernel, threshold=threshold,
                          inv_keep=1.0 / keep),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(view.shape, x.dtype),
    )(seed.reshape(1), view)
    return out.reshape(-1)[:n].reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_dropout_tpu(x, seed, rate: float):
    return _apply(x, seed, rate)


def _fwd(x, seed, rate):
    return _apply(x, seed, rate), seed


def _bwd(rate, seed, dy):
    # same seed, same shape -> bit-identical mask as the forward pass
    return _apply(dy, seed, rate), None


_fused_dropout_tpu.defvjp(_fwd, _bwd)


def fused_dropout(x: jnp.ndarray, key: jax.Array, rate: float) -> jnp.ndarray:
    """Dropout with in-kernel mask generation (see module docstring).

    `key` is a jax PRNG key (any impl); a 32-bit seed is folded out of
    its key data, so distinct flax rng streams give independent masks.
    """
    if rate <= 0.0:
        return x
    if rate >= 1.0:
        return jnp.zeros_like(x)
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    seed = data[-1]
    if data.shape[0] > 1:
        seed = seed ^ (data[-2] * jnp.uint32(2654435761))
    seed = seed.astype(jnp.int32)
    if jax.default_backend() != "tpu":
        # CPU/GPU fallback: same contract via the standard formulation
        keep = jax.random.bernoulli(jax.random.wrap_key_data(
            jax.random.key_data(key)), 1.0 - rate, x.shape)
        return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype),
                         jnp.zeros((), x.dtype))
    return _fused_dropout_tpu(x, seed, rate)
