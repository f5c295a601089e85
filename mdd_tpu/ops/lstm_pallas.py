"""Pallas TPU kernel for the fused bidirectional LSTM recurrence.

The lax.scan LSTM (ops/lstm.py) re-stages its operands every iteration;
this kernel exploits the TPU grid's sequential execution to keep the
recurrent weights and the (h, c) state VMEM-resident across all T steps:

  * grid = (B/B_TILE, T), batch-major: for each batch tile the whole
    time recurrence runs before moving on, with the (h, c) state living
    in scratch (reset at t == 0) — state never round-trips to HBM
    between timesteps;
  * w_hh (2, H, 4H) is loaded into VMEM once and reused by every step;
  * batch tiling keeps per-iteration VMEM blocks within the ~16 MB
    budget at any batch size (a single-tile version OOMs at B=512);
  * per step: two (B_TILE, H) @ (H, 4H) MXU dots (one per direction)
    plus VPU gate math — bit-compatible with ops/lstm.bilstm;
  * backward is a second Pallas kernel walking time in reverse,
    recomputing gates from saved (h, c) and accumulating dW_hh in a
    VMEM scratch across the entire grid (custom_vjp wires it up).

Same (T, 2, B, 4H) layout as the scan path: direction axis separate
from batch so DP sharding never re-shards inside the kernel.  Falls
back to interpret mode off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Batch tile sizes by compute dtype.  bf16 halves every VMEM block, so
# the tiles can fill (or double-pump) the 128-row MXU systolic array; the
# f32 tiles are the largest that fit the 16 MB VMEM budget (f32 at
# B_TILE_BWD=128 needs 18.75 MB and OOMs).  Backward needs ~2x the live
# blocks (saved activations + the dW accumulator), hence smaller tiles.
_TILES = {
    jnp.dtype(jnp.bfloat16): (256, 64),
    jnp.dtype(jnp.float32): (64, 32),
}


def _tiles(dtype) -> tuple[int, int]:
    return _TILES.get(jnp.dtype(dtype), (64, 32))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sigmoid(x):
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(xp_ref, whh_ref, hs_ref, cs_ref, h_scr, c_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    xp = xp_ref[0]            # (2, B_TILE, 4H), compute dtype
    h = h_scr[:]              # (2, B_TILE, H), compute dtype
    c = c_scr[:]              # (2, B_TILE, H), float32
    # dot operands stay in the compute dtype (bf16 on bfloat16 runs —
    # full-rate MXU); accumulation and gate math are always float32.
    gates = xp.astype(jnp.float32) + jnp.concatenate(
        [jnp.dot(h[d], whh_ref[d], preferred_element_type=jnp.float32)[None]
         for d in range(2)], axis=0)
    hdim = h.shape[-1]
    i = _sigmoid(gates[..., :hdim])
    f = _sigmoid(gates[..., hdim:2 * hdim])
    g = jnp.tanh(gates[..., 2 * hdim:3 * hdim])
    o = _sigmoid(gates[..., 3 * hdim:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h_scr[:] = h_new.astype(h_scr.dtype)
    c_scr[:] = c_new.astype(c_scr.dtype)
    hs_ref[0] = h_new.astype(hs_ref.dtype)
    cs_ref[0] = c_new.astype(cs_ref.dtype)


def _pad_batch(x, bt):
    b = x.shape[2]
    pad = (-b) % bt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x, b


def _lstm_seq_fwd(x_proj: jnp.ndarray, w_hh: jnp.ndarray):
    """(T, 2, B, 4H), (2, H, 4H) -> (hs, cs) each (T, 2, B, H).

    Runs in x_proj's dtype: on bfloat16 runs the recurrent dots are
    bf16 x bf16 -> f32 (full-rate MXU) and the hs/cs streams written to
    HBM are bf16 (half the bandwidth); the cell state and all gate math
    stay float32 in VMEM.  float32 inputs reproduce the float32 kernel
    exactly (the CPU-interpret test path).
    """
    dtype = x_proj.dtype
    B_TILE, _ = _tiles(dtype)
    x_proj, b_orig = _pad_batch(x_proj, B_TILE)
    t, d, b, four_h = x_proj.shape
    h = four_h // 4
    nb = b // B_TILE
    out_shape = jax.ShapeDtypeStruct((t, d, b, h), dtype)
    blk = lambda i, j: (j, 0, i, 0)   # grid (nb, t): batch-major
    hs, cs = pl.pallas_call(
        _fwd_kernel,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((1, d, B_TILE, four_h), blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d, B_TILE, h), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, B_TILE, h), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((d, B_TILE, h), dtype),
            pltpu.VMEM((d, B_TILE, h), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_proj, w_hh.astype(dtype))
    return hs[:, :, :b_orig], cs[:, :, :b_orig]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(xp_ref, whh_ref, cs_ref, hprev_ref, cprev_ref,
                dhs_ref, dxp_ref, dwhh_ref, dh_scr, dc_scr, dwacc_scr):
    bi = pl.program_id(0)
    step = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)

    @pl.when(step == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    @pl.when((step == 0) & (bi == 0))
    def _():
        dwacc_scr[:] = jnp.zeros_like(dwacc_scr)

    xp = xp_ref[0]                       # (2, B_TILE, 4H), compute dtype
    h_prev = hprev_ref[0]                # (2, B_TILE, H), compute dtype
    c_prev = cprev_ref[0].astype(jnp.float32)
    c_t = cs_ref[0].astype(jnp.float32)
    dh_total = dhs_ref[0] + dh_scr[:]
    hdim = h_prev.shape[-1]

    # recompute gates (same dots as forward: operands in compute dtype,
    # float32 accumulation/gate math)
    gates = xp.astype(jnp.float32) + jnp.concatenate(
        [jnp.dot(h_prev[d], whh_ref[d],
                 preferred_element_type=jnp.float32)[None]
         for d in range(2)], axis=0)
    i = _sigmoid(gates[..., :hdim])
    f = _sigmoid(gates[..., hdim:2 * hdim])
    g = jnp.tanh(gates[..., 2 * hdim:3 * hdim])
    o = _sigmoid(gates[..., 3 * hdim:])

    tanh_c = jnp.tanh(c_t)
    do = dh_total * tanh_c
    dc = dh_total * o * (1.0 - tanh_c * tanh_c) + dc_scr[:]
    di = dc * g
    df = dc * c_prev
    dg = dc * i
    dgi = di * i * (1.0 - i)
    dgf = df * f * (1.0 - f)
    dgg = dg * (1.0 - g * g)
    dgo = do * o * (1.0 - o)
    dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)  # (2, Bt, 4H)

    dxp_ref[0] = dgates.astype(dxp_ref.dtype)
    # dh_prev = dgates @ W^T ; dW += h_prev^T @ dgates — dot operands in
    # the compute dtype, f32 accumulation (matches autodiff through a
    # bf16 scan, where the cotangents themselves are bf16)
    dg_lp = dgates.astype(whh_ref.dtype)
    dh_prev = jnp.concatenate(
        [jnp.dot(dg_lp[d], whh_ref[d].T,
                 preferred_element_type=jnp.float32)[None]
         for d in range(2)], axis=0)
    dwacc_scr[:] += jnp.concatenate(
        [jnp.dot(h_prev[d].T, dg_lp[d],
                 preferred_element_type=jnp.float32)[None]
         for d in range(2)], axis=0)
    dh_scr[:] = dh_prev
    dc_scr[:] = dc * f

    @pl.when((step == nt - 1) & (bi == nb - 1))
    def _():
        dwhh_ref[:] = dwacc_scr[:].astype(dwhh_ref.dtype)


def _lstm_seq_bwd(x_proj, w_hh, hs, cs, dhs):
    dtype = x_proj.dtype
    _, B_TILE_BWD = _tiles(dtype)
    x_proj, b_orig = _pad_batch(x_proj, B_TILE_BWD)
    hs, _ = _pad_batch(hs, B_TILE_BWD)
    cs, _ = _pad_batch(cs, B_TILE_BWD)
    dhs, _ = _pad_batch(dhs.astype(jnp.float32), B_TILE_BWD)
    t, d, b, four_h = x_proj.shape
    h = four_h // 4
    nb = b // B_TILE_BWD
    # h_{t-1}, c_{t-1} sequences (zeros at t=0)
    hprev = jnp.concatenate([jnp.zeros((1, d, b, h), hs.dtype), hs[:-1]])
    cprev = jnp.concatenate([jnp.zeros((1, d, b, h), cs.dtype), cs[:-1]])

    rev = lambda i, j: (t - 1 - j, 0, i, 0)   # time reversed per batch tile
    dxp, dwhh = pl.pallas_call(
        _bwd_kernel,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((1, d, B_TILE_BWD, four_h), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, B_TILE_BWD, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, B_TILE_BWD, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, B_TILE_BWD, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, B_TILE_BWD, h), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d, B_TILE_BWD, four_h), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, d, b, four_h), dtype),
            jax.ShapeDtypeStruct((d, h, four_h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, B_TILE_BWD, h), jnp.float32),
            pltpu.VMEM((d, B_TILE_BWD, h), jnp.float32),
            pltpu.VMEM((d, h, four_h), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_proj, w_hh.astype(dtype), cs, hprev, cprev, dhs)
    return dxp[:, :, :b_orig], dwhh


# ---------------------------------------------------------------------------
# custom-vjp wrapper + bilstm-compatible facade
# ---------------------------------------------------------------------------

@jax.custom_vjp
def lstm_seq(x_proj: jnp.ndarray, w_hh: jnp.ndarray) -> jnp.ndarray:
    """(T, 2, B, 4H) projections + (2, H, 4H) recurrent weights ->
    (T, 2, B, H) hidden states."""
    hs, _ = _lstm_seq_fwd(x_proj, w_hh)
    return hs


def _vjp_fwd(x_proj, w_hh):
    hs, cs = _lstm_seq_fwd(x_proj, w_hh)
    return hs, (x_proj, w_hh, hs, cs)


def _vjp_bwd(res, dhs):
    x_proj, w_hh, hs, cs = res
    dxp, dwhh = _lstm_seq_bwd(x_proj, w_hh, hs, cs, dhs)
    return dxp.astype(x_proj.dtype), dwhh.astype(w_hh.dtype)


lstm_seq.defvjp(_vjp_fwd, _vjp_bwd)


def bilstm_pallas(
    x: jnp.ndarray,
    w_ih_fwd: jnp.ndarray, w_hh_fwd: jnp.ndarray,
    w_ih_bwd: jnp.ndarray, w_hh_bwd: jnp.ndarray,
    b_fwd: jnp.ndarray | None = None,
    b_bwd: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for ops.lstm.bilstm using the Pallas kernel."""
    xf = jnp.dot(x, w_ih_fwd, preferred_element_type=jnp.float32)
    xb = jnp.dot(jnp.flip(x, axis=0), w_ih_bwd,
                 preferred_element_type=jnp.float32)
    if b_fwd is not None:
        xf = xf + b_fwd
    if b_bwd is not None:
        xb = xb + b_bwd
    # keep the projection stream in the compute dtype (bf16 halves the
    # kernel's HBM traffic; the scan path stores xp in x.dtype too)
    x_proj = jnp.stack([xf, xb], axis=1).astype(x.dtype)
    w_hh = jnp.stack([w_hh_fwd, w_hh_bwd])
    hs = lstm_seq(x_proj, w_hh)
    fwd = hs[:, 0]
    bwd = jnp.flip(hs[:, 1], axis=0)
    return jnp.concatenate([fwd, bwd], axis=-1).astype(x.dtype)
