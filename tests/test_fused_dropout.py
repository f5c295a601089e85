"""Fused-dropout contract tests (CPU fallback path; the Pallas kernel's
TPU behavior — exact keep rate, bit-consistent fwd/bwd masks — is
validated on hardware, see VALIDATION.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from mdd_tpu.models.ctc_model import CTCAttentionModel, ModelConfig
from mdd_tpu.ops.dropout_pallas import fused_dropout


def test_fallback_statistics_and_scaling():
    key = jax.random.key(0)
    x = jnp.ones((64, 256), jnp.float32)
    y = np.asarray(fused_dropout(x, key, 0.2))
    zero_frac = (y == 0).mean()
    assert abs(zero_frac - 0.2) < 0.02
    nz = y[y != 0]
    np.testing.assert_allclose(nz, 1.25, rtol=1e-6)


def test_fallback_fwd_bwd_mask_consistent():
    key = jax.random.key(3)
    x = jnp.ones((32, 128), jnp.float32)
    y = np.asarray(fused_dropout(x, key, 0.3))
    g = np.asarray(jax.grad(
        lambda x: fused_dropout(x, key, 0.3).sum())(x))
    np.testing.assert_array_equal(g, y)


def test_rate_zero_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(
        np.asarray(fused_dropout(x, jax.random.key(0), 0.0)),
        np.asarray(x))


def test_model_runs_with_fused_dropout():
    """use_fused_dropout=True trains end-to-end (fallback on CPU) and
    produces finite grads; eval mode is dropout-free and deterministic."""
    cfg = ModelConfig(input_dim=24, num_class=8, rnn_hidden_size=8,
                      rnn_layers=2, text_embed_size=8,
                      use_fused_dropout=True)
    model = CTCAttentionModel(cfg)
    feats = jnp.ones((2, 16, 24))
    trans = jnp.ones((2, 4), jnp.int32)
    tl = jnp.full((2,), 4, jnp.int32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           feats, trans, tl, train=False)

    def loss(params):
        lp, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, trans, tl, train=True,
            rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"])
        return lp.sum()

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(g))
    # eval: no rng needed, deterministic
    a = model.apply(variables, feats, trans, tl, train=False)
    b = model.apply(variables, feats, trans, tl, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
