"""Pallas LSTM kernel: forward parity with the scan path and custom-VJP
gradient parity with autodiff (runs in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdd_tpu.ops.lstm import bilstm
from mdd_tpu.ops.lstm_pallas import bilstm_pallas, lstm_seq


def _weights(rng, d_in, h):
    s = 1.0 / np.sqrt(h)
    mk = lambda *shape: jnp.asarray(
        rng.uniform(-s, s, shape).astype(np.float32))
    return (mk(d_in, 4 * h), mk(h, 4 * h), mk(d_in, 4 * h), mk(h, 4 * h))


def test_forward_matches_scan():
    rng = np.random.default_rng(0)
    t, b, d_in, h = 12, 4, 16, 8
    x = jnp.asarray(rng.standard_normal((t, b, d_in)).astype(np.float32))
    wf, whf, wb, whb = _weights(rng, d_in, h)
    ref = bilstm(x, wf, whf, wb, whb)
    out = bilstm_pallas(x, wf, whf, wb, whb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_forward_with_bias_matches_scan():
    rng = np.random.default_rng(1)
    t, b, d_in, h = 7, 3, 10, 6
    x = jnp.asarray(rng.standard_normal((t, b, d_in)).astype(np.float32))
    wf, whf, wb, whb = _weights(rng, d_in, h)
    bf = jnp.asarray(rng.standard_normal(4 * h).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal(4 * h).astype(np.float32))
    ref = bilstm(x, wf, whf, wb, whb, bf, bb)
    out = bilstm_pallas(x, wf, whf, wb, whb, bf, bb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_autodiff():
    """custom_vjp backward kernel vs jax autodiff through the scan."""
    rng = np.random.default_rng(2)
    t, d, b, h = 6, 2, 3, 4
    x_proj = jnp.asarray(
        rng.standard_normal((t, d, b, 4 * h)).astype(np.float32))
    w_hh = jnp.asarray(
        (rng.standard_normal((d, h, 4 * h)) * 0.3).astype(np.float32))

    def loss_pallas(xp, w):
        return jnp.sum(jnp.tanh(lstm_seq(xp, w)) * 0.7)

    def loss_scan(xp, w):
        from mdd_tpu.ops.lstm import lstm_scan

        outs = []
        for dd in range(d):
            outs.append(lstm_scan(xp[:, dd], w[dd]))
        hs = jnp.stack(outs, axis=1)
        return jnp.sum(jnp.tanh(hs) * 0.7)

    v1, g1 = jax.value_and_grad(loss_pallas, argnums=(0, 1))(x_proj, w_hh)
    v2, g2 = jax.value_and_grad(loss_scan, argnums=(0, 1))(x_proj, w_hh)
    assert float(v1) == pytest.approx(float(v2), abs=1e-4)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=1e-4, rtol=1e-3)


def test_gradient_through_bilstm_facade():
    rng = np.random.default_rng(3)
    t, b, d_in, h = 5, 2, 8, 4
    x = jnp.asarray(rng.standard_normal((t, b, d_in)).astype(np.float32))
    wf, whf, wb, whb = _weights(rng, d_in, h)

    g_pallas = jax.grad(
        lambda w: jnp.sum(bilstm_pallas(x, wf, w, wb, whb) ** 2))(whf)
    g_scan = jax.grad(
        lambda w: jnp.sum(bilstm(x, wf, w, wb, whb) ** 2))(whf)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_scan),
                               atol=1e-4, rtol=1e-3)


def test_model_with_pallas_lstm_matches_scan_model():
    """Full CTCAttentionModel forward: pallas-LSTM config == scan config."""
    from mdd_tpu.models.ctc_model import CTCAttentionModel, ModelConfig

    rng = np.random.default_rng(4)
    base = dict(input_dim=24, num_class=8, rnn_hidden_size=8,
                rnn_layers=2, text_embed_size=8)
    feats = jnp.asarray(rng.standard_normal((2, 16, 24)).astype(np.float32))
    trans = jnp.asarray(rng.integers(2, 8, (2, 4)).astype(np.int32))
    tl = jnp.asarray([4, 4])

    m1 = CTCAttentionModel(ModelConfig(**base, use_pallas_lstm=False))
    v = m1.init(jax.random.key(0), feats, trans, tl)
    out1 = m1.apply(v, feats, trans, tl)

    m2 = CTCAttentionModel(ModelConfig(**base, use_pallas_lstm=True))
    out2 = m2.apply(v, feats, trans, tl)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               atol=1e-5, rtol=1e-5)
