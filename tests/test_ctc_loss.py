"""CTC loss: brute-force path enumeration + optax cross-validation."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mdd_tpu.ops.ctc_loss import ctc_loss, ctc_loss_scan, ctc_loss_sum_mean


def brute_force_ctc_nll(log_probs, label, blank=0):
    """-log sum over all alignments collapsing to `label` (tiny T, C only)."""
    t, c = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(c), repeat=t):
        # collapse: remove repeats then blanks
        collapsed = []
        prev = None
        for p in path:
            if p != prev:
                collapsed.append(p)
            prev = p
        collapsed = [p for p in collapsed if p != blank]
        if collapsed == list(label):
            lp = sum(log_probs[i, p] for i, p in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    t, c = 5, 4
    logits = rng.standard_normal((t, 1, c)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    for label in ([1], [1, 2], [2, 2], [1, 2, 3]):
        want = brute_force_ctc_nll(np.asarray(log_probs)[:, 0], label)
        labels = jnp.asarray([label + [0] * (3 - len(label))])
        got = ctc_loss(log_probs, jnp.asarray([t]), labels,
                       jnp.asarray([len(label)]))
        np.testing.assert_allclose(float(got[0]), want, rtol=1e-4)


def test_ctc_matches_optax_batched():
    rng = np.random.default_rng(3)
    t, b, c, l = 20, 4, 10, 6
    logits = rng.standard_normal((t, b, c)).astype(np.float32) * 2
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lengths = jnp.asarray([20, 17, 12, 9])
    label_lengths = jnp.asarray([6, 4, 3, 1])
    labels = jnp.asarray(rng.integers(1, c, size=(b, l)), dtype=jnp.int32)

    ours = ctc_loss(log_probs, input_lengths, labels, label_lengths)

    logit_paddings = (jnp.arange(t)[None, :] >= input_lengths[:, None]).astype(jnp.float32)
    label_paddings = (jnp.arange(l)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    ref = optax.ctc_loss(jnp.asarray(logits).swapaxes(0, 1), logit_paddings,
                         labels, label_paddings, blank_id=0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


def test_ctc_gradients_flow_and_match_optax():
    rng = np.random.default_rng(4)
    t, b, c, l = 12, 2, 6, 4
    logits = jnp.asarray(rng.standard_normal((t, b, c)).astype(np.float32))
    input_lengths = jnp.asarray([12, 8])
    labels = jnp.asarray(rng.integers(1, c, size=(b, l)), dtype=jnp.int32)
    label_lengths = jnp.asarray([4, 2])

    def ours_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return jnp.sum(ctc_loss(lp, input_lengths, labels, label_lengths))

    def optax_fn(lg):
        logit_paddings = (jnp.arange(t)[None, :] >= input_lengths[:, None]).astype(jnp.float32)
        label_paddings = (jnp.arange(l)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
        return jnp.sum(optax.ctc_loss(lg.swapaxes(0, 1), logit_paddings,
                                      labels, label_paddings, blank_id=0))

    g1 = jax.grad(ours_fn)(logits)
    g2 = jax.grad(optax_fn)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


@pytest.mark.parametrize("seed", [0, 7])
def test_custom_vjp_matches_scan_autodiff(seed):
    """The analytic alpha-beta gradient must equal autodiff through the
    forward scan — incl. ragged input/label lengths and zero-length
    labels."""
    rng = np.random.default_rng(seed)
    t, b, c, l = 15, 5, 7, 5
    logits = jnp.asarray(rng.standard_normal((t, b, c)).astype(np.float32) * 2)
    input_lengths = jnp.asarray([15, 11, 15, 3, 1])
    labels = jnp.asarray(rng.integers(1, c, size=(b, l)), dtype=jnp.int32)
    # include a repeated label (skip-blocked) and a zero-length label
    labels = labels.at[2, 1].set(labels[2, 0])
    label_lengths = jnp.asarray([5, 3, 4, 1, 0])
    cot = jnp.asarray(rng.standard_normal(b).astype(np.float32))

    def make(fn):
        def f(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return jnp.sum(cot * fn(lp, input_lengths, labels, label_lengths))
        return f

    l1, g1 = jax.value_and_grad(make(ctc_loss))(logits)
    l2, g2 = jax.value_and_grad(make(ctc_loss_scan))(logits)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-3)


def test_custom_vjp_impossible_label_grad_is_zero():
    logits = jnp.zeros((2, 1, 4))

    def f(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return jnp.sum(ctc_loss(lp, jnp.asarray([2]),
                                jnp.asarray([[1, 2, 3]]), jnp.asarray([3])))

    g = jax.grad(f)(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_ctc_impossible_label_is_large():
    # label longer than frames -> no valid alignment -> huge loss
    log_probs = jax.nn.log_softmax(jnp.zeros((2, 1, 4)), axis=-1)
    loss = ctc_loss(log_probs, jnp.asarray([2]),
                    jnp.asarray([[1, 2, 3]]), jnp.asarray([3]))
    assert float(loss[0]) > 1e20


def test_sum_mean_reduction():
    rng = np.random.default_rng(5)
    log_probs = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((10, 3, 5)).astype(np.float32)), axis=-1)
    il = jnp.asarray([10, 10, 10])
    labels = jnp.asarray([[1, 2], [3, 4], [2, 1]])
    ll = jnp.asarray([2, 2, 2])
    per = ctc_loss(log_probs, il, labels, ll)
    agg = ctc_loss_sum_mean(log_probs, il, labels, ll)
    np.testing.assert_allclose(float(agg), float(jnp.sum(per)) / 3, rtol=1e-6)
