"""Padded-row and multi-device equivalence of the DP train step.

The torch reference trains on true batch sizes (train_ctc.py:42-98); our
DP step pads ragged tail batches so B divides the mesh.  These tests pin
that padding is mathematically invisible:

  * a tail batch of 3 padded to 8 (8-device mesh) produces the same loss,
    gradients and batch-norm statistics as the unpadded batch of 3 on one
    device;
  * the padding rows' *content* is irrelevant (garbage rows == replicated
    rows);
  * a full batch on 1 device equals the same batch sharded over 8 devices
    (DP math correctness, SURVEY.md §2.4).

Gradients (not post-Adam params) are compared: parameters directly
feeding a BatchNorm (e.g. conv biases) have mathematically zero gradient,
so their computed grad is reduction-order noise at ~1e-10 — Adam amplifies
that noise's *sign* to a full +/-lr step, which no implementation choice
can make bitwise stable.  An absolute tolerance on gradients is the
correct invariant.
"""

import numpy as np
import jax
import pytest

from mdd_tpu.data.dataset import Batch, pad_batch_to
from mdd_tpu.models.ctc_model import ModelConfig
from mdd_tpu.train.loop import Trainer


def _small_cfg():
    # dropout=0 so padded/unpadded runs draw identical dropout masks
    # (a (B,...)-shaped mask differs by construction when B differs).
    return ModelConfig(input_dim=24, num_class=12, rnn_hidden_size=16,
                       rnn_layers=2, text_embed_size=16, dropout=0.0)


def _batch(b, cfg, t=32, l=6, seed=0):
    rng = np.random.default_rng(seed)
    return Batch(
        inputs=rng.standard_normal((b, t, cfg.input_dim)).astype(np.float32),
        input_fracs=np.full((b,), 1.0, np.float32),
        targets=rng.integers(2, cfg.num_class, (b, l)).astype(np.int32),
        target_sizes=np.full((b,), l, np.int32),
        trans=rng.integers(2, cfg.num_class, (b, l)).astype(np.int32),
        trans_sizes=np.full((b,), l, np.int32),
        utt_ids=[f"u{i}" for i in range(b)],
    )


def _loss_grads_stats(trainer, batch, valid=None):
    """Jit-compiled loss + grads + updated BN stats under the trainer's
    mesh sharding (the same SPMD partitioning the real train step uses)."""
    arrays = trainer._batch_arrays(batch, valid)
    state = trainer.state

    def lf(params):
        loss, (stats, _, _) = trainer._loss_and_out(
            params, state.batch_stats, arrays, jax.random.key(42), True)
        return loss, stats

    (loss, stats), grads = jax.jit(
        jax.value_and_grad(lf, has_aux=True))(state.params)
    return float(loss), jax.device_get(grads), jax.device_get(stats)


def _tree_allclose(a, b, atol=1e-5, rtol=1e-4):
    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=rtol)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tail_batch_padding_matches_unpadded():
    cfg = _small_cfg()
    batch3 = _batch(3, cfg)

    t1 = Trainer(cfg, n_devices=1, seed=7, sample_t=32, sample_l=6)
    loss1, grads1, stats1 = _loss_grads_stats(t1, batch3)

    t8 = Trainer(cfg, n_devices=8, seed=7, sample_t=32, sample_l=6)
    padded, valid = pad_batch_to(batch3, 8)
    loss8, grads8, stats8 = _loss_grads_stats(t8, padded, valid)

    assert np.isclose(loss1, loss8, atol=1e-4)
    _tree_allclose(grads1, grads8)
    _tree_allclose(stats1, stats8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_padding_content_is_irrelevant():
    cfg = _small_cfg()
    batch3 = _batch(3, cfg)
    padded, valid = pad_batch_to(batch3, 8)

    # replace the replicated padding rows with garbage
    garbage = _batch(8, cfg, seed=99)
    mixed = Batch(
        inputs=np.where(valid[:, None, None], padded.inputs, garbage.inputs),
        input_fracs=padded.input_fracs,
        targets=np.where(valid[:, None], padded.targets, garbage.targets),
        target_sizes=padded.target_sizes,
        trans=np.where(valid[:, None], padded.trans, garbage.trans),
        trans_sizes=padded.trans_sizes,
        utt_ids=padded.utt_ids,
    )

    t8 = Trainer(cfg, n_devices=8, seed=7, sample_t=32, sample_l=6)
    loss_a, grads_a, stats_a = _loss_grads_stats(t8, padded, valid)
    loss_b, grads_b, stats_b = _loss_grads_stats(t8, mixed, valid)

    assert np.isclose(loss_a, loss_b, atol=1e-5)
    _tree_allclose(grads_a, grads_b)
    _tree_allclose(stats_a, stats_b)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_one_device_equals_eight_devices():
    """Same full batch, same seed: DP over 8 devices == 1 device."""
    cfg = _small_cfg()
    batch8 = _batch(8, cfg)

    t1 = Trainer(cfg, n_devices=1, seed=7, sample_t=32, sample_l=6)
    loss1, grads1, stats1 = _loss_grads_stats(t1, batch8)

    t8 = Trainer(cfg, n_devices=8, seed=7, sample_t=32, sample_l=6)
    loss8, grads8, stats8 = _loss_grads_stats(t8, batch8)

    assert np.isclose(loss1, loss8, rtol=1e-5)
    _tree_allclose(grads1, grads8)
    _tree_allclose(stats1, stats8)


def test_eval_step_masks_padding_loss():
    """Eval loss of a padded batch equals eval loss of the true batch."""
    cfg = _small_cfg()
    batch3 = _batch(3, cfg)
    import jax
    import jax.numpy as jnp

    from mdd_tpu.parallel.mesh import replicated

    t1 = Trainer(cfg, n_devices=1, seed=7, sample_t=32, sample_l=6)
    eval_fn = t1._step_fn(False)
    zeros = lambda: jax.device_put(jnp.zeros(4, jnp.float32),
                                   replicated(t1.mesh))
    acc_true = eval_fn(t1.state, t1._batch_arrays(batch3), zeros())
    padded, valid = pad_batch_to(batch3, 8)
    acc_pad = eval_fn(t1.state, t1._batch_arrays(padded, valid), zeros())
    assert np.isclose(float(acc_true[0]), float(acc_pad[0]), atol=1e-5)
    # WER tallies must also ignore the padding rows
    assert float(acc_true[1]) == float(acc_pad[1])
    assert float(acc_true[2]) == float(acc_pad[2])
