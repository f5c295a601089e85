"""Training tests: plateau machine semantics, synthetic-task learning,
DP-sharded step on the virtual 8-device mesh, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdd_tpu.data.dataset import Batch
from mdd_tpu.models.ctc_model import ModelConfig
from mdd_tpu.train.loop import Trainer
from mdd_tpu.train.plateau import PlateauAction, PlateauScheduler


def test_plateau_machine_reference_semantics():
    s = PlateauScheduler(init_lr=1.0, decay=0.5, end_adjust_acc=2.0,
                         patience=3, max_adjust_times=2)
    # big improvement -> snapshot, counter reset
    a = s.step(100.0, 0.1)
    assert a & PlateauAction.SNAPSHOT_LOSS and s.adjust_rate_count == 0
    # inside the band (no improvement) x patience -> decay+restore
    a = s.step(101.0, 0.1)
    assert s.adjust_rate_count == 1 and not (a & PlateauAction.DECAY_AND_RESTORE)
    a = s.step(100.5, 0.1)
    a = s.step(101.5, 0.1)
    assert a & PlateauAction.DECAY_AND_RESTORE
    assert s.learning_rate == 0.5 and s.adjust_time == 1
    # inside-band improvement refreshes the true-best snapshot
    a = s.step(99.0, 0.2)
    assert a & PlateauAction.SNAPSHOT_LOSS and a & PlateauAction.SNAPSHOT_ACC
    # a regression far outside the band jumps the counter to patience
    a = s.step(200.0, 0.1)
    assert a & PlateauAction.DECAY_AND_RESTORE
    assert a & PlateauAction.STOP and s.stopped
    assert s.learning_rate == 0.25


# ---------------------------------------------------------------------------
# synthetic learnable task
# ---------------------------------------------------------------------------
N_PHONES = 6          # ids 2..7 (0=blank, 1=UNK)
FRAMES_PER_PHONE = 4  # -> 2 output frames per phone after conv downsample 2
FEAT_DIM = 24


def synth_batch(rng, batch_size, n_labels=4):
    """Features encode the phone sequence directly; CTC must learn the map."""
    t = n_labels * FRAMES_PER_PHONE
    feats = np.zeros((batch_size, t, FEAT_DIM), np.float32)
    labels = rng.integers(2, 2 + N_PHONES, size=(batch_size, n_labels))
    for b in range(batch_size):
        for i, p in enumerate(labels[b]):
            feats[b, i * FRAMES_PER_PHONE:(i + 1) * FRAMES_PER_PHONE, p] = 4.0
    feats += rng.standard_normal(feats.shape).astype(np.float32) * 0.1
    return Batch(
        inputs=feats,
        input_fracs=np.ones(batch_size, np.float32),
        targets=labels.astype(np.int32),
        target_sizes=np.full(batch_size, n_labels, np.int32),
        trans=labels.astype(np.int32),
        trans_sizes=np.full(batch_size, n_labels, np.int32),
        utt_ids=[f"synth{b}" for b in range(batch_size)],
    )


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = ModelConfig(input_dim=FEAT_DIM, num_class=2 + N_PHONES,
                      rnn_hidden_size=32, rnn_layers=2, text_embed_size=16,
                      text_vocab_size=16, dropout=0.0)
    return Trainer(cfg, init_lr=3e-3, weight_decay=0.0, n_devices=8,
                   sample_t=16, sample_l=4)


def test_synthetic_task_learns(tiny_trainer):
    trainer = tiny_trainer
    rng = np.random.default_rng(0)
    batches = [synth_batch(rng, 16) for _ in range(12)]
    acc0, loss0 = trainer.run_epoch(batches, 1, train=True, log=lambda *a: None)
    losses = [loss0]
    for epoch in range(2, 14):
        _, loss = trainer.run_epoch(batches, epoch, train=True,
                                    log=lambda *a: None)
        losses.append(loss)
    acc, dev_loss = trainer.run_epoch(batches, 99, train=False,
                                      log=lambda *a: None)
    assert dev_loss < losses[0] * 0.35, f"loss did not drop: {losses}"
    assert acc > 0.6, f"greedy accuracy too low: {acc}"


def test_add_weight_noise_perturbs_every_param(tiny_trainer):
    """Working port of the reference's dead `add_weights_noise`
    (model_ctc.py:246-249 — never called, and a no-op even if called)."""
    before = jax.device_get(tiny_trainer.state.params)
    tiny_trainer.add_weight_noise(std=0.01)
    after = jax.device_get(tiny_trainer.state.params)
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        diff = np.asarray(a) - np.asarray(b)
        assert np.any(diff != 0)
        assert np.abs(diff).max() < 0.1          # noise at the right scale
    # restore so the module-scoped fixture stays usable by other tests
    from mdd_tpu.parallel.mesh import replicated

    tiny_trainer.state = jax.device_put(
        tiny_trainer.state.replace(params=before),
        replicated(tiny_trainer.mesh))


def test_large_vocab_trains():
    """>255-class vocabs are supported: the old uint8 train-WER fetch is
    gone (WER now computed on device in int32, ops/wer.py)."""
    cfg = ModelConfig(input_dim=FEAT_DIM, num_class=300,
                      rnn_hidden_size=8, rnn_layers=1,
                      text_vocab_size=302)
    trainer = Trainer(cfg, sample_t=8, sample_l=4)
    rng = np.random.default_rng(0)
    batch = Batch(
        inputs=rng.standard_normal((8, 8, FEAT_DIM)).astype(np.float32),
        input_fracs=np.ones(8, np.float32),
        targets=rng.integers(2, 300, (8, 4)).astype(np.int32),
        target_sizes=np.full(8, 4, np.int32),
        trans=rng.integers(2, 300, (8, 4)).astype(np.int32),
        trans_sizes=np.full(8, 4, np.int32),
        utt_ids=[f"u{i}" for i in range(8)])
    acc, loss = trainer.run_epoch([batch], epoch=1, train=True,
                                  log=lambda *_: None)
    assert np.isfinite(loss) and 0.0 <= 1.0 - acc <= 10.0


def test_state_is_sharded_over_mesh(tiny_trainer):
    # Params replicated over all 8 virtual devices.
    leaf = jax.tree.leaves(tiny_trainer.state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_checkpoint_roundtrip(tmp_path, tiny_trainer):
    from mdd_tpu.train.checkpoint import load_checkpoint

    trainer = tiny_trainer
    path = trainer.save(str(tmp_path), "exp", "best", epoch=3)
    state, meta = load_checkpoint(str(tmp_path / "exp"), "best")
    assert meta["epoch"] == 3
    assert meta["model_config"]["num_class"] == 2 + N_PHONES
    want = jax.device_get(trainer.state.params)
    got = state["params"]
    flat_w = jax.tree.leaves(want)
    flat_g = jax.tree.leaves(got)
    assert len(flat_w) == len(flat_g)
    for a, b in zip(flat_w, flat_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
