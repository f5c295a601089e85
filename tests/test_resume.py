"""Checkpoint-resume tests: save latest with optimizer state, restore,
continue training identically-shaped."""

import numpy as np
import pytest

from mdd_tpu.data.dataset import Batch
from mdd_tpu.models.ctc_model import ModelConfig
from mdd_tpu.train.loop import Trainer


def _tiny_cfg():
    return ModelConfig(input_dim=12, num_class=6, rnn_hidden_size=8,
                       rnn_layers=2, text_embed_size=8)


def _batch(rng, cfg, b=2, t=16, l=3):
    return Batch(
        inputs=rng.standard_normal((b, t, cfg.input_dim)).astype(np.float32),
        input_fracs=np.ones(b, np.float32),
        targets=rng.integers(2, cfg.num_class, (b, l)).astype(np.int32),
        target_sizes=np.full(b, l, np.int32),
        trans=rng.integers(2, cfg.num_class, (b, l)).astype(np.int32),
        trans_sizes=np.full(b, l, np.int32),
        utt_ids=[f"u{i}" for i in range(b)])


def test_save_restore_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    rng = np.random.default_rng(0)
    batch = _batch(rng, cfg)

    t1 = Trainer(cfg, n_devices=1, sample_t=16, sample_l=3)
    t1.run_epoch([batch], 1, True, log=lambda *_: None)
    t1.scheduler.learning_rate = 0.25e-3
    t1.scheduler.adjust_time = 3
    t1.loss_results = [5.0, 4.0]
    t1.save(str(tmp_path), "exp", "latest", epoch=2)

    t2 = Trainer(cfg, n_devices=1, sample_t=16, sample_l=3)
    epoch = t2.restore(str(tmp_path), "exp", "latest")
    assert epoch == 2
    assert t2.scheduler.learning_rate == pytest.approx(0.25e-3)
    assert t2.scheduler.adjust_time == 3
    assert t2.loss_results == [5.0, 4.0]

    import jax

    h1 = jax.device_get(t1.state)
    h2 = jax.device_get(t2.state)
    for a, b_ in zip(jax.tree.leaves(h1.params), jax.tree.leaves(h2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # optimizer state restored too (Adam moments differ from init zeros)
    m1 = jax.tree.leaves(h1.opt_state)
    m2 = jax.tree.leaves(h2.opt_state)
    assert any(np.abs(np.asarray(x)).sum() > 0
               for x in m1 if hasattr(x, "shape") and np.ndim(x) > 0)
    for a, b_ in zip(m1, m2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_fit_resume_continues(tmp_path):
    cfg = _tiny_cfg()
    rng = np.random.default_rng(1)
    batch = _batch(rng, cfg)

    t1 = Trainer(cfg, n_devices=1, sample_t=16, sample_l=3,
                 max_adjust_times=1, plateau_patience=1)
    t1.fit([batch], [batch], num_epochs=2,
           checkpoint_dir=str(tmp_path), exp_name="exp",
           log=lambda *_: None)

    t2 = Trainer(cfg, n_devices=1, sample_t=16, sample_l=3,
                 max_adjust_times=1, plateau_patience=1)
    logs = []
    t2.fit([batch], [batch], num_epochs=3,
           checkpoint_dir=str(tmp_path), exp_name="exp",
           log=logs.append, resume=True)
    assert any("resumed from epoch" in str(l) for l in logs)


def test_resume_fast_forwards_loader_epochs(tmp_path):
    """A resumed run must continue the original augmentation/shuffle rng
    sequence: after fit(resume=True) restores epoch k, the loaders'
    epoch counters sit at k (epoch k+1 consumes counter k), not 0
    (round-3 advisor finding — replaying epoch-1 SpecAugment/mutation
    streams made resumed runs non-equivalent to uninterrupted ones)."""

    class CountingLoader:
        """Minimal loader recording which epoch counters were consumed."""

        batch_size = 2

        def __init__(self, batch):
            self.batch = batch
            self._epoch = 0
            self.consumed = []

        def set_epoch(self, epoch):
            self._epoch = int(epoch)

        def __iter__(self):
            self.consumed.append(self._epoch)
            self._epoch += 1
            yield self.batch

    cfg = _tiny_cfg()
    rng = np.random.default_rng(2)
    batch = _batch(rng, cfg)

    t1 = Trainer(cfg, n_devices=1, sample_t=16, sample_l=3)
    tl1, dl1 = CountingLoader(batch), CountingLoader(batch)
    t1.fit(tl1, dl1, num_epochs=3, checkpoint_dir=str(tmp_path),
           exp_name="exp", log=lambda *_: None)
    assert tl1.consumed[:3] == [0, 1, 2]

    t2 = Trainer(cfg, n_devices=1, sample_t=16, sample_l=3)
    tl2, dl2 = CountingLoader(batch), CountingLoader(batch)
    t2.fit(tl2, dl2, num_epochs=5, checkpoint_dir=str(tmp_path),
           exp_name="exp", log=lambda *_: None, resume=True)
    # resumed from epoch 3 -> epochs 4, 5 consume counters 3, 4
    assert tl2.consumed[:2] == [3, 4]
    assert dl2.consumed[:2] == [3, 4]


def test_threaded_loader_delegates_set_epoch():
    from mdd_tpu.data.prefetch import ThreadedLoader

    class Inner:
        _epoch = 0

        def set_epoch(self, e):
            self._epoch = e

    inner = Inner()
    ThreadedLoader(inner).set_epoch(7)
    assert inner._epoch == 7


def test_async_save_matches_sync(tmp_path):
    """save_async (device snapshot -> background fetch+write) must
    produce a checkpoint identical to a synchronous save of the same
    state, and stale tmp dirs from a crashed save must not break the
    next one."""
    import jax

    from mdd_tpu.train.checkpoint import load_checkpoint

    cfg = _tiny_cfg()
    rng = np.random.default_rng(3)
    batch = _batch(rng, cfg)
    t = Trainer(cfg, n_devices=1, sample_t=16, sample_l=3)
    t.run_epoch([batch], 1, True, log=lambda *_: None)

    t.save(str(tmp_path), "exp", "latest", epoch=1)
    sync_state, sync_meta = load_checkpoint(str(tmp_path / "exp"), "latest")

    # simulate a crashed earlier save: stale tmp dir must be cleaned up
    import os
    stale = tmp_path / "exp" / f"latest.tmp-{os.getpid()}"
    stale.mkdir(parents=True)
    (stale / "junk").write_text("x")

    t.save_async(str(tmp_path), "exp", "latest", epoch=1)
    t.join_saves()
    async_state, async_meta = load_checkpoint(str(tmp_path / "exp"),
                                              "latest")
    assert async_meta["epoch"] == sync_meta["epoch"] == 1
    for a, b in zip(jax.tree.leaves(sync_state), jax.tree.leaves(async_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not stale.exists()


def test_interrupted_save_preserves_previous_checkpoint(tmp_path):
    """The save swap is crash-safe: even if a new save dies before the
    swap, the previous 'latest' stays loadable (the old scheme rmtree'd
    it first).  Simulated by checking the committed bundle survives a
    failing save attempt."""
    from mdd_tpu.train import checkpoint as ck

    cfg = _tiny_cfg()
    rng = np.random.default_rng(4)
    batch = _batch(rng, cfg)
    t = Trainer(cfg, n_devices=1, sample_t=16, sample_l=3)
    t.save(str(tmp_path), "exp", "latest", epoch=7)

    # a save that explodes during serialization must leave the old
    # bundle untouched
    import pytest as _pytest
    with _pytest.raises(Exception):
        ck.save_checkpoint(str(tmp_path / "exp"), "latest",
                           params=object(),     # unserializable
                           batch_stats={}, meta={})
    state, meta = ck.load_checkpoint(str(tmp_path / "exp"), "latest")
    assert meta["epoch"] == 7 and "params" in state
