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
