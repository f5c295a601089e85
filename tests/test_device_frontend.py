"""Device-frontend equivalence: on-device splice/skip == host pipeline.

The device frontend ships raw (T, 81) features over the wire and runs
make_context -> skip_frames -> pad_to_multiple inside the jit step
(frontend.splice.batched_splice_skip), cutting host->device transfer by
the splice factor.  These tests pin bit-equality against the host path
(reference utils/tools.py:207-227 semantics) at every level: the op, the
BucketedLoader wire format, and a full Trainer step.
"""

import numpy as np
import pytest

from mdd_tpu.data.dataset import Batch, BucketedLoader, SpeechDataset
from mdd_tpu.frontend.splice import (batched_splice_skip, make_context,
                                     output_frames, pad_to_multiple,
                                     skip_frames)


def _host_reference(raws, lengths, t_out, left, right, skip, multiple):
    """Host pipeline applied per item, zero-padded to the batch grid."""
    b = len(raws)
    d = raws[0].shape[1] * (left + 1 + right)
    out = np.zeros((b, t_out, d), np.float32)
    frames = np.zeros(b, np.int32)
    for i, (raw, n) in enumerate(zip(raws, lengths)):
        feat = pad_to_multiple(
            skip_frames(make_context(raw[:n], left, right), skip), multiple)
        out[i, : feat.shape[0]] = feat
        frames[i] = feat.shape[0]
    return out, frames


@pytest.mark.parametrize("left,right,skip,multiple", [
    (0, 2, 2, 2),     # the reference recipe (splice (0,2), skip 2)
    (1, 1, 2, 2),
    (0, 2, 1, 2),     # no skip
    (2, 3, 3, 2),
])
def test_batched_splice_skip_matches_host(left, right, skip, multiple):
    rng = np.random.default_rng(0)
    quantum = skip * multiple * 8
    lengths = np.array([5, 17, 31, 32, 1, 24], np.int32)
    t_raw = int(np.ceil(lengths.max() / quantum)) * quantum
    d = 7
    raw = np.zeros((len(lengths), t_raw, d), np.float32)
    raws = []
    for i, n in enumerate(lengths):
        x = rng.standard_normal((n, d)).astype(np.float32)
        raw[i, :n] = x
        raws.append(x)

    got, frames = batched_splice_skip(
        np.asarray(raw), np.asarray(lengths), left, right, skip, multiple)
    want, want_frames = _host_reference(
        raws, lengths, t_raw // skip, left, right, skip, multiple)

    np.testing.assert_array_equal(np.asarray(frames), want_frames)
    np.testing.assert_array_equal(np.asarray(got), want)
    for i, n in enumerate(lengths):
        assert int(frames[i]) == output_frames(int(n), skip, multiple)


def _write_corpus(tmp_path, n=7, seed=0):
    from mdd_tpu.frontend import kaldi_io

    rng = np.random.default_rng(seed)
    phones = ["sil", "aa", "b", "k"]
    with kaldi_io.ArkScpWriter(str(tmp_path / "f.ark"),
                               str(tmp_path / "f.scp")) as w, \
            open(tmp_path / "lab", "w") as lab, \
            open(tmp_path / "trn", "w") as trn:
        for i in range(n):
            utt = f"u{i}"
            t = int(rng.integers(40, 260))
            w.write(utt, rng.standard_normal((t, 81)).astype(np.float32))
            seq = " ".join(rng.choice(phones[1:], size=5))
            lab.write(f"{utt} {seq}\n")
            trn.write(f"{utt} {seq}\n")
    return phones


def _loaders(tmp_path, phones, device_frontend, wire_dtype=None):
    from mdd_tpu.data.vocab import Vocab

    vocab = Vocab(phones)
    ds = SpeechDataset(vocab, str(tmp_path / "f.scp"), str(tmp_path / "lab"),
                       str(tmp_path / "trn"), train=False,
                       device_frontend=device_frontend)
    return BucketedLoader(ds, batch_size=3, shuffle=False,
                          time_quantum=16, wire_dtype=wire_dtype)


def test_loader_wire_format_equivalent(tmp_path):
    phones = _write_corpus(tmp_path)
    host_batches = list(_loaders(tmp_path, phones, False))
    raw_batches = list(_loaders(tmp_path, phones, True))
    assert len(host_batches) == len(raw_batches)
    for hb, rb in zip(host_batches, raw_batches):
        assert hb.utt_ids == rb.utt_ids
        raw_len = np.round(rb.input_fracs * rb.inputs.shape[1]).astype(int)
        spliced, frames = batched_splice_skip(
            np.asarray(rb.inputs), raw_len, 0, 2, 2, 2)
        assert spliced.shape == hb.inputs.shape, (spliced.shape,
                                                  hb.inputs.shape)
        np.testing.assert_array_equal(np.asarray(spliced), hb.inputs)
        fracs = np.asarray(frames, np.float32) / spliced.shape[1]
        np.testing.assert_allclose(fracs, hb.input_fracs, rtol=0, atol=0)


def test_loader_bf16_wire(tmp_path):
    import ml_dtypes

    phones = _write_corpus(tmp_path)
    host_batches = list(_loaders(tmp_path, phones, False))
    raw_batches = list(_loaders(tmp_path, phones, True,
                                wire_dtype="bfloat16"))
    for hb, rb in zip(host_batches, raw_batches):
        assert rb.inputs.dtype == ml_dtypes.bfloat16
        raw_len = np.round(rb.input_fracs * rb.inputs.shape[1]).astype(int)
        spliced, _ = batched_splice_skip(
            np.asarray(rb.inputs), raw_len, 0, 2, 2, 2)
        # splice is a gather: bf16-wire output == bf16(host f32 output)
        np.testing.assert_array_equal(
            np.asarray(spliced),
            hb.inputs.astype(ml_dtypes.bfloat16))


def test_trainer_step_equivalent(tmp_path):
    """One full train step: device-frontend Trainer == host-frontend
    Trainer on the same utterances (same seed), loss bit-close."""
    from mdd_tpu.data.vocab import Vocab
    from mdd_tpu.models.ctc_model import ModelConfig
    from mdd_tpu.train.loop import Trainer

    phones = _write_corpus(tmp_path, n=6)
    vocab = Vocab(phones)
    cfg = ModelConfig(input_dim=243, num_class=vocab.n_words,
                      rnn_hidden_size=16, rnn_layers=1, text_embed_size=8)

    losses = {}
    for dev_fe in (False, True):
        ds = SpeechDataset(vocab, str(tmp_path / "f.scp"),
                           str(tmp_path / "lab"), str(tmp_path / "trn"),
                           train=False, device_frontend=dev_fe)
        loader = BucketedLoader(ds, batch_size=6, shuffle=False,
                                time_quantum=16)
        trainer = Trainer(cfg, seed=7, sample_t=16, sample_l=4,
                          device_frontend=dev_fe)
        _, loss = trainer.run_epoch(loader, epoch=1, train=True,
                                    log=lambda *_: None)
        losses[dev_fe] = loss
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-6, atol=1e-6)
