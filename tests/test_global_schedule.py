"""Multi-process streaming loader: the deterministic global batch
schedule (BucketedLoader.global_schedule) must give every host the same
shapes and batch counts, cover each utterance exactly once, and equal
the single-process schedule row-for-row."""

import numpy as np

from mdd_tpu.data.dataset import BucketedLoader, SpeechDataset
from mdd_tpu.data.vocab import Vocab
from mdd_tpu.frontend import kaldi_io


def _corpus(tmp_path, n=13, seed=0):
    rng = np.random.default_rng(seed)
    phones = ["sil", "aa", "b", "k"]
    with kaldi_io.ArkScpWriter(str(tmp_path / "f.ark"),
                               str(tmp_path / "f.scp")) as w, \
            open(tmp_path / "lab", "w") as lab, \
            open(tmp_path / "trn", "w") as trn:
        for i in range(n):
            t = int(rng.integers(30, 200))
            w.write(f"u{i}", rng.standard_normal((t, 81)).astype(np.float32))
            seq = " ".join(rng.choice(phones[1:],
                                      size=int(rng.integers(3, 8))))
            lab.write(f"u{i} {seq}\n")
            trn.write(f"u{i} {seq}\n")
    return phones


def _ds(tmp_path, phones, train=True, device_frontend=False):
    return SpeechDataset(Vocab(phones), str(tmp_path / "f.scp"),
                         str(tmp_path / "lab"), str(tmp_path / "trn"),
                         train=train, device_frontend=device_frontend)


def _loader(ds, **kw):
    return BucketedLoader(ds, batch_size=4, seed=3, time_quantum=16,
                          label_quantum=8, **kw)


def test_hosts_agree_and_cover_corpus(tmp_path):
    phones = _corpus(tmp_path)
    ds = _ds(tmp_path, phones)
    hosts = [list(_loader(_ds(tmp_path, phones), shuffle=True,
                          process_index=p, process_count=2))
             for p in range(2)]
    assert len(hosts[0]) == len(hosts[1])
    seen = []
    for b0, b1 in zip(*hosts):
        # identical shapes on every host, batch for batch
        assert b0.inputs.shape == b1.inputs.shape
        assert b0.targets.shape == b1.targets.shape
        assert b0.trans.shape == b1.trans.shape
        for b in (b0, b1):
            seen += [u for u, s in zip(b.utt_ids, b.score_mask) if s]
    assert sorted(seen) == sorted(it[0] for it in ds.items)


def test_matches_single_process_schedule(tmp_path):
    """Concatenating the two hosts' row slices reproduces the
    single-process global schedule (same global batch size) exactly."""
    phones = _corpus(tmp_path)
    single = list(BucketedLoader(
        _ds(tmp_path, phones), batch_size=8, seed=3, time_quantum=16,
        label_quantum=8, shuffle=True, global_schedule=True))
    hosts = [list(_loader(_ds(tmp_path, phones), shuffle=True,
                          process_index=p, process_count=2))
             for p in range(2)]
    assert len(single) == len(hosts[0])
    for bs, b0, b1 in zip(single, *hosts):
        np.testing.assert_array_equal(
            bs.inputs, np.concatenate([b0.inputs, b1.inputs]))
        np.testing.assert_array_equal(
            bs.targets, np.concatenate([b0.targets, b1.targets]))
        np.testing.assert_array_equal(
            bs.trans, np.concatenate([b0.trans, b1.trans]))
        np.testing.assert_array_equal(
            bs.score_mask, np.concatenate([b0.score_mask, b1.score_mask]))
        assert bs.utt_ids == b0.utt_ids + b1.utt_ids


def test_tail_padding_masked(tmp_path):
    phones = _corpus(tmp_path, n=13)   # 13 % 8 != 0
    loader = _loader(_ds(tmp_path, phones, train=False),
                     process_index=0, process_count=2)
    batches = list(loader)
    n_valid = int(sum(b.score_mask.sum() for b in batches))
    # host 0 holds its slice of each global batch; total valid across
    # BOTH hosts is 13 (checked in test_hosts_agree); padded rows repeat
    # the last item and are unmasked from scoring
    assert all(b.size == 4 for b in batches)
    assert n_valid <= 13
    tail = batches[-1]
    assert "<pad>" in tail.utt_ids or tail.score_mask.all()


def test_device_frontend_global_schedule(tmp_path):
    """Raw-grid quantum + device frontend compose with the global
    schedule (lengths are pre-transform raw frames)."""
    phones = _corpus(tmp_path)
    hosts = [list(_loader(_ds(tmp_path, phones, device_frontend=True),
                          shuffle=True, process_index=p, process_count=2))
             for p in range(2)]
    for b0, b1 in zip(*hosts):
        assert b0.inputs.shape == b1.inputs.shape
        # raw-grid divisibility for batched_splice_skip
        assert b0.inputs.shape[1] % 4 == 0


def test_single_process_default_unchanged(tmp_path):
    """Without multi-process or the explicit flag, the established
    per-host streaming behavior is bit-identical to before."""
    phones = _corpus(tmp_path)
    a = list(_loader(_ds(tmp_path, phones), shuffle=False))
    b = list(_loader(_ds(tmp_path, phones), shuffle=False,
                     global_schedule=False))
    assert not _loader(_ds(tmp_path, phones)).global_schedule
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.inputs, y.inputs)
        assert x.utt_ids == y.utt_ids
