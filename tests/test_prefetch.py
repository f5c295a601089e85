"""Input-pipeline concurrency tests: threaded prefetch, host sharding,
worker-count-invariant determinism."""

import numpy as np
import pytest

from mdd_tpu.data.prefetch import ThreadedLoader, shard_for_host


def test_threaded_loader_yields_all_batches_in_order():
    batches = list(range(20))
    out = list(ThreadedLoader(batches, prefetch=3))
    assert out == batches
    # second epoch works (fresh producer)
    assert list(ThreadedLoader(batches, prefetch=3)) == batches


def test_threaded_loader_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    class L:
        def __iter__(self):
            return gen()

    it = iter(ThreadedLoader(L(), prefetch=2))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_shard_for_host_equal_lengths_and_coverage():
    items = list(range(10))
    shards = [shard_for_host(items, i, 3) for i in range(3)]
    assert all(len(s) == 4 for s in shards)   # ceil(10/3)
    covered = set()
    for s in shards:
        covered.update(s)
    assert covered == set(items)              # every item on some host
    # single host: identity
    assert shard_for_host(items, 0, 1) == items


class _StubDataset:
    """Minimal SpeechDataset stand-in: n items of varying length."""

    train = False
    device_frontend = False

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def load_item(self, idx, rng=None):
        t = 10 + idx
        feat = np.full((t, 4), float(idx), np.float32)
        return feat, [1, 2], [1, 2], f"utt{idx}"


def test_shard_for_host_primary_marks_wraparound_once():
    from mdd_tpu.data.prefetch import shard_for_host_primary

    items = list(range(10))
    scored = []
    for p in range(4):                     # ceil(10/4)=3 -> 12 slots, 2 dups
        shard, primary = shard_for_host_primary(items, p, 4)
        assert len(shard) == len(primary) == 3
        scored += [it for it, pr in zip(shard, primary) if pr]
    assert sorted(scored) == items         # each item scored exactly once
    # single process: everything is primary
    shard, primary = shard_for_host_primary(items, 0, 1)
    assert shard == items and all(primary)


@pytest.mark.parametrize("n,procs,bs", [(10, 4, 2), (9, 2, 4), (6, 4, 3)])
def test_loader_score_mask_covers_each_utt_exactly_once(n, procs, bs):
    """Multi-host eval double-count fix: across all hosts' loaders, the
    score_mask selects every utterance exactly once while every host
    still iterates equal batch counts (reference scores each of the 900
    test utts once, test_ctc_nosil.py:165-298)."""
    from mdd_tpu.data.dataset import BucketedLoader

    scored, batch_counts = [], []
    for p in range(procs):
        loader = BucketedLoader(_StubDataset(n), batch_size=bs,
                                process_index=p, process_count=procs)
        cnt = 0
        for batch in loader:
            assert batch.score_mask is not None
            scored += [u for u, s in zip(batch.utt_ids, batch.score_mask)
                       if s]
            cnt += 1
        batch_counts.append(cnt)
    assert len(set(batch_counts)) == 1          # equal batch counts
    assert sorted(scored) == sorted(f"utt{i}" for i in range(n))


def test_loader_score_mask_survives_shuffle():
    from mdd_tpu.data.dataset import BucketedLoader

    scored = []
    for p in range(3):
        loader = BucketedLoader(_StubDataset(7), batch_size=2, shuffle=True,
                                seed=3, process_index=p, process_count=3)
        for batch in loader:
            scored += [u for u, s in zip(batch.utt_ids, batch.score_mask)
                       if s]
    assert sorted(scored) == sorted(f"utt{i}" for i in range(7))


def test_loader_determinism_independent_of_workers(tmp_path, reference_dir):
    """Same seed -> identical batches whether items load serially or on a
    thread pool (per-item rng streams)."""
    from mdd_tpu.data.dataset import BucketedLoader, SpeechDataset
    from mdd_tpu.data.vocab import Vocab
    from mdd_tpu.frontend import kaldi_io
    from mdd_tpu.frontend.pipeline import extract_split

    demo = reference_dir / "egs" / "vocabulary" / "single"
    scp = tmp_path / "wav.scp"
    scp.write_text("".join(f"w{i} {demo}/{i}.wav\n" for i in (1, 2, 3, 4)))
    fbank_scp, _ = extract_split(str(scp), str(tmp_path))

    labels = tmp_path / "phn_text"
    labels.write_text("".join(f"w{i} aa bb cc\n" for i in (1, 2, 3, 4)))
    vocab = Vocab(["aa", "bb", "cc"])

    def batches(num_workers):
        ds = SpeechDataset(vocab, fbank_scp, str(labels), str(labels),
                           train=True)
        loader = BucketedLoader(ds, batch_size=2, shuffle=True, seed=7,
                                num_workers=num_workers)
        return list(loader)

    a = batches(0)
    b = batches(4)
    assert len(a) == len(b) == 2
    for x, y in zip(a, b):
        assert x.utt_ids == y.utt_ids
        np.testing.assert_array_equal(x.inputs, y.inputs)
        np.testing.assert_array_equal(x.trans, y.trans)
