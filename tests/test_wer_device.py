"""Device WER == host WER: batched jit collapse + Levenshtein vs the
host collapse_ctc + align.levenshtein path, over randomized batches and
edge cases (blanks everywhere, repeats across blanks, zero frames,
padded rows)."""

import jax.numpy as jnp
import numpy as np

from mdd_tpu.align.levenshtein import edit_distance
from mdd_tpu.decode.greedy import collapse_ctc
from mdd_tpu.ops.wer import batched_edit_distance, greedy_wer_counts


def _host_counts(ids, frames, targets, tsizes, valid):
    errs, tokens = 0, 0
    for i in range(ids.shape[0]):
        if not valid[i]:
            continue
        pred = collapse_ctc(ids[i], int(frames[i]))
        label = list(targets[i][: int(tsizes[i])])
        dist, _ = edit_distance(label, pred)
        errs += dist
        tokens += len(label)
    return errs, tokens


def test_edit_distance_matches_host():
    rng = np.random.default_rng(0)
    b, t, l = 16, 20, 9
    pred = rng.integers(1, 6, (b, t)).astype(np.int32)
    pred_len = rng.integers(0, t + 1, b).astype(np.int32)
    targets = rng.integers(1, 6, (b, l)).astype(np.int32)
    tsizes = rng.integers(1, l + 1, b).astype(np.int32)
    got = np.asarray(batched_edit_distance(
        jnp.asarray(pred), jnp.asarray(pred_len),
        jnp.asarray(targets), jnp.asarray(tsizes)))
    for i in range(b):
        want, _ = edit_distance(list(targets[i][: tsizes[i]]),
                                list(pred[i][: pred_len[i]]))
        assert got[i] == want, (i, got[i], want)


def test_greedy_wer_counts_matches_host():
    rng = np.random.default_rng(1)
    for trial in range(5):
        b, t, l = 8, 30, 12
        # blank-heavy framewise ids, like real CTC posteriors
        ids = rng.integers(0, 5, (b, t)).astype(np.int32)
        ids[rng.random((b, t)) < 0.5] = 0
        frames = rng.integers(0, t + 1, b).astype(np.int32)
        targets = rng.integers(2, 5, (b, l)).astype(np.int32)
        tsizes = rng.integers(1, l + 1, b).astype(np.int32)
        valid = rng.random(b) < 0.8
        errs, toks = greedy_wer_counts(
            jnp.asarray(ids), jnp.asarray(frames), jnp.asarray(targets),
            jnp.asarray(tsizes), jnp.asarray(valid))
        werrs, wtoks = _host_counts(ids, frames, targets, tsizes, valid)
        assert int(errs) == werrs, trial
        assert int(toks) == wtoks, trial


def test_repeat_across_blank_kept():
    # [5, 0, 5] collapses to [5, 5] (CTC semantics)
    ids = jnp.asarray([[5, 0, 5]])
    errs, toks = greedy_wer_counts(
        ids, jnp.asarray([3]), jnp.asarray([[5, 5]]),
        jnp.asarray([2]), jnp.asarray([True]))
    assert int(errs) == 0 and int(toks) == 2


def test_zero_frames_gives_label_length():
    errs, toks = greedy_wer_counts(
        jnp.asarray([[1, 2, 3]]), jnp.asarray([0]),
        jnp.asarray([[4, 5, 6]]), jnp.asarray([3]), jnp.asarray([True]))
    assert int(errs) == 3 and int(toks) == 3
