"""Quantify the dither decision (VERDICT r2 next-round #7).

The reference's Kaldi binaries dither by default (dither=1.0 on int16
scale, feat/feature-window.cc); our fbank defaults to dither=0 for
deterministic features, with train-time dither available via
`compute_fbank(..., key=...)` (frontend/fbank.py:45,171).  The risk is
mixing our dither-0 features with the COMMITTED training CMVN stats
(computed over dither-1.0 Kaldi features).  These tests measure that
mismatch on the 20 real demo word recordings and pin the measured bound:

  * per-dim feature-mean shift between dither 0 and dither 1.0 is
    <= ~0.18 of a committed-training-set std (median ~0.04 std) — a
    bounded, small bias relative to the feature distribution's scale;
  * as a distribution-level sanity check, our dither-0 demo-wav means
    sit within ~1.3 committed stds of the committed training means
    (median z ~= 1.0 — different speech, same scale).

Conclusion recorded in PARITY.md: dither-0 inference against the
committed CMVN stats is a <= 0.2-sigma per-dim effect; pipelines that
extract features AND CMVN stats with our own `feat` CLI have zero
mismatch by construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def demo_features(reference_dir):
    from mdd_tpu.frontend.fbank import FbankConfig, compute_fbank
    from mdd_tpu.frontend.wav import read_audio

    demo = reference_dir / "egs" / "vocabulary" / "single"
    if not demo.exists():
        pytest.skip("demo word set missing")
    f0, fd = [], []
    for i in range(1, 21):
        wav, sr = read_audio(str(demo / f"{i}.wav"))
        assert sr == 16000
        w = jnp.asarray(wav, jnp.float32)
        f0.append(np.asarray(compute_fbank(w, FbankConfig(dither=0.0))))
        for s in range(3):
            fd.append(np.asarray(compute_fbank(
                w, FbankConfig(dither=1.0), key=jax.random.key(s))))
    return np.concatenate(f0), np.concatenate(fd)


@pytest.fixture(scope="module")
def committed_cmvn(reference_dir):
    from mdd_tpu.frontend.cmvn import parse_kaldi_cmvn_text

    path = (reference_dir / "egs" / "attention_aug" / "data"
            / "global_fbank_cmvn.txt")
    if not path.exists():
        pytest.skip("committed CMVN stats missing")
    stats = parse_kaldi_cmvn_text(str(path))
    return stats.mean, np.sqrt(stats.var)


def test_dither_mean_shift_bounded(demo_features, committed_cmvn):
    """Dither on/off moves per-dim means by at most ~0.2 committed std."""
    f0, fd = demo_features
    _, ref_std = committed_cmvn
    shift = np.abs(fd.mean(0) - f0.mean(0)) / ref_std
    assert shift.max() < 0.25, shift.max()          # measured 0.176
    assert np.median(shift) < 0.08, np.median(shift)  # measured 0.041


def test_dither_std_shift_bounded(demo_features, committed_cmvn):
    f0, fd = demo_features
    _, ref_std = committed_cmvn
    sshift = np.abs(fd.std(0) - f0.std(0)) / ref_std
    assert sshift.max() < 0.15, sshift.max()        # measured 0.102


def test_demo_features_match_committed_scale(demo_features, committed_cmvn):
    """Distribution-level sanity vs the committed training stats: the
    demo words are different speech but must live on the same scale."""
    f0, _ = demo_features
    ref_mean, ref_std = committed_cmvn
    z = np.abs(f0.mean(0) - ref_mean) / ref_std
    assert np.median(z) < 2.0, np.median(z)         # measured 1.00
    assert z.max() < 3.0, z.max()                   # measured 1.28


def test_train_time_dither_reproducible():
    """Same key -> same dithered features; different keys differ."""
    from mdd_tpu.frontend.fbank import FbankConfig, compute_fbank

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-3000, 3000, 4000), jnp.float32)
    cfg = FbankConfig(dither=1.0)
    a = np.asarray(compute_fbank(w, cfg, key=jax.random.key(1)))
    b = np.asarray(compute_fbank(w, cfg, key=jax.random.key(1)))
    c = np.asarray(compute_fbank(w, cfg, key=jax.random.key(2)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0
    # dither off ignores the key entirely
    d0 = np.asarray(compute_fbank(w, FbankConfig(dither=0.0),
                                  key=jax.random.key(1)))
    d1 = np.asarray(compute_fbank(w, FbankConfig(dither=0.0)))
    np.testing.assert_array_equal(d0, d1)
