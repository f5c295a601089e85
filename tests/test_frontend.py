"""Front-end tests: fbank properties, CMVN stats parity, splice/skip
semantics, Kaldi ark round-trips, demo WAV ingestion."""

import numpy as np
import pytest

from mdd_tpu.frontend.cmvn import (
    CmvnStats,
    apply_cmvn,
    parse_kaldi_cmvn_text,
    write_kaldi_cmvn_text,
)
from mdd_tpu.frontend.fbank import FbankConfig, compute_fbank, num_frames
from mdd_tpu.frontend.kaldi_io import ArkScpWriter, load_mat, read_ark, read_scp
from mdd_tpu.frontend.splice import make_context, output_frames, pad_to_multiple, skip_frames
from mdd_tpu.frontend.wav import read_wav


CFG = FbankConfig()


def test_fbank_shapes_and_framing():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 1000).astype(np.float32)  # 1 s
    feats = np.asarray(compute_fbank(wav, CFG))
    # Kaldi snip-edges framing: 1 + (16000-400)//160 = 98 frames, 81 dims.
    assert feats.shape == (98, 81)
    assert num_frames(16000, CFG) == 98
    assert np.all(np.isfinite(feats))


def test_fbank_energy_dim_is_raw_log_energy():
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(4000) * 500).astype(np.float32)
    feats = np.asarray(compute_fbank(wav, CFG))
    frame0 = wav[:400] - wav[:400].mean()  # dc-removed, pre-window
    expected = np.log((frame0.astype(np.float64) ** 2).sum())
    assert abs(feats[0, 0] - expected) < 1e-2


def test_fbank_tone_peaks_at_expected_mel_bin():
    # A pure 1 kHz tone must put its energy in the mel bin whose center is
    # nearest 1 kHz.
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    wav = (np.sin(2 * np.pi * 1000.0 * t) * 10000).astype(np.float32)
    feats = np.asarray(compute_fbank(wav, CFG))
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    mel_low, mel_high = mel(20.0), mel(8000.0)
    delta = (mel_high - mel_low) / (CFG.num_mel_bins + 1)
    centers = mel_low + (np.arange(CFG.num_mel_bins) + 1) * delta
    expected_bin = int(np.argmin(np.abs(centers - mel(1000.0))))
    hot = int(np.argmax(feats[10, 1:]))
    assert abs(hot - expected_bin) <= 1


def test_fbank_dft_matches_numpy_fft():
    # The matmul DFT must agree with numpy's rFFT power spectrum.
    from mdd_tpu.frontend.fbank import _dft_and_mel_matrices

    dft, _ = _dft_and_mel_matrices(CFG)
    rng = np.random.default_rng(2)
    frame = rng.standard_normal(512).astype(np.float32)
    spec = frame @ np.asarray(dft)
    power_ours = spec[:256] ** 2 + spec[256:] ** 2
    power_np = np.abs(np.fft.rfft(frame)[:256]) ** 2
    np.testing.assert_allclose(power_ours, power_np, rtol=1e-3, atol=1e-2)


def test_cmvn_parse_committed_stats(reference_dir):
    path = reference_dir / "egs" / "attention_aug" / "data" / "global_fbank_cmvn.txt"
    stats = parse_kaldi_cmvn_text(str(path))
    assert stats.dim == 81
    assert stats.count > 1e6  # ~5496 utts of frames
    assert np.all(stats.var > 0)
    # Normalizing random features must produce ~0 mean under these stats'
    # inverse transform.
    x = np.tile(stats.mean, (10, 1)).astype(np.float32)
    y = apply_cmvn(x, stats)
    np.testing.assert_allclose(y, 0.0, atol=1e-4)


def test_cmvn_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    feats = [rng.standard_normal((50, 81)).astype(np.float32) for _ in range(4)]
    stats = CmvnStats.accumulate(feats)
    p = tmp_path / "cmvn.txt"
    write_kaldi_cmvn_text(stats, str(p))
    stats2 = parse_kaldi_cmvn_text(str(p))
    np.testing.assert_allclose(stats.mean, stats2.mean, rtol=1e-4)
    all_feats = np.concatenate(feats)
    normed = apply_cmvn(all_feats, stats)
    assert abs(normed.mean()) < 1e-3
    assert abs(normed.std() - 1.0) < 1e-2


def test_make_context_matches_reference_semantics():
    # Reference make_context(tools.py:207-216): left/right shifts with edge
    # replication, concatenated [x, right1, right2] for (0, 2).
    x = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = make_context(x, 0, 2)
    assert out.shape == (4, 9)
    np.testing.assert_array_equal(out[:, :3], x)
    np.testing.assert_array_equal(out[0, 3:6], x[1])
    np.testing.assert_array_equal(out[3, 3:6], x[3])  # edge replicated
    np.testing.assert_array_equal(out[0, 6:9], x[2])
    np.testing.assert_array_equal(out[2, 6:9], x[3])
    np.testing.assert_array_equal(out[3, 6:9], x[3])

    out_l = make_context(x, 1, 0)
    np.testing.assert_array_equal(out_l[0, :3], x[0])
    np.testing.assert_array_equal(out_l[1, :3], x[0])
    np.testing.assert_array_equal(out_l[:, 3:], x)


def test_skip_and_pad():
    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    s = skip_frames(x, 2)
    assert s.shape == (5, 2)
    np.testing.assert_array_equal(s[:, 0], [0, 4, 8, 12, 16])
    p = pad_to_multiple(s, 2)
    assert p.shape == (6, 2)
    assert output_frames(10, 2, 2) == 6


def test_ark_scp_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    mats = {f"utt{i}": rng.standard_normal((7 + i, 81)).astype(np.float32)
            for i in range(3)}
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    with ArkScpWriter(ark, scp) as w:
        for utt, m in mats.items():
            w.write(utt, m)
    table = read_scp(scp)
    assert list(table) == list(mats)
    for utt, rx in table.items():
        np.testing.assert_array_equal(load_mat(rx), mats[utt])
    for utt, m in read_ark(ark):
        np.testing.assert_array_equal(m, mats[utt])


def test_demo_wav_reading(reference_dir):
    path = reference_dir / "egs" / "vocabulary" / "single" / "1.wav"
    data, rate = read_wav(str(path))
    assert rate == 16000
    assert data.ndim == 1 and len(data) > 1000
    assert np.abs(data).max() > 100  # int16 scale
