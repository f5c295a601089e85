"""Tests for the spectrogram front-end and the visualizer."""

import numpy as np
import pytest


def test_spectrogram_shapes_and_normalization(reference_dir):
    import jax.numpy as jnp

    from mdd_tpu.frontend.spectrogram import compute_spectrogram
    from mdd_tpu.frontend.wav import read_audio

    wav, sr = read_audio(str(reference_dir / "egs" / "vocabulary"
                             / "single" / "1.wav"))
    spec = np.asarray(compute_spectrogram(jnp.asarray(wav, jnp.float32)))
    n_fft = 400
    expect_t = 1 + (len(wav) - n_fft) // 160
    assert spec.shape == (expect_t, 257)  # padded 512 -> 257 bins
    assert abs(spec.mean()) < 1e-4
    assert abs(spec.std() - 1.0) < 1e-3


def test_make_spectrum_writes_ark(tmp_path, reference_dir):
    from mdd_tpu.frontend import kaldi_io
    from mdd_tpu.frontend.spectrogram import make_spectrum

    demo = reference_dir / "egs" / "vocabulary" / "single"
    scp = tmp_path / "wav.scp"
    scp.write_text(f"w1 {demo/'1.wav'}\nw2 {demo/'2.wav'}\n")
    n = make_spectrum(str(scp), str(tmp_path / "spec.ark"),
                      str(tmp_path / "spec.scp"), log=lambda *_: None)
    assert n == 2
    mats = dict(kaldi_io.read_ark(str(tmp_path / "spec.ark")))
    assert set(mats) == {"w1", "w2"}
    assert mats["w1"].shape[1] == 257


def test_visualize_utterance(tmp_path):
    import jax

    from mdd_tpu.models.ctc_model import CTCAttentionModel, ModelConfig
    from mdd_tpu.utils.visualize import visualize_utterance

    pytest.importorskip("matplotlib")
    cfg = ModelConfig(input_dim=24, num_class=8, rnn_hidden_size=16,
                      rnn_layers=2, text_embed_size=16)
    model = CTCAttentionModel(cfg)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((32, 24)).astype(np.float32)
    trans = np.asarray([2, 3, 4], np.int32)
    variables = model.init(jax.random.key(0), feats[None], trans[None],
                           np.asarray([3], np.int32))
    paths = visualize_utterance(
        model, variables, feats, trans,
        {i: f"p{i}" for i in range(8)}, str(tmp_path))
    assert len(paths) >= 2
    import os

    for p in paths:
        assert os.path.getsize(p) > 1000


def test_mel_warp_matches_reference_interpolation():
    """mel_warp == the reference's per-frame linear interpolation loop."""
    import math

    import numpy as np

    from mdd_tpu.frontend.spectrogram import mel_warp

    rng = np.random.default_rng(0)
    # 201 bins: the shape F_Mel actually sees (librosa stft n_fft=400).
    # NOTE: the reference loop itself would IndexError at the very top
    # bin (mel_bin[-1] == n-1 + eps -> frame[n]); we clip instead.
    t, n = 5, 201
    spec = rng.standard_normal((t, n)).astype(np.float32)

    # reference F_Mel loop (tools.py:184-205), librosa-free re-derivation
    fmax = 8000.0
    max_mel = 2595.0 * math.log10(1.0 + fmax / 700.0)
    mels = np.linspace(0.0, max_mel, n)
    freqs = 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    mel_bin = freqs * 0.025
    want = np.zeros_like(spec)
    for ti in range(t):
        for i in range(n):
            left = min(int(math.floor(mel_bin[i])), n - 1)
            right = min(left + 1, n - 1)
            want[ti, i] = ((spec[ti, right] - spec[ti, left])
                           * (mel_bin[i] - left) + spec[ti, left])

    got = np.asarray(mel_warp(spec))
    np.testing.assert_allclose(got, want, atol=1e-5)
