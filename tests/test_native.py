"""Native denoiser tests: library build, SNR improvement on synthetic
noisy speech-band signals, CLI wav round-trip, engine integration."""

import subprocess

import numpy as np
import pytest

from mdd_tpu.native import ensure_built, native_available, spectral_denoise


@pytest.fixture(scope="module", autouse=True)
def built():
    if not ensure_built():
        pytest.skip("no native toolchain")


def _snr(clean, noisy):
    noise = noisy - clean
    return 10 * np.log10(np.sum(clean ** 2) / max(np.sum(noise ** 2), 1e-9))


def test_denoise_improves_snr():
    """Stationary white noise around a speech-band tone burst: the NS
    gain must improve SNR measurably."""
    sr = 16000
    t = np.arange(3 * sr) / sr
    clean = np.zeros_like(t, dtype=np.float32)
    # tone bursts (speech-ish amplitude envelope)
    for f0, start in [(220.0, 0.5), (440.0, 1.2), (330.0, 2.0)]:
        seg = (t >= start) & (t < start + 0.4)
        clean[seg] = (8000 * np.sin(2 * np.pi * f0 * t[seg])
                      * np.hanning(seg.sum())).astype(np.float32)
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(len(t)).astype(np.float32) * 500
    noisy = clean + noise

    out = spectral_denoise(noisy, sr, aggressiveness=4)
    assert out.shape == noisy.shape
    assert np.isfinite(out).all()
    snr_before = _snr(clean, noisy)
    snr_after = _snr(clean, out)
    assert snr_after > snr_before + 3.0  # at least 3 dB better


def test_denoise_preserves_clean_signal():
    """After the noise-floor warmup (the estimator treats the first
    ~0.25 s as noise, like WebRTC NS), a strong clean tone must come
    through mostly intact."""
    sr = 16000
    t = np.arange(int(1.5 * sr)) / sr
    clean = np.zeros_like(t, dtype=np.float32)
    tone = t >= 0.5  # leading silence covers the warmup
    clean[tone] = (10000 * np.sin(2 * np.pi * 300 * t[tone])).astype(
        np.float32)
    out = spectral_denoise(clean, sr)
    seg = slice(int(0.7 * sr), int(1.4 * sr))
    c = np.corrcoef(clean[seg], out[seg])[0, 1]
    assert c > 0.95


def test_cli_roundtrip(tmp_path, reference_dir):
    from pathlib import Path

    binary = (Path(__file__).resolve().parents[1] / "native" / "build"
              / "mdd_denoise")
    if not binary.exists():
        pytest.skip("CLI binary missing")
    src = reference_dir / "egs" / "vocabulary" / "single" / "1.wav"
    out = tmp_path / "denoised.wav"
    subprocess.run([str(binary), str(src), str(out), "4"], check=True)
    from mdd_tpu.frontend.wav import read_wav

    a, sr_a = read_wav(str(src))
    b, sr_b = read_wav(str(out))
    assert sr_a == sr_b
    assert abs(len(a) - len(b)) <= 1
    assert np.isfinite(b).all()


def test_engine_accepts_native_denoiser():
    assert native_available()
    x = np.random.default_rng(1).standard_normal(16000).astype(np.float32)
    y = spectral_denoise(x, 16000)
    assert y.shape == x.shape


class TestNativeArkReader:
    """native/ark_io.cc: mmap bulk ark reader parity with the Python
    reader (skipped when no C++ toolchain is available)."""

    @pytest.fixture(scope="class")
    def ark(self, tmp_path_factory):
        from mdd_tpu.frontend import kaldi_io

        d = tmp_path_factory.mktemp("ark")
        rng = np.random.default_rng(0)
        mats = {}
        with kaldi_io.ArkScpWriter(str(d / "f.ark"), str(d / "f.scp")) as w:
            for i in range(20):
                m = rng.standard_normal(
                    (int(rng.integers(5, 60)), 81)).astype(np.float32)
                mats[f"u{i}"] = m
                w.write(f"u{i}", m)
        return d, mats

    def test_reader_parity(self, ark):
        from mdd_tpu import native
        from mdd_tpu.frontend import kaldi_io

        d, mats = ark
        if not native.ensure_built():
            pytest.skip("no C++ toolchain")
        with native.NativeArkReader(str(d / "f.ark")) as r:
            assert r.n == 20
            assert r.utts == [f"u{i}" for i in range(20)]
            scp = kaldi_io.read_scp(str(d / "f.scp"))
            for utt, rx in scp.items():
                off = int(rx.rsplit(":", 1)[1])
                i = r.by_offset[off]
                np.testing.assert_array_equal(r.read(i), mats[utt])
                # zero-copy view matches too
                np.testing.assert_array_equal(np.asarray(r.view(i)),
                                              mats[utt])

    def test_view_survives_close(self, ark):
        """A zero-copy view held past close() must stay valid: close()
        defers the munmap until the last view is garbage-collected
        (round-3 advisor use-after-free finding)."""
        import gc

        from mdd_tpu import native

        d, mats = ark
        if not native.ensure_built():
            pytest.skip("no C++ toolchain")
        r = native.NativeArkReader(str(d / "f.ark"))
        v = r.view(0)
        expect = np.array(v)            # copy before close
        r.close()
        assert r._h is not None         # munmap deferred
        np.testing.assert_array_equal(v, expect)   # still readable
        del v
        gc.collect()
        assert r._h is None             # last view dropped -> closed
        with pytest.raises(ValueError):
            r.view(0)

    def test_bulk_load_matches_per_item(self, ark):
        from mdd_tpu.frontend import kaldi_io

        d, mats = ark
        scp = kaldi_io.read_scp(str(d / "f.scp"))
        rxs = list(scp.values())
        bulk = kaldi_io.bulk_load(rxs)
        for utt, rx, m in zip(scp, rxs, bulk):
            np.testing.assert_array_equal(m, mats[utt])
            np.testing.assert_array_equal(m, kaldi_io.load_mat(rx))

    def test_python_fallback_parity(self, ark, monkeypatch):
        """bulk_load's pure-Python path (native unavailable) agrees."""
        import mdd_tpu.native as native
        from mdd_tpu.frontend import kaldi_io

        d, mats = ark
        monkeypatch.setattr(
            native, "NativeArkReader",
            lambda path: (_ for _ in ()).throw(OSError("forced")))
        scp = kaldi_io.read_scp(str(d / "f.scp"))
        bulk = kaldi_io.bulk_load(list(scp.values()))
        for utt, m in zip(scp, bulk):
            np.testing.assert_array_equal(m, mats[utt])

    def test_open_missing_file_raises(self):
        from mdd_tpu import native

        if not native.ensure_built():
            pytest.skip("no C++ toolchain")
        with pytest.raises(OSError):
            native.NativeArkReader("/nonexistent.ark")
