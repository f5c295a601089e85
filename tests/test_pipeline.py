"""Feature-pipeline tests: wav.scp -> ark/scp + CMVN round trip on the
reference demo recordings."""

import numpy as np
import pytest

from mdd_tpu.frontend import kaldi_io
from mdd_tpu.frontend.cmvn import parse_kaldi_cmvn_text, apply_cmvn
from mdd_tpu.frontend.fbank import FbankConfig
from mdd_tpu.frontend.pipeline import extract_split, featurize_wavs
from mdd_tpu.frontend.wav import read_audio


@pytest.fixture(scope="module")
def demo_wavs(reference_dir):
    d = reference_dir / "egs" / "vocabulary" / "single"
    paths = {f"word{i}": str(d / f"{i}.wav") for i in (1, 2, 3)}
    for p in paths.values():
        import os
        if not os.path.exists(p):
            pytest.skip("demo wavs missing")
    return paths


def test_extract_split_roundtrip(tmp_path, demo_wavs):
    scp = tmp_path / "wav.scp"
    scp.write_text("".join(f"{u} {p}\n" for u, p in sorted(demo_wavs.items())))
    scp_path, cmvn = extract_split(str(scp), str(tmp_path), name="fbank")

    # stats were trained on this split -> mean ~0, var ~1 after apply
    feats = dict(kaldi_io.read_ark(str(tmp_path / "fbank.ark")))
    assert set(feats) == set(demo_wavs)
    allf = np.concatenate(list(feats.values()), axis=0)
    assert allf.shape[1] == FbankConfig().feat_dim == 81
    assert np.abs(allf.mean(axis=0)).max() < 1e-3
    assert np.abs(allf.var(axis=0) - 1.0).max() < 1e-2

    # scp entries load the same matrices
    scp_map = kaldi_io.read_scp(scp_path)
    m = kaldi_io.load_mat(scp_map["word1"])
    np.testing.assert_array_equal(m, feats["word1"])

    # CMVN text round-trips
    stats2 = parse_kaldi_cmvn_text(str(tmp_path / "global_fbank_cmvn.txt"))
    np.testing.assert_allclose(stats2.mean, cmvn.mean, rtol=1e-5)
    assert stats2.count == pytest.approx(cmvn.count)


def test_featurize_with_committed_cmvn(reference_dir, demo_wavs):
    stats = parse_kaldi_cmvn_text(str(
        reference_dir / "egs" / "attention_aug" / "data"
        / "global_fbank_cmvn.txt"))
    feats = featurize_wavs(demo_wavs, stats)
    for u, f in feats.items():
        assert f.shape[1] == 81
        assert np.isfinite(f).all()
        # ~100 fps: a 1-3s word recording gives 80-320 frames
        wav, sr = read_audio(demo_wavs[u])
        expect = 1 + (len(wav) - 400) // 160
        assert f.shape[0] == expect


def test_batched_matches_single(demo_wavs):
    """Bucketed-padded batch fbank == per-utterance fbank."""
    import jax.numpy as jnp
    from mdd_tpu.frontend.fbank import compute_fbank

    cfg = FbankConfig()
    wav, sr = read_audio(demo_wavs["word1"])
    single = np.asarray(compute_fbank(jnp.asarray(wav.astype(np.float32)), cfg))

    from mdd_tpu.frontend.pipeline import _BatchedFbank
    batched = _BatchedFbank(cfg)([wav.astype(np.float32)])[0]
    assert batched.shape == single.shape
    np.testing.assert_allclose(batched, single, atol=2e-4, rtol=1e-5)
