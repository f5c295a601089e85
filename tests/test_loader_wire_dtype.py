"""The cached and streaming loader branches of the CLI must resolve the
SAME wire dtype for one config — otherwise PER/F1 silently differ
between device_cache modes / process counts for an identical checkpoint
(round-5 review finding: the cache branch used to default to bfloat16
while the streaming branch defaulted to float32)."""

import numpy as np

from mdd_tpu.cli import _build_loader
from mdd_tpu.data.device_cache import CachedLoader
from mdd_tpu.data.vocab import Vocab
from mdd_tpu.frontend import kaldi_io
from mdd_tpu.utils.config import load_config


def _corpus(tmp_path, n=3):
    rng = np.random.default_rng(5)
    with kaldi_io.ArkScpWriter(str(tmp_path / "f.ark"),
                               str(tmp_path / "f.scp")) as w, \
            open(tmp_path / "lab", "w") as lab:
        for i in range(n):
            w.write(f"u{i}", rng.standard_normal((24, 81)).astype(np.float32))
            lab.write(f"u{i} aa b\n")
    (tmp_path / "units").write_text("sil\naa\nb\n")


def _cfg(tmp_path, wire_dtype_line=""):
    conf = tmp_path / "c.yaml"
    conf.write_text(
        "device_frontend: true\ndevice_cache: true\nbatch_size: 2\n"
        "time_quantum: 8\n" + wire_dtype_line)
    return load_config(str(conf))


def test_cached_loader_wire_dtype_matches_streaming_default(tmp_path):
    """wire_dtype unset -> BOTH branches must produce float32 features."""
    _corpus(tmp_path)
    vocab = Vocab.from_units_file(str(tmp_path / "units"))
    scp, lab = str(tmp_path / "f.scp"), str(tmp_path / "lab")

    cached = _build_loader(_cfg(tmp_path), vocab, scp, lab, lab,
                           train=False, device_fe=True, allow_cache=True)
    assert isinstance(cached, CachedLoader)
    bucket = next(iter(cached.cache.buckets.values()))
    assert bucket.dtype == np.float32

    streaming = _build_loader(_cfg(tmp_path), vocab, scp, lab, lab,
                              train=False, device_fe=True,
                              allow_cache=False)
    batch = next(iter(streaming))
    assert np.asarray(batch.inputs).dtype == np.float32


def test_cached_loader_wire_dtype_matches_streaming_bf16(tmp_path):
    """wire_dtype: bfloat16 -> both branches quantize identically."""
    import jax.numpy as jnp

    _corpus(tmp_path)
    vocab = Vocab.from_units_file(str(tmp_path / "units"))
    scp, lab = str(tmp_path / "f.scp"), str(tmp_path / "lab")
    cfg = _cfg(tmp_path, "wire_dtype: bfloat16\n")

    cached = _build_loader(cfg, vocab, scp, lab, lab,
                           train=False, device_fe=True, allow_cache=True)
    bucket = next(iter(cached.cache.buckets.values()))
    assert bucket.dtype == jnp.bfloat16

    streaming = _build_loader(cfg, vocab, scp, lab, lab,
                              train=False, device_fe=True,
                              allow_cache=False)
    batch = next(iter(streaming))
    assert np.asarray(batch.inputs).dtype == jnp.bfloat16
