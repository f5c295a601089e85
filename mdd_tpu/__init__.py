"""mdd_tpu — a TPU-native framework for Mispronunciation Detection & Diagnosis (MDD).

A ground-up JAX/XLA/Pallas re-design of the capabilities of
dyustc/CTC-Attention-Mispronunciation (the "reference"): CNN+BiLSTM CTC
acoustic models with canonical-text attention, Kaldi-compatible fbank
front-end, CTC greedy/prefix-beam decoding with phone-bigram LM fusion,
phoneme alignment and hierarchical MDD scoring (TA/FR/FA/TR, P/R/F1),
and a single-word pronunciation-diagnosis product pipeline.

Compute path: jax.numpy / flax / Pallas kernels, sharded with
jax.sharding.Mesh + shard_map for multi-chip data parallelism.
Runtime path: host NumPy data pipeline with optional C++ feature
extraction (see mdd_tpu/runtime).
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: fresh CLI processes reuse
    compiled programs instead of paying the full TPU compile again
    (minutes per shape over a remote-compile tunnel).  Opt out with
    MDD_TPU_NO_COMPILE_CACHE=1 or point MDD_TPU_COMPILE_CACHE elsewhere."""
    import os

    if os.environ.get("MDD_TPU_NO_COMPILE_CACHE"):
        return
    path = os.environ.get(
        "MDD_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mdd_tpu_xla"))
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


_enable_compilation_cache()
