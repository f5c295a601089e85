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
