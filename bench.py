"""Benchmark: training throughput of the flagship text-attention CTC model.

Metric: audio-seconds of speech processed per second per chip by the full
jit-compiled data-parallel training step (forward + CTC loss + backward +
Adam update) on realistic shapes.

Shapes: batch of 64 utterances x 160 model-input frames.  The pipeline is
16 kHz -> 100 fps fbank -> frame-skip 2 (tools.py:218-227 semantics), so
one model-input frame = 0.02 s of audio and 160 frames ~= a 3.2 s
utterance — the TIMIT/L2-ARCTIC average.

Baseline: the reference (single GPU, torch) runs one epoch — 5496 train
utts + 897 dev utts ~= 21 700 audio-seconds — in ~68.5 s
(egs/attention_aug/result/train.log:280 "time_used: 1.1420 minutes"),
i.e. ~317 audio-seconds/s.  vs_baseline = ours / 317.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_AUDIO_SEC_PER_S = 317.0
SECONDS_PER_INPUT_FRAME = 0.02  # 10 ms hop x frame-skip 2

BATCH = 512    # saturates the chip; throughput flat beyond ~512
FRAMES = 160   # ~3.2 s per utterance
LABEL_LEN = 48
WARMUP_STEPS = 5
BENCH_STEPS = 30


def main() -> None:
    from mdd_tpu.data.dataset import Batch
    from mdd_tpu.models.ctc_model import ModelConfig
    from mdd_tpu.train.loop import Trainer

    import jax

    cfg = ModelConfig(compute_dtype="bfloat16",
                      use_pallas_lstm=jax.default_backend() == "tpu")
    trainer = Trainer(cfg, sample_t=FRAMES, sample_l=LABEL_LEN)
    n_chips = trainer.mesh.devices.size

    rng = np.random.default_rng(0)
    batch = Batch(
        inputs=rng.standard_normal((BATCH, FRAMES, cfg.input_dim)).astype(np.float32),
        input_fracs=np.full((BATCH,), 1.0, np.float32),
        targets=rng.integers(2, cfg.num_class, (BATCH, LABEL_LEN)).astype(np.int32),
        target_sizes=np.full((BATCH,), LABEL_LEN, np.int32),
        trans=rng.integers(2, cfg.num_class, (BATCH, LABEL_LEN)).astype(np.int32),
        trans_sizes=np.full((BATCH,), LABEL_LEN, np.int32),
        utt_ids=[f"utt{i}" for i in range(BATCH)],
    )

    import jax

    step_fn = trainer._step_fn(True)
    arrays = trainer._batch_arrays(batch)
    for _ in range(WARMUP_STEPS):
        trainer.rng, dropout_rng = jax.random.split(trainer.rng)
        trainer.state, loss, ids, isz = step_fn(trainer.state, arrays,
                                                dropout_rng)
    float(loss)  # NOTE: block_until_ready does not actually block on the
    # axon remote platform; only a value fetch forces completion.  The
    # final fetch below serializes the whole donated-state step chain, so
    # elapsed covers every step's real device time.

    t0 = time.perf_counter()
    for _ in range(BENCH_STEPS):
        trainer.rng, dropout_rng = jax.random.split(trainer.rng)
        trainer.state, loss, ids, isz = step_fn(trainer.state, arrays,
                                                dropout_rng)
    assert float(loss) > 0.0
    elapsed = time.perf_counter() - t0

    audio_seconds = BENCH_STEPS * BATCH * FRAMES * SECONDS_PER_INPUT_FRAME
    value = audio_seconds / elapsed / n_chips
    print(json.dumps({
        "metric": "train_throughput_audio_seconds_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
