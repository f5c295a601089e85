"""Benchmark: training throughput + decode throughput of the flagship model.

Primary metric: audio-seconds of speech processed per second per chip by
the full jit-compiled data-parallel training step (forward + CTC loss +
backward + Adam update) on realistic shapes.

Shapes: batch of 512 utterances x 160 model-input frames.  The pipeline is
16 kHz -> 100 fps fbank -> frame-skip 2 (tools.py:218-227 semantics), so
one model-input frame = 0.02 s of audio and 160 frames ~= a 3.2 s
utterance — the TIMIT/L2-ARCTIC average.

Baseline: the reference (single GPU, torch) runs one epoch — 5496 train
utts + 897 dev utts ~= 21 700 audio-seconds — in ~68.5 s
(egs/attention_aug/result/train.log:280 "time_used: 1.1420 minutes"),
i.e. ~317 audio-seconds/s.  vs_baseline = ours / 317.

The `extra` field carries the honest accounting the primary number rests
on: ms/step, analytic FLOP/step, MFU against the chip's bf16 peak, and
the batched jit beam-decode throughput (reference decodes 900 utts in
3.25 min, result/train.log:3703-3705).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
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

DECODE_BATCH = 512
DECODE_FRAMES = 80   # model output frames for a 3.2 s utterance
DECODE_ROUNDS = 6    # timed rounds; mean reported with min/max dispersion
BEAM_WIDTH = 10
REFERENCE_DECODE_MIN_900 = 3.25   # result/train.log:3703-3705

# bf16 peak of one TPU v5e (v5 lite) chip.
TPU_V5E_BF16_PEAK_FLOPS = 197e12


def train_step_flops(cfg, batch: int, frames: int, label_len: int) -> float:
    """Analytic FLOP count of one training step (fwd + bwd ~= 3x fwd).

    Counts the MXU work (convs, LSTM gate matmuls, projections, attention,
    head); elementwise/BN/CTC work is bandwidth- not FLOP-bound and is
    excluded, so MFU reported from this is a slight *under*estimate.
    """
    t, f = frames, cfg.input_dim
    flops = 0.0
    cin = 1
    for (kt, kf), (st, sf), (pt, pf), ch in zip(
            cfg.conv_kernels, cfg.conv_strides, cfg.conv_padding,
            cfg.conv_channels):
        t = (t + 2 * pt - kt) // st + 1
        f = (f + 2 * pf - kf) // sf + 1
        flops += 2.0 * t * f * ch * kt * kf * cin
        cin = ch
    t_out = t
    h = cfg.rnn_hidden_size
    d_in = f * cin
    for layer in range(cfg.rnn_layers):
        d = d_in if layer == 0 else 2 * h
        flops += 2.0 * t_out * 2 * (d * 4 * h + h * 4 * h)   # both directions
    if cfg.use_text_attention:
        le = label_len
        e = cfg.text_embed_size
        flops += 2.0 * le * 2 * (e * 4 * h + h * 4 * h)      # text BiLSTM
        flops += 2.0 * le * (2 * h) * (2 * h)                # key projection
        flops += 2.0 * t_out * le * (2 * h) * 2              # scores + context
        head_in = 4 * h
    else:
        head_in = 2 * h
    flops += 2.0 * t_out * head_in * cfg.num_class
    return 3.0 * batch * flops       # fwd + bwd


def bench_train(cfg, extra: dict) -> float:
    from mdd_tpu.data.dataset import Batch
    from mdd_tpu.train.loop import Trainer

    import jax

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

    import jax.numpy as jnp
    from mdd_tpu.parallel.mesh import replicated

    step_fn = trainer._step_fn(True)
    arrays = trainer._batch_arrays(batch)
    acc = jax.device_put(jnp.zeros(4, jnp.float32),
                         replicated(trainer.mesh))
    for _ in range(WARMUP_STEPS):
        trainer.rng, dropout_rng = jax.random.split(trainer.rng)
        trainer.state, acc = step_fn(trainer.state, arrays, dropout_rng,
                                     acc)
    float(acc[0])  # NOTE: block_until_ready does not actually block on
    # the axon remote platform; only a value fetch forces completion.
    # The final fetch below serializes the whole donated-state step
    # chain, so elapsed covers every step's real device time.

    t0 = time.perf_counter()
    for _ in range(BENCH_STEPS):
        trainer.rng, dropout_rng = jax.random.split(trainer.rng)
        trainer.state, acc = step_fn(trainer.state, arrays, dropout_rng,
                                     acc)
    assert float(acc[0]) > 0.0
    elapsed = time.perf_counter() - t0

    ms_per_step = elapsed / BENCH_STEPS * 1e3
    flops = train_step_flops(cfg, BATCH, FRAMES, LABEL_LEN)
    mfu = flops / (elapsed / BENCH_STEPS) / (
        TPU_V5E_BF16_PEAK_FLOPS * n_chips)
    extra["ms_per_step"] = round(ms_per_step, 2)
    extra["tflop_per_step"] = round(flops / 1e12, 3)
    extra["mfu"] = round(mfu, 4)
    extra["train_batch"] = BATCH

    audio_seconds = BENCH_STEPS * BATCH * FRAMES * SECONDS_PER_INPUT_FRAME
    return audio_seconds / elapsed / n_chips


def bench_decode(cfg, extra: dict) -> None:
    """Batched jit prefix-beam decode throughput (K=10, committed LM).

    Measured through the PRODUCTION path: `decode_log` on device-resident
    log-probs — exactly how `EvalSession` feeds the decoder (the model's
    log-softmax output is already on device; evals/evaluate.py decode_log
    call).  The pre-round-4 bench called `decode(probs)` which paid a
    host->device transfer plus a probs->log conversion the production
    path never sees.  Reported with dispersion (mean/min/max over
    DECODE_ROUNDS timed rounds) because the tunnel-attached chip's
    dispatch latency varies run to run."""
    import pathlib

    import jax
    import jax.numpy as jnp

    from mdd_tpu.data.vocab import Vocab
    from mdd_tpu.decode.beam_jit import BatchedBeamDecoder

    data = pathlib.Path("/root/reference/egs/attention_aug/data")
    lm = None
    if (data / "lm_phone_bg.arpa").exists():
        from mdd_tpu.decode.arpa import ArpaBigramLM
        lm = ArpaBigramLM(str(data / "lm_phone_bg.arpa"))
    if (data / "units").exists():
        vocab = Vocab.from_units_file(str(data / "units"))
    else:
        vocab = Vocab([f"p{i}" for i in range(cfg.num_class - 2)])

    dec = BatchedBeamDecoder(vocab.index2word, beam_width=BEAM_WIDTH,
                             lm=lm, lm_alpha=0.5)
    rng = np.random.default_rng(0)
    logits = rng.standard_normal(
        (DECODE_BATCH, DECODE_FRAMES, vocab.n_words)).astype(np.float32)
    logits[:, :, 0] += 2.0    # realistic blank-dominated posteriors
    log_probs = jax.device_put(jnp.asarray(
        logits - jax.scipy.special.logsumexp(logits, -1, keepdims=True)))
    lengths = [DECODE_FRAMES] * DECODE_BATCH

    dec.decode_log(log_probs, lengths)          # compile
    rates = []
    for _ in range(DECODE_ROUNDS):
        t0 = time.perf_counter()
        out = dec.decode_log(log_probs, lengths)
        rates.append(DECODE_BATCH / (time.perf_counter() - t0))
    assert len(out) == DECODE_BATCH
    utts_per_s = float(np.mean(rates))
    extra["decode_utts_per_s"] = round(utts_per_s, 1)
    extra["decode_utts_per_s_min"] = round(float(np.min(rates)), 1)
    extra["decode_utts_per_s_max"] = round(float(np.max(rates)), 1)
    extra["decode_beam_width"] = BEAM_WIDTH
    extra["decode_min_per_900_utts"] = round(900 / utts_per_s / 60, 4)
    extra["decode_vs_reference"] = round(
        REFERENCE_DECODE_MIN_900 / (900 / utts_per_s / 60), 1)


def _flagship_phones():
    """The reference's 41 committed units when mounted (so benchmark
    models run the flagship 43-class head), else the synthetic set."""
    import pathlib

    from tools.synthetic_corpus import PHONES

    units = pathlib.Path("/root/reference/egs/attention_aug/data/units")
    if units.exists():
        phones = [ln.strip() for ln in units.read_text().splitlines()
                  if ln.strip()]
        if "sil" in phones:
            return phones
    return PHONES


def bench_epoch(cfg, extra: dict) -> None:
    """End-to-end epoch throughput INCLUDING the input pipeline.

    Synthesizes a corpus with the real TIMIT/L2-ARCTIC length statistics
    (~3 s utterances) over the reference's 41-unit inventory (the model
    is the same 43-class flagship as the headline step metric), then
    measures two production input paths:

      * device-resident feature cache (the steady-state path): the corpus
        is uploaded once, row-sharded over the mesh; per-epoch batches
        are on-device gathers from index vectors, SpecAugment applied as
        device masking from host-sampled geometry (bit-equivalent to the
        host pipeline, tests/test_device_cache.py).  Epochs >= 2 move no
        feature bytes over the host->device link — this is the headline
        epoch number.
      * host streaming pipeline (first-epoch/ingest path): kaldiio ark
        reads, host SpecAugment + mutation, bucketed batching, threaded
        prefetch, raw-bf16 wire, splice/skip on device.  On a
        remote-attached TPU the ~43 MB/s link bounds this number."""
    import tempfile
    from pathlib import Path

    from mdd_tpu.data.dataset import BucketedLoader, SpeechDataset
    from mdd_tpu.data.device_cache import CachedLoader, DeviceFeatureCache
    from mdd_tpu.data.prefetch import ThreadedLoader
    from mdd_tpu.data.vocab import Vocab
    from mdd_tpu.frontend import kaldi_io
    from mdd_tpu.train.loop import Trainer

    from tools.synthetic_corpus import make_split

    phones = _flagship_phones()
    assert len(phones) + 2 == cfg.num_class, (
        "epoch bench inventory must match the flagship head")
    n_epochs = 3
    with tempfile.TemporaryDirectory() as d:
        out = Path(d)
        # reference training-set scale: 5,496 utterances
        # (result/train.log:54) with the real ~3 s length statistics
        make_split(out, "train", 5496, seed=0, min_phones=16, max_phones=40,
                   phones=phones)
        vocab = Vocab(phones)
        ds = SpeechDataset(vocab, str(out / "train.scp"),
                           str(out / "train_phn_text"),
                           str(out / "train_transcript_phn_text"),
                           train=True, device_frontend=True)
        audio_s = sum(kaldi_io.load_mat(rx).shape[0]
                      for _, rx, _, _ in ds.items) * 0.01
        trainer = Trainer(cfg, sample_t=64, sample_l=16,
                          device_frontend=True)
        extra["epoch_model_num_class"] = cfg.num_class
        extra["epoch_audio_s"] = round(audio_s, 1)

        # --- steady-state path: device-resident cache ---
        cache = DeviceFeatureCache(ds, mesh=trainer.mesh,
                                   wire_dtype="bfloat16")
        cloader = CachedLoader(cache, batch_size=256, shuffle=True, seed=0)
        trainer.run_epoch(cloader, epoch=0, train=True,
                          log=lambda *_: None)          # compile epoch
        t0 = time.perf_counter()
        for e in range(1, n_epochs + 1):
            trainer.run_epoch(cloader, epoch=e, train=True,
                              log=lambda *_: None)
        elapsed = time.perf_counter() - t0
        rate = n_epochs * audio_s / elapsed / trainer.mesh.devices.size
        extra["epoch_audio_s_per_s_cached"] = round(rate, 1)
        extra["epoch_s_cached"] = round(elapsed / n_epochs, 3)
        extra["cache_mb"] = round(cache.bytes / 2**20, 1)
        # row-sharded over the mesh: per-device HBM (= upload per device)
        # is corpus/N, not a full replica
        extra["cache_mb_per_device"] = round(
            cache.bytes_per_device / 2**20, 1)

        # --- ingest path: host streaming pipeline ---
        loader = ThreadedLoader(
            BucketedLoader(ds, batch_size=256, shuffle=True, seed=0,
                           num_workers=8, wire_dtype="bfloat16"),
            prefetch=4)
        trainer.run_epoch(loader, epoch=0, train=True,
                          log=lambda *_: None)          # compile epoch
        t0 = time.perf_counter()
        for e in range(1, n_epochs + 1):
            trainer.run_epoch(loader, epoch=e, train=True,
                              log=lambda *_: None)
        elapsed = time.perf_counter() - t0
        rate = n_epochs * audio_s / elapsed / trainer.mesh.devices.size
        extra["epoch_audio_s_per_s_with_pipeline"] = round(rate, 1)
        extra["epoch_s"] = round(elapsed / n_epochs, 3)


def bench_frontend(extra: dict) -> None:
    """Feature front-end throughput: the matmul-DFT fbank/MFCC kernels
    (replacing the reference's compute-fbank-feats C++ binaries,
    steps/make_feat.sh:25-39) plus the end-to-end `feat` split path.

    Two kinds of numbers:
      * frontend_{fbank,mfcc}_audio_s_per_s — the jit-compiled batched
        kernel on device-resident waveforms, steady state: the
        speed-of-light-facing number the roofline note in VALIDATION.md
        ("Front-end roofline") analyzes.
      * feat_split_audio_s_per_s — extract_split end to end (wav file
        reads, device fbank, float64 CMVN accumulation, apply-cmvn, ark
        write) at reference test-set scale: the honest pipeline number.
    """
    import tempfile
    import wave
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from mdd_tpu.frontend.fbank import FbankConfig, compute_fbank_batch
    from mdd_tpu.frontend.mfcc import MfccConfig, compute_mfcc_batch

    b, seconds = 128, 3.0
    s = int(16000 * seconds)
    rng = np.random.default_rng(0)
    wav = (3000.0 * rng.standard_normal((b, s))).astype(np.float32)
    lengths = np.full((b,), s, np.int32)
    dev_w = jax.device_put(jnp.asarray(wav))
    dev_l = jax.device_put(jnp.asarray(lengths))
    rounds = 20
    for name, cfg_f, fn in (("fbank", FbankConfig(), compute_fbank_batch),
                            ("mfcc", MfccConfig(), compute_mfcc_batch)):
        jfn = jax.jit(lambda w, l, fn=fn, c=cfg_f: fn(w, l, c))
        feats, _ = jfn(dev_w, dev_l)
        float(feats[0, 0, 0])                      # compile + sync
        t0 = time.perf_counter()
        for _ in range(rounds):
            feats, _ = jfn(dev_w, dev_l)
        float(feats[0, 0, 0])                      # fetch serializes queue
        elapsed = time.perf_counter() - t0
        extra[f"frontend_{name}_audio_s_per_s"] = round(
            rounds * b * seconds / elapsed, 1)

    # end-to-end `feat` path at reference test-set scale (900 utts ~3 s)
    n_utts, utt_seconds = 900, 3.0
    with tempfile.TemporaryDirectory() as d:
        out = Path(d)
        (out / "wav").mkdir()
        scp_lines = []
        pcm_t = int(16000 * utt_seconds)
        for i in range(n_utts):
            path = out / "wav" / f"u{i:04d}.wav"
            pcm = (3000.0 * rng.standard_normal(pcm_t)).astype(np.int16)
            with wave.open(str(path), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(pcm.tobytes())
            scp_lines.append(f"u{i:04d} {path}")
        (out / "wav.scp").write_text("\n".join(scp_lines) + "\n")

        from mdd_tpu.frontend.pipeline import extract_split

        extract_split(str(out / "wav.scp"), str(out / "feat0"),
                      batch_size=128)              # warm the jit shapes
        t0 = time.perf_counter()
        extract_split(str(out / "wav.scp"), str(out / "feat1"),
                      batch_size=128)
        elapsed = time.perf_counter() - t0
        extra["feat_split_audio_s_per_s"] = round(
            n_utts * utt_seconds / elapsed, 1)
        extra["feat_split_s_per_900_utts"] = round(elapsed, 2)


def _trained_eval_variables(cfg, vocab):
    """(variables, model_cfg, tag): the committed syn_full best checkpoint
    when present and vocab-compatible (so the beam's blank-skip operates
    on realistic trained posteriors — BeamSearch.py:93-94 parity), else
    random init (the conservative no-skip case)."""
    import dataclasses as dc
    import os

    import jax
    import jax.numpy as jnp

    from mdd_tpu.models.ctc_model import CTCAttentionModel

    ckpt_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "checkpoints", "syn_full")
    if os.path.exists(os.path.join(ckpt_dir, "best")):
        try:
            from mdd_tpu.cli import _model_config_from_meta
            from mdd_tpu.train.checkpoint import load_checkpoint

            state, meta = load_checkpoint(ckpt_dir, "best")
            model_cfg = _model_config_from_meta(meta)
            if model_cfg.num_class == vocab.n_words:
                model_cfg = dc.replace(
                    model_cfg,
                    use_pallas_lstm=jax.default_backend() == "tpu")
                return ({"params": state["params"],
                         "batch_stats": state["batch_stats"]},
                        model_cfg, "syn_full/best")
        except Exception:  # noqa: BLE001 — fall through to random init
            pass
    model = CTCAttentionModel(cfg)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 64, cfg.input_dim)), jnp.zeros((1, 16), jnp.int32),
        jnp.asarray([16]), train=False)
    return ({"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, cfg, "random_init")


def bench_eval(cfg, extra: dict) -> None:
    """End-to-end `evaluate` at reference scale: loader + DP forward +
    jit beam (K=10, committed LM) + 3-way alignment + MDD accounting for
    900 utterances (the reference decodes the same 900-utt test set in
    3.25 min, result/train.log:3703-3705, scoring extra).  One warm pass
    compiles every bucket shape; the timed pass is the steady-state
    number.  Runs on the trained syn_full checkpoint when available so
    the beam's blank-dominated frame skip fires as in production
    (`eval_checkpoint` in extra records which)."""
    import tempfile
    from pathlib import Path

    from mdd_tpu.data.dataset import BucketedLoader, SpeechDataset
    from mdd_tpu.data.vocab import Vocab
    from mdd_tpu.evals.evaluate import EvalSession, evaluate_model

    from tools.synthetic_corpus import make_split

    phones = _flagship_phones()
    lm_path = "/root/reference/egs/attention_aug/data/lm_phone_bg.arpa"
    import os

    with tempfile.TemporaryDirectory() as d:
        out = Path(d)
        # reference test-set scale: 900 utts (result/train.log:55)
        make_split(out, "test", 900, seed=2, min_phones=16, max_phones=40,
                   phones=phones)
        vocab = Vocab(phones)
        variables, model_cfg, tag = _trained_eval_variables(cfg, vocab)
        extra["eval_checkpoint"] = tag
        session = EvalSession(
            model_cfg, variables,
            vocab, decode_type="beam", beam_width=BEAM_WIDTH,
            lm_path=lm_path if os.path.exists(lm_path) else None,
            lm_alpha=0.5, device_frontend=True)

        def run():
            # device-frontend wire (raw bf16, splice/skip in the jit
            # forward): whole-corpus eval is otherwise bound by the
            # spliced-float32 host->device transfer on this link;
            # ThreadedLoader prefetch overlaps host ark reads + batch
            # assembly with the device forward/decode (which itself
            # overlaps the worker-thread MDD scoring)
            from mdd_tpu.data.prefetch import ThreadedLoader

            ds = SpeechDataset(vocab, str(out / "test.scp"),
                               str(out / "test_phn_text"),
                               str(out / "test_transcript_phn_text"),
                               device_frontend=True)
            # batch 128 + time_quantum 64: finer pipeline granularity for
            # the transfer/decode overlap and ~25% fewer padded wire
            # bytes than one 512-wide bucket (more jit shapes, all
            # compiled in the warm pass)
            loader = ThreadedLoader(
                BucketedLoader(ds, batch_size=128, shuffle=False,
                               num_workers=8, time_quantum=64,
                               wire_dtype="bfloat16"),
                prefetch=4)
            return evaluate_model(session, loader, log=lambda *_: None)

        run()                      # compile every bucket shape
        times = []
        for _ in range(3):         # tunnel dispatch latency varies run to
            t0 = time.perf_counter()   # run; report mean with min/max
            rep = run()
            times.append(time.perf_counter() - t0)
        elapsed = float(np.mean(times))
        assert rep.n_utts == 900
        extra["eval_utts_per_s"] = round(rep.n_utts / elapsed, 1)
        extra["eval_utts_per_s_min"] = round(rep.n_utts / max(times), 1)
        extra["eval_utts_per_s_max"] = round(rep.n_utts / min(times), 1)
        extra["eval_min_per_900_utts"] = round(elapsed / 60, 4)
        extra["eval_vs_reference_decode"] = round(
            REFERENCE_DECODE_MIN_900 / (elapsed / 60), 1)

        # steady-state REPEATED eval (per-epoch dev decoding, CI
        # regression evals): the test corpus pins in HBM like the
        # training set (row-sharded) and every pass moves only index
        # vectors + labels over the link — the transfer bound of the
        # one-shot number disappears
        from mdd_tpu.data.device_cache import (CachedLoader,
                                               DeviceFeatureCache)

        ds = SpeechDataset(vocab, str(out / "test.scp"),
                           str(out / "test_phn_text"),
                           str(out / "test_transcript_phn_text"),
                           device_frontend=True)
        cache = DeviceFeatureCache(ds, mesh=session.mesh,
                                   time_quantum=64,
                                   wire_dtype="bfloat16")
        session.attach_cache(cache)
        # batch 256: with no transfer to hide, fewer dispatches + a more
        # efficient beam win over the one-shot path's 128 (512 loses to
        # padded-row decode waste at 900 utts)
        cloader = CachedLoader(cache, batch_size=256, shuffle=False)
        rep = evaluate_model(session, cloader, log=lambda *_: None)
        assert rep.n_utts == 900
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            rep = evaluate_model(session, cloader, log=lambda *_: None)
            times.append(time.perf_counter() - t0)
        assert rep.n_utts == 900
        elapsed = float(np.mean(times))
        extra["eval_utts_per_s_cached"] = round(900 / elapsed, 1)
        extra["eval_utts_per_s_cached_max"] = round(900 / min(times), 1)


def main() -> None:
    from mdd_tpu.models.ctc_model import ModelConfig

    import jax

    # head sized to the benchmark inventory: the reference's 41 units + 2
    # (= the flagship 43) when the mount is present, else the synthetic set
    cfg = ModelConfig(num_class=len(_flagship_phones()) + 2,
                      compute_dtype="bfloat16",
                      use_pallas_lstm=jax.default_backend() == "tpu")
    # record the head size: without the reference mount the inventory
    # falls back to the synthetic set (25 classes) and the numbers are
    # not directly comparable to flagship-43 runs
    extra: dict = {"model_num_class": cfg.num_class}
    value = bench_train(cfg, extra)
    bench_decode(cfg, extra)
    bench_frontend(extra)
    bench_eval(cfg, extra)
    bench_epoch(cfg, extra)
    print(json.dumps({
        "metric": "train_throughput_audio_seconds_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_S, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
