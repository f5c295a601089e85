"""MDD evaluation harness: decode a test set, score PER + TA/FR/FA/TR.

The TPU-native equivalent of the reference's
egs/attention_aug/steps/test_ctc_nosil.py: a jit-compiled batched forward
over the bucketed loader, greedy or prefix-beam decoding, sil-stripping,
three pairwise alignments per utterance, hierarchical MDD accounting with
a per-accent (default Mandarin, speaker prefix TXHC) breakdown, and the
decode_seq/human_seq/transcribe dump files the Kaldi scoring path
(result/mdd_result.sh) consumes.

The pure accounting lives in ``score_mdd`` so it can be regression-tested
directly against the committed 900-utterance result dumps.
"""

from __future__ import annotations

import copy
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdd_tpu.align.levenshtein import align
from mdd_tpu.align.mdd import (
    MddCounts,
    alignment_to_slots,
    mdd_accumulate,
    mdd_accumulate_subset,
)
from mdd_tpu.data.dataset import Batch, BucketedLoader, pad_batch_to
from mdd_tpu.data.vocab import Vocab
from mdd_tpu.decode.beam import BeamSearchDecoder
from mdd_tpu.decode.greedy import collapse_ctc
from mdd_tpu.models.ctc_model import CTCAttentionModel, ModelConfig


@dataclass
class MddReport:
    counts: MddCounts = field(default_factory=MddCounts)
    accent_counts: MddCounts = field(default_factory=MddCounts)
    errors: int = 0
    tokens: int = 0
    accent_errors: int = 0
    accent_tokens: int = 0
    n_utts: int = 0
    decode_minutes: float = 0.0

    @property
    def per(self) -> float:
        return 100.0 * self.errors / self.tokens if self.tokens else 0.0

    @property
    def accent_per(self) -> float:
        return (100.0 * self.accent_errors / self.accent_tokens
                if self.accent_tokens else 0.0)


def _strip_sil(tokens: Sequence[str]) -> List[str]:
    return [t for t in tokens if t != "sil"]


def score_mdd(
    triples: Iterable[Tuple[str, Sequence[str], Sequence[str], Sequence[str]]],
    accent_prefixes: Tuple[str, ...] = ("TXHC",),
    strip_sil: bool = True,
) -> MddReport:
    """Score (utt, decoded, label, canonical) phone sequences.

    Reproduces test_ctc_nosil.py:218-298: PER = edit-distance(decoded,
    label) over label tokens; MDD counts from the label<->canonical and
    decoded<->canonical alignment slot dicts.  `accent_prefixes` selects
    the per-accent subset by utterance-id prefix (reference: utt[:4] in
    ['TXHC']).
    """
    rep = MddReport()
    for utt, decoded, label, canonical in triples:
        if strip_sil:
            decoded = _strip_sil(decoded)
            label = _strip_sil(label)
            canonical = _strip_sil(canonical)
        in_accent = any(utt.startswith(p) for p in accent_prefixes)

        _, lc_path = align(label, canonical)
        dist, _ = align(decoded, label)
        _, dc_path = align(decoded, canonical)

        d1 = alignment_to_slots(label, canonical, lc_path)
        d2 = alignment_to_slots(decoded, canonical, dc_path)
        if in_accent:
            mdd_accumulate(copy.deepcopy(d1), copy.deepcopy(d2), rep.counts)
            mdd_accumulate_subset(d1, d2, rep.accent_counts)
            rep.accent_errors += dist
            rep.accent_tokens += len(label)
        else:
            mdd_accumulate(d1, d2, rep.counts)

        rep.errors += dist
        rep.tokens += len(label)
        rep.n_utts += 1
    return rep


_COUNT_FIELDS = ("true_accept", "false_rejection", "false_accept",
                 "tr_correct_diag", "tr_wrong_diag", "total_canonical_phones")
_REPORT_FIELDS = ("errors", "tokens", "accent_errors", "accent_tokens",
                  "n_utts")


def report_to_vector(rep: MddReport) -> np.ndarray:
    """Flatten the integer tallies of an MddReport into one int64 vector
    (counts, accent_counts, then scalar fields) for cross-host psum."""
    vals = [getattr(rep.counts, f) for f in _COUNT_FIELDS]
    vals += [getattr(rep.accent_counts, f) for f in _COUNT_FIELDS]
    vals += [getattr(rep, f) for f in _REPORT_FIELDS]
    return np.asarray(vals, np.int64)


def report_from_vector(vec: np.ndarray) -> MddReport:
    vec = [int(v) for v in np.asarray(vec)]
    n = len(_COUNT_FIELDS)
    counts = MddCounts(**dict(zip(_COUNT_FIELDS, vec[:n])))
    accent = MddCounts(**dict(zip(_COUNT_FIELDS, vec[n:2 * n])))
    rep = MddReport(counts=counts, accent_counts=accent)
    for f, v in zip(_REPORT_FIELDS, vec[2 * n:]):
        setattr(rep, f, v)
    return rep


def all_reduce_report(rep: MddReport) -> MddReport:
    """Sum an MddReport's tallies across all JAX processes.

    Multi-host DP evaluation: each host decodes its own shard of the test
    set (BucketedLoader shards by process_index); the global PER / MDD
    metrics are the elementwise sum of the per-host integer tallies.
    No-op in a single-process run.  decode_minutes stays host-local
    (wall-clock, not summable).
    """
    if jax.process_count() == 1:
        return rep
    from mdd_tpu.parallel.mesh import all_reduce_metrics

    out = report_from_vector(all_reduce_metrics(report_to_vector(rep)))
    out.decode_minutes = rep.decode_minutes
    return out


def _format_counts(c: MddCounts, errors: int, tokens: int) -> List[str]:
    per = 100.0 * errors / tokens if tokens else 0.0
    lines = [
        f"total_error: {errors}",
        f"total_phoneme: {tokens}",
        "Phoneme error rate on test set: %.4f" % per,
        "total :  %d %d" % (c.total_canonical_phones,
                            c.true_accept + c.false_rejection
                            + c.false_accept + c.true_rejection),
        "TA :  %d" % c.true_accept,
        "FR :  %d" % c.false_rejection,
        "FA :  %d" % c.false_accept,
        "TR :  %d" % c.true_rejection,
        "TR correct :  %d" % c.tr_correct_diag,
        "TR wrong :   %d" % c.tr_wrong_diag,
        "Precision : %.4f" % (c.precision * 100),
        "Recall : %.4f" % (c.recall * 100),
        "F1 score : %.4f" % (c.f1 * 100),
    ]
    return lines


def format_mdd_report(rep: MddReport, accent_name: str = "mandarin") -> str:
    lines = ["-" * 13 + " all languages " + "-" * 13]
    lines += _format_counts(rep.counts, rep.errors, rep.tokens)
    lines += ["-" * 15 + f" {accent_name} " + "-" * 15]
    lines += _format_counts(rep.accent_counts, rep.accent_errors,
                            rep.accent_tokens)
    lines.append("time used for decode %d sentences: %.4f minutes."
                 % (rep.n_utts, rep.decode_minutes))
    return "\n".join(lines)


class EvalSession:
    """Jit-compiled batched forward + decoding for evaluation/inference.

    The forward is data-parallel like the train step: the batch is
    sharded over the ('data',) mesh, variables are replicated and passed
    as an explicit jit argument (not a closure constant — one trace
    serves every session), and log-probs come back sharded over their
    batch axis, so eval/decode scale with the mesh exactly as training
    does.  Ragged batches are padded up to the mesh before the forward
    and trimmed after.
    """

    def __init__(
        self,
        model_cfg: ModelConfig,
        variables: Dict,
        vocab: Vocab,
        decode_type: str = "greedy",
        beam_width: int = 10,
        lm_path: Optional[str] = None,
        lm_alpha: float = 0.0,
        host_beam: bool = False,
        mesh=None,
        device_frontend: bool = False,
        left_ctx: int = 0,
        right_ctx: int = 2,
        n_skip_frame: int = 2,
        n_downsample: int = 2,
    ):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mdd_tpu.parallel.mesh import (batch_sharding, make_local_mesh,
                                           replicated)

        self.cfg = model_cfg
        # device_frontend: batches arrive as RAW (B, T_raw, D) features
        # (bf16 on the wire); context splice + frame skip run on device
        # inside the jit forward — ~6x fewer host->device bytes than
        # spliced float32, the dominant cost of whole-corpus eval on a
        # remote-attached chip.  Same contract as the Trainer's.
        self.device_frontend = device_frontend
        self.left_ctx, self.right_ctx = left_ctx, right_ctx
        self.n_skip_frame, self.n_downsample = n_skip_frame, n_downsample
        self.model = CTCAttentionModel(model_cfg)
        # per-host mesh: in multi-process runs each host decodes its own
        # loader shard (all_reduce_report sums the tallies); a global
        # mesh would treat the host-local batch as the global batch and
        # the decoded outputs would span non-addressable devices
        self.mesh = mesh if mesh is not None else make_local_mesh()
        repl = replicated(self.mesh)
        data = batch_sharding(self.mesh)
        tbc = NamedSharding(self.mesh, P(None, "data"))  # (T', B, C) axis 1
        # kept for stage_batch: transferring inputs with the forward's
        # exact in_sharding lets a staging thread move batch N+1 over the
        # host link while batch N decodes (the jit call then reuses the
        # committed arrays without re-transfer)
        self._data_sharding = data
        self._repl = repl
        self._tbc = tbc
        self.cache = None          # set by attach_cache
        self.variables = jax.device_put(variables, repl)
        self.vocab = vocab
        self._fwd = jax.jit(
            self._forward,
            in_shardings=(repl, data, data, data, data),
            out_shardings=(tbc, data))
        # decode_type semantics follow the reference: anything that is not
        # 'greedy'/'Greedy' selects the beam decoder — including the
        # committed config value "Nono" (test_ctc_nosil.py:135-138).
        self.greedy = decode_type.lower() == "greedy"
        if not self.greedy:
            lm = None
            if lm_path:
                from mdd_tpu.decode.arpa import ArpaBigramLM
                lm = ArpaBigramLM(lm_path)
            if host_beam:
                self.beam = BeamSearchDecoder(
                    vocab.index2word, beam_width=beam_width, lm=lm,
                    lm_alpha=lm_alpha)
            else:
                from mdd_tpu.decode.beam_jit import BatchedBeamDecoder
                self.beam = BatchedBeamDecoder(
                    vocab.index2word, beam_width=beam_width, lm=lm,
                    lm_alpha=lm_alpha)

    def _forward_from_raw(self, variables, inputs, raw_len, trans,
                          trsizes):
        """Device-frontend forward on RAW (B, T_raw, D) features: splice
        + frame-skip on device, then the model.  Shared by the streaming
        forward (which derives raw_len from wire fractions) and the
        cached forward (which has true lengths) so the two paths cannot
        diverge."""
        from mdd_tpu.frontend.splice import batched_splice_skip
        from mdd_tpu.train.loop import exact_output_sizes

        inputs, model_frames = batched_splice_skip(
            inputs, raw_len, self.left_ctx, self.right_ctx,
            self.n_skip_frame, self.n_downsample)
        log_probs = self.model.apply(
            variables, inputs, trans, trsizes, train=False)
        frames = exact_output_sizes(model_frames, log_probs.shape[0],
                                    inputs.shape[1])
        return log_probs, frames

    def _forward(self, variables, inputs, fracs, trans, trsizes):
        if self.device_frontend:
            raw_len = jnp.round(fracs * inputs.shape[1]).astype(jnp.int32)
            return self._forward_from_raw(variables, inputs, raw_len,
                                          trans, trsizes)
        log_probs = self.model.apply(
            variables, inputs, trans, trsizes, train=False)
        out_len = log_probs.shape[0]
        frames = (fracs * out_len).astype(jnp.int32)
        return log_probs, frames

    def attach_cache(self, cache) -> None:
        """Enable transfer-free decoding over a DeviceFeatureCache.

        Repeated evaluation of a fixed dev/test set (per-epoch dev
        decoding, CI regression evals, benchmark steady state) should
        not re-ship the corpus over the host link every pass: like the
        Trainer's cached step, the features stay pinned in HBM
        (row-sharded over the mesh) and each batch is assembled inside
        the jit forward by the shared shard_map gather
        (data.device_cache.make_cache_assemble) — the per-batch wire
        traffic is an index vector plus label metadata.  Decodes are
        bit-identical to the streaming path (pinned by
        tests/test_evaluate.py::test_cached_eval_matches_streaming).
        Single-process only (a multi-host cached eval would decode into
        non-addressable devices; multi-host runs keep the per-host
        streaming loader).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mdd_tpu.data.device_cache import make_cache_assemble

        assert self.device_frontend, (
            "cached eval decodes raw cached features; construct the "
            "EvalSession with device_frontend=True")
        assert jax.process_count() == 1, (
            "cached eval is single-process; multi-host runs use the "
            "per-host streaming loader")
        self.cache = cache
        self._cache_sharded = bool(getattr(cache, "shard_rows", True))
        assemble = make_cache_assemble(self.mesh, self._cache_sharded)
        cache_sh = (NamedSharding(self.mesh, P("data"))
                    if self._cache_sharded else self._repl)
        idx_sh = self._repl if self._cache_sharded else self._data_sharding

        def fwd(variables, cache_arr, idx, lengths, trans, trsizes):
            inputs = assemble(cache_arr, idx)
            return self._forward_from_raw(variables, inputs, lengths,
                                          trans, trsizes)

        self._fwd_cached = jax.jit(
            fwd,
            in_shardings=(self._repl, cache_sh, idx_sh,
                          self._data_sharding, self._data_sharding,
                          self._data_sharding),
            out_shardings=(self._tbc, self._data_sharding))

    def stage_batch(self, batch: Batch):
        """Pad to the mesh and move the batch to device.

        Split out of decode_batch so a staging thread can overlap the
        host->device transfer of batch N+1 with the decode of batch N —
        on a remote-attached chip the transfer (~bf16 features of 512
        utterances) and the beam scan are comparable costs, so the
        overlap nearly halves warm whole-corpus eval time.
        Returns (batch, n_real, device_arrays) for decode_staged.
        """
        import jax

        from mdd_tpu.data.device_cache import CachedBatch

        if isinstance(batch, CachedBatch):
            # cached batches are wire-tiny (index vector + labels):
            # nothing to pre-transfer, the jit call moves them itself
            return batch, batch.size, None
        n_real = batch.size
        n_dev = self.mesh.devices.size
        if n_real % n_dev:
            batch, _ = pad_batch_to(batch, -(-n_real // n_dev) * n_dev)
        arrays = jax.device_put(
            (np.asarray(batch.inputs), np.asarray(batch.input_fracs),
             np.asarray(batch.trans), np.asarray(batch.trans_sizes)),
            self._data_sharding)
        return batch, n_real, arrays

    def decode_batch(self, batch) -> Tuple[List[List[str]], np.ndarray]:
        """-> (decoded phone lists, output frame counts).  Accepts a
        feature Batch or (with attach_cache) a CachedBatch."""
        return self.decode_staged(self.stage_batch(batch))

    def decode_staged(self, staged) -> Tuple[List[List[str]], np.ndarray]:
        """Decode a batch already staged on device by stage_batch."""
        batch, n_real, arrays = staged
        if arrays is None:
            assert self.cache is not None, (
                "CachedBatch decoding requires attach_cache(cache)")
            idx = (batch.global_idx if self._cache_sharded
                   and batch.global_idx is not None else batch.idx)
            log_probs, frames = self._fwd_cached(
                self.variables, self.cache.buckets[batch.bucket],
                jnp.asarray(idx), jnp.asarray(batch.lengths),
                jnp.asarray(batch.trans), jnp.asarray(batch.trans_sizes))
        else:
            log_probs, frames = self._fwd(self.variables, *arrays)
        frames = np.asarray(frames)
        if self.greedy:
            ids = np.asarray(jnp.argmax(log_probs, axis=-1)).T  # (B, T)
            seqs = [collapse_ctc(ids[b], int(frames[b]))
                    for b in range(ids.shape[0])]
        elif hasattr(self.beam, "decode_log"):
            # jit beam: feed log-softmax straight in — no host exp /
            # device log round-trip over the (B, T, C) tensor
            seqs = self.beam.decode_log(log_probs.swapaxes(0, 1),
                                        frames.tolist())
        else:
            probs = np.exp(np.asarray(log_probs)).transpose(1, 0, 2)
            seqs = self.beam.decode(probs, frames.tolist())
        return [self.vocab.decode(s) for s in seqs[:n_real]], frames[:n_real]


def _ladder_size(n: int, batch_size: int, n_dev: int) -> int:
    """Pad target for a ragged tail batch: the next power of two >= n
    (and >= the mesh width), capped at the loader's batch size.

    A 1-utterance tail in a length bucket used to pay a full
    `batch_size`-wide forward (pad_batch_to(batch, batch_size)); the
    pow-2 ladder bounds the waste at <2x the tail's own work while
    keeping the compiled shape set small — the same trick
    infer.diagnose_words' BATCH_SIZES ladder uses for serving.
    Eval-mode BN uses running stats and every other op is per-sample,
    so metrics are bit-identical at any padded width (pinned by
    tests/test_evaluate.py).
    """
    p = max(n_dev, 1)
    while p < n:
        p *= 2
    return min(p, batch_size) if batch_size >= n else n


class _AsyncScorer:
    """Scores decoded batches in a worker thread so host-side alignment +
    MDD accounting for batch N overlap the device forward/decode of batch
    N+1 (VERDICT r4: evaluate serialized decode then scoring, so loader +
    decode + scoring times added instead of hiding behind the max).

    All MddReport tallies are order-independent integer sums, so chunked
    accumulation is bit-identical to one score_mdd pass over the full
    triple list (pinned by tests/test_evaluate.py).
    """

    def __init__(self, accent_prefixes: Tuple[str, ...]):
        import queue
        import threading

        self.accent_prefixes = accent_prefixes
        self.vec = np.zeros(len(_COUNT_FIELDS) * 2 + len(_REPORT_FIELDS),
                            np.int64)
        self.q: "queue.Queue" = queue.Queue(maxsize=8)
        self.err: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self) -> None:
        while True:
            chunk = self.q.get()
            if chunk is None:
                return
            if self.err is not None:
                continue   # keep draining so a blocked submit() can't
                # deadlock the eval loop; the error surfaces on join()
            try:
                rep = score_mdd(chunk, self.accent_prefixes)
                self.vec += report_to_vector(rep)
            except BaseException as e:  # noqa: BLE001 — surfaced on join
                self.err = e

    def submit(self, chunk: List) -> None:
        if self.err is None:
            self.q.put(chunk)

    def join(self) -> MddReport:
        self.q.put(None)
        self.thread.join()
        if self.err is not None:
            raise self.err
        return report_from_vector(self.vec)


def evaluate_model(
    session: EvalSession,
    loader: BucketedLoader,
    accent_prefixes: Tuple[str, ...] = ("TXHC",),
    dump_dir: Optional[str] = None,
    log=print,
    overlap_scoring: bool = True,
) -> MddReport:
    """Decode the whole loader and score (test_ctc_nosil.py:165-338).

    With `overlap_scoring` (default) the 3-way alignment + MDD
    accounting runs in a worker thread pipelined one batch behind the
    jit forward/decode, so eval wall clock is bounded by
    max(decode, scoring) instead of their sum; tallies are identical
    either way (order-independent integer sums).
    """
    vocab = session.vocab
    triples = []
    scorer = _AsyncScorer(accent_prefixes) if overlap_scoring else None
    start = time.time()
    batch_size = getattr(loader, "batch_size", None)
    n_dev = session.mesh.devices.size

    def padded(batch):
        from mdd_tpu.data.device_cache import CachedBatch

        if isinstance(batch, CachedBatch):
            # CachedLoader already pads to one fixed shape per bucket and
            # carries its own validity mask
            valid = batch.valid.copy()
            if batch.score_mask is not None:
                valid &= batch.score_mask
            return batch, valid
        valid = np.ones(batch.size, bool)
        if batch_size and batch.size < batch_size:
            # pad the ragged tail up the pow-2 ladder (not to the full
            # batch size) so a short tail pays a proportionate forward
            batch, valid = pad_batch_to(
                batch, _ladder_size(batch.size, batch_size, n_dev))
        if batch.score_mask is not None:
            # exclude multi-host wrap-around duplicates: decoded (equal
            # batch counts across hosts) but scored on exactly one host
            valid &= batch.score_mask
        return batch, valid

    def staged_iter():
        """Stage batch N+1's host->device transfer while batch N
        decodes (plain generator when overlap is off).  The overlap is
        a ThreadedLoader over the staging generator — same bounded
        queue / error propagation / abandon-safety as every other
        producer thread in the framework."""
        staged = ((b, session.stage_batch(b), v)
                  for b, v in (padded(batch) for batch in loader))
        if not overlap_scoring:
            yield from staged
            return
        from mdd_tpu.data.prefetch import ThreadedLoader

        yield from ThreadedLoader(staged, prefetch=2)

    for batch, staged, valid in staged_iter():
        decoded, _ = session.decode_staged(staged)
        chunk = []
        for i, utt in enumerate(batch.utt_ids):
            if not valid[i]:
                continue
            label = vocab.decode(
                batch.targets[i][: batch.target_sizes[i]])
            canonical = vocab.decode(
                batch.trans[i][: batch.trans_sizes[i]])
            chunk.append((utt, decoded[i], label, canonical))
        if scorer is not None:
            scorer.submit(chunk)
        # triples feed the dump files (and the serial scoring path);
        # keeping them is a few strings per utterance
        triples.extend(chunk)

    if dump_dir is not None:
        d = Path(dump_dir)
        if jax.process_count() > 1:
            # each rank holds only its shard's triples; writing the same
            # paths from every rank on a shared filesystem would clobber
            # — per-rank subdirs keep the dumps complete (cat rank*/x to
            # reassemble the full set)
            d = d / f"rank{jax.process_index()}"
        d.mkdir(parents=True, exist_ok=True)
        with open(d / "decode_seq.log", "w") as w1, \
             open(d / "human_seq.log", "w") as w2, \
             open(d / "transcribe.log", "w") as w3:
            for utt, decoded, label, canonical in triples:
                w1.write(f"{utt} {' '.join(_strip_sil(decoded))}\n")
                w2.write(f"{utt} {' '.join(_strip_sil(label))}\n")
                w3.write(f"{utt} {' '.join(_strip_sil(canonical))}\n")

    rep = (scorer.join() if scorer is not None
           else score_mdd(triples, accent_prefixes))
    rep.decode_minutes = (time.time() - start) / 60.0
    # Multi-host: sum tallies across processes so every host logs the
    # global metrics (each host decoded only its loader shard).
    rep = all_reduce_report(rep)
    log(format_mdd_report(rep))
    return rep
