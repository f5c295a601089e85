"""Speech dataset + bucketed batching for the TPU input pipeline.

Replaces the reference's torch DataLoader stack (utils/data_loader.py:
55-192) with a host-NumPy pipeline built for XLA's compilation model:

  * items join fbank scp + actual-phone labels + canonical transcripts
    (reference SpeechDataset.process_feature_label:79-121 semantics,
    including the `utt.split('.')[0]` scp-key normalization);
  * per-item transform: SpecAugment + canonical-transcript mutation when
    training, context splice, frame skip, pad-to-multiple (data_loader
    __getitem__:123-146);
  * batches are zero-padded and, critically, **bucketed by padded length**
    so the number of distinct jit shapes is bounded (the torch reference
    re-pads every batch to its own max length — free on GPU eager mode,
    a recompile storm under XLA).

Batch layout mirrors the reference collate (create_input:151-181):
(inputs, input_frac_sizes, targets, target_sizes, trans, trans_sizes,
utt_list), with input sizes stored as *fractions* of the padded length —
the consumer multiplies by the model's output frame count
(train_ctc.py:68), reproducing the reference's length bookkeeping
(including its floor-rounding behavior).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from mdd_tpu.data.vocab import Vocab
from mdd_tpu.frontend import kaldi_io
from mdd_tpu.frontend.augment import mutate_transcript, spec_augment
from mdd_tpu.frontend.splice import make_context, pad_to_multiple, skip_frames


@dataclasses.dataclass
class Batch:
    inputs: np.ndarray        # (B, T, D) float32
    input_fracs: np.ndarray   # (B,) float32 — T_i / T_max
    targets: np.ndarray       # (B, L) int32
    target_sizes: np.ndarray  # (B,) int32
    trans: np.ndarray         # (B, L2) int32
    trans_sizes: np.ndarray   # (B,) int32
    utt_ids: List[str]
    # score_mask[i] False marks a multi-host wrap-around duplicate: the
    # row is processed (equal batch counts across hosts) but must not be
    # scored — each utterance is scored on exactly one host.  None means
    # all rows are scoring primaries (single-process loaders).
    score_mask: Optional[np.ndarray] = None

    @property
    def size(self) -> int:
        return self.inputs.shape[0]


def _read_keyed(path: str) -> Dict[str, List[str]]:
    out: Dict[str, List[str]] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            utt, rest = line.split(" ", 1)
            out[utt] = rest.split()
    return out


class SpeechDataset:
    def __init__(
        self,
        vocab: Vocab,
        scp_path: str,
        lab_path: str,
        trans_path: str,
        left_ctx: int = 0,
        right_ctx: int = 2,
        n_skip_frame: int = 2,
        n_downsample: int = 2,
        train: bool = False,
        augment_mode: int = 2,
        mutation_prob: float = 0.1,
        device_frontend: bool = False,
    ):
        self.vocab = vocab
        self.left_ctx, self.right_ctx = left_ctx, right_ctx
        self.n_skip_frame, self.n_downsample = n_skip_frame, n_downsample
        self.train = train
        self.augment_mode = augment_mode
        self.mutation_prob = mutation_prob
        # device_frontend: ship RAW (T, D) features over the wire and run
        # splice + frame-skip on device inside the jit train step
        # (frontend.splice.batched_splice_skip) — (left+1+right)x fewer
        # host->device bytes, the usual bottleneck on remote-attached TPUs.
        self.device_frontend = device_frontend

        scp = kaldi_io.read_scp(scp_path)
        labels = _read_keyed(lab_path)
        trans = _read_keyed(trans_path)
        self.items: List[Tuple[str, str, List[int], List[int]]] = []
        for utt, rx in scp.items():
            key = utt.split(".")[0]
            self.items.append((
                key, rx, vocab.encode(labels[key]), vocab.encode(trans[key])))
        assert len(self.items) == len(labels) == len(trans), \
            "scp/label/transcript files disagree on the utterance set"

    def __len__(self) -> int:
        return len(self.items)

    def feature_dim_out(self, feat_dim: int) -> int:
        return feat_dim * (self.left_ctx + 1 + self.right_ctx)

    def load_item(self, idx: int, rng: Optional[np.random.Generator] = None):
        """-> (feats (T, D'), label ids, trans ids, utt)."""
        utt, rx, label, trans = self.items[idx]
        feat = kaldi_io.load_mat(rx)
        if self.train and rng is not None:
            feat = spec_augment(feat, rng)
            trans = mutate_transcript(trans, self.vocab, rng,
                                      self.mutation_prob, self.augment_mode)
        if not self.device_frontend:
            feat = skip_frames(
                make_context(feat, self.left_ctx, self.right_ctx),
                self.n_skip_frame)
            feat = pad_to_multiple(feat, self.n_downsample)
        return feat.astype(np.float32), list(label), list(trans), utt


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def resolve_wire_dtype(wire_dtype: Optional[str]):
    """Wire-format dtype for feature payloads (shared by BucketedLoader
    and DeviceFeatureCache).  None/'float32' -> float32; 'bfloat16'
    halves host->device bytes (features are CMVN-normalized, so bf16's
    ~3 significant digits lose nothing the model's own bf16 compute
    path wouldn't)."""
    if wire_dtype in (None, "", "float32"):
        return np.float32
    if wire_dtype == "bfloat16":
        import ml_dtypes

        return ml_dtypes.bfloat16
    return np.dtype(wire_dtype)


class BucketedLoader:
    """Batching with shape bucketing.

    Batches are grouped by similar frame length; each batch's time axis is
    padded to a bucket boundary (multiple of `time_quantum`) and label axes
    to multiples of `label_quantum`, so XLA sees a small closed set of
    shapes across the whole run.
    """

    def __init__(
        self,
        dataset: SpeechDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        time_quantum: int = 64,
        label_quantum: int = 16,
        drop_last: bool = False,
        num_workers: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        wire_dtype: Optional[str] = None,
        global_schedule: Optional[bool] = None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.time_quantum = time_quantum
        if getattr(dataset, "device_frontend", False):
            # raw-grid bucketing: quantize on pre-skip frames so the
            # post-skip grid lands on the same time_quantum boundaries,
            # and batched_splice_skip's divisibility holds.
            skip = max(dataset.n_skip_frame, 1)
            self.time_quantum = (
                _round_up(time_quantum * skip,
                          skip * dataset.n_downsample))
        self.label_quantum = label_quantum
        self.wire_dtype = resolve_wire_dtype(wire_dtype)
        self.drop_last = drop_last
        self.num_workers = num_workers
        self._epoch = 0
        self.process_index = process_index
        self.process_count = process_count
        # global_schedule (default: on for multi-process runs): every
        # host computes ONE deterministic batch schedule over the full
        # corpus — lengths learned up front from the ark headers, no
        # feature payloads read — and loads only its own row slice of
        # each global batch.  Equal shapes and batch counts across hosts
        # are then guaranteed by construction (the streaming analogue of
        # CachedLoader's scheme; per-host independent bucketing could
        # diverge in shape and deadlock the collectives).  Off in
        # single-process runs to preserve the established behavior.
        self.global_schedule = (process_count > 1 if global_schedule is None
                                else bool(global_schedule))
        self.shape_coordinated = self.global_schedule or process_count == 1
        if self.global_schedule:
            self._tlens, self._llens, self._l2lens = \
                self._schedule_lengths(dataset)
            self._order = np.arange(len(dataset))
            self._primary = np.ones(len(dataset), bool)
            return
        # Per-host sharding (single process, or explicit opt-out): each
        # host iterates a deterministic, equal-length shard of the
        # utterance list (SURVEY.md §7 hard part 6); the per-item primary
        # flags mark wrap-around duplicates so scoring counts each
        # utterance exactly once across hosts.
        from mdd_tpu.data.prefetch import shard_for_host_primary

        order, primary = shard_for_host_primary(
            list(range(len(dataset))), process_index, process_count)
        self._order = np.asarray(order)
        self._primary = np.asarray(primary, bool)

    @staticmethod
    def _schedule_lengths(dataset):
        """(post-transform frame, label, transcript) lengths per item.

        The global schedule needs every item's shape up front so all
        hosts derive identical batch geometry without reading payloads.
        Ark-backed SpeechDatasets answer from ark headers (one mmap'd
        scan, no feature bytes); any other dataset — stubs, synthetic
        corpora, future storage backends — falls back to loading each
        item once in eval mode (SpecAugment and transcript mutation are
        length-preserving, so probed lengths hold for every epoch)."""
        items = getattr(dataset, "items", None)
        if items is not None:
            from mdd_tpu.frontend import kaldi_io
            from mdd_tpu.frontend.splice import output_frames

            raw_rows = kaldi_io.matrix_rows([rx for _, rx, _, _ in items])
            if getattr(dataset, "device_frontend", False):
                tlens = np.asarray(raw_rows, np.int64)
            else:
                tlens = np.asarray(
                    [output_frames(r, dataset.n_skip_frame,
                                   dataset.n_downsample)
                     for r in raw_rows], np.int64)
            llens = np.asarray([len(it[2]) for it in items], np.int64)
            l2lens = np.asarray([len(it[3]) for it in items], np.int64)
            return tlens, llens, l2lens
        tlens = np.empty(len(dataset), np.int64)
        llens = np.empty(len(dataset), np.int64)
        l2lens = np.empty(len(dataset), np.int64)
        for i in range(len(dataset)):
            feat, label, tr, _ = dataset.load_item(i, rng=None)
            tlens[i], llens[i], l2lens[i] = feat.shape[0], len(label), len(tr)
        return tlens, llens, l2lens

    def __len__(self) -> int:
        if self.global_schedule:
            g = self.batch_size * self.process_count
            n = len(self._order)
            return n // g if self.drop_last else -(-n // g)
        n = len(self._order)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Fast-forward the epoch counter (checkpoint resume).

        The per-item augmentation rngs are keyed (seed + epoch, idx) and
        shuffles by seed + epoch, so a resumed run must continue the
        original epoch sequence — without this the resumed run replays
        the earliest epochs' SpecAugment/mutation/shuffle streams
        (round-3 advisor finding).  Epoch e consumes counter value e-1
        (a fresh loader starts at 0)."""
        self._epoch = int(epoch)

    def _load_many(self, indices, epoch: int):
        """Load items, each with its own deterministic rng stream — safe
        under thread-pool execution and independent of worker count."""

        def load(i):
            rng = (np.random.default_rng((self.seed + epoch, int(i)))
                   if self.ds.train else None)
            return self.ds.load_item(int(i), rng)

        if self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.num_workers) as pool:
                return list(pool.map(load, indices))
        return [load(i) for i in indices]

    def __iter__(self) -> Iterator[Batch]:
        epoch = self._epoch
        rng = np.random.default_rng(self.seed + epoch)
        self._epoch += 1
        if self.global_schedule:
            yield from self._iter_global(epoch, rng)
            return
        order = np.array(self._order)
        primary = np.array(self._primary)
        if self.shuffle:
            perm = rng.permutation(len(order))
            order, primary = order[perm], primary[perm]
            # length-aware shuffling: load in windows, sort each window by
            # length, emit batches — bounds padding waste while staying
            # stochastic.
            window = self.batch_size * 16
        else:
            window = len(order)

        for wstart in range(0, len(order), window):
            widx = order[wstart:wstart + window]
            loaded = self._load_many(widx, epoch)
            loaded = sorted(zip(loaded, primary[wstart:wstart + window]),
                            key=lambda it: it[0][0].shape[0])
            for bstart in range(0, len(loaded), self.batch_size):
                chunk = loaded[bstart:bstart + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    continue
                yield self._collate(chunk)

    def _iter_global(self, epoch: int, rng) -> Iterator[Batch]:
        """Deterministic global batch schedule (multi-process streaming).

        Identical on every host: shuffle the full index list, sort each
        global window by the precomputed post-transform length, chunk
        into global batches of batch_size * process_count rows (tail
        padded by repeating the last item, valid=False).  Each host then
        LOADS only its own row slice; t/l shapes come from the whole
        global chunk, so every host compiles the same program.
        """
        g = self.batch_size * self.process_count
        order = np.array(self._order)
        if self.shuffle:
            order = order[rng.permutation(len(order))]
            window = g * 16
        else:
            window = len(order)
        for wstart in range(0, len(order), window):
            widx = order[wstart:wstart + window]
            widx = widx[np.argsort(self._tlens[widx], kind="stable")]
            for bstart in range(0, len(widx), g):
                chunk = list(widx[bstart:bstart + g])
                if self.drop_last and len(chunk) < g:
                    continue
                yield self._collate_global(chunk, epoch)

    def _collate_global(self, chunk, epoch: int) -> Batch:
        g = self.batch_size * self.process_count
        n_real = len(chunk)
        chunk = chunk + [chunk[-1]] * (g - n_real)   # pad: repeat last
        # shapes from the GLOBAL chunk (identical on every host)
        t_max = _round_up(int(max(self._tlens[i] for i in chunk)),
                          self.time_quantum)
        l_max = _round_up(int(max(self._llens[i] for i in chunk)),
                          self.label_quantum)
        l2_max = _round_up(int(max(self._l2lens[i] for i in chunk)),
                           self.label_quantum)
        lo = self.process_index * self.batch_size
        slots = range(lo, lo + self.batch_size)
        local = [chunk[s] for s in slots]
        loaded = self._load_many(local, epoch)
        b = self.batch_size
        d = loaded[0][0].shape[1]
        inputs = np.zeros((b, t_max, d), self.wire_dtype)
        fracs = np.zeros(b, np.float32)
        targets = np.zeros((b, l_max), np.int32)
        tsizes = np.zeros(b, np.int32)
        trans = np.zeros((b, l2_max), np.int32)
        trsizes = np.zeros(b, np.int32)
        score = np.zeros(b, bool)
        utts = []
        for k, ((feat, label, tr, utt), s) in enumerate(zip(loaded, slots)):
            valid = s < n_real
            inputs[k, : feat.shape[0]] = feat
            fracs[k] = feat.shape[0] / t_max
            targets[k, : len(label)] = label
            tsizes[k] = len(label)
            trans[k, : len(tr)] = tr
            trsizes[k] = len(tr)
            score[k] = valid
            utts.append(utt if valid else "<pad>")
        return Batch(inputs, fracs, targets, tsizes, trans, trsizes, utts,
                     score_mask=score)

    def _collate(self, chunk) -> Batch:
        b = len(chunk)
        t_max = _round_up(max(it[0].shape[0] for it, _ in chunk),
                          self.time_quantum)
        d = chunk[0][0][0].shape[1]
        l_max = _round_up(max(len(it[1]) for it, _ in chunk),
                          self.label_quantum)
        l2_max = _round_up(max(len(it[2]) for it, _ in chunk),
                           self.label_quantum)
        inputs = np.zeros((b, t_max, d), self.wire_dtype)
        fracs = np.zeros(b, np.float32)
        targets = np.zeros((b, l_max), np.int32)
        tsizes = np.zeros(b, np.int32)
        trans = np.zeros((b, l2_max), np.int32)
        trsizes = np.zeros(b, np.int32)
        score = np.zeros(b, bool)
        utts = []
        for i, ((feat, label, tr, utt), prim) in enumerate(chunk):
            inputs[i, :feat.shape[0]] = feat
            fracs[i] = feat.shape[0] / t_max
            targets[i, :len(label)] = label
            tsizes[i] = len(label)
            trans[i, :len(tr)] = tr
            trsizes[i] = len(tr)
            score[i] = prim
            utts.append(utt)
        return Batch(inputs, fracs, targets, tsizes, trans, trsizes, utts,
                     score_mask=score)


def pad_batch_to(batch: Batch, batch_size: int) -> Tuple[Batch, np.ndarray]:
    """Pad a short batch to `batch_size` rows; returns (batch, valid mask).

    Needed for multi-device sharding where B must divide the mesh, and for
    the 897/900-utterance eval sets that don't divide evenly.
    """
    b = batch.size
    if b == batch_size:
        return batch, np.ones(b, bool)
    pad = batch_size - b
    rep = lambda a: np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
    mask = np.concatenate([np.ones(b, bool), np.zeros(pad, bool)])
    score = (np.concatenate([batch.score_mask, np.zeros(pad, bool)])
             if batch.score_mask is not None else None)
    return Batch(rep(batch.inputs), rep(batch.input_fracs), rep(batch.targets),
                 rep(batch.target_sizes), rep(batch.trans),
                 rep(batch.trans_sizes), batch.utt_ids + ["<pad>"] * pad,
                 score_mask=score), mask
