"""Device-resident feature cache: keep the whole corpus in HBM across epochs.

The host pipeline (data.dataset.BucketedLoader) re-collates and re-ships
every feature matrix to the device every epoch — on a remote-attached TPU
the ~43 MB/s host->device link then bounds epoch throughput at ~8% of the
jit step rate (VALIDATION.md, round 2).  But the features themselves are
static across epochs: only the SpecAugment mask geometry and the
canonical-transcript mutation (both label/metadata-sized) change.  At the
reference corpus scale (5,496 train utts x ~310 raw frames x 81 dims,
result/train.log:54) the whole training set is ~276 MB in bf16 — it fits
v5e HBM (16 GB) dozens of times over.

So: upload the raw 81-dim features ONCE, grouped into shape buckets, and
form each batch on device as a gather from an int32 index vector.  The
per-step wire traffic drops from ~25 MB (bf16 raw batch) to a few KB
(indices + label ids + 4 SpecAugment ints per item).  Epochs >= 2 are
transfer-free.

Equivalence to the host pipeline is exact, not statistical: the loader
draws each item's np.random.Generator with the same (seed + epoch, idx)
key and consumes it in the same order as SpeechDataset.load_item —
SpecAugment geometry first (frontend.augment.sample_spec_augment_params,
applied on device by apply_spec_augment_masks), transcript mutation second
— so masked features and mutated transcripts are bit-identical to what
the host pipeline would have shipped (tests/test_device_cache.py).

Replaces the input layer of the reference's utils/data_loader.py:123-146
for the steady-state training path; the host pipeline remains the
first-epoch/streaming ingest.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from mdd_tpu.data.dataset import (SpeechDataset, _round_up,
                                  resolve_wire_dtype)
from mdd_tpu.frontend.augment import (
    mutate_transcript,
    sample_spec_augment_params,
)
from mdd_tpu.parallel.mesh import make_mesh, replicated


@dataclasses.dataclass
class CachedBatch:
    """One training batch expressed as device-cache coordinates.

    The feature payload never touches the host: `idx` indexes rows of the
    bucket's HBM-resident array.  Everything here is wire-tiny.
    """

    bucket: int               # raw-frame bucket key (device array lookup)
    idx: np.ndarray           # (B,) int32 — rows into the bucket array
    lengths: np.ndarray       # (B,) int32 — true raw frame counts
    aug: np.ndarray           # (B, 4) int32 — [f, f0, w, t0]; zeros = no-op
    targets: np.ndarray       # (B, L) int32
    target_sizes: np.ndarray  # (B,) int32
    trans: np.ndarray         # (B, L2) int32 — mutated when training
    trans_sizes: np.ndarray   # (B,) int32
    utt_ids: List[str]
    valid: np.ndarray         # (B,) bool — False rows are batch padding
    score_mask: Optional[np.ndarray] = None  # multi-host scoring primaries
    # (B_global,) int32 — the FULL global batch's row ids (identical on
    # every host).  The row-sharded cache gather needs every device to
    # see all slots' ids (train.loop shard_map assemble); equals `idx`
    # in single-process runs.
    global_idx: Optional[np.ndarray] = None

    @property
    def size(self) -> int:
        return self.idx.shape[0]


def make_cache_assemble(mesh, sharded: bool = True):
    """-> assemble(cache, idx): gather global batch rows from a bucket
    array inside jit.

    With `sharded` (DeviceFeatureCache's default row-sharded layout),
    assembly is a shard_map: each device takes the rows it owns for
    every global batch slot (out-of-shard slots contribute exact zeros)
    and one psum_scatter over ICI delivers slot k's row to the device
    that computes batch row k — bit-identical to a replicated-cache
    take since exactly one device contributes each slot.  `idx` must be
    the FULL global batch's row ids, replicated (CachedBatch.global_idx).
    With `sharded=False` the cache is replicated and assemble is a plain
    take over the (host-sharded) idx.

    Shared by the Trainer's cached step (train/loop._make_cached_step)
    and the cached evaluation forward (evals.evaluate.EvalSession).
    """
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_total = int(mesh.devices.size)

    if not sharded:
        def assemble(cache, idx):
            return jnp.take(cache, idx, axis=0)
        return assemble

    def assemble(cache, idx):
        m = cache.shape[0] // n_total

        def body(c_local, idx_full):
            d = jax.lax.axis_index("data")
            local = idx_full - d * m
            ok = (local >= 0) & (local < m)
            rows = jnp.take(c_local, jnp.clip(local, 0, m - 1), axis=0)
            contrib = jnp.where(ok[:, None, None], rows,
                                jnp.zeros((), c_local.dtype))
            return jax.lax.psum_scatter(
                contrib, "data", scatter_dimension=0, tiled=True)

        return shard_map(body, mesh=mesh,
                         in_specs=(P("data"), P()),
                         out_specs=P("data"))(cache, idx)

    return assemble


class DeviceFeatureCache:
    """Load a SpeechDataset's features once and pin them in device memory.

    Features are grouped into raw-length buckets (same raw-grid quantum as
    BucketedLoader's device-frontend mode, so batched_splice_skip's
    divisibility holds) and stacked into one (n_b, T_b, D) array per
    bucket, **row-sharded over the ('data',) mesh axis**: device d holds
    rows [d*m, (d+1)*m) of each bucket, so per-device HBM is ~corpus/N and
    the one-time upload moves each byte to exactly one device.  Batch
    assembly inside the jit step is a shard_map local-gather +
    psum_scatter over ICI (train.loop._make_cached_step) — each batch
    row's (T, D) payload crosses ICI exactly once (~0.25 ms for a 25 MB
    batch at ICI bandwidth), and the assembled batch is bit-identical to
    the old fully-replicated gather (one device contributes each row; the
    others add exact bf16 zeros).  `shard_rows=False` restores the
    replicated layout (used when the consumer isn't the sharded step).
    """

    def __init__(
        self,
        dataset: SpeechDataset,
        mesh=None,
        time_quantum: int = 64,
        wire_dtype: str = "bfloat16",
        num_workers: int = 8,   # unused since the bulk-ingest path
        # (kaldi_io.bulk_load opens each ark once); kept for API compat
        shard_rows: bool = True,
    ):
        assert getattr(dataset, "device_frontend", False), (
            "DeviceFeatureCache requires a device_frontend dataset: the "
            "cache stores RAW features; splice/skip run inside the jit step")
        self.ds = dataset
        self.mesh = mesh if mesh is not None else make_mesh()
        self.shard_rows = shard_rows
        n_dev = int(self.mesh.devices.size)
        skip = max(dataset.n_skip_frame, 1)
        self.raw_quantum = _round_up(time_quantum * skip,
                                     skip * dataset.n_downsample)
        dtype = resolve_wire_dtype(wire_dtype)

        # bulk ingest: one open (native mmap index when built) per ark
        # file instead of one open+seek per utterance
        from mdd_tpu.frontend import kaldi_io

        n = len(dataset)
        feats = [np.asarray(f, np.float32) for f in kaldi_io.bulk_load(
            [rx for _, rx, _, _ in dataset.items])]

        self.feat_dim = feats[0].shape[1]
        self.lengths = np.asarray([f.shape[0] for f in feats], np.int32)
        # bucket assignment + per-bucket dense arrays
        self.bucket_items: Dict[int, List[int]] = {}
        row_of = np.zeros(n, np.int32)
        for i, f in enumerate(feats):
            b = _round_up(f.shape[0], self.raw_quantum)
            rows = self.bucket_items.setdefault(b, [])
            row_of[i] = len(rows)
            rows.append(i)
        self.row_of = row_of
        self.buckets: Dict[int, jax.Array] = {}
        self.bytes = 0
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = (NamedSharding(self.mesh, P("data")) if shard_rows
                    else replicated(self.mesh))
        for b, rows in self.bucket_items.items():
            # row-sharded arrays need the row count divisible by the mesh;
            # pad rows never appear in row_of, so they are never gathered
            n_rows = (_round_up(len(rows), n_dev) if shard_rows
                      else len(rows))
            arr = np.zeros((n_rows, b, self.feat_dim), dtype)
            for r, i in enumerate(rows):
                arr[r, : feats[i].shape[0]] = feats[i]
            self.bytes += arr.nbytes
            # make_array_from_callback uploads exactly the rows each
            # device owns (and works under real multi-process runs, where
            # device_put to a global sharding would see non-addressable
            # devices)
            self.buckets[b] = jax.make_array_from_callback(
                arr.shape, sharding, lambda idx, a=arr: a[idx])
        # replicated layouts keep a full copy on every device
        self.bytes_per_device = (self.bytes // n_dev if shard_rows
                                 else self.bytes)

    def __len__(self) -> int:
        return len(self.ds)


class CachedLoader:
    """Iterate CachedBatches over a DeviceFeatureCache, epoch by epoch.

    Mirrors BucketedLoader's contract (batch_size attribute, per-epoch
    shuffling, multi-host sharding with scoring-primary flags) but emits
    index-vector batches instead of feature payloads.  Batches are always
    padded to the full batch_size (repeating the last row, valid=False) so
    every bucket contributes exactly one jit shape.
    """

    def __init__(
        self,
        cache: DeviceFeatureCache,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        label_quantum: int = 16,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.cache = cache
        self.ds = cache.ds
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.label_quantum = label_quantum
        self._epoch = 0
        self.process_index = process_index
        self.process_count = process_count
        # Per-host emitted batches are padded up to the mesh's per-host
        # row quantum so every batch shards evenly.
        #
        # Multi-process: unlike BucketedLoader (which shards the ITEM
        # list per host — fine when each host pads its own batches but a
        # collective-deadlock hazard if per-host bucket schedules
        # diverge in shape), the cached loader builds ONE deterministic
        # GLOBAL batch schedule over the full corpus — identical on
        # every host by construction — and each host contributes its own
        # row slice of every global batch (the Trainer's shard_batch
        # assembles them via make_array_from_process_local_data).  Equal
        # shapes and batch counts across hosts are then guaranteed, and
        # each utterance appears in exactly one global batch.
        n_local = max(1,
                      cache.mesh.devices.size // jax.process_count())
        self._pad_to = -(-batch_size // n_local) * n_local
        self._global_chunk = batch_size * process_count
        self._buckets: Dict[int, List[int]] = {}
        for i in range(len(cache)):
            b = _round_up(int(cache.lengths[i]), cache.raw_quantum)
            self._buckets.setdefault(b, []).append(i)

    def __len__(self) -> int:
        return sum(-(-len(rows) // self._global_chunk)
                   for rows in self._buckets.values())

    def set_epoch(self, epoch: int) -> None:
        """Fast-forward the epoch counter (checkpoint resume) — same
        contract as BucketedLoader.set_epoch: the per-item augmentation
        rng keys and shuffles are epoch-derived, so a resumed run must
        continue the original sequence."""
        self._epoch = int(epoch)

    def __iter__(self) -> Iterator[CachedBatch]:
        epoch = self._epoch
        self._epoch += 1
        rng = np.random.default_rng(self.seed + epoch)
        batches: List[Tuple[int, List[int]]] = []
        for b in sorted(self._buckets):
            rows = self._buckets[b]
            idx = rng.permutation(len(rows)) if self.shuffle else range(len(rows))
            chunk: List[int] = []
            for j in idx:
                chunk.append(rows[j])
                if len(chunk) == self._global_chunk:
                    batches.append((b, chunk))
                    chunk = []
            if chunk:
                batches.append((b, chunk))
        if self.shuffle:
            rng.shuffle(batches)  # type: ignore[arg-type]
        for b, chunk in batches:
            yield self._make_batch(b, chunk, epoch)

    def _make_batch(self, bucket: int, chunk: Sequence[int],
                    epoch: int) -> CachedBatch:
        cache, ds = self.cache, self.ds
        n_real = len(chunk)
        b = self._pad_to * self.process_count       # global padded rows
        idx = np.zeros(b, np.int32)
        lengths = np.zeros(b, np.int32)
        aug = np.zeros((b, 4), np.int32)
        valid = np.zeros(b, bool)
        utts: List[str] = []
        labels: List[List[int]] = []
        transcripts: List[List[int]] = []
        for k in range(b):
            i = chunk[min(k, n_real - 1)]
            utt, _, label, trans = ds.items[i]
            t = int(cache.lengths[i])
            if ds.train and k < n_real:
                # same per-item Generator key and draw order as the host
                # pipeline (BucketedLoader._load_many -> load_item):
                # SpecAugment geometry first, transcript mutation second
                irng = np.random.default_rng((self.seed + epoch, int(i)))
                aug[k] = sample_spec_augment_params(t, cache.feat_dim, irng)
                trans = mutate_transcript(trans, ds.vocab, irng,
                                          ds.mutation_prob, ds.augment_mode)
            idx[k] = cache.row_of[i]
            lengths[k] = t
            valid[k] = k < n_real
            utts.append(utt if k < n_real else "<pad>")
            labels.append(list(label))
            transcripts.append(list(trans))
        l_max = _round_up(max(len(l) for l in labels), self.label_quantum)
        l2_max = _round_up(max(len(t) for t in transcripts), self.label_quantum)
        targets = np.zeros((b, l_max), np.int32)
        tsizes = np.zeros(b, np.int32)
        trans_a = np.zeros((b, l2_max), np.int32)
        trsizes = np.zeros(b, np.int32)
        for k in range(b):
            targets[k, : len(labels[k])] = labels[k]
            tsizes[k] = len(labels[k])
            trans_a[k, : len(transcripts[k])] = transcripts[k]
            trsizes[k] = len(transcripts[k])
        # each utterance occupies exactly one global slot -> every valid
        # row is a scoring primary
        score = valid.copy()
        if self.process_count > 1:
            # this host's row slice of the global batch; global_idx keeps
            # the full schedule for the row-sharded cache gather
            lo = self.process_index * self._pad_to
            hi = lo + self._pad_to
            sl = slice(lo, hi)
            return CachedBatch(bucket, idx[sl], lengths[sl], aug[sl],
                               targets[sl], tsizes[sl], trans_a[sl],
                               trsizes[sl], utts[lo:hi], valid[sl],
                               score_mask=score[sl], global_idx=idx)
        return CachedBatch(bucket, idx, lengths, aug, targets, tsizes,
                           trans_a, trsizes, utts, valid, score_mask=score,
                           global_idx=idx)
