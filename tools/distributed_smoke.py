"""Real multi-process `jax.distributed` smoke run (no monkeypatching).

Each participating process runs this script with the same coordinator
port; process 0 hosts the coordinator.  The run executes the actual
multi-host code paths the framework ships:

  * `jax.distributed.initialize` over a localhost coordinator (the CPU
    stand-in for a TPU pod's coordination service),
  * a global ('data',) mesh spanning both processes' devices,
  * DP train steps where every host contributes its local batch shard
    (`parallel.mesh.shard_batch` -> make_array_from_process_local_data)
    and the gradient/loss reduction crosses process boundaries,
  * a DP eval epoch with the host-local WER tallies summed via
    `all_reduce_metrics` (process_allgather),
  * an MDD report reduction (`evals.evaluate.all_reduce_report`) over
    per-host utterance shards.

Writes a JSON result file per process; the single-process invocation of
the same script is the ground truth the multi-process losses must equal
(tests/test_distributed_real.py pins it).

Usage (2 processes):
    python tools/distributed_smoke.py --process-id 0 --num-processes 2 \
        --port 12345 --out /tmp/p0.json &
    python tools/distributed_smoke.py --process-id 1 --num-processes 2 \
        --port 12345 --out /tmp/p1.json
"""

import argparse
import json
import os
import sys

parser = argparse.ArgumentParser()
parser.add_argument("--process-id", type=int, default=0)
parser.add_argument("--num-processes", type=int, default=1)
parser.add_argument("--port", type=int, default=12345)
parser.add_argument("--out", required=True)
parser.add_argument("--local-devices", type=int, default=1,
                    help="virtual CPU devices per process")
parser.add_argument("--steps", type=int, default=3)
args = parser.parse_args()

# Platform env must be pinned before jax imports: the axon TPU plugin in
# this image hangs when initialized from spawned subprocesses.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count="
        f"{args.local_devices}").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

if args.num_processes > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
        initialization_timeout=60)

import numpy as np  # noqa: E402

from mdd_tpu.data.dataset import Batch  # noqa: E402
from mdd_tpu.evals.evaluate import (all_reduce_report,  # noqa: E402
                                    report_to_vector, score_mdd)
from mdd_tpu.models.ctc_model import ModelConfig  # noqa: E402
from mdd_tpu.train.loop import Trainer  # noqa: E402


def main() -> None:
    pid, nproc = args.process_id, args.num_processes
    assert jax.process_index() == pid
    assert jax.process_count() == nproc

    cfg = ModelConfig(input_dim=24, num_class=12, rnn_hidden_size=16,
                      rnn_layers=1, text_embed_size=8)
    trainer = Trainer(cfg, seed=11, sample_t=16, sample_l=4)

    # deterministic GLOBAL batches; every process generates the same ones
    # and slices out its own rows
    b_global, t, l = 8, 16, 4
    b_local = b_global // nproc
    lo, hi = pid * b_local, (pid + 1) * b_local
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(args.steps):
        inputs = rng.standard_normal((b_global, t, cfg.input_dim)).astype(
            np.float32)
        targets = rng.integers(2, cfg.num_class, (b_global, l)).astype(
            np.int32)
        batches.append(Batch(
            inputs=inputs[lo:hi],
            input_fracs=np.full((b_local,), 1.0, np.float32),
            targets=targets[lo:hi],
            target_sizes=np.full((b_local,), l, np.int32),
            trans=targets[lo:hi].copy(),
            trans_sizes=np.full((b_local,), l, np.int32),
            utt_ids=[f"utt{i}" for i in range(lo, hi)],
        ))

    train_losses = []
    for step_batch in batches:
        _, loss = trainer.run_epoch([step_batch], epoch=1, train=True,
                                    log=lambda *_: None)
        train_losses.append(float(loss))

    dev_acc, dev_loss = trainer.run_epoch(batches, epoch=1, train=False,
                                          log=lambda *_: None)

    # MDD reduction over per-host utterance shards: global tallies must be
    # the sum of everyone's shard
    utts = [(f"TXHC_u{i}" if i % 2 else f"ABA_u{i}",
             ["aa", "b", "k"], ["aa", "b"], ["aa", "b"])
            for i in range(6)]
    local_rep = score_mdd(utts[pid::nproc])
    global_rep = all_reduce_report(local_rep)

    # Device-cache leg: every host generates the same tiny corpus, builds
    # the HBM cache, and iterates the GLOBAL batch schedule contributing
    # its row slice — cross-process gather + SpecAugment + splice + train
    # step, losses must match the single-process run.
    import tempfile

    from mdd_tpu.data.dataset import SpeechDataset
    from mdd_tpu.data.device_cache import CachedLoader, DeviceFeatureCache
    from mdd_tpu.data.vocab import Vocab
    from mdd_tpu.frontend import kaldi_io

    d = tempfile.mkdtemp()
    rng2 = np.random.default_rng(5)
    with kaldi_io.ArkScpWriter(f"{d}/f.ark", f"{d}/f.scp") as w, \
            open(f"{d}/lab", "w") as lab_f, open(f"{d}/trn", "w") as trn_f:
        for i in range(10):
            nfrm = int(rng2.integers(16, 48))
            w.write(f"u{i}", rng2.standard_normal((nfrm, 8)).astype(
                np.float32))
            lab_f.write(f"u{i} p2 p3 p4\n")
            trn_f.write(f"u{i} p2 p3 p4\n")
    vocab = Vocab([f"p{i}" for i in range(2, 10)])
    ds = SpeechDataset(vocab, f"{d}/f.scp", f"{d}/lab", f"{d}/trn",
                       train=True, device_frontend=True)
    cfg_dc = ModelConfig(input_dim=24, num_class=10, rnn_hidden_size=16,
                         rnn_layers=1, text_embed_size=8)
    tr2 = Trainer(cfg_dc, seed=3, sample_t=16, sample_l=4,
                  device_frontend=True)
    cache = DeviceFeatureCache(ds, mesh=tr2.mesh, time_quantum=8,
                               wire_dtype="float32")
    cl = CachedLoader(cache, batch_size=8 // nproc, shuffle=True, seed=2,
                      process_index=pid, process_count=nproc)
    _, cached_loss = tr2.run_epoch(cl, epoch=1, train=True,
                                   log=lambda *_: None)

    with open(args.out, "w") as f:
        json.dump({
            "process_id": pid,
            "num_processes": nproc,
            "global_devices": jax.device_count(),
            "train_losses": train_losses,
            "dev_loss": float(dev_loss),
            "dev_acc": float(dev_acc),
            "report_vector": [int(v) for v in
                              report_to_vector(global_rep)],
            "cached_loss": float(cached_loss),
        }, f)
    print(f"[{pid}] distributed smoke OK: train_losses={train_losses}",
          flush=True)


if __name__ == "__main__":
    main()
