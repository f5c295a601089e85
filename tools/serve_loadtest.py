"""Sustained-load benchmark for the socket serving path.

Starts a `SocketServer` on an ephemeral TCP port with a real engine,
drives it with N concurrent clients for a fixed duration using the 20
reference demo words (mixed wav lengths, egs/vocabulary/single), and
reports per-request latency percentiles + throughput — the production
serving evidence VALIDATION.md's "Socket serving under sustained load"
table records (the stdin loop's single-burst table only showed one
batch's latency).

Usage:
  python tools/serve_loadtest.py --conf conf/synthetic_full.yaml \
      --checkpoint checkpoints/syn_full \
      --cmvn /root/reference/egs/attention_aug/data/global_fbank_cmvn.txt \
      --clients 4 --seconds 60 [--warmup]
"""

from __future__ import annotations

import argparse
import json
import socket
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

DEMO = Path("/root/reference/egs/vocabulary/single")


def client_loop(port: int, words: list, deadline: float, seed: int,
                latencies: list, errors: list) -> None:
    rng = np.random.default_rng(seed)
    with socket.create_connection(("127.0.0.1", port), timeout=300) as s:
        f = s.makefile("rw", encoding="utf-8")
        i = 0
        while time.time() < deadline:
            wav, word = words[int(rng.integers(len(words)))]
            t0 = time.time()
            f.write(json.dumps({"id": f"{seed}_{i}", "wav": wav,
                                "word": word}) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            dt = time.time() - t0
            if resp.get("status") == "ok":
                latencies.append(dt)
            else:
                errors.append(resp.get("error", "?"))
            i += 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--checkpoint")
    ap.add_argument("--cmvn", required=True)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--warmup", action="store_true",
                    help="precompile the serving shape set first")
    args = ap.parse_args()

    from mdd_tpu.cli import _build_engine
    from mdd_tpu.serve import SocketServer

    eng_args = argparse.Namespace(
        conf=args.conf, checkpoint=args.checkpoint, cmvn=args.cmvn,
        dict_dir=None, ecdict_csv=None, denoise=False, forgiving=None,
        phonetic_format="cmu")
    engine = _build_engine(eng_args)
    if args.warmup:
        t0 = time.time()
        n_shapes = engine.warmup(max_seconds=3.2)
        print(f"warmed {n_shapes} shapes in {time.time() - t0:.1f}s")

    words = []
    for txt in sorted(DEMO.glob("*.txt")):
        wav = txt.with_suffix(".wav")
        if wav.exists():
            words.append((str(wav), txt.read_text().strip().split()[0]))
    assert words, f"no demo words under {DEMO}"

    server = SocketServer(engine, "127.0.0.1:0", max_batch=args.max_batch)
    srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
    srv_thread.start()

    latencies: list = []
    errors: list = []
    deadline = time.time() + args.seconds
    t_start = time.time()
    clients = [threading.Thread(
        target=client_loop,
        args=(server.port, words, deadline, 100 + c, latencies, errors))
        for c in range(args.clients)]
    for c in clients:
        c.start()
    for c in clients:
        c.join()
    wall = time.time() - t_start
    server.shutdown()
    srv_thread.join(timeout=10)

    lat = np.asarray(sorted(latencies))
    out = {
        "clients": args.clients,
        "seconds": round(wall, 1),
        "requests_ok": int(lat.size),
        "errors": len(errors),
        "throughput_req_per_s": round(lat.size / wall, 2),
        "p50_ms": round(1e3 * float(np.percentile(lat, 50)), 1),
        "p90_ms": round(1e3 * float(np.percentile(lat, 90)), 1),
        "p99_ms": round(1e3 * float(np.percentile(lat, 99)), 1),
        "max_ms": round(1e3 * float(lat.max()), 1),
    }
    print(json.dumps(out))
    if errors:
        print("sample errors:", errors[:3], file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
