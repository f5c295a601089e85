"""Persistent serving loop for single-word MDD diagnosis.

The reference's product entry point (`egs/attention_aug/infer.py`)
re-initializes everything per invocation — its own RTF report shows
model + dictionary init dominating wall clock (infer.py:588-597).  For
production serving the engine should load once and answer many requests;
this module provides that as a line-delimited JSON protocol over any
stream pair (stdin/stdout from the CLI) or over a TCP / unix socket with
concurrent clients and cross-client dynamic batching (`SocketServer`,
CLI `serve --socket host:port`):

  request:  {"wav": "/path/to.wav", "word": "about"}
            optional: "id" (echoed), "canonical" (phone list overriding
            G2P — the --phonetic transcript analogue)
  response: {"status": "ok", "id": ..., "word": ..., "score": ...,
             "canonical_row": ..., "ops_row": ..., "decoded_row": ...,
             "insertion_faults": [...], "substitution_faults": [...],
             "deletion_faults": [...], "ipa": ..., "translation": ...,
             "phonics": ..., "seconds": <group wall>,
             "amortized_seconds": <seconds / batch>, "batch": <size>}
  errors:   {"status": "error", "id": ..., "error": "..."}

One response line per request line, in order; EOF shuts down.  The
first request pays the jit compile (or none, with `serve --warmup`);
later requests of similar length reuse the cached executable (lengths
are bucketed by the fbank frame count like every other jit surface).
Responses are deterministic per request: diagnose_words buckets
co-batched items by padded length, so a wav's diagnosis never depends
on what arrived with it.  "seconds" keeps its original meaning — the
wall clock the request actually waited (its whole group's processing
time); "amortized_seconds" is its share of the shared work.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import IO

from mdd_tpu.infer import InferenceEngine


def _diag_response(diag, rid, seconds: float, batch: int) -> dict:
    d = dataclasses.asdict(diag)
    return {
        "status": "ok",
        "id": rid,
        "word": diag.word,
        "score": diag.score,
        "correct": diag.correct,
        "total": diag.total,
        "canonical_row": d["canonical_row"],
        "ops_row": d["ops_row"],
        "decoded_row": d["decoded_row"],
        "insertion_faults": d["insertion_faults"],
        "substitution_faults": d["substitution_faults"],
        "deletion_faults": d["deletion_faults"],
        "ipa": diag.ipa_display,
        "translation": diag.translation,
        "phonics": diag.phonics,
        # seconds: the wall clock this request actually waited (its
        # whole dynamically-batched group's processing time — the
        # latency a client observes, and the field's meaning since the
        # first release); amortized_seconds: this request's share of
        # the shared work (seconds / batch); batch: group size
        "seconds": round(seconds, 4),
        "amortized_seconds": round(seconds / max(batch, 1), 4),
        "batch": batch,
    }


def handle_requests(engine: InferenceEngine, lines: list) -> list:
    """A group of JSON request lines -> responses, in order.

    Valid requests in the group share ONE batched forward/decode
    (engine.diagnose_words — dynamic batching); malformed or failing
    requests get per-request error responses without disturbing the rest.
    """
    t0 = time.time()
    resps: list = [None] * len(lines)
    items, slots = [], []
    for i, line in enumerate(lines):
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            resps[i] = {"status": "error", "error": f"bad json: {e}"}
            continue
        rid = req.get("id")
        wav_path = req.get("wav")
        word = req.get("word")
        if (not wav_path or not word or not isinstance(wav_path, str)
                or not isinstance(word, str)):
            resps[i] = {"status": "error", "id": rid,
                        "error": "request needs string 'wav' and 'word'"}
            continue
        try:
            wav = engine._prepare_audio(wav_path)
        except FileNotFoundError as e:
            resps[i] = {"status": "error", "id": rid, "error": str(e)}
            continue
        except Exception as e:  # noqa: BLE001
            resps[i] = {"status": "error", "id": rid,
                        "error": f"{type(e).__name__}: {e}"}
            continue
        if wav is None:
            resps[i] = {"status": "error", "id": rid,
                        "error": "audio exceeds the maximum length gate"}
            continue
        # unique utt id per slot so same-word requests don't collide
        items.append((f"r{i}", wav, word, req.get("canonical")))
        slots.append((i, rid))
    if items:
        try:
            diags = engine.diagnose_words(items)
            seconds = time.time() - t0
            for (i, rid), diag in zip(slots, diags):
                resps[i] = _diag_response(diag, rid, seconds, len(items))
        except Exception:  # noqa: BLE001 — one bad item must not fail the
            # group: retry each request singly so only the offender errors
            for (i, rid), item in zip(slots, items):
                t1 = time.time()
                try:
                    diag = engine.diagnose_words([item])[0]
                    resps[i] = _diag_response(diag, rid, time.time() - t1,
                                              1)
                except Exception as e:  # noqa: BLE001
                    resps[i] = {"status": "error", "id": rid,
                                "error": f"{type(e).__name__}: {e}"}
    return resps


def handle_request(engine: InferenceEngine, line: str) -> dict:
    """One JSON request line -> one JSON-serializable response dict."""
    return handle_requests(engine, [line])[0]


def serve_loop(engine: InferenceEngine, in_stream: IO[str],
               out_stream: IO[str], log=None, max_batch: int = 16) -> int:
    """Serve until EOF; returns the number of requests handled.

    Requests already queued when one is picked up are processed together
    in one batched forward/decode (up to max_batch).  A reader thread
    pulls complete lines into a queue, so batching sees lines that are
    sitting in the text wrapper's read-ahead buffer (an fd-level select
    would not) and a partial line on the wire never blocks responses to
    requests that are already complete.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue()
    _EOF = object()

    def reader() -> None:
        try:
            for line in in_stream:
                if line.strip():
                    q.put(line.strip())
        finally:
            q.put(_EOF)

    threading.Thread(target=reader, daemon=True).start()

    n = 0
    done = False
    while not done:
        item = q.get()
        if item is _EOF:
            break
        group = [item]
        while len(group) < max_batch:
            try:
                nxt = q.get_nowait()
            except queue.Empty:
                break
            if nxt is _EOF:
                done = True
                break
            group.append(nxt)
        resps = handle_requests(engine, group)
        for resp in resps:
            out_stream.write(json.dumps(resp, ensure_ascii=False) + "\n")
            n += 1
            if log is not None:
                log(f"[serve] #{n} {resp.get('word', '?')} -> "
                    f"{resp['status']} ({resp.get('seconds', 0)}s, "
                    f"batch {len(group)})")
        out_stream.flush()
    return n


class SocketServer:
    """TCP / unix-socket transport around the serve protocol.

    Same line-delimited JSON request/response contract as `serve_loop`,
    over a listening socket with any number of concurrent clients.
    Requests from ALL connections feed one queue; the single batcher
    thread groups whatever is pending (up to `max_batch`) into one
    batched forward/decode and routes each response back to its
    connection — cross-client dynamic batching, so N concurrent clients
    cost ~one client's latency instead of N serialized engine calls.
    Per-connection response order equals request order (the queue is
    FIFO and one batcher writes group by group); responses stay
    per-request deterministic because diagnose_words buckets co-batched
    items by padded length (see module docstring).

    `address` is "host:port" for TCP or a filesystem path for a unix
    socket.  `serve_forever()` blocks until `shutdown()`; `.port` holds
    the bound TCP port (for "host:0" ephemeral binds, as the tests use).
    """

    #: per-connection send timeout: a client that stops reading its
    #: responses must not block the batcher thread (and so every other
    #: client) once its TCP buffer fills — on timeout its response is
    #: dropped and the connection closed
    SEND_TIMEOUT_S = 30.0
    #: shared-queue bound: readers block when the engine falls behind,
    #: giving per-connection backpressure instead of unbounded memory
    QUEUE_MAX = 1024

    def __init__(self, engine: InferenceEngine, address: str,
                 max_batch: int = 16, log=None):
        import queue
        import socket

        self.engine = engine
        self.max_batch = max_batch
        self.log = log
        self.q: "queue.Queue" = queue.Queue(maxsize=self.QUEUE_MAX)
        self._shutdown = False
        self.n_served = 0
        # a path (contains a separator, or no colon at all) is a unix
        # socket; otherwise host:port.  NOTE: for IPv6 use a hostname or
        # a unix socket — bare bracketless IPv6 literals are ambiguous.
        import os

        if os.sep in address or ":" not in address:
            if os.path.exists(address):
                import stat

                if not stat.S_ISSOCK(os.stat(address).st_mode):
                    raise ValueError(
                        f"refusing to replace non-socket file {address!r}")
                os.unlink(address)
            self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self.sock.bind(address)
            self.port = None
        else:
            host, port = address.rsplit(":", 1)
            self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self.sock.bind((host or "127.0.0.1", int(port)))
            self.port = self.sock.getsockname()[1]
        self.sock.listen(64)
        self.sock.settimeout(0.2)   # so the accept loop sees shutdown

    def _reader(self, conn) -> None:
        """Per-connection reader: complete lines -> the shared queue."""
        try:
            with conn.makefile("r", encoding="utf-8", errors="replace") as f:
                for line in f:
                    if line.strip():
                        self.q.put((conn, line.strip()))
        except (OSError, ValueError):
            pass  # client went away mid-line; its queued requests still run

    def _accept_loop(self) -> None:
        import socket

        import struct

        while not self._shutdown:
            try:
                conn, _ = self.sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            # send-only timeout (recv stays blocking so idle clients are
            # fine): a peer that stops reading responses errors out of
            # sendall after SEND_TIMEOUT_S instead of freezing the
            # batcher thread for every other client
            conn.setsockopt(
                socket.SOL_SOCKET, socket.SO_SNDTIMEO,
                struct.pack("ll", int(self.SEND_TIMEOUT_S), 0))
            import threading

            threading.Thread(target=self._reader, args=(conn,),
                             daemon=True).start()

    def serve_forever(self) -> int:
        """Accept + batch until shutdown(); returns requests served."""
        import queue
        import threading

        accept = threading.Thread(target=self._accept_loop, daemon=True)
        accept.start()
        while True:
            try:
                item = self.q.get(timeout=0.2)
            except queue.Empty:
                if self._shutdown:
                    break
                continue
            group = [item]
            while len(group) < self.max_batch:
                try:
                    group.append(self.q.get_nowait())
                except queue.Empty:
                    break
            conns, lines = zip(*group)
            resps = handle_requests(self.engine, list(lines))
            for conn, resp in zip(conns, resps):
                data = (json.dumps(resp, ensure_ascii=False) + "\n").encode()
                try:
                    conn.sendall(data)
                except OSError:
                    # disconnected, or stopped reading until the send
                    # timeout fired: drop the response, close so its
                    # reader exits too, keep serving everyone else
                    try:
                        conn.close()
                    except OSError:
                        pass
                self.n_served += 1
                if self.log is not None:
                    self.log(f"[serve] #{self.n_served} "
                             f"{resp.get('word', '?')} -> {resp['status']} "
                             f"(batch {len(group)})")
        self.sock.close()
        return self.n_served

    def shutdown(self) -> None:
        self._shutdown = True
