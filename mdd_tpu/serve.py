"""Persistent serving loop for single-word MDD diagnosis.

The reference's product entry point (`egs/attention_aug/infer.py`)
re-initializes everything per invocation — its own RTF report shows
model + dictionary init dominating wall clock (infer.py:588-597).  For
production serving the engine should load once and answer many requests;
this module provides that as a line-delimited JSON protocol over any
stream pair (stdin/stdout from the CLI — trivially wrapped by a socket
server or supervisor):

  request:  {"wav": "/path/to.wav", "word": "about"}
            optional: "id" (echoed), "canonical" (phone list overriding
            G2P — the --phonetic transcript analogue)
  response: {"status": "ok", "id": ..., "word": ..., "score": ...,
             "canonical_row": ..., "ops_row": ..., "decoded_row": ...,
             "insertion_faults": [...], "substitution_faults": [...],
             "deletion_faults": [...], "ipa": ..., "translation": ...,
             "phonics": ..., "seconds": <wall>}
  errors:   {"status": "error", "id": ..., "error": "..."}

One response line per request line, in order; EOF shuts down.  The
first request pays the jit compile; later requests of similar length
reuse the cached executable (lengths are bucketed by the fbank frame
count like every other jit surface).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import IO

from mdd_tpu.infer import InferenceEngine


def _diag_response(diag, rid, seconds: float) -> dict:
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
        "seconds": round(seconds, 4),
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
        if not wav_path or not word:
            resps[i] = {"status": "error", "id": rid,
                        "error": "request needs 'wav' and 'word'"}
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
                resps[i] = _diag_response(diag, rid, seconds)
        except Exception as e:  # noqa: BLE001 — batch failure -> per-req errors
            for i, rid in slots:
                resps[i] = {"status": "error", "id": rid,
                            "error": f"{type(e).__name__}: {e}"}
    return resps


def handle_request(engine: InferenceEngine, line: str) -> dict:
    """One JSON request line -> one JSON-serializable response dict."""
    return handle_requests(engine, [line])[0]


def _drain_ready(in_stream: IO[str], max_batch: int) -> list:
    """Read additional request lines that are ALREADY available on the
    stream without blocking (dynamic batching window).  Only possible
    for real file descriptors; StringIO and friends serve one-by-one."""
    import select

    lines: list = []
    try:
        fd = in_stream.fileno()
    except (AttributeError, OSError):
        return lines
    while len(lines) < max_batch - 1:
        ready, _, _ = select.select([fd], [], [], 0)
        if not ready:
            break
        line = in_stream.readline()
        if not line:
            break
        if line.strip():
            lines.append(line.strip())
    return lines


def serve_loop(engine: InferenceEngine, in_stream: IO[str],
               out_stream: IO[str], log=None, max_batch: int = 16) -> int:
    """Serve until EOF; returns the number of requests handled.

    Requests already queued on the input when one is picked up are
    processed together in one batched forward/decode (up to max_batch).
    """
    n = 0
    for line in in_stream:
        line = line.strip()
        if not line:
            continue
        group = [line] + _drain_ready(in_stream, max_batch)
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
