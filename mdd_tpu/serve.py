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


def handle_request(engine: InferenceEngine, line: str) -> dict:
    """One JSON request line -> one JSON-serializable response dict."""
    try:
        req = json.loads(line)
    except json.JSONDecodeError as e:
        return {"status": "error", "error": f"bad json: {e}"}
    rid = req.get("id")
    wav_path = req.get("wav")
    word = req.get("word")
    if not wav_path or not word:
        return {"status": "error", "id": rid,
                "error": "request needs 'wav' and 'word'"}
    t0 = time.time()
    try:
        wav = engine._prepare_audio(wav_path)
        if wav is None:
            return {"status": "error", "id": rid,
                    "error": "audio exceeds the maximum length gate"}
        diag = engine.diagnose_word(rid or word, wav, word,
                                    canonical_units=req.get("canonical"))
    except FileNotFoundError as e:
        return {"status": "error", "id": rid, "error": str(e)}
    except Exception as e:  # noqa: BLE001 — a request must not kill the server
        return {"status": "error", "id": rid,
                "error": f"{type(e).__name__}: {e}"}
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
        "seconds": round(time.time() - t0, 4),
    }


def serve_loop(engine: InferenceEngine, in_stream: IO[str],
               out_stream: IO[str], log=None) -> int:
    """Serve until EOF; returns the number of requests handled."""
    n = 0
    for line in in_stream:
        line = line.strip()
        if not line:
            continue
        resp = handle_request(engine, line)
        out_stream.write(json.dumps(resp, ensure_ascii=False) + "\n")
        out_stream.flush()
        n += 1
        if log is not None:
            log(f"[serve] #{n} {resp.get('word', '?')} -> "
                f"{resp['status']} ({resp.get('seconds', 0)}s)")
    return n
