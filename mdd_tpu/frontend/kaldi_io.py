"""Minimal Kaldi ark/scp matrix IO (replaces copy-feats / kaldiio).

Supports the formats the reference pipeline actually uses: binary
float/double matrices ("BFM "/"BDM ") written with `copy-feats
--compress=false`, scp indirection (`utt path:offset`), and text archives.
Pure Python + NumPy; no Kaldi binaries required.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, Tuple

import numpy as np


def read_scp(path: str) -> Dict[str, str]:
    """scp file -> {utt: rxspecifier} preserving order."""
    out: Dict[str, str] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            utt, rx = line.split(" ", 1)
            out[utt] = rx
    return out


def _read_token(f) -> str:
    tok = b""
    while True:
        c = f.read(1)
        if c in (b" ", b""):
            break
        tok += c
    return tok.decode()


def _read_binary_matrix(f) -> np.ndarray:
    token = _read_token(f)
    if token in ("BFM", "BDM"):
        dtype = np.float32 if token == "BFM" else np.float64
        assert f.read(1) == b"\x04"
        rows = struct.unpack("<i", f.read(4))[0]
        assert f.read(1) == b"\x04"
        cols = struct.unpack("<i", f.read(4))[0]
        data = np.frombuffer(f.read(rows * cols * dtype().itemsize), dtype=dtype)
        return data.reshape(rows, cols).astype(np.float32)
    if token in ("BFV", "BDV"):
        dtype = np.float32 if token == "BFV" else np.float64
        assert f.read(1) == b"\x04"
        n = struct.unpack("<i", f.read(4))[0]
        return np.frombuffer(f.read(n * dtype().itemsize), dtype=dtype).astype(np.float32)
    raise ValueError(f"unsupported Kaldi binary token {token!r} "
                     "(compressed matrices are not supported)")


def load_mat(rxspecifier: str) -> np.ndarray:
    """Load one matrix given `path:offset` (scp entry) or a plain path."""
    if ":" in rxspecifier and rxspecifier.rsplit(":", 1)[1].isdigit():
        path, offset = rxspecifier.rsplit(":", 1)
        offset = int(offset)
    else:
        path, offset = rxspecifier, None
    with open(path, "rb") as f:
        if offset is not None:
            f.seek(offset)
        else:
            _read_token(f)  # skip utt id when reading a bare ark
        header = f.read(2)
        if header == b"\x00B":
            return _read_binary_matrix(f)
        raise ValueError("text-format ark reading requires read_text_ark()")


def read_ark(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (utt, matrix) over a binary ark file."""
    with open(path, "rb") as f:
        while True:
            utt = _read_token(f)
            if not utt:
                return
            header = f.read(2)
            if header != b"\x00B":
                raise ValueError("only binary arks are supported")
            yield utt, _read_binary_matrix(f)


class ArkScpWriter:
    """Write (utt, matrix) pairs to a binary ark + scp pair."""

    def __init__(self, ark_path: str, scp_path: str | None = None):
        self.ark_path = ark_path
        self._ark = open(ark_path, "wb")
        self._scp = open(scp_path, "w", encoding="utf-8") if scp_path else None

    def write(self, utt: str, mat: np.ndarray) -> None:
        mat = np.ascontiguousarray(mat, dtype=np.float32)
        self._ark.write(utt.encode() + b" ")
        offset = self._ark.tell()
        self._ark.write(b"\x00B" + b"BFM \x04"
                        + struct.pack("<i", mat.shape[0]) + b"\x04"
                        + struct.pack("<i", mat.shape[1]))
        self._ark.write(mat.tobytes())
        if self._scp:
            self._scp.write(f"{utt} {self.ark_path}:{offset}\n")

    def close(self) -> None:
        self._ark.close()
        if self._scp:
            self._scp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _iter_ark_with_offsets(path: str) -> Iterator[Tuple[str, int, np.ndarray]]:
    """Like read_ark but also yields each entry's '\\0B' marker offset
    (the offset scp entries point at)."""
    with open(path, "rb") as f:
        while True:
            utt = _read_token(f)
            if not utt:
                return
            offset = f.tell()
            if f.read(2) != b"\x00B":
                raise ValueError("only binary arks are supported")
            yield utt, offset, _read_binary_matrix(f)


def bulk_load(rxspecifiers) -> list:
    """Load many scp entries, opening each ark file ONCE.

    The per-entry `load_mat` path opens + seeks per utterance — fine for
    lazy streaming, wasteful for bulk ingest (the device-cache build
    reads the whole corpus up front).  This groups entries by file and
    uses the native mmap reader (native/ark_io.cc) when available,
    falling back to one sequential Python pass per ark.  Returns
    matrices aligned with the input order.
    """
    groups: Dict[str, list] = {}
    order = []
    for k, rx in enumerate(rxspecifiers):
        if ":" in rx and rx.rsplit(":", 1)[1].isdigit():
            path, off = rx.rsplit(":", 1)
            order.append((path, int(off)))
        else:
            order.append((rx, None))
        groups.setdefault(order[-1][0], []).append((k, order[-1][1]))
    out: list = [None] * len(order)
    for path, entries in groups.items():
        reader = None
        try:
            from mdd_tpu.native import NativeArkReader

            reader = NativeArkReader(path)
        except OSError:
            reader = None
        if reader is not None:
            with reader:
                for k, off in entries:
                    i = 0 if off is None else reader.by_offset.get(off)
                    out[k] = (reader.read(i) if i is not None
                              else load_mat(f"{path}:{off}"))
            continue
        by_off: Dict[int, np.ndarray] = {}
        first = None
        for _, off, mat in _iter_ark_with_offsets(path):
            if first is None:
                first = mat
            by_off[off] = mat
        for k, off in entries:
            if off is None:
                out[k] = first
            else:
                mat = by_off.get(off)
                # unknown offset (stale scp): same per-entry fallback as
                # the native path — load_mat raises a clear error if the
                # entry is truly unreadable
                out[k] = mat if mat is not None else load_mat(
                    f"{path}:{off}")
    return out


def _iter_ark_headers(path: str) -> Iterator[Tuple[str, int, int, int]]:
    """Header-only ark scan: (utt, marker_offset, rows, cols) per entry,
    seeking over the payloads — cheap way to learn every matrix's length
    without reading feature data."""
    with open(path, "rb") as f:
        while True:
            utt = _read_token(f)
            if not utt:
                return
            offset = f.tell()
            if f.read(2) != b"\x00B":
                raise ValueError("only binary arks are supported")
            token = _read_token(f)
            if token not in ("BFM", "BDM"):
                raise ValueError(f"unsupported token {token!r}")
            itemsize = 4 if token == "BFM" else 8
            assert f.read(1) == b"\x04"
            rows = struct.unpack("<i", f.read(4))[0]
            assert f.read(1) == b"\x04"
            cols = struct.unpack("<i", f.read(4))[0]
            f.seek(rows * cols * itemsize, 1)
            yield utt, offset, rows, cols


def matrix_rows(rxspecifiers) -> list:
    """Row counts (frame lengths) for many scp entries without reading
    feature payloads — native mmap index when built, header-only seeks
    otherwise.  Input order preserved."""
    groups: Dict[str, list] = {}
    keys = []
    for k, rx in enumerate(rxspecifiers):
        if ":" in rx and rx.rsplit(":", 1)[1].isdigit():
            path, off = rx.rsplit(":", 1)
            keys.append((path, int(off)))
        else:
            keys.append((rx, None))
        groups.setdefault(keys[-1][0], []).append((k, keys[-1][1]))
    out = [0] * len(keys)
    for path, entries in groups.items():
        try:
            from mdd_tpu.native import NativeArkReader

            with NativeArkReader(path) as r:
                for k, off in entries:
                    i = 0 if off is None else r.by_offset.get(off)
                    out[k] = (int(r.rows[i]) if i is not None
                              else load_mat(f"{path}:{off}").shape[0])
            continue
        except OSError:
            pass
        by_off: Dict[int, int] = {}
        first = None
        for _, off, rows, _ in _iter_ark_headers(path):
            if first is None:
                first = rows
            by_off[off] = rows
        for k, off in entries:
            if off is None:
                out[k] = first
            else:
                r = by_off.get(off)
                out[k] = (r if r is not None
                          else load_mat(f"{path}:{off}").shape[0])
    return out
