"""WAV / NIST-SPHERE ingestion and resampling (replaces soundfile/sph2pipe).

Reads 16-bit PCM RIFF WAVs with the stdlib `wave` module, NIST SPHERE
files (the TIMIT container handled by sph2pipe in the reference,
local/timit_data_prep.sh:14-18) with a small header parser, and resamples
with a polyphase filter (scipy).  Output is float32 in int16 scale
([-32768, 32767]) to match what the Kaldi front-end consumes.
"""

from __future__ import annotations

import wave

import numpy as np
from scipy.signal import resample_poly


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read PCM WAV -> (float32 mono samples in int16 scale, sample_rate)."""
    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 65536.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) * 256.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if channels > 1:
        data = data.reshape(-1, channels)[:, 0].copy()
    return data, rate


def read_sphere(path: str) -> tuple[np.ndarray, int]:
    """Read a NIST SPHERE file (TIMIT) -> (float32 samples, rate)."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if not magic.startswith(b"NIST_1A"):
            raise ValueError(f"{path} is not a NIST SPHERE file")
        header_size = int(f.read(8).strip())
        f.seek(0)
        header = f.read(header_size).decode("ascii", errors="replace")
        fields = {}
        for line in header.splitlines()[2:]:
            parts = line.split()
            if len(parts) >= 3 and parts[0] != "end_head":
                fields[parts[0]] = parts[2]
        rate = int(fields.get("sample_rate", 16000))
        n = int(fields.get("sample_count", 0))
        byte_fmt = fields.get("sample_byte_format", "01")
        data = np.fromfile(f, dtype="<i2" if byte_fmt == "01" else ">i2", count=n)
    return data.astype(np.float32), rate


def read_audio(path: str) -> tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic.startswith(b"RIFF"):
        return read_wav(path)
    if magic.startswith(b"NIST_1A"):
        return read_sphere(path)
    raise ValueError(f"unknown audio container for {path}")


def resample(data: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return data
    from math import gcd

    g = gcd(orig_sr, target_sr)
    return resample_poly(data, target_sr // g, orig_sr // g).astype(np.float32)


def write_wav(path: str, data: np.ndarray, rate: int) -> None:
    pcm = np.clip(data, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
