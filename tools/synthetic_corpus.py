"""Synthetic MDD corpus generator for end-to-end validation.

No TIMIT/L2-ARCTIC is available in this environment, so this tool
synthesizes a corpus with the same file layout (fbank ark/scp +
phn_text + transcript_phn_text) where each phone has a distinct spectral
signature: phone p maps to a band of excited mel bins with additive
noise, durations are random, and "mispronunciations" are injected by
swapping phones between the canonical transcript and the actual
(spoken/labeled) sequence — so a trained model should both transcribe
well (low PER) and surface the injected errors through the MDD pipeline.

Usage: python tools/synthetic_corpus.py OUT_DIR [n_train n_dev n_test]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

PHONES = ["sil", "aa", "ae", "ah", "b", "d", "eh", "er", "f", "g", "ih",
          "iy", "k", "l", "m", "n", "ow", "p", "r", "s", "t", "uw", "z"]
FEAT_DIM = 81
MIN_DUR, MAX_DUR = 6, 16


def phone_signature(idx: int, rng: np.random.Generator) -> np.ndarray:
    """A fixed mel-band template per phone (deterministic by index)."""
    sig_rng = np.random.default_rng(1000 + idx)
    centers = sig_rng.choice(np.arange(4, FEAT_DIM - 4), size=3,
                             replace=False)
    base = np.full(FEAT_DIM, -1.0, np.float32)
    for c in centers:
        width = sig_rng.integers(2, 5)
        lo, hi = max(0, c - width), min(FEAT_DIM, c + width)
        base[lo:hi] = 2.0 + sig_rng.uniform(0.0, 1.0)
    return base


def synth_utterance(phones, rng, inventory=PHONES):
    sigs = []
    for p in phones:
        dur = int(rng.integers(MIN_DUR, MAX_DUR))
        sig = phone_signature(inventory.index(p), rng)
        frames = sig[None, :] + 0.35 * rng.standard_normal(
            (dur, FEAT_DIM)).astype(np.float32)
        sigs.append(frames)
    return np.concatenate(sigs, axis=0)


def make_split(out: Path, name: str, n: int, seed: int,
               error_rate: float = 0.15,
               min_phones: int = 4, max_phones: int = 12,
               phones=None) -> None:
    """min/max_phones control utterance length: the default 4-12 phones
    (~0.6-1.5 s) keeps CPU tests fast; pass ~16-40 (~2-4.5 s) to match
    the real TIMIT/L2-ARCTIC length distribution for benchmarking.
    `phones` overrides the inventory (e.g. the reference's 41 units so
    benchmarks run the flagship 43-class head); must include 'sil'."""
    from mdd_tpu.frontend import kaldi_io

    inventory = list(phones) if phones is not None else PHONES
    rng = np.random.default_rng(seed)
    content = [p for p in inventory if p != "sil"]
    out.mkdir(parents=True, exist_ok=True)
    ark = str(out / f"{name}.ark")
    scp = str(out / f"{name}.scp")
    with kaldi_io.ArkScpWriter(ark, scp) as w, \
            open(out / f"{name}_phn_text", "w") as lab, \
            open(out / f"{name}_transcript_phn_text", "w") as trn:
        for i in range(n):
            utt = f"{name}_{i:05d}"
            length = int(rng.integers(min_phones, max_phones))
            canonical = ["sil"] + [content[rng.integers(len(content))]
                                   for _ in range(length)] + ["sil"]
            actual = list(canonical)
            # inject mispronunciations: substitutions only (keeps
            # alignment simple to verify)
            for j in range(1, len(actual) - 1):
                if rng.random() < error_rate:
                    actual[j] = content[rng.integers(len(content))]
            feats = synth_utterance(actual, rng, inventory)
            w.write(utt, feats)
            lab.write(f"{utt} {' '.join(actual)}\n")
            trn.write(f"{utt} {' '.join(canonical)}\n")


def main(out_dir: str, n_train: int = 400, n_dev: int = 60,
         n_test: int = 60) -> None:
    out = Path(out_dir)
    make_split(out, "train", n_train, seed=0)
    make_split(out, "dev", n_dev, seed=1)
    make_split(out, "test", n_test, seed=2)
    with open(out / "units", "w") as f:
        for p in PHONES:
            f.write(p + "\n")
    print(f"synthetic corpus -> {out} ({n_train}/{n_dev}/{n_test})")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0], *(int(a) for a in args[1:]))
