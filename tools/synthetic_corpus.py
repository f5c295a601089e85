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

# "hard" profile knobs (see hard_signatures): tuned so the flagship model
# plateaus in the reference's regime (dev acc ~0.85, PER 10-20%,
# result/train.log:1848) instead of solving the corpus.
HARD_CLUSTER = 4      # phones per confusable cluster (shared base bands)
HARD_SEP = 0.35       # amplitude of the per-phone distinguishing bumps
HARD_NOISE = 1.3      # per-frame noise sigma (easy profile: 0.35)
HARD_XFADE = 4        # coarticulation crossfade frames at each boundary
HARD_CHANNEL = 0.6    # per-utterance channel offset sigma (log-mel bias)


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


def hard_signature(idx: int) -> np.ndarray:
    """Confusable template: phones in the same cluster (idx // HARD_CLUSTER)
    share their 3 loud base bands; only two low-amplitude bumps of height
    HARD_SEP distinguish a phone from its cluster siblings.  With
    HARD_NOISE-level frame noise the within-cluster Mahalanobis gap is
    small, so posteriors between siblings stay near-tied — the regime the
    reference model lives in (dev acc 0.8446, result/train.log:1848)."""
    cluster = idx // HARD_CLUSTER
    c_rng = np.random.default_rng(2000 + cluster)
    centers = c_rng.choice(np.arange(4, FEAT_DIM - 4), size=3,
                           replace=False)
    base = np.full(FEAT_DIM, -1.0, np.float32)
    for c in centers:
        width = int(c_rng.integers(2, 5))
        base[max(0, c - width):min(FEAT_DIM, c + width)] = \
            2.0 + c_rng.uniform(0.0, 1.0)
    p_rng = np.random.default_rng(3000 + idx)
    bumps = p_rng.choice(np.arange(2, FEAT_DIM - 2), size=2, replace=False)
    for b in bumps:
        base[b - 1:b + 2] += HARD_SEP * p_rng.uniform(0.7, 1.3)
    return base


def synth_utterance(phones, rng, inventory=PHONES, profile: str = "easy"):
    if profile == "easy":
        sigs = []
        for p in phones:
            dur = int(rng.integers(MIN_DUR, MAX_DUR))
            sig = phone_signature(inventory.index(p), rng)
            frames = sig[None, :] + 0.35 * rng.standard_normal(
                (dur, FEAT_DIM)).astype(np.float32)
            sigs.append(frames)
        return np.concatenate(sigs, axis=0)

    # hard: confusable templates + coarticulation + channel + heavy noise
    durs = [int(rng.integers(MIN_DUR, MAX_DUR)) for _ in phones]
    clean = np.concatenate([
        np.repeat(hard_signature(inventory.index(p))[None, :], d, axis=0)
        for p, d in zip(phones, durs)], axis=0)
    # coarticulation: moving-average the template track over time so
    # boundary frames blend adjacent phone spectra (no clean one-hot edge)
    if HARD_XFADE > 1:
        k = HARD_XFADE
        pad = np.pad(clean, ((k // 2, k - 1 - k // 2), (0, 0)), mode="edge")
        kern = np.ones(k, np.float32) / k
        clean = np.apply_along_axis(
            lambda col: np.convolve(col, kern, mode="valid"), 0, pad)
    offset = HARD_CHANNEL * rng.standard_normal(FEAT_DIM).astype(np.float32)
    gain = 1.0 + 0.1 * rng.standard_normal()
    noise = HARD_NOISE * rng.standard_normal(clean.shape).astype(np.float32)
    return (gain * clean + offset[None, :] + noise).astype(np.float32)


def make_split(out: Path, name: str, n: int, seed: int,
               error_rate: float = 0.15,
               min_phones: int = 4, max_phones: int = 12,
               phones=None, profile: str = "easy") -> None:
    """min/max_phones control utterance length: the default 4-12 phones
    (~0.6-1.5 s) keeps CPU tests fast; pass ~16-40 (~2-4.5 s) to match
    the real TIMIT/L2-ARCTIC length distribution for benchmarking.
    `phones` overrides the inventory (e.g. the reference's 41 units so
    benchmarks run the flagship 43-class head); must include 'sil'.
    profile='hard' selects the confusable-cluster acoustics (see
    hard_signature) so trained models land in the reference's PER regime
    instead of solving the corpus.  Injected mispronunciations favor
    cluster siblings under 'hard' — like real L2 errors, the substituted
    phone *sounds close* to the canonical one, so MDD has to separate
    acoustic confusion from actual mispronunciation."""
    from mdd_tpu.frontend import kaldi_io

    inventory = list(phones) if phones is not None else PHONES
    rng = np.random.default_rng(seed)
    content = [p for p in inventory if p != "sil"]
    out.mkdir(parents=True, exist_ok=True)
    ark = str(out / f"{name}.ark")
    scp = str(out / f"{name}.scp")

    def substitute(phone: str) -> str:
        if profile == "hard" and rng.random() < 0.5:
            # half the injected errors are within-cluster confusions
            idx = inventory.index(phone)
            cluster = idx // HARD_CLUSTER
            sibs = [p for p in content
                    if inventory.index(p) // HARD_CLUSTER == cluster
                    and p != phone]
            if sibs:
                return sibs[int(rng.integers(len(sibs)))]
        return content[int(rng.integers(len(content)))]

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
                    actual[j] = substitute(actual[j])
            feats = synth_utterance(actual, rng, inventory, profile)
            w.write(utt, feats)
            lab.write(f"{utt} {' '.join(actual)}\n")
            trn.write(f"{utt} {' '.join(canonical)}\n")


def main(out_dir: str, n_train: int = 400, n_dev: int = 60,
         n_test: int = 60, profile: str = "easy",
         min_phones: int = 4, max_phones: int = 12, units=None) -> None:
    out = Path(out_dir)
    phones = None
    if units:
        phones = [ln.strip() for ln in Path(units).read_text().splitlines()
                  if ln.strip()]
    make_split(out, "train", n_train, seed=0, profile=profile,
               min_phones=min_phones, max_phones=max_phones, phones=phones)
    make_split(out, "dev", n_dev, seed=1, profile=profile,
               min_phones=min_phones, max_phones=max_phones, phones=phones)
    make_split(out, "test", n_test, seed=2, profile=profile,
               min_phones=min_phones, max_phones=max_phones, phones=phones)
    with open(out / "units", "w") as f:
        for p in (phones or PHONES):
            f.write(p + "\n")
    print(f"synthetic corpus -> {out} ({n_train}/{n_dev}/{n_test}, "
          f"profile={profile})")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("sizes", nargs="*", type=int, default=[400, 60, 60])
    ap.add_argument("--profile", choices=("easy", "hard"), default="easy")
    ap.add_argument("--min-phones", type=int, default=4)
    ap.add_argument("--max-phones", type=int, default=12)
    ap.add_argument("--units", default=None,
                    help="units file overriding the phone inventory")
    a = ap.parse_args()
    # per-slot defaults: omitted dev/test sizes stay 60, not the train
    # default (matching the original positional-call semantics)
    sizes = list(a.sizes) + [400, 60, 60][len(a.sizes):]
    main(a.out_dir, *sizes[:3], profile=a.profile,
         min_phones=a.min_phones, max_phones=a.max_phones, units=a.units)
