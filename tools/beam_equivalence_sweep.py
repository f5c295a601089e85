"""Full-scale host-vs-jit beam equivalence sweep with statistics.

Runs N random (and blank-heavy) matrices at the production operating
point (C=43 committed vocab, T=220, K=10, committed bigram LM,
lm_alpha=0.5) and reports:

  * exact-match rate,
  * per-divergence signed score gaps (jit - host) under the unpruned
    float64 constrained-forward scorer,
  * aggregate token error rate between the two decoders' outputs.

Beam search over dense near-uniform posteriors is chaotic: float32 (jit)
vs float64 (host) accumulation reorders near-tied beams at pruning
boundaries, and a dropped beam can later win — in EITHER direction.  The
sweep quantifies that the divergences are (a) rare, (b) score-tied or
nearly so, and (c) not systematically biased against the jit decoder.

Usage: python tools/beam_equivalence_sweep.py [N] (default 1000)
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))


def main(n: int = 1000) -> None:
    from mdd_tpu.align.levenshtein import edit_distance
    from mdd_tpu.data.vocab import Vocab
    from mdd_tpu.decode.arpa import ArpaBigramLM
    from mdd_tpu.decode.beam import BeamSearchDecoder
    from mdd_tpu.decode.beam_jit import BatchedBeamDecoder
    from test_beam_equivalence_scale import T, K, LM_ALPHA, constrained_score

    data = pathlib.Path("/root/reference/egs/attention_aug/data")
    vocab = Vocab.from_units_file(str(data / "units"))
    lm = ArpaBigramLM(str(data / "lm_phone_bg.arpa"))
    host = BeamSearchDecoder(vocab.index2word, beam_width=K, lm=lm,
                             lm_alpha=LM_ALPHA)
    jit = BatchedBeamDecoder(vocab.index2word, beam_width=K, lm=lm,
                             lm_alpha=LM_ALPHA)

    rng = np.random.default_rng(2024)
    n_random = n // 2
    n_blank = n - n_random
    mats = []
    for _ in range(n_random):
        logits = rng.standard_normal((T, vocab.n_words)).astype(np.float32)
        mats.append(logits * 1.5)
    for _ in range(n_blank):
        logits = rng.standard_normal((T, vocab.n_words)).astype(np.float32)
        logits[:, 0] += rng.uniform(2.0, 5.0)
        hot = rng.integers(0, T, 25)
        logits[hot, 0] -= 6.0
        mats.append(logits * 1.5)
    probs = np.exp(np.stack(mats) - np.stack(mats).max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)

    gaps, errs, toks, n_exact = [], 0, 0, 0
    chunk = 64
    for s in range(0, n, chunk):
        p = probs[s:s + chunk]
        lengths = [T] * len(p)
        got = jit.decode(p, lengths)
        want = host.decode(p, lengths)
        for i, (a, b) in enumerate(zip(got, want)):
            toks += len(b)
            if a == b:
                n_exact += 1
                continue
            errs += edit_distance(a, b)[0]
            sa = constrained_score(p[i], T, a, vocab.index2word, lm,
                                   LM_ALPHA)
            sb = constrained_score(p[i], T, b, vocab.index2word, lm,
                                   LM_ALPHA)
            gaps.append(sa - sb)
        done = min(s + chunk, n)
        print(f"  {done}/{n}: exact {n_exact}, divergent {len(gaps)}",
              file=sys.stderr)

    gaps_arr = np.asarray(gaps) if gaps else np.zeros(1)
    report = {
        "n": n,
        "exact": n_exact,
        "exact_rate": round(n_exact / n, 4),
        "divergent": len(gaps),
        "token_err_rate": round(errs / max(1, toks), 6),
        "gap_mean": round(float(gaps_arr.mean()), 6),
        "gap_min": round(float(gaps_arr.min()), 6),
        "gap_max": round(float(gaps_arr.max()), 6),
        "gap_abs_max": round(float(np.abs(gaps_arr).max()), 6),
        "jit_better": int((gaps_arr > 0).sum()) if gaps else 0,
        "host_better": int((gaps_arr < 0).sum()) if gaps else 0,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
