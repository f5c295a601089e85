"""Batched CTC prefix beam search under jit.

TPU-native re-architecture of the host beam search (decode/beam.py, the
semantic ground truth mirroring reference utils/BeamSearch.py:35-153).
Dynamic prefix dicts do not vectorize, so the jit version keeps a
fixed-K beam state per batch element:

  prefixes (K, T) int32        label history (padded)
  lengths  (K,)                prefix lengths
  last     (K,)                last label (or the <s> sentinel V)
  h1, h2   (K,) int32          double rolling hash of the prefix
  p_b, p_nb (K,) float32       log P(prefix ending in blank / non-blank)

Each frame expands K beams into K "stay" + K*C "extend" candidates and
merges candidates that reach the same prefix.  The merge exploits the
structure of the candidate set: live beams are pairwise-distinct
prefixes, so two stays never merge, and two extensions merge only if
their (parent, label) pairs produce equal sequences — impossible for
distinct parents of a deduplicated beam.  The ONLY possible merge is an
extension landing on another beam's stay (parent + [c] == beam_j).
That is a (K*C, K) hash-equality test + a masked log-sum-exp folded
into the stay scores — pure dense VPU work, no sort and no scatter
(an earlier revision lexsorted all K+K*C candidates and ran scattered
segment reductions; the structural merge decodes ~5x faster on TPU).
Top-K over the (now pairwise-distinct) candidates closes the frame —
all inside one lax.scan, vmapped over the batch.  Reference semantics
preserved exactly:

  * blank-dominated frame skip: 1 - p_t(blank) < 0.1 (BeamSearch.py:93-94);
  * repeat-vs-blank gate with the p_{t-1}(blank) >= 0.9 quirk (:109-116);
  * bigram LM fusion on extension via a dense (V+1, V+1) matrix
    compiled from the ARPA file (NgramLM semantics incl. backoff);
  * end-of-sequence LM term and length normalization (:130-145).

Hash collisions between distinct prefixes would merge them incorrectly;
with two independent 32-bit rolling hashes the probability is ~2^-62 per
candidate pair — negligible (and covered by the equivalence tests).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
_MUL1 = np.int32(1000003)
_MUL2 = np.int32(-1640531527)  # 2654435769 as int32 (Knuth)


def _log_add(a, b):
    return jnp.logaddexp(a, b)


@functools.partial(
    jax.jit, static_argnames=("beam_width", "blank", "blank_skip_threshold"))
def _beam_search_batch(
    log_probs,            # (B, T, C) log probabilities
    lengths,              # (B,) valid frame counts
    lm_matrix,            # (V+1, V+1) ln P(w2|w1) * lm_alpha; row V = <s>,
                          # col V = </s>; all-zero when no LM
    beam_width: int,
    blank: int,
    blank_skip_threshold: float,
):
    B, T, C = log_probs.shape
    K = beam_width
    V = lm_matrix.shape[0] - 1  # sentinel index for empty history / EOS

    def single(lp, length):
        # initial state: beam 0 = empty prefix, rest invalid
        prefixes = jnp.zeros((K, T), jnp.int32)
        lengths0 = jnp.zeros((K,), jnp.int32)
        last = jnp.full((K,), V, jnp.int32)
        h1 = jnp.concatenate([jnp.ones((1,), jnp.int32),
                              -2 - jnp.arange(K - 1, dtype=jnp.int32)])
        h2 = jnp.concatenate([jnp.ones((1,), jnp.int32),
                              -2 - jnp.arange(K - 1, dtype=jnp.int32)])
        p_b = jnp.full((K,), NEG_INF, jnp.float32).at[0].set(0.0)
        p_nb = jnp.full((K,), NEG_INF, jnp.float32)

        def step(state, inputs):
            prefixes, lens, last, h1, h2, p_b, p_nb = state
            lp_t, prev_lp_blank, t = inputs
            p_total = _log_add(p_b, p_nb)

            # ---- candidate construction: K "stay" + K*(C) "extend" ----
            # stay: same prefix; blank path collects everything, nonblank
            # path continues the trailing label
            stay_pb = p_total + lp_t[blank]
            stay_pnb = jnp.where(lens > 0, p_nb + lp_t[last], NEG_INF)

            # extensions: beam k extended with class c (c != blank)
            prev_blank_dominant = prev_lp_blank >= jnp.log(0.9)
            labels = jnp.arange(C, dtype=jnp.int32)
            is_repeat = last[:, None] == labels[None, :]          # (K, C)
            base = jnp.where(is_repeat & ~prev_blank_dominant,
                             p_b[:, None], p_total[:, None])
            lm_term = lm_matrix[last, :C]                          # (K, C)
            ext_pnb = base + lp_t[None, :] + lm_term               # (K, C)
            # blank column is not a real extension
            ext_pnb = ext_pnb.at[:, blank].set(NEG_INF)

            # extension hashes (the candidate prefix parent+[c])
            ch1 = h1[:, None] * _MUL1 + labels[None, :] + 1        # (K, C)
            ch2 = h2[:, None] * _MUL2 + labels[None, :] + 1

            # ---- structural merge: extension -> stay collisions only ----
            # (see module docstring: stays are pairwise distinct, and so
            # are extensions; the only equal-prefix pair is ext == stay)
            m = ((ch1.reshape(-1)[:, None] == h1[None, :])
                 & (ch2.reshape(-1)[:, None] == h2[None, :]))   # (KC, K)
            ext_flat = ext_pnb.reshape(-1)
            stay_gain = jax.nn.logsumexp(
                ext_flat[:, None], b=m.astype(ext_flat.dtype), axis=0)
            stay_pnb = jnp.logaddexp(stay_pnb, stay_gain)
            ext_flat = jnp.where(m.any(axis=1), NEG_INF, ext_flat)

            # ---- top-K over the (pairwise-distinct) candidates ----
            cand_total = jnp.concatenate(
                [_log_add(stay_pb, stay_pnb), ext_flat])       # (K + KC,)
            top_val, top_pos = jax.lax.top_k(cand_total, K)
            is_stay = top_pos < K
            j = jnp.where(is_stay, top_pos, 0)                 # stay index
            e = jnp.where(is_stay, 0, top_pos - K)             # ext index
            sel_parent = jnp.where(is_stay, j, e // C).astype(jnp.int32)
            sel_label = (e % C).astype(jnp.int32)
            sel_ext = ~is_stay

            new_prefixes = prefixes[sel_parent]
            put = jnp.clip(lens[sel_parent], 0, T - 1)
            new_prefixes = jnp.where(
                sel_ext[:, None]
                & (jnp.arange(T)[None, :] == put[:, None]),
                sel_label[:, None], new_prefixes)
            new_lens = lens[sel_parent] + sel_ext.astype(jnp.int32)
            new_last = jnp.where(sel_ext, sel_label, last[sel_parent])
            new_h1 = jnp.where(is_stay, h1[j], ch1.reshape(-1)[e])
            new_h2 = jnp.where(is_stay, h2[j], ch2.reshape(-1)[e])
            new_pb = jnp.where(is_stay, stay_pb[j], NEG_INF)
            new_pnb = jnp.where(is_stay, stay_pnb[j], ext_flat[e])

            # ---- frame gating: skip blank-dominated / padded frames ----
            # log(1 - p_blank) < log(threshold)
            p_blank_t = jnp.exp(lp_t[blank])
            skip = ((1.0 - p_blank_t) < blank_skip_threshold) | (t >= length)
            keep = lambda new, old: jnp.where(skip, old, new)
            state = (
                keep(new_prefixes, prefixes),
                keep(new_lens, lens),
                keep(new_last, last),
                keep(new_h1, h1),
                keep(new_h2, h2),
                keep(new_pb, p_b),
                keep(new_pnb, p_nb),
            )
            return state, None

        prev_lp_blank = jnp.concatenate(
            [jnp.asarray([NEG_INF], jnp.float32), lp[:-1, blank]])
        (prefixes, lens, last, h1, h2, p_b, p_nb), _ = jax.lax.scan(
            step,
            (prefixes, lengths0, last, h1, h2, p_b, p_nb),
            (lp, prev_lp_blank, jnp.arange(T)))

        # ---- finalize: EOS LM term + length normalization ----
        p_total = _log_add(p_b, p_nb)
        eos = jnp.where(lens > 0, lm_matrix[last, V], 0.0)
        norm = (p_total + eos) / jnp.maximum(lens, 1)
        best = jnp.argmax(norm)
        return prefixes[best], lens[best]

    return jax.vmap(single)(log_probs, lengths)


class BatchedBeamDecoder:
    """Drop-in batched replacement for decode.beam.BeamSearchDecoder."""

    def __init__(
        self,
        id2word: Dict[int, str],
        beam_width: int = 10,
        blank: int = 0,
        lm=None,
        lm_alpha: float = 0.0,
        blank_skip_threshold: float = 0.1,
    ):
        self.id2word = id2word
        self.beam_width = beam_width
        self.blank = blank
        self.blank_skip_threshold = blank_skip_threshold
        v = max(id2word.keys()) + 1
        if lm is not None and lm_alpha != 0.0:
            self.lm_matrix = jnp.asarray(
                lm.dense_matrix(id2word) * lm_alpha, jnp.float32)
        else:
            self.lm_matrix = jnp.zeros((v + 1, v + 1), jnp.float32)

    def decode(self, probs: np.ndarray,
               lengths: Sequence[int]) -> List[List[int]]:
        """(B, T, C) probabilities -> label id sequences."""
        log_probs = jnp.log(jnp.maximum(jnp.asarray(probs, jnp.float32),
                                        1e-38))
        return self.decode_log(log_probs, lengths)

    def decode_log(self, log_probs, lengths: Sequence[int]) -> List[List[int]]:
        """(B, T, C) LOG probabilities -> label id sequences.

        Skips the probs round-trip — model log-softmax output can be fed
        straight in (the kernel derives p(blank) for the skip/repeat
        gates from the log values itself)."""
        prefixes, lens = _beam_search_batch(
            jnp.asarray(log_probs, jnp.float32),
            jnp.asarray(lengths, jnp.int32), self.lm_matrix,
            beam_width=self.beam_width, blank=self.blank,
            blank_skip_threshold=self.blank_skip_threshold)
        prefixes = np.asarray(prefixes)
        lens = np.asarray(lens)
        return [prefixes[b, : lens[b]].tolist()
                for b in range(prefixes.shape[0])]

    def decode_phones(self, probs, lengths) -> List[List[str]]:
        return [[self.id2word[i] for i in seq]
                for seq in self.decode(probs, lengths)]
