"""Product inference: single-word pronunciation diagnosis.

The TPU-native counterpart of the reference demo entry point
(egs/attention_aug/infer.py:435-601): for each `N.wav` + `N.txt` prompt
pair in a directory —

  resample -> (optional denoise hook) -> fbank + committed-CMVN ->
  CTC-attention forward + greedy/beam decode -> strip sil / drop err ->
  align decoded vs canonical -> per-phone fault lists -> 0-100 score ->
  printable report + RTF breakdown.

Deliberate fixes versus the reference, documented per SURVEY.md §7:
input wavs are never rewritten on resample (infer.py:501-503 mutates the
user's file), temp artifacts are never scattered next to the inputs, and
CUDA is not force-disabled — the model runs on whatever device jit picks.
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from mdd_tpu.align.levenshtein import align
from mdd_tpu.align.mdd import (
    align_canonical_decoded,
    apply_forgiveness,
    fault_statistics,
    word_score,
)
from mdd_tpu.data.dataset import Batch
from mdd_tpu.data.vocab import Vocab
from mdd_tpu.evals.evaluate import EvalSession
from mdd_tpu.frontend.cmvn import CmvnStats
from mdd_tpu.frontend.fbank import FbankConfig
from mdd_tpu.frontend.splice import make_context, pad_to_multiple, skip_frames
from mdd_tpu.frontend.wav import read_audio, resample
from mdd_tpu.lexicon.dictionary import CMU_TO_IPA_WIKI, Phonetic
from mdd_tpu.models.ctc_model import ModelConfig


def read_phonemes_from_textgrid(path: str) -> List[str]:
    """Canonical phones from a TextGrid (the `--phonetic transcript`
    mode, infer.py:374-403).

    NOTE: the reference function is broken — an indentation slip puts
    all its normalization inside the empty-mark branch, so every
    non-empty mark is dropped and empty marks emit "sil" twice.  We
    implement the evident intent: strip stress digits, fold reduced
    vowels (AX/AH0 -> ah, ER0 -> er — this path uses the 39-phone set),
    map silence/error tokens, lowercase.
    """
    from mdd_tpu.data.textgrid import TextGrid
    from mdd_tpu.lexicon.phones import normalize_canonical_phone

    tg = TextGrid.fromFile(path)
    return [normalize_canonical_phone(iv.mark or "", keep_reduced=False)
            for iv in tg[1]]


@dataclasses.dataclass
class WordDiagnosis:
    utt_id: str
    word: str
    ipa_display: str
    translation: str
    canonical_row: str
    ops_row: str
    decoded_row: str
    insertion_faults: List[str]
    substitution_faults: List[str]
    deletion_faults: List[str]
    correct: int
    total: int
    score: int
    phonics: str = ""   # letter->IPA breakdown (phonics_engine.csv)

    def render(self) -> str:
        lines = [
            "id     : " + self.utt_id,
            f"{self.utt_id}: {self.word}",
            self.ipa_display,
        ]
        if self.phonics:
            lines.append("phonics: " + self.phonics)
        if self.translation:
            lines.append(self.translation)
        lines += [
            self.canonical_row,
            self.ops_row,
            self.decoded_row,
            "ins err: " + " ".join(self.insertion_faults),
            "sub err: " + " ".join(self.substitution_faults),
            "del err: " + " ".join(self.deletion_faults),
            f"Comp.  : {self.correct}/{self.total}",
            f"score  : {self.score}",
            "",
        ]
        return "\n".join(lines)


def _aligned_rows(decoded: Sequence[str], canonical: Sequence[str],
                  ops: Sequence[str]) -> Tuple[str, str, str]:
    """Column-aligned canonical / op / decoded display rows
    (reference print_aligned_string semantics)."""
    widths = [max(len(str(canonical[i])), len(str(decoded[i])), 1)
              for i in range(len(ops))]
    can = " ".join(str(canonical[i]).ljust(widths[i]) for i in range(len(ops)))
    op = " ".join(str(ops[i]).ljust(widths[i]) for i in range(len(ops)))
    dec = " ".join(str(decoded[i]).ljust(widths[i]) for i in range(len(ops)))
    return ("canonical : " + can, "            " + op, "decode    : " + dec)


class InferenceEngine:
    """End-to-end single-word diagnosis."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        variables: Dict,
        vocab: Vocab,
        cmvn: CmvnStats,
        phonetic: Optional[Phonetic] = None,
        decode_type: str = "greedy",
        beam_width: int = 10,
        lm_path: Optional[str] = None,
        lm_alpha: float = 0.0,
        fbank_cfg: FbankConfig = FbankConfig(),
        left_ctx: int = 0,
        right_ctx: int = 2,
        n_skip_frame: int = 2,
        n_downsample: int = 2,
        denoiser: Optional[Callable[[np.ndarray, int], np.ndarray]] = None,
        max_wav_seconds: float = 180.0,
        use_ipa: bool = False,
        forgiving: Optional[int] = None,   # g_pairs level (off by default,
        # matching the reference's strict criterion — infer.py:69-153)
    ):
        t0 = time.time()
        self.session = EvalSession(model_cfg, variables, vocab,
                                   decode_type, beam_width, lm_path, lm_alpha)
        t1 = time.time()
        self.vocab = vocab
        self.cmvn = cmvn
        self.fbank_cfg = fbank_cfg
        self.phonetic = phonetic or Phonetic()
        # fail at construction, not at the first word lookup, when the
        # CMUdict assets aren't available (MDD_DICT_DIR unset and no
        # reference mount) — a server would otherwise come up healthy
        # and then error on every request
        self.phonetic.validate_assets()
        # init-stage wall clock for the reference's 4-way RTF breakdown
        # (infer.py:588-597: model init / phone init / denoise / mdd infer)
        self._model_init_s = t1 - t0
        self._phone_init_s = time.time() - t1
        self.left_ctx, self.right_ctx = left_ctx, right_ctx
        self.n_skip_frame, self.n_downsample = n_skip_frame, n_downsample
        self.denoiser = denoiser
        self.max_wav_seconds = max_wav_seconds
        self.use_ipa = use_ipa
        self.forgiving = forgiving
        self._timings: Dict[str, float] = {}

    # ------------------------------------------------------------------
    def _prepare_audio(self, wav_path: str) -> Optional[np.ndarray]:
        data, sr = read_audio(wav_path)
        if data.ndim > 1:
            data = data[:, 0]
        if sr != 16000:
            data = resample(data, sr, 16000)
        if self.denoiser is not None:
            data = self.denoiser(data, 16000)
        if len(data) / 16000.0 > self.max_wav_seconds:
            # reference length gate: silence.wav length == 3 min
            # (infer.py:509-511)
            return None
        return data.astype(np.float32)

    def _featurize(self, wavs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        # featurize via in-memory path: write temp wavs only when the
        # source needed resampling; otherwise reuse the direct API.
        from mdd_tpu.frontend.pipeline import _BatchedFbank
        from mdd_tpu.frontend.cmvn import apply_cmvn

        fbank = _BatchedFbank(self.fbank_cfg)
        out = {}
        utts = sorted(wavs)
        for s in range(0, len(utts), 16):
            chunk = utts[s:s + 16]
            feats = fbank([wavs[u] for u in chunk])
            for u, f in zip(chunk, feats):
                out[u] = np.asarray(apply_cmvn(f, self.cmvn))
        return out

    # label axis padded to a multiple of this in both the single-word and
    # batched paths (same shapes -> same compiled program -> equal-length
    # batched results reproduce diagnose_word bitwise; bounded shape set
    # for the long-lived server)
    LABEL_QUANTUM = 8
    # serving batch-size ladder: diagnose_words pads each length-bucket
    # group up to the next size here (beyond the last, next pow2).  Kept
    # small and fixed so warmup() can precompile the exact shape set.
    BATCH_SIZES = (1, 4, 16)

    def _model_batch(self, utt: str, feats: np.ndarray,
                     canonical_units: List[str]) -> Batch:
        x = pad_to_multiple(
            skip_frames(make_context(feats, self.left_ctx, self.right_ctx),
                        self.n_skip_frame), self.n_downsample)
        ids = self.vocab.encode(canonical_units)
        l_pad = -(-len(ids) // self.LABEL_QUANTUM) * self.LABEL_QUANTUM
        trans = np.zeros((1, l_pad), np.int32)
        trans[0, : len(ids)] = ids
        sizes = np.asarray([len(ids)], np.int32)
        return Batch(
            inputs=np.asarray(x, np.float32)[None],
            input_fracs=np.ones(1, np.float32),
            targets=trans.copy(), target_sizes=sizes.copy(),
            trans=trans, trans_sizes=sizes,
            utt_ids=[utt])

    # ------------------------------------------------------------------
    def _word_meta(self, word: str,
                   canonical_units: Optional[List[str]]):
        """Dictionary/G2P lookups for one word (host side)."""
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            if canonical_units is None:
                canonical_units = self.phonetic.canonical_model_phones(word)
            ipa_display = self.phonetic.api_word_phonetic(word)
            translation = self.phonetic.api_word_translation(word)
            phonics_entry = self.phonetic.api_word_phonics(word)
            phonics = ("" if phonics_entry is None else " ".join(
                "-".join(m) for m in phonics_entry["mapping"]))
        return canonical_units, ipa_display, translation, phonics

    def diagnose_words(
        self,
        items: List[Tuple[str, np.ndarray, str, Optional[List[str]]]],
        time_quantum: int = 32,
    ) -> List[WordDiagnosis]:
        """Diagnose several recorded words in batched forward/decodes.

        items: (utt_id, wav, word, canonical_units-or-None) tuples; the
        serving path's dynamic batching (serve.py) uses this.

        **Response stability**: items are bucketed by padded model-frame
        length (multiple of `time_quantum`), one forward/decode per
        bucket.  Every item's batch is therefore padded to a width
        determined by its OWN length alone, so a wav's diagnosis can
        never depend on what it was co-batched with.  Without the
        bucketing, shorter items in a mixed batch inherit the model's
        (and the torch reference's) unpacked-LSTM property — the
        backward directions traverse the co-batch's extra zero padding,
        shifting posteriors ~1e-2 in log space and occasionally a
        near-tie diagnosis (pinned by tests/test_infer.py).  Featurize
        still runs once over the whole group; each bucket's padded
        width is a jit-cached shape.
        """
        if not items:
            return []
        ids = [utt for utt, *_ in items]
        if len(set(ids)) != len(ids):
            raise ValueError(f"duplicate utt_ids in diagnose_words: {ids}")
        metas = []
        wavs = {}
        for utt, wav, word, canonical_units in items:
            metas.append((utt, word) + self._word_meta(word, canonical_units))
            wavs[utt] = wav
        feats = self._featurize(wavs)
        xs, trans_ids = [], []
        for utt, _, canonical_units, *_ in metas:
            x = pad_to_multiple(
                skip_frames(make_context(feats[utt], self.left_ctx,
                                         self.right_ctx),
                            self.n_skip_frame), self.n_downsample)
            xs.append(np.asarray(x, np.float32))
            trans_ids.append(self.vocab.encode(canonical_units))
        # bucket by padded length -> per-item-deterministic padding
        buckets: Dict[int, List[int]] = {}
        for i, x in enumerate(xs):
            t_pad = -(-x.shape[0] // time_quantum) * time_quantum
            buckets.setdefault(t_pad, []).append(i)
        out: List[Optional[WordDiagnosis]] = [None] * len(items)
        for t_max in sorted(buckets):
            group = buckets[t_max]
            # pad the group's batch axis up to the next size in
            # BATCH_SIZES (repeating the last item; extra rows' outputs
            # are discarded): group sizes vary with burst composition,
            # and every distinct (b, T) would otherwise be a fresh jit
            # compile — ~30 s each on a tunnel-attached chip.  The small
            # fixed ladder (rather than every power of two) keeps the
            # shape set exactly coverable by warmup().
            n_real = len(group)
            b = next((s for s in self.BATCH_SIZES if s >= n_real),
                     1 << (n_real - 1).bit_length())
            group = group + [group[-1]] * (b - n_real)
            # label axis quantized too (same quantum as _model_batch): a
            # long-lived server would otherwise recompile the forward
            # for every new max canonical length
            l_max = (-(-max(len(trans_ids[i]) for i in group)
                       // self.LABEL_QUANTUM) * self.LABEL_QUANTUM)
            inputs = np.zeros((b, t_max, xs[0].shape[1]), np.float32)
            fracs = np.zeros(b, np.float32)
            trans = np.zeros((b, l_max), np.int32)
            trsizes = np.zeros(b, np.int32)
            out_max = self.session.cfg.output_frames(t_max)
            for k, i in enumerate(group):
                x, t = xs[i], trans_ids[i]
                inputs[k, : x.shape[0]] = x
                # frac chosen so floor(frac * out_len) lands EXACTLY on
                # the item's own model frame count — the naive t_i/t_max
                # ratio can truncate the final frame under float32 (the
                # loader keeps that floor behavior for reference parity;
                # the single-word path uses frac=1.0, so the batch must
                # match it)
                n_i = self.session.cfg.output_frames(x.shape[0])
                fracs[k] = min(1.0, (n_i + 0.5) / out_max)
                trans[k, : len(t)] = t
                trsizes[k] = len(t)
            batch = Batch(inputs=inputs, input_fracs=fracs,
                          targets=trans.copy(), target_sizes=trsizes.copy(),
                          trans=trans, trans_sizes=trsizes,
                          utt_ids=[metas[i][0] for i in group])
            decoded_lists, _ = self.session.decode_batch(batch)
            for i, decoded in zip(group[:n_real], decoded_lists):
                out[i] = self._diagnose_decoded(metas[i], decoded)
        return out  # type: ignore[return-value]

    def warmup(self, max_seconds: float = 3.2,
               batch_sizes: Optional[Sequence[int]] = None,
               max_canonical_phones: int = 16) -> int:
        """Precompile the serving shape set so no client request pays a
        jit compile (~30 s each on a tunnel-attached chip; a cold burst
        of 16 measured ~3 min of compiles).  Covers the full product
        diagnose_words can request: every length bucket up to
        `max_seconds`, every BATCH_SIZES rung (the exact ladder groups
        pad to), and every LABEL_QUANTUM width up to
        `max_canonical_phones` (few English words exceed 16 phones; a
        longer word still works, paying one compile).  Returns the
        number of shapes warmed.  Word metadata is bypassed with
        explicit canonical overrides, so no dictionary lookups happen."""
        if batch_sizes is None:
            batch_sizes = self.BATCH_SIZES
        unit = self.vocab.index2word[2]  # any real unit
        label_lens = range(1, max_canonical_phones + 1, self.LABEL_QUANTUM)
        n = 0
        for b in batch_sizes:
            for llen in label_lens:
                canon = [unit] * llen
                # one wav length per 32-model-frame bucket: 32 model
                # frames = 64 raw frames = 0.64 s of 16 kHz audio
                secs = 0.64
                while secs <= max_seconds + 1e-9:
                    wav = np.zeros(int(secs * 16000), np.float32)
                    items = [(f"_warm{i}", wav, "a", canon)
                             for i in range(b)]
                    self.diagnose_words(items)
                    n += 1
                    secs += 0.64
        return n

    def diagnose_word(self, utt_id: str, wav: np.ndarray, word: str,
                      canonical_units: Optional[List[str]] = None
                      ) -> WordDiagnosis:
        """Diagnose one recorded word against its prompt."""
        meta = (utt_id, word) + self._word_meta(word, canonical_units)
        feats = self._featurize({utt_id: wav})[utt_id]
        batch = self._model_batch(utt_id, feats, meta[2])
        decoded_lists, _ = self.session.decode_batch(batch)
        return self._diagnose_decoded(meta, decoded_lists[0])

    def _diagnose_decoded(self, meta, decoded_raw) -> WordDiagnosis:
        """Alignment + forgiveness + faults + score for one decoded word."""
        utt_id, word, canonical_units, ipa_display, translation, phonics = meta
        decoded = [p for p in decoded_raw if p not in ("sil", "err")]
        canonical = [p for p in canonical_units if p != "sil"]

        _, dc_path = align(decoded, canonical)

        dec, can, ops = align_canonical_decoded(decoded, canonical, dc_path)
        if self.forgiving is not None:
            dec, can, ops = apply_forgiveness(dec, can, ops, self.forgiving)
        if self.use_ipa:
            # display conversion after alignment/forgiveness: the pair
            # tables are keyed by model units; 'D'/'I' placeholders pass
            # through the map unchanged
            dec = [CMU_TO_IPA_WIKI.get(p.upper(), p) for p in dec]
            can = [CMU_TO_IPA_WIKI.get(p.upper(), p) for p in can]
        ins_f, sub_f, del_f = fault_statistics(ops, can, dec)
        score, correct, total = word_score(ops, len(ins_f))
        can_row, ops_row, dec_row = _aligned_rows(dec, can, ops)
        return WordDiagnosis(
            utt_id=utt_id, word=word, ipa_display=ipa_display,
            translation=translation, canonical_row=can_row, ops_row=ops_row,
            decoded_row=dec_row, insertion_faults=ins_f,
            substitution_faults=sub_f, deletion_faults=del_f,
            correct=correct, total=total, score=score, phonics=phonics)

    def diagnose_dir(self, wav_dir: str, log=print,
                     textgrid_dir: Optional[str] = None,
                     decode_dump: Optional[str] = None
                     ) -> List[WordDiagnosis]:
        """The reference demo flow over a directory of N.wav + N.txt pairs
        (infer.py:486-597), with the per-stage RTF breakdown report.

        With `textgrid_dir`, canonical phones come from N.TextGrid files
        instead of G2P (the reference's `--phonetic transcript` mode);
        `decode_dump` writes the decode_seq.txt file (infer.py:286,370).
        """
        t0 = time.time()
        d = Path(wav_dir)
        items: List[Tuple[str, np.ndarray, str, Optional[List[str]]]] = []
        total_audio = 0.0
        for p in sorted(d.iterdir(), key=lambda q: q.name):
            if p.suffix != ".wav":
                continue
            canonical = None
            if textgrid_dir is not None:
                tg = Path(textgrid_dir) / (p.stem + ".TextGrid")
                if not tg.exists():
                    continue
                canonical = read_phonemes_from_textgrid(str(tg))
            txt = p.with_suffix(".txt")
            if not txt.exists():
                continue
            wav = self._prepare_audio(str(p))
            if wav is None:
                log(f"{p} skipped, wav length over "
                    f"{self.max_wav_seconds:.0f}s limit")
                continue
            total_audio += len(wav) / 16000.0
            items.append((p.stem, wav, txt.read_text().strip(), canonical))
        t1 = time.time()

        results = []
        dump = open(decode_dump, "w") if decode_dump else None
        for utt, wav, word, canonical in items:
            diag = self.diagnose_word(utt, wav, word, canonical)
            log(diag.render())
            results.append(diag)
            if dump is not None:
                decoded = diag.decoded_row.split(":", 1)[1].split()
                dump.write(f"{utt} {' '.join(decoded)}\n")
        if dump is not None:
            dump.close()
        t2 = time.time()

        if total_audio > 0:
            # 4-way per-stage RTF breakdown, reference infer.py:588-597:
            # model init / phone init / denoise(+audio load) / mdd infer.
            denoise_s = t1 - t0
            mdd_s = t2 - t1
            time_used = (self._model_init_s + self._phone_init_s
                         + denoise_s + mdd_s)
            rtf = time_used / total_audio
            log("RTF: %.4f, time used for decode %d sentences: %.4f "
                "seconds, total wav length: %.4f seconds"
                % (rtf, len(items), time_used, total_audio))
            log("init model time: %.4f, init phone time: %.4f, "
                "denoise time: %.4f, mdd infer time: %.4f"
                % (self._model_init_s / total_audio,
                   self._phone_init_s / total_audio,
                   denoise_s / total_audio, mdd_s / total_audio))
            log("process time: %.4f" % ((denoise_s + mdd_s) / total_audio))
        return results
