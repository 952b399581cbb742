"""Char/word tokenizer with pad-aware decode.

Mirrors the reference Tokenizer's encode/decode surface
(/root/reference/utils/text/tokenizer.py:404-466 encode, 599-667 decode /
ctc_decode; SURVEY §2.2 M13-M14): a vocab built deterministically from a
corpus or supplied, int32 sequences, batch padding (sequence_utils.py:16),
and a CTC-style collapse-repeats + drop-blank decode.  No learned BPE —
the merge table would be model state; the 'bpe' proxy for token *counts*
lives in :mod:`ocr_ray.functions.analysis`.
"""

from __future__ import annotations

import numpy as np

PAD, UNK, BLANK = 0, 1, 2
_SPECIALS = ("<pad>", "<unk>", "<blank>")


class Tokenizer:
    def __init__(self, vocab: list[str], *, level: str = "word"):
        assert level in ("word", "char")
        self.level = level
        self.vocab = list(_SPECIALS) + [v for v in vocab if v not in _SPECIALS]
        self.index = {tok: i for i, tok in enumerate(self.vocab)}

    @classmethod
    def from_corpus(cls, texts, *, level: str = "word", max_vocab: int = 50_000):
        """Deterministic vocab: tokens by (-count, token) order."""
        from collections import Counter

        counts: Counter = Counter()
        for t in texts:
            counts.update(t.split() if level == "word" else list(t))
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return cls([tok for tok, _ in ordered[:max_vocab]], level=level)

    def _split(self, text: str) -> list[str]:
        return text.split() if self.level == "word" else list(text)

    def encode(self, text: str) -> np.ndarray:
        """text -> int32 ids (tokenizer.py:404-466)."""
        return np.asarray(
            [self.index.get(tok, UNK) for tok in self._split(text)], dtype=np.int32
        )

    def decode(self, ids, *, skip_special: bool = True) -> str:
        """ids -> text, pad/unk/blank skipped (tokenizer.py:599-656)."""
        sep = " " if self.level == "word" else ""
        toks = []
        for i in np.asarray(ids, dtype=np.int64).tolist():
            if skip_special and i < len(_SPECIALS):
                continue
            if 0 <= i < len(self.vocab):
                toks.append(self.vocab[i])
        return sep.join(toks)

    def ctc_decode(self, ids) -> str:
        """Greedy CTC collapse: drop repeats then blanks
        (ctc_decoder.py:14-36, tokenizer.py:658-667)."""
        arr = np.asarray(ids, dtype=np.int64)
        if arr.size == 0:
            return ""
        keep = np.concatenate([[True], arr[1:] != arr[:-1]])
        collapsed = arr[keep]
        collapsed = collapsed[collapsed != BLANK]
        return self.decode(collapsed)


def log_softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    s = logits - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def ctc_beam_decode(
    logits: np.ndarray,
    *,
    blank: int = BLANK,
    num_beams: int = 10,
    top_paths: int = 1,
):
    """CTC prefix beam search over a (T, V) logit matrix
    (the reference's ``method='beam'`` path, ctc_decoder.py:20-35, which
    delegates to keras ``ops.ctc_decode``; reimplemented from scratch as
    the standard prefix-merging beam).  Returns ``(paths, scores)`` where
    scores are length-normalized total log-probabilities (the reference
    divides by sequence length too)."""
    lp = log_softmax(np.asarray(logits, dtype=np.float64))
    T, V = lp.shape
    NEG = -np.inf
    # prefix -> (log P ending in blank, log P ending in non-blank)
    beams: dict[tuple, tuple[float, float]] = {(): (0.0, NEG)}
    for t in range(T):
        new: dict[tuple, list[float]] = {}

        def acc(prefix, d_pb, d_pnb):
            cur = new.setdefault(prefix, [NEG, NEG])
            cur[0] = np.logaddexp(cur[0], d_pb)
            cur[1] = np.logaddexp(cur[1], d_pnb)

        for prefix, (pb, pnb) in beams.items():
            total = np.logaddexp(pb, pnb)
            for s in range(V):
                p = lp[t, s]
                if s == blank:
                    acc(prefix, total + p, NEG)
                elif prefix and s == prefix[-1]:
                    # repeat symbol: only a blank gap separates two copies
                    acc(prefix, NEG, pnb + p)
                    acc(prefix + (s,), NEG, pb + p)
                else:
                    acc(prefix + (s,), NEG, total + p)
        ranked = sorted(
            new.items(), key=lambda kv: -np.logaddexp(kv[1][0], kv[1][1])
        )[:num_beams]
        beams = {k: (v[0], v[1]) for k, v in ranked}
    final = sorted(
        ((np.logaddexp(pb, pnb), prefix) for prefix, (pb, pnb) in beams.items()),
        key=lambda x: (-x[0], x[1]),
    )[:top_paths]
    return (
        [list(prefix) for _, prefix in final],
        [score / max(1, T) for score, _ in final],
    )


def pad_batch(sequences, *, pad_value: int = PAD) -> np.ndarray:
    """Right-pad int sequences to a [N, max_len] int32 matrix
    (sequence_utils.py:16)."""
    if not len(sequences):
        return np.zeros((0, 0), dtype=np.int32)
    max_len = max(len(s) for s in sequences)
    out = np.full((len(sequences), max_len), pad_value, dtype=np.int32)
    for i, s in enumerate(sequences):
        out[i, : len(s)] = s
    return out


def slice_outputs(batch: np.ndarray, offsets, lengths) -> list[np.ndarray]:
    """Slice token outputs by (offset, length) per row
    (tokens_processing.py:20-39)."""
    return [row[o : o + n] for row, o, n in zip(batch, offsets, lengths)]
