"""Byte-level BPE: learned merges, rank-greedy encode, exact decode.

The reference ships a full BPE path — byte->unicode symbol mapping
(text_processing.py:371-385), the rank-greedy merge loop applied per
pretoken (text_processing.py:334-368), and a Tokenizer that splits with a
GPT-style regex then BPE-tokenizes each piece (tokenizer.py:54-188,
encode 404-466) — but loads its merge tables from published model files.
Here the merges are LEARNED from a corpus sample (the standard
most-frequent-pair algorithm) so the engine is self-contained, and the
whole scheme stays deterministic: ties break lexicographically, byte
symbols make decode(encode(text)) == text for arbitrary unicode input.
"""

from __future__ import annotations

import re
from collections import Counter

# RE2-safe GPT-style pretokenizer (no lookahead; shared with the
# doc_tokens_bpe oracle SQL in pipelines.queries_ext)
PRETOKEN_RE = "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte -> printable-unicode-symbol bijection
    (text_processing.py:371-385): printable latin bytes map to themselves,
    the rest shift into 256+ codepoints so every byte has a visible symbol."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_B2U = bytes_to_unicode()
_U2B = {v: k for k, v in _B2U.items()}


def _pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word[:-1], word[1:]))


def train_bpe(texts, *, n_merges: int = 200, pattern: str = PRETOKEN_RE):
    """Learn ``n_merges`` byte-pair merges (most-frequent pair per round,
    ties broken by lexicographic pair order so training is deterministic).

    Returns the ordered merge list [(first, second), ...]."""
    pat = re.compile(pattern)
    word_freq: Counter = Counter()
    for t in texts:
        for tok in pat.findall(t):
            word_freq[tuple(_B2U[b] for b in tok.encode("utf-8"))] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for word, f in word_freq.items():
            for p in zip(word[:-1], word[1:]):
                pair_counts[p] += f
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_freq: Counter = Counter()
        for word, f in word_freq.items():
            if best not in _pairs(word):
                new_freq[word] += f
                continue
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == best[0] and word[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_freq[tuple(out)] += f
        word_freq = new_freq
    return merges


class BPETokenizer:
    """Encode/decode with a learned merge table.

    vocab layout: ids 0-255 are the byte symbols (in byte order), then one
    id per merge product, in merge order — so the id space is a pure
    function of the merges and the scheme needs no separate vocab file."""

    def __init__(self, merges: list[tuple[str, str]], *, pattern: str = PRETOKEN_RE):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        self.pattern = pattern
        self.pat = re.compile(pattern)
        self.vocab = [_B2U[b] for b in range(256)] + [a + b for a, b in self.merges]
        self.index = {s: i for i, s in enumerate(self.vocab)}
        self._cache: dict[str, list[str]] = {}

    @classmethod
    def train(cls, texts, *, n_merges: int = 200, pattern: str = PRETOKEN_RE):
        return cls(train_bpe(texts, n_merges=n_merges, pattern=pattern), pattern=pattern)

    def _bpe(self, token: str) -> list[str]:
        """Rank-greedy merge loop per pretoken (the reference ``bpe``
        algorithm, text_processing.py:334-368): repeatedly merge the
        lowest-rank adjacent pair until none is in the table."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = tuple(_B2U[b] for b in token.encode("utf-8"))
        while len(word) > 1:
            pairs = _pairs(word)
            best = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if best not in self.ranks:
                break
            merged = best[0] + best[1]
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == best[0] and word[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        result = list(word)
        if len(self._cache) < 65536:
            self._cache[token] = result
        return result

    def encode(self, text: str) -> list[int]:
        ids = []
        for token in self.pat.findall(text):
            ids.extend(self.index[s] for s in self._bpe(token))
        return ids

    def decode(self, ids) -> str:
        symbols = "".join(self.vocab[i] for i in ids)
        return bytes(_U2B[c] for c in symbols).decode("utf-8", errors="replace")

    def n_tokens(self, text: str) -> int:
        return sum(len(self._bpe(tok)) for tok in self.pat.findall(text))

    def to_dict(self) -> dict:
        return {"merges": [list(m) for m in self.merges], "pattern": self.pattern}

    @classmethod
    def from_dict(cls, d: dict):
        return cls([tuple(m) for m in d["merges"]], pattern=d["pattern"])
