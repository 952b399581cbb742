"""Text cleaners: the by-name registry of scalar cleaning functions.

Mirrors /root/reference/utils/text/cleaners.py (M8/M9 in SURVEY §2.2):
``get_cleaners_fn`` resolves names/(name, kwargs)/callables to a pipeline
(cleaners.py:83-126), ``clean_text`` applies them (cleaners.py:118-126).
Cleaner semantics follow the reference implementations at
cleaners.py:139-355; number expansion (numbers.py:253-271) is a built-in
English num2words-lite (the environment has no num2words).

For batch pipelines use :func:`clean_array`: cleaners with a pyarrow.compute
kernel run vectorized over the whole column, the rest fall back to a Python
map — the registry records which is which.
"""

from __future__ import annotations

import re
import unicodedata
from functools import partial

import pyarrow as pa
import pyarrow.compute as pc

_WS_RE = re.compile(r"\s+")
_URL_RE = re.compile(r"\bhttps?://\S+|\bwww\.\S+")
_FILE_RE = re.compile(r"\b\S+\.(?:pdf|docx?|txt|csv|json|png|jpe?g|py|md)\b")
_MARKDOWN_RE = re.compile(r"\*\*(.*?)\*\*")
_ACRONYM_RE = re.compile(r"\b[A-Z]{2,4}\b")

_PUNCTUATION = "!\"#$%&()*+,-./:;<=>?@[\\]^_`{|}~"
_LEFT_PUNCT = "([{"
_RIGHT_PUNCT = ")]}.,!?;:"

_ABBREVIATIONS_EN = {
    "mr": "mister", "mrs": "misess", "dr": "doctor", "st": "saint",
    "co": "company", "jr": "junior", "ltd": "limited", "etc": "etcetera",
    "vs": "versus", "eg": "for example", "ie": "that is",
}

_ONES = ("zero one two three four five six seven eight nine ten eleven twelve "
         "thirteen fourteen fifteen sixteen seventeen eighteen nineteen").split()
_TENS = ("", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety")


def _num_to_words(n: int) -> str:
    """English number names for 0..999_999_999 (num2words-lite)."""
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] + ("" if not r else " " + _ONES[r])
    if n < 1000:
        h, r = divmod(n, 100)
        return _ONES[h] + " hundred" + ("" if not r else " " + _num_to_words(r))
    for scale, name in ((1_000_000, "million"), (1_000, "thousand")):
        if n >= scale:
            q, r = divmod(n, scale)
            return _num_to_words(q) + " " + name + ("" if not r else " " + _num_to_words(r))
    return str(n)


# ---------------------------------------------------------------------------
# scalar cleaners (reference names)
# ---------------------------------------------------------------------------

def lowercase(text, **_):
    return text.lower()


def strip(text, lstrip=True, rstrip=True, **_):
    if lstrip and rstrip:
        return text.strip()
    if lstrip:
        return text.lstrip()
    if rstrip:
        return text.rstrip()
    return text


def lstrip(text, **_):
    return text.lstrip()


def rstrip(text, **_):
    return text.rstrip()


def collapse_whitespace(text, **_):
    return _WS_RE.sub(" ", text)


def remove_urls(text, **_):
    return _URL_RE.sub("", text)


def remove_files(text, **_):
    return _FILE_RE.sub("", text)


def remove_markdown(text, **_):
    return _MARKDOWN_RE.sub(r"\1", text)


def remove_control(text, **_):
    """Keep tab/newline/cr/space and anything not category C (cleaners.py:260-265)."""
    return "".join(
        c for c in text
        if c in ("\t", "\n", "\r", " ") or c.isalnum()
        or not unicodedata.category(c).startswith("C")
    )


def remove_accents(text, **_):
    text = unicodedata.normalize("NFD", text)
    return "".join(c for c in text if unicodedata.category(c) != "Mn")


def remove_punctuation(text, punctuation=_PUNCTUATION, **_):
    return "".join(c for c in text if c not in punctuation)


def detach_punctuation(text, punctuation=_PUNCTUATION, **_):
    for p in punctuation:
        text = text.replace(p, " {} ".format(p))
    return text.strip()


def attach_punctuation(text, **_):
    for p in _LEFT_PUNCT:
        text = text.replace("{} ".format(p), p)
    for p in _RIGHT_PUNCT:
        text = text.replace(" {}".format(p), p)
    return text


def collapse_repetitions(text, max_repetition=3, **_):
    if not text:
        return text
    keep, count = [text[0]], 1
    for c in text[1:]:
        count = 1 if c != keep[-1] else count + 1
        if count <= max_repetition:
            keep.append(c)
    return "".join(keep)


def convert_to_alnum(text, allowed_char=".,?! ", replace_char=" ", **_):
    return "".join(c if c.isalnum() or c in allowed_char else replace_char for c in text)


def replace_patterns(text, patterns, **_):
    for pattern, repl in patterns.items():
        text = re.sub(pattern, repl, text)
    return text


def replace_words(text, words, flags=re.IGNORECASE, **_):
    """Whole-word replacement from a dict (cleaners.py:166-194)."""
    lower = {k.lower(): v for k, v in words.items()}
    if not any(k in text.lower() for k in lower):
        return text
    regex = re.compile(
        r"\b({})\b".format("|".join(re.escape(k) for k in words)), flags
    )
    return regex.sub(lambda m: lower[m.group(0).lower()], text)


def expand_abreviations(text, abreviations=None, **_):
    ab = abreviations or _ABBREVIATIONS_EN
    regex = re.compile(
        r"\b({})(\.|\b)".format("|".join(re.escape(k) for k in ab)), re.IGNORECASE
    )
    return regex.sub(lambda m: ab[m.group(1).lower()], text)


def expand_acronyms(text, **_):
    """Spell out 2-4 letter all-caps words (cleaners.py:218-225)."""
    return _ACRONYM_RE.sub(lambda m: " ".join(m.group(0).lower()), text)


def expand_numbers(text, **_):
    """Digit runs -> English words (numbers.py:253-271, num2words-lite)."""
    return re.sub(r"\d+", lambda m: _num_to_words(int(m.group(0))), text)


def remove_tokens(text, tokens=(), **_):
    if not tokens:
        return text
    return replace_words(text, {tok: "" for tok in tokens})


def basic_cleaners(text, **kw):
    """lowercase + collapse_whitespace (cleaners.py:302-306)."""
    return collapse_whitespace(lowercase(text, **kw), **kw)


def english_cleaners(text, **kw):
    """The complete_cleaners chain for English (cleaners.py:316-369):
    markdown strip, abbreviation + number expansion, lowercase, accents
    strip, whitespace collapse."""
    text = remove_markdown(text, **kw)
    text = expand_abreviations(text, **kw)
    text = expand_numbers(text, **kw)
    text = lowercase(text, **kw)
    text = remove_accents(text, **kw)
    return collapse_whitespace(text, **kw).strip()


# name -> (scalar_fn, vectorized_fn | None)
_VECTORIZED = {
    "lowercase": lambda col: pc.utf8_lower(col),
    "strip": lambda col: pc.utf8_trim_whitespace(col),
    "lstrip": lambda col: pc.utf8_ltrim_whitespace(col),
    "rstrip": lambda col: pc.utf8_rtrim_whitespace(col),
    "collapse_whitespace": lambda col: pc.replace_substring_regex(col, r"\s+", " "),
    "remove_urls": lambda col: pc.replace_substring_regex(col, _URL_RE.pattern, ""),
    "remove_markdown": lambda col: pc.replace_substring_regex(
        col, r"\*\*(.*?)\*\*", r"\1"
    ),
}

REGISTRY = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and not name.startswith("_") and name not in (
        "get_cleaners_fn", "clean_text", "clean_array", "partial",
    )
}


def get_cleaners_fn(cleaners):
    """Resolve a list of cleaner specs to callables (cleaners.py:83-114).

    Spec forms: name str | (name, kwargs) | {'name': ..., **kwargs} |
    callable."""
    if not isinstance(cleaners, (list, tuple)):
        cleaners = [cleaners]
    fns = []
    for spec in cleaners:
        kwargs = None
        if isinstance(spec, tuple):
            spec, kwargs = spec
        elif isinstance(spec, dict):
            spec, kwargs = spec["name"], {k: v for k, v in spec.items() if k != "name"}
        if callable(spec):
            fns.append(spec if not kwargs else partial(spec, **kwargs))
            continue
        fn = REGISTRY.get(spec)
        if fn is None:
            raise ValueError("Unknown cleaner: {}".format(spec))
        fns.append(fn if not kwargs else partial(fn, **kwargs))
    return fns


def clean_text(text: str, cleaners) -> str:
    """Apply a cleaner chain to one string (cleaners.py:118-126)."""
    for fn in get_cleaners_fn(cleaners):
        text = fn(text)
    return text


def clean_array(column, cleaners):
    """Apply a cleaner chain to a pyarrow string array, vectorized where a
    pyarrow.compute kernel exists, Python map otherwise."""
    if not isinstance(cleaners, (list, tuple)):
        cleaners = [cleaners]
    col = column
    for spec in cleaners:
        if isinstance(spec, str) and spec in _VECTORIZED:
            col = _VECTORIZED[spec](col)
        else:
            fn = get_cleaners_fn([spec])[0]
            col = pa.array(
                [fn(v) if v is not None else None for v in col.to_pylist()],
                pa.string(),
            )
    return col
