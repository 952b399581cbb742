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


# --- full normalize_numbers chain (numbers.py:16-271), English tables ------

_TIME_WORDS = {"h": "hour", "min": "minute", "sec": "second", "s": "second"}
_UNITS_EN = {
    "l": "litre", "g": "gram", "t": "tonne", "m": "meter", "mi": "mile",
    "o": "bytes", "V": "volt", "W": "watt", "A": "ampere", "Hz": "hertz",
    "J": "joul", "N": "newton", "b": "bar",
}
_UNIT_PREFIX_EN = {
    "n": "nano", "m": "mili", "c": "centi", "d": "deci",
    "k": "kilo", "M": "mega", "G": "giga", "T": "tera",
}
_MATH_EN = {
    "=": "equal", "+": "plus", "-": "minus", "*": "times",
    "/": "divide by", "^": "exponent",
}

_UNITS_RE = re.compile(
    r"(\d+)\s*({})?({})(?:\/({}))\b".format(
        "|".join(_UNIT_PREFIX_EN), "|".join(_UNITS_EN), "|".join(_TIME_WORDS)
    )
)
_MATH_SYMBOL_RE = re.compile(
    r"(?:(?<=\d)(\s*[\+\*\/\^\=]\s*(\+|\-\s*)?)(?=\d)|((?:^|\s+)(\-|\+)\s*(\+|\-\s*)?)(?=\d))"
)
_SEC_PAT = r"(\d+)\s*(?:sec|s)\b"
_MIN_PAT = r"(\d+)\s*min(?:\s*{})?".format(_SEC_PAT)
_HOURS_PAT = r"(\d+)\s*h\s*(?:{}|{})?".format(_MIN_PAT, _SEC_PAT)
_TIME_RE = re.compile(r"\b(?:{}|{}|{})\b".format(_HOURS_PAT, _MIN_PAT, _SEC_PAT))
_CLOCK_RE = re.compile(r"(\d{1,2}):(\d{1,2}):(\d{1,2})")
_COMMA_NUMBER_RE = re.compile(r"([0-9][0-9\,]+[0-9])")
_SPACE_NUMBER_RE = re.compile(r"[0-9]+( [0-9]{3,3})+(?!\d)")
_TIRET_NUMBER_RE = re.compile(r"([0-9]+-[0-9])")
_POUNDS_RE = re.compile(r"£([0-9\,]*[0-9]+)")
_DOLLARS_RE = re.compile(r"\$([0-9\.\,]*[0-9]+)")
_DECIMAL_NUMBER_RE = re.compile(r"([0-9]+\.[0-9]+)")
_ORDINAL_RE = re.compile(r"([0-9]+)(st|nd|rd|th)")

_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _ordinal_words(n: int) -> str:
    parts = _num_to_words(n).split()
    last = parts[-1]
    if last in _ORDINAL_IRREGULAR:
        parts[-1] = _ORDINAL_IRREGULAR[last]
    elif last.endswith("y"):
        parts[-1] = last[:-1] + "ieth"
    else:
        parts[-1] = last + "th"
    return " ".join(parts)


def _expand_time_parts(h, m, s) -> str:
    parts = []
    for t, unit in ((h, "h"), (m, "min"), (s, "sec")):
        if t is None:
            continue
        unit = _TIME_WORDS[unit] + ("s" if int(t) > 1 else "")
        parts.append("{} {}".format(t, unit))
    return " and ".join(parts)


def _expand_dollars(match: str) -> str:
    parts = match.split(".")
    if len(parts) > 2:
        return match + " dollars"  # unexpected
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    if dollars and cents:
        return "{} dollar{}, {} cent{}".format(
            dollars, "s" if dollars != 1 else "", cents, "s" if cents != 1 else ""
        )
    if dollars:
        return "{} dollar{}".format(dollars, "s" if dollars != 1 else "")
    if cents:
        return "{} cent{}".format(cents, "s" if cents != 1 else "")
    return "zero dollars"


def _expand_decimal(num: str) -> str:
    # 'punt' mirrors the reference's en separator token (numbers.py:19);
    ent, dec = num.split(".")
    if dec.count("0") == len(dec):
        return "{} punt zero".format(_num_to_words(int(ent)))
    n_zeros = len(dec) - len(dec.lstrip("0"))
    dec_words = _num_to_words(int(dec))
    if n_zeros == 0:
        tail = dec_words
    elif n_zeros < 4:
        tail = " ".join(["zero"] * n_zeros) + " " + dec_words
    else:
        # divergence: the reference's >=4-zeros format drops the decimal
        # words entirely (numbers.py:225-230 passes 4 args to a 3-slot
        # format); we keep them after the 'times zero' prefix
        tail = "{} times zero {}".format(_num_to_words(n_zeros), dec_words)
    return "{} punt {}".format(_num_to_words(int(ent)), tail)


def normalize_numbers(text, expand_symbols=True, **_):
    """The full reference expansion chain (numbers.py:253-271): units and
    math symbols, durations (3h 10min 5s) and clock times (hh:mm:ss),
    comma/space/tiret normalization, £/$ amounts, decimals, ordinals, then
    plain cardinals."""
    if expand_symbols:
        def units(m):
            n, prefix, unit, per_time = m.groups()
            out = "{} {}{}".format(n, _UNIT_PREFIX_EN.get(prefix, ""), _UNITS_EN[unit])
            if int(n) > 1:
                out += "s"
            if per_time:
                out += " per " + _TIME_WORDS[per_time]
            return out

        text = _UNITS_RE.sub(units, text)
        text = _MATH_SYMBOL_RE.sub(
            lambda m: " " + " ".join(_MATH_EN[s] for s in m.group(0).split()) + " ",
            text,
        )
    text = _TIME_RE.sub(
        lambda m: _expand_time_parts(
            m.groups()[0],
            m.groups()[1] or m.groups()[4],
            m.groups()[2] or m.groups()[3] or m.groups()[5] or m.groups()[6],
        ),
        text,
    )
    text = _CLOCK_RE.sub(lambda m: _expand_time_parts(*m.groups()), text)
    text = _COMMA_NUMBER_RE.sub(lambda m: m.group(1).replace(",", ""), text)
    text = _TIRET_NUMBER_RE.sub(lambda m: m.group(1).replace("-", " - "), text)
    text = _SPACE_NUMBER_RE.sub(lambda m: m.group(0).replace(" ", ""), text)
    text = _POUNDS_RE.sub(r"\1 pounds", text)
    text = _DOLLARS_RE.sub(lambda m: _expand_dollars(m.group(1)), text)
    text = _DECIMAL_NUMBER_RE.sub(lambda m: _expand_decimal(m.group(1)), text)
    text = _ORDINAL_RE.sub(lambda m: _ordinal_words(int(m.group(1))), text)
    return re.sub(r"\d+", lambda m: _num_to_words(int(m.group(0))), text)


_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+")
_PHONE_RE = re.compile(r"\+?[0-9][0-9()\- ]{7,}[0-9]")


def redact_pii(text, email_token="<EMAIL>", phone_token="<PHONE>", **_):
    """Training-data hygiene: emails and phone-like digit runs replaced by
    typed placeholders.  RE2-safe patterns (no lookaround) so the DuckDB
    oracle can run the identical regexes."""
    text = _EMAIL_RE.sub(email_token, text)
    return _PHONE_RE.sub(phone_token, text)


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
