# -*- coding: utf-8 -*-
"""Serbian Cyrillic <-> Latin transliteration kernels, vectorized.

Semantics reproduce the reference behaviorally:

* ``CYR_TO_LAT`` — the 60-entry char map (digraph outputs ``Њ``->``Nj``,
  ``Љ``->``Lj``, ``Џ``->``Dž``); reference: src/transliteration.py:3-13.
* ``has_cyrillic`` — "at least some in cyrillic": any char of the string is a
  key of the table (NOT general Unicode Cyrillic); src/transliteration.py:16-17.
* ``cyr2lat`` — char-wise map, unknown chars pass through;
  src/transliteration.py:20-27.
* ``lat2cyr`` — the query-side Latin->Cyrillic REPLACE chain: 8 digraph
  replaces (note: ``Lj`` is absent from the chain, faithfully), then 27
  lowercase singles, then 27 uppercase singles;
  sparql/adding_namesr_central.sparql BIND chains.
* ``romanize`` — int_name romanization (Đ->Dj, strip diacritics), 10
  replaces; sparql/adding_int_name.sparql.
* ``looks_serbian_latin`` / ``obviously_english`` — the latin-name heuristic
  regexes (letters minus i,v; x|y|w|q); sparql/adding_namesr_central.sparql:12-14.

All kernels take a pandas Series of strings (nullable) and are vectorized:
regex masks via ``Series.str.contains`` (compiled once at import), char-wise
maps via ``str.translate`` with a precompiled table (C-level per string, no
per-char Python), replace chains via ``Series.str.replace(..., regex=False)``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

CYR_TO_LAT = {
    "А": "A", "Б": "B", "В": "V", "Г": "G", "Д": "D", "Е": "E",
    "Ж": "Ž", "З": "Z", "И": "I", "Ј": "J", "К": "K", "Л": "L",
    "М": "M", "Н": "N", "Њ": "Nj", "О": "O", "П": "P", "Р": "R",
    "С": "S", "Т": "T", "Ћ": "Ć", "У": "U", "Ф": "F", "Х": "H",
    "Ц": "C", "Ч": "Č", "Џ": "Dž", "Ш": "Š", "Ђ": "Đ", "Љ": "Lj",
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ж": "ž", "з": "z", "и": "i", "ј": "j", "к": "k", "л": "l",
    "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o", "п": "p",
    "р": "r", "с": "s", "т": "t", "ћ": "ć", "у": "u", "ф": "f",
    "х": "h", "ц": "c", "ч": "č", "џ": "dž", "ш": "š", "ђ": "đ",
}

_TRANSLATE_TABLE = {ord(k): v for k, v in CYR_TO_LAT.items()}

# Exactly the 60 reference chars, as a regex class.
_CYR_CLASS = "[" + "".join(CYR_TO_LAT) + "]"
_CYR_RE = re.compile(_CYR_CLASS)

# The query-side Latin->Cyrillic chain, in exact sparql REPLACE order.
LAT2CYR_STEPS = [
    ("DŽ", "Џ"), ("Dž", "Џ"), ("NJ", "Њ"), ("Nj", "Њ"), ("LJ", "Љ"),
    ("dž", "џ"), ("nj", "њ"), ("lj", "љ"),
    # lowercase singles
    ("a", "а"), ("b", "б"), ("v", "в"), ("g", "г"), ("d", "д"), ("đ", "ђ"),
    ("e", "е"), ("ž", "ж"), ("z", "з"), ("i", "и"), ("j", "ј"), ("k", "к"),
    ("l", "л"), ("m", "м"), ("n", "н"), ("o", "о"), ("p", "п"), ("r", "р"),
    ("s", "с"), ("t", "т"), ("ć", "ћ"), ("u", "у"), ("f", "ф"), ("h", "х"),
    ("c", "ц"), ("č", "ч"), ("š", "ш"),
    # uppercase singles
    ("A", "А"), ("B", "Б"), ("V", "В"), ("G", "Г"), ("D", "Д"), ("Đ", "Ђ"),
    ("E", "Е"), ("Ž", "Ж"), ("Z", "З"), ("I", "И"), ("J", "Ј"), ("K", "К"),
    ("L", "Л"), ("M", "М"), ("N", "Н"), ("O", "О"), ("P", "П"), ("R", "Р"),
    ("S", "С"), ("T", "Т"), ("Ć", "Ћ"), ("U", "У"), ("F", "Ф"), ("H", "Х"),
    ("C", "Ц"), ("Č", "Ч"), ("Š", "Ш"),
]

ROMANIZE_STEPS = [
    ("Đ", "Dj"), ("Ž", "Z"), ("Ć", "C"), ("Č", "C"), ("Š", "S"),
    ("đ", "dj"), ("ž", "z"), ("ć", "c"), ("č", "c"), ("š", "s"),
]

# Letters minus i,v (Roman-numeral tolerance); case-insensitive.
_SERBIAN_LATIN_RE = re.compile("a|b|c|č|ć|d|đ|e|f|g|h|j|k|l|m|n|o|p|r|s|š|t|u|z|ž",
                               re.IGNORECASE)
_ENGLISH_RE = re.compile("x|y|w|q", re.IGNORECASE)
# "name is cyrillic" regex from checking_namesr-latn_*.sparql (30 lowercase
# letters, case-insensitive).
_NAME_CYR_RE = re.compile("а|б|в|г|д|ђ|е|ж|з|и|ј|к|л|љ|м|н|њ|о|п|р|с|т|ћ|у|ф|х|ц|ч|џ|ш",
                          re.IGNORECASE)


def _as_series(values) -> pd.Series:
    if isinstance(values, pd.Series):
        return values
    return pd.Series(values, dtype=object)


def has_cyrillic(values) -> np.ndarray:
    """Boolean mask: any char of the string is one of the 60 Serbian letters.

    Nulls -> False.
    """
    s = _as_series(values)
    return s.str.contains(_CYR_RE, na=False).to_numpy(dtype=bool)


def cyr2lat_str(text: str) -> str:
    """Scalar char-wise transliteration (for oracle / tests)."""
    return text.translate(_TRANSLATE_TABLE)


def cyr2lat(values) -> pd.Series:
    """Char-wise Cyrillic->Latin over a Series; nulls pass through as null."""
    s = _as_series(values)
    mask = s.notna()
    out = s.copy()
    if mask.any():
        out[mask] = [t.translate(_TRANSLATE_TABLE) for t in s[mask]]
    return out


def _replace_chain(values, steps) -> pd.Series:
    s = _as_series(values)
    for old, new in steps:
        s = s.str.replace(old, new, regex=False)
    return s


def lat2cyr(values) -> pd.Series:
    """Query-side Latin->Cyrillic (exact sparql REPLACE chain, X5)."""
    return _replace_chain(values, LAT2CYR_STEPS)


def lat2cyr_str(text: str) -> str:
    for old, new in LAT2CYR_STEPS:
        text = text.replace(old, new)
    return text


def romanize(values) -> pd.Series:
    """int_name romanization (X6)."""
    return _replace_chain(values, ROMANIZE_STEPS)


def romanize_str(text: str) -> str:
    for old, new in ROMANIZE_STEPS:
        text = text.replace(old, new)
    return text


def looks_serbian_latin(values) -> np.ndarray:
    s = _as_series(values)
    return s.str.contains(_SERBIAN_LATIN_RE, na=False).to_numpy(dtype=bool)


def obviously_english(values) -> np.ndarray:
    s = _as_series(values)
    return s.str.contains(_ENGLISH_RE, na=False).to_numpy(dtype=bool)


def name_is_cyrillic(values) -> np.ndarray:
    """The checking_namesr-latn query's cyrillic-name regex mask."""
    s = _as_series(values)
    return s.str.contains(_NAME_CYR_RE, na=False).to_numpy(dtype=bool)
