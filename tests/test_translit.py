# -*- coding: utf-8 -*-
"""Transliteration truth tables (behavioral spec from the reference's
test/test_checks.py + src/transliteration.py + sparql REPLACE chains)."""

import numpy as np
import pandas as pd

from osmlint import translit


def test_cyr2lat_basic():
    assert translit.cyr2lat_str("фоо") == "foo"
    assert translit.cyr2lat_str("Ниш") == "Niš"
    assert translit.cyr2lat_str("Београд") == "Beograd"


def test_cyr2lat_digraphs():
    # digraph case: Nj not NJ (reference table src/transliteration.py:3-13)
    assert translit.cyr2lat_str("Љубовија") == "Ljubovija"
    assert translit.cyr2lat_str("Њего") == "Njego"
    assert translit.cyr2lat_str("Џак") == "Džak"
    assert translit.cyr2lat_str("њ љ џ") == "nj lj dž"


def test_cyr2lat_passthrough():
    assert translit.cyr2lat_str("abc 123 Ниш!") == "abc 123 Niš!"
    s = translit.cyr2lat(pd.Series(["фоо", None, "bar"]))
    assert s.tolist()[0] == "foo"
    assert s.tolist()[2] == "bar"
    assert s.isna().tolist() == [False, True, False]


def test_has_cyrillic():
    assert translit.has_cyrillic(pd.Series(["фоо"])).tolist() == [True]
    assert translit.has_cyrillic(pd.Series(["foo"])).tolist() == [False]
    # mixed counts as "at least some"
    assert translit.has_cyrillic(pd.Series(["fоo"])).tolist() == [True]
    assert translit.has_cyrillic(pd.Series([None, ""])).tolist() == [False, False]


def test_lat2cyr_chain():
    # the sparql chain has no "Lj" digraph replace — faithful quirk:
    assert translit.lat2cyr_str("Ljubovija") == "Лјубовија"
    assert translit.lat2cyr_str("LJUBOVIJA") == "ЉУБОВИЈА"
    assert translit.lat2cyr_str("ljubovija") == "љубовија"
    assert translit.lat2cyr_str("Beograd") == "Београд"
    assert translit.lat2cyr_str("Dže") == "Џе"


def test_romanize():
    assert translit.romanize_str("Đorđe") == "Djordje"
    assert translit.romanize_str("Žižić") == "Zizic"
    assert translit.romanize_str("Čačak Šid") == "Cacak Sid"


def test_latin_heuristics():
    looks = translit.looks_serbian_latin(pd.Series(["Beograd", "III", "в"]))
    assert looks.tolist() == [True, False, False]
    eng = translit.obviously_english(pd.Series(["Query Way", "Beograd"]))
    assert eng.tolist() == [True, False]


def test_name_is_cyrillic_regex():
    assert translit.name_is_cyrillic(pd.Series(["Ниш", "Nis", "НИШ"])).tolist() \
        == [True, False, True]


def test_round_trip_pure_cyrillic():
    # cyr2lat then the full charwise map back is NOT generally invertible
    # (digraphs); but single-letter names round-trip through lat2cyr chain
    names = ["Батамо", "Согира", "Ветебе"]
    latin = [translit.cyr2lat_str(n) for n in names]
    back = [translit.lat2cyr_str(x) for x in latin]
    assert back == names
