# -*- coding: utf-8 -*-
"""Data-driven rules: batch re-expressions of the reference's SPARQL queries.

Each reference ``.sparql`` map (reference: sparql/*.sparql, executed
server-side by Sophox, src/sources/sophox_source.py:19-49) becomes a pure
per-row rule over the decoded flat batch: a boolean mask (tag presence +
latin-name heuristics + point-radius geofence) plus projected binding
columns (name, tag_1/val_1 fix suggestion).  Rules are batch-local — no
cross-row state — so they run embarrassingly parallel inside map_batches.

Rule output rows are exactly the reference's Sophox result bindings: every
output row *is* a finding (GenericSophoxCheck, src/checks.py:701-717 — "by
definition, everything returned from Sophox is not passing check").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pandas as pd

from . import translit
from .geo import haversine_km

# wikibase:around service centers/radii (sparql/*.sparql, Point(lon lat))
SERBIA_CENTER = (44.04751, 21.00403)   # (lat, lon)
CENTERS = {
    "serbia": (SERBIA_CENTER, 250.0),
    "adding_north": ((45.62738, 19.86459), 57.0),
    "adding_central": ((44.5576, 20.4244), 90.0),
    "adding_west": ((43.70735, 20.29740), 70.0),
    "adding_east": ((43.19011, 22.02201), 65.0),
    "adding_south": ((42.57887, 22.10607), 31.0),
    "checking_north": ((45.0784, 20.0560), 150.0),
    "checking_south": ((43.5622, 21.0424), 130.0),
}


def _within(df: pd.DataFrame, key: str) -> np.ndarray:
    (clat, clon), radius = CENTERS[key]
    d = haversine_km(df["lat"].to_numpy(), df["lon"].to_numpy(), clat, clon)
    return d <= radius


def _notna(df, col) -> np.ndarray:
    return df[col].notna().to_numpy() & (df[col].fillna("") != "").to_numpy()


@dataclass
class Rule:
    slug: str                      # sophox map slug
    map_name: str                  # full reference map name
    comment: str
    check_description: str         # str.format template, {0} = name
    sparql_file: str               # provenance
    fn: Callable[[pd.DataFrame], pd.DataFrame]

    def apply(self, flat: pd.DataFrame) -> pd.DataFrame:
        """flat (decoded pbf batch) -> binding rows.

        Output columns: osm_id, entity_type, lat, lon, name, tag_1, val_1.
        """
        return self.fn(flat)


def _project(df: pd.DataFrame, mask: np.ndarray, name, tag_1: str, val_1) -> pd.DataFrame:
    out = pd.DataFrame({
        "osm_id": df["osm_id"].to_numpy()[mask],
        "entity_type": df["entity_type"].to_numpy()[mask],
        "lat": df["lat"].to_numpy()[mask],
        "lon": df["lon"].to_numpy()[mask],
        "name": np.asarray(name, dtype=object)[mask],
        "tag_1": tag_1,
        "val_1": np.asarray(val_1, dtype=object)[mask],
    })
    return out


def _adding_name(df: pd.DataFrame) -> pd.DataFrame:
    # sparql/adding_name.sparql: name:sr exists, name NOT exists,
    # (place OR highway exists), whole-Serbia circle r=250
    mask = (_notna(df, "name_sr") & ~_notna(df, "name")
            & (_notna(df, "place") | _notna(df, "highway"))
            & _within(df, "serbia"))
    namesr = df["name_sr"].to_numpy(dtype=object)
    return _project(df, mask, namesr, "name", namesr)


def _masked(values: pd.Series, mask: np.ndarray, kernel) -> np.ndarray:
    """Apply an expensive transliteration kernel ONLY to masked rows — the
    replace chains are multi-pass over every string, so transforming the
    full column before the mask dominates generation/rule time."""
    out = np.full(len(values), None, dtype=object)
    if mask.any():
        out[mask] = kernel(values[mask]).to_numpy(dtype=object)
    return out


def _adding_namesr(region: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # sparql/adding_namesr_<region>.sparql: name + highway exist, latin
        # heuristic, not obviously english, regional circle; val = lat2cyr(name)
        mask = (_notna(df, "name") & _notna(df, "highway")
                & translit.looks_serbian_latin(df["name"])
                & ~translit.obviously_english(df["name"])
                & _within(df, "adding_" + region))
        fixed = _masked(df["name"], mask, translit.lat2cyr)
        return _project(df, mask, df["name"].to_numpy(dtype=object), "name:sr", fixed)
    return fn


def _changing_namesr(df: pd.DataFrame) -> pd.DataFrame:
    # sparql/changing_namesr_to_cyrillic.sparql: name:sr exists,
    # (place OR highway), latin heuristic on name:sr (english filter is
    # commented out in the reference query), whole-Serbia circle
    mask = (_notna(df, "name_sr")
            & (_notna(df, "place") | _notna(df, "highway"))
            & translit.looks_serbian_latin(df["name_sr"])
            & _within(df, "serbia"))
    namesr = df["name_sr"].to_numpy(dtype=object)
    fixed = _masked(df["name_sr"], mask, translit.lat2cyr)
    return _project(df, mask, namesr, "name:sr", fixed)


def _checking_latn(region: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # sparql/checking_namesr-latn_<region>.sparql: name + name:sr exist,
        # regional circle; correct = cyr2lat(name:sr);
        # (latin exists AND correct != current) OR (no latin AND name cyrillic)
        base = _notna(df, "name") & _notna(df, "name_sr") & _within(df, "checking_" + region)
        correct = pd.Series(_masked(df["name_sr"], base, translit.cyr2lat),
                            index=df.index)
        latin_exists = _notna(df, "name_sr_latn")
        differs = (correct.fillna("") != df["name_sr_latn"].fillna("")).to_numpy()
        mask = base & ((latin_exists & differs)
                       | (~latin_exists & translit.name_is_cyrillic(df["name"])))
        return _project(df, mask, df["name"].to_numpy(dtype=object),
                        "name:sr-Latn", correct.to_numpy(dtype=object))
    return fn


def _adding_int_name(df: pd.DataFrame) -> pd.DataFrame:
    # sparql/adding_int_name.sparql: name:sr-Latn exists and contains đ
    # (case-insensitive), int_name NOT exists, whole-Serbia circle;
    # val = romanized name:sr-Latn; binding name = name:sr-Latn
    latn = df["name_sr_latn"]
    mask = (_notna(df, "name_sr_latn")
            & latn.str.contains("đ", case=False, na=False).to_numpy()
            & ~_notna(df, "int_name")
            & _within(df, "serbia"))
    roman = _masked(latn, mask, translit.romanize)
    return _project(df, mask, latn.to_numpy(dtype=object), "int_name", roman)


RULES: list[Rule] = [
    Rule("sophox_adding_name", "Serbia checks (Sophox adding name)",
         "Adding name tag from name:sr tag",
         "Entity {0} is missing name tag", "sparql/adding_name.sparql",
         _adding_name),
    Rule("sophox_changing_namesr_to_cyrillic",
         "Serbia checks (Sophox converting name:sr to cyrillic)",
         "Semi-automatic cyrillization of name:sr for highways and places in Serbia and close surrounding",
         "Entity {0} is not having cyrillic name:sr tag",
         "sparql/changing_namesr_to_cyrillic.sparql", _changing_namesr),
] + [
    Rule(f"sophox_adding_namesr_{r}",
         f"Serbia checks (Sophox adding missing name:sr {r})",
         "Semi-automatic addition of name:sr to highways in Serbia"
         if r == "central" else
         "Semi-automatic addition of name:sr tag to highways in Serbia",
         "Entity {0} is missing name:sr tag",
         f"sparql/adding_namesr_{r}.sparql", _adding_namesr(r))
    for r in ("north", "central", "west", "east", "south")
] + [
    Rule(f"sophox_checking_namesr_latn_{r}",
         f"Serbia checks (Sophox checking name:sr-Latn {r})",
         "Semi-automatic addition/checks of name:sr-Latn tag to entities in Serbia",
         "Entity {0} is missing name:sr-Latn tag or having name:sr-Latn tag "
         "that is not consistent with name:sr tag",
         f"sparql/checking_namesr-latn_{r}.sparql", _checking_latn(r))
    for r in ("north", "south")
] + [
    Rule("sophox_adding_int_name", "Serbia checks (Sophox adding int_name)",
         "Workaround for Nominatim GitHub issue #862, adding int_name",
         "Entity {0} could be better searchable with int_name",
         "sparql/adding_int_name.sparql", _adding_int_name),
]

RULES_BY_SLUG = {r.slug: r for r in RULES}
