# -*- coding: utf-8 -*-
"""Pure-Python per-entity re-implementation of the reference semantics.

This is the parity oracle for pytest: a faithful, row-at-a-time rendering of
the reference's check/engine behavior (src/checks.py, src/engine.py,
src/sources/osm_source.py, src/main.py) with the live pywikibot/osmapi
services replaced by the deterministic synth reference tables.  It is
deliberately slow and simple — dictionaries and for-loops — so that the
vectorized Ray pipeline can be asserted equal against an independent
formulation.

Documented divergences (shared with the engine, see checks.py docstring):
NameMissingCheck interpolates doc_id instead of the entity's memory address;
WikipediaAndWikidataInSyncCheck evaluates only where the wikidata entry is
valid; merge order (A3) is deterministic config order.
"""

from __future__ import annotations

import math

import pandas as pd

from . import translit
from .checks import VALID_BOXES

_BOXES = ",".join(VALID_BOXES)
CTV = ("city", "town", "village")


def _haversine(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = map(math.radians, (lat1, lon1, lat2, lon2))
    d = (math.sin((lat2 - lat1) * 0.5) ** 2
         + math.cos(lat1) * math.cos(lat2) * math.sin((lon2 - lon1) * 0.5) ** 2)
    return 2 * 6371 * math.asin(math.sqrt(d))


def _tags(row: dict) -> dict:
    t = {}
    for key, col in [("name", "name"), ("name:sr", "name_sr"),
                     ("name:sr-Latn", "name_sr_latn"), ("place", "place"),
                     ("is_in:country", "is_in_country"),
                     ("wikipedia", "wikipedia"), ("wikidata", "wikidata"),
                     ("highway", "highway"), ("int_name", "int_name")]:
        v = row.get(col)
        if v is not None and not (isinstance(v, float) and math.isnan(v)):
            t[key] = v
    return t


def _applicable_ctv(tags):
    return tags.get("place") in CTV


def _country_excluded(tags):
    return "is_in:country" in tags and tags["is_in:country"] != "Serbia"


def _name_or_id(tags, row):
    return tags["name"] if "name" in tags else row["osm_id"]


def check_entity(row: dict, check: str, serbia_mode: bool,
                 wiki_ref: dict, wikidata_ref: dict,
                 local_store: dict) -> tuple[bool, str]:
    """(applicable, message). Empty message = CHECKED_OK."""
    tags = _tags(row)
    if check == "checks.GenericSophoxCheck":
        if row.get("origin") != "sophox":
            return False, ""
        desc = row.get("check_description") or "no description"
        return True, desc.format(_name_or_id(tags, row))

    if not _applicable_ctv(tags):
        return False, ""
    place = tags.get("place", "(unknown place type)")
    noi = _name_or_id(tags, row)

    if check == "checks.NameMissingCheck":
        if "name" not in tags or not tags["name"]:
            return True, "Name missing for {0} with id {1}: {2}".format(
                place, row["osm_id"], row["doc_id"])
        return True, ""

    if check == "checks.NameCyrillicCheck":
        if serbia_mode and tags.get("name"):
            if _country_excluded(tags):
                return True, ""
            name = tags["name"]
        elif not serbia_mode and tags.get("name:sr"):
            name = tags["name:sr"]
        else:
            return True, ""
        if not any(ch in translit.CYR_TO_LAT for ch in name):
            return True, 'Seems that {0} name is not in cyrillic for "{1}"'.format(
                place, name)
        return True, ""

    if check == "checks.LatinNameExistsCheck":
        if serbia_mode and tags.get("name:sr-Latn"):
            return True, ""
        if not serbia_mode and tags.get("name:sr-Latn"):
            return True, ""
        if not serbia_mode and "name:sr" not in tags:
            return True, ""
        return True, "Latin name missing for {0} {1}".format(place, noi)

    if check == "checks.LatinNameSameAsCyrillicCheck":
        if serbia_mode and "name" not in tags:
            return True, ""
        if not serbia_mode and "name:sr" not in tags:
            return True, ""
        if "name:sr-Latn" not in tags:
            return True, ""
        if _country_excluded(tags):
            return True, ""
        latin = tags["name:sr-Latn"]
        cyr = tags["name"] if serbia_mode else tags["name:sr"]
        if translit.cyr2lat_str(cyr) != latin:
            return True, ("Latin name {0} for {1} {2} is not properly "
                          "transliterated".format(latin, place, cyr))
        return True, ""

    if check == "checks.LatinNameNotInCyrillicCheck":
        if "name" not in tags:
            return True, ""
        latn = tags.get("name:sr-Latn")
        if latn is not None and any(ch in translit.CYR_TO_LAT for ch in latn):
            return True, ("There is cyrillic in {0} name {1} for latin version "
                          "{2}".format(place, tags["name"], latn))
        return True, ""

    if check == "checks.WikipediaEntryExistsCheck":
        if _country_excluded(tags):
            return True, ""
        if "wikipedia" not in tags:
            return True, "Wikipedia missing for {0} {1}".format(tags["place"], noi)
        return True, ""

    if check == "checks.WikipediaEntryIsInSerbianCheck":
        if "wikipedia" not in tags:
            return True, ""
        if _country_excluded(tags):
            return True, ""
        if not tags["wikipedia"].startswith("sr:"):
            return True, ("Wikipedia entry is {0} and is not in Serbian for {1} "
                          "{2}".format(tags["wikipedia"], tags["place"], noi))
        return True, ""

    if check == "checks.WikipediaEntryValidCheck":
        if "name" not in tags or "wikipedia" not in tags:
            return True, ""
        if not tags["wikipedia"].startswith("sr:"):
            return True, ""
        if _country_excluded(tags):
            return True, ""
        title = tags["wikipedia"][3:]
        entry = wiki_ref.get(title)
        err = "Wikipedia entry {0} is not valid for {1} {2}".format(
            title, tags["place"], noi)
        if entry is None or not entry["exists"]:
            return True, err
        if not entry["has_box"]:
            return True, ("Cannot calculate distance as Wikipedia article {0} "
                          "does not contain any of valid boxes {1}".format(
                              title, _BOXES))
        if entry["wiki_lat"] is None or (isinstance(entry["wiki_lat"], float)
                                         and math.isnan(entry["wiki_lat"])):
            return True, ("Wikipedia entry {0} is missing latitude or "
                          "longitude".format(title))
        dist = _haversine(entry["wiki_lat"], entry["wiki_lon"],
                          row["lat"], row["lon"])
        if dist <= 20:
            local_store["wikipedia"] = entry
            return True, ""
        return True, ("Wikipedia and OSM entries are more than 20km apart "
                      "({0:.2f} km) for place {1}.".format(dist, noi))

    if check == "checks.WikidataEntryExistsCheck":
        if _country_excluded(tags):
            return True, ""
        if "wikidata" not in tags:
            return True, "Wikidata missing for {0} {1}".format(tags["place"], noi)
        return True, ""

    if check == "checks.WikidataEntryValidCheck":
        if "wikidata" not in tags:
            return True, ""
        if _country_excluded(tags):
            return True, ""
        item = wikidata_ref.get(tags["wikidata"])
        if item is None:
            return True, "Wikidata entry {0} for {1} {2} wrong".format(
                tags["wikidata"], tags["place"], noi)
        local_store["wikidata"] = item
        return True, ""

    if check == "checks.WikipediaAndWikidataInSyncCheck":
        if "wikipedia" not in tags or "wikidata" not in tags:
            return True, ""
        if _country_excluded(tags):
            return True, ""
        item = local_store.get("wikidata") or wikidata_ref.get(tags["wikidata"])
        if item is None:
            return True, ""   # divergence: reference would KeyError here
        if item["label_sr"] != tags["wikipedia"][3:]:
            return True, ("Wikidata entry {0} for {1} {2} doesn't match "
                          "wikipedia entry ({3})for it".format(
                              tags["wikidata"], tags["place"], noi,
                              tags["wikipedia"]))
        return True, ""

    if check == "checks.IsInCountryCheck":
        if "is_in:country" not in tags:
            return True, "is_in:country missing for {0} {1}".format(
                tags["place"], noi)
        return True, ""

    if check == "checks_extended.RemoveLatinName":
        if tags.get("name:sr-Latn"):
            return True, "Latin name missing for {0} {1}".format(place, noi)
        return True, ""

    raise KeyError(check)


FIXABLE = {
    "checks.LatinNameExistsCheck", "checks.LatinNameSameAsCyrillicCheck",
    "checks.WikipediaEntryExistsCheck", "checks.WikipediaEntryIsInSerbianCheck",
    "checks.WikidataEntryExistsCheck", "checks.IsInCountryCheck",
    "checks.GenericSophoxCheck", "checks_extended.RemoveLatinName",
}


def flags_for_map(flat: pd.DataFrame, map_name: str, check_list: list[str],
                  wiki_ref: dict, wikidata_ref: dict) -> pd.DataFrame:
    """all_checks accumulation for one map-check (src/sources/osm_source.py:27-43
    incl. last-wins dedup by bare id), flattened to flag rows."""
    serbia_mode = "Serbia checks" in map_name
    all_checks: dict[int, tuple] = {}
    for row in flat.to_dict("records"):
        local_store: dict = {}
        results = {}
        for fqn in check_list:
            applicable, msg = check_entity(row, fqn, serbia_mode,
                                           wiki_ref, wikidata_ref, local_store)
            if not applicable:
                continue
            results[fqn] = {
                "result": "CHECKED_ERROR" if msg else "CHECKED_OK",
                "message": msg,
                "fixable": bool(msg) and fqn in FIXABLE,
            }
        if results:
            tags = _tags(row)
            name = tags.get("name", str(row["osm_id"]))
            if "name:sr" in tags:
                name = "{0} / {1}".format(name, tags["name:sr"])
            all_checks[row["osm_id"]] = (name, row["entity_type"], results,
                                         row["doc_id"], row["seq"])
    rows = []
    for osm_id, (name, etype, results, doc_id, seq) in all_checks.items():
        for fqn, res in results.items():
            rows.append((doc_id, map_name, osm_id, seq, name, etype, fqn,
                         res["result"], res["message"], res["fixable"]))
    return pd.DataFrame(rows, columns=[
        "doc_id", "map_name", "osm_id", "seq", "display_name", "entity_type",
        "check_name", "result", "message", "fixable"])


def load_refs(data_dir: str):
    import os
    import pyarrow.parquet as pq
    wiki = pq.read_table(os.path.join(data_dir, "wiki_ref.parquet")).to_pandas()
    wd = pq.read_table(os.path.join(data_dir, "wikidata_ref.parquet")).to_pandas()
    wiki_ref = {r["title"]: r for r in wiki.to_dict("records")}
    wikidata_ref = {r["qid"]: r for r in wd.to_dict("records")}
    return wiki_ref, wikidata_ref
