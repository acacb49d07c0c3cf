# -*- coding: utf-8 -*-
"""Property-based tests (hypothesis): invariants no example table covers.

No Ray needed — these exercise the pure kernels."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from osmlint import geo, spans, translit

CYR = "".join(translit.CYR_TO_LAT)
LATIN_OUT = set("".join(translit.CYR_TO_LAT.values()))

name_st = st.text(alphabet=CYR + "AaBb -", min_size=0, max_size=24)


@given(name_st)
def test_cyr2lat_removes_all_cyrillic(s):
    out = translit.cyr2lat_str(s)
    assert not any(ch in translit.CYR_TO_LAT for ch in out)
    # unknown chars pass through untouched
    assert all((c in translit.CYR_TO_LAT) or (c in out) for c in s)


@given(name_st)
def test_has_cyrillic_agrees_with_scalar(s):
    vec = bool(translit.has_cyrillic(pd.Series([s]))[0])
    assert vec == any(ch in translit.CYR_TO_LAT for ch in s)


@given(st.floats(-89.99, 89.99), st.floats(-179.99, 179.99),
       st.integers(1, 14))
def test_cell_parent_contains_child(lat, lon, res):
    child = geo.cell_id(np.array([lat]), np.array([lon]), res)[0]
    if res > 1:
        parent = geo.cell_parent(np.array([child]), res)[0]
        direct = geo.cell_id(np.array([lat]), np.array([lon]), res - 1)[0]
        assert parent == direct


@given(st.floats(-89.0, 89.0), st.floats(-179.0, 179.0))
def test_haversine_identity_and_symmetry(lat, lon):
    assert geo.haversine_km(lat, lon, lat, lon) == 0.0
    d1 = geo.haversine_km(lat, lon, 44.0, 20.0)
    d2 = geo.haversine_km(44.0, 20.0, lat, lon)
    assert abs(d1 - d2) < 1e-9


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 10**7),                       # osm_id
              st.sampled_from(["node", "way", "relation"]),
              st.one_of(st.none(), name_st),               # name
              st.one_of(st.none(), name_st),               # name_sr
              st.floats(40.0, 47.0), st.floats(13.0, 24.0)),
    min_size=1, max_size=40, unique_by=lambda t: t[0]))
def test_span_roundtrip_random_frames(rows):
    df = pd.DataFrame(rows, columns=["osm_id", "entity_type", "name",
                                     "name_sr", "lat", "lon"])
    df["lat"] = df["lat"].round(7)
    df["lon"] = df["lon"].round(7)
    df["map_slug"] = "prop"
    df["seq"] = np.arange(len(df), dtype=np.int64)
    df["origin"] = "pbf"
    for c in ["name_sr_latn", "place", "is_in_country", "wikipedia",
              "wikidata", "highway", "int_name", "comment",
              "check_description", "vote", "tag_1", "val_1", "media_img"]:
        df[c] = None
    # empty-string names are droppable tags in span encoding; normalize
    for c in ("name", "name_sr"):
        df[c] = df[c].replace("", None)
    df["doc_id"] = ("prop/" + df["entity_type"] + "/"
                    + df["osm_id"].astype(str))
    from osmlint import schema
    flat = pa.Table.from_pandas(df[schema.FLAT_COLUMNS],
                                preserve_index=False)
    enc = spans.encode_table(flat)
    dec = spans.decode_batch(enc)
    back = spans.encode_table(dec)
    assert spans.spans_equal(enc, back)
    got = dec.to_pandas()
    assert list(got["osm_id"]) == list(df["osm_id"])
    assert list(got["name"].fillna("-")) == list(df["name"].fillna("-"))


def test_malformed_doc_ids_dropped():
    good = pd.DataFrame({
        "doc_id": ["m/node/1", "bogus", "m/way/not_a_number", "m/node/2"],
        "spans": [[{"kind": "origin", "text": "pbf", "media_ref": "",
                    "offset": 0},
                   {"kind": "seq", "text": str(i), "media_ref": "",
                    "offset": 1},
                   {"kind": "geom", "text": "Point(20.0000000 44.0000000)",
                    "media_ref": "", "offset": 2}] for i in range(4)],
    })
    from osmlint import schema
    t = pa.Table.from_pandas(good, preserve_index=False,
                             schema=schema.DOCUMENTS)
    out = spans.decode_batch(t)
    assert out.num_rows == 2
    assert sorted(out["osm_id"].to_pylist()) == [1, 2]
