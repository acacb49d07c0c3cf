# -*- coding: utf-8 -*-
"""Encode/decode between span-sequence documents and flat columnar batches.

Canonical span encoding of one OSM entity (one document row):

==========================  =============================================
kind                        text / media_ref
==========================  =============================================
``origin``                  'pbf' | 'sophox' (reference entity.origin,
                            src/osm_lint_entity.py:21,50)
``seq``                     source sequence number (decimal string) — makes
                            the reference's dict-accumulation order (last-wins
                            dedup, src/sources/osm_source.py:43) reproducible
                            under parallel reads
``geom``                    'Point(<lon:.7f> <lat:.7f>)'
``tag:<key>``               tag value, in canonical tag order
``media``                   text='<lang>:<title>' media_ref='wiki://<lang>/<t>'
                            for wikipedia; text='<Q>' media_ref='wikidata://<Q>'
                            for wikidata; text='image' media_ref='img://...'
                            for attached imagery (multimodal payload)
``meta:<key>``              sophox #defaultView:Editor metadata
                            (src/sources/sophox_source.py:29-32,47-49)
``suggest:tag_N/val_N``     sophox fix-suggestion pairs
                            (src/sources/sophox_source.py:34-44)
==========================  =============================================

``offset`` is the span's position in the row (0-based).  The per-row
invariant: every transformation preserves span-sequence equality
(kind, text, media_ref, order) — checks flag, they never mutate spans.
``decode → encode`` is the identity on this encoding (tested).

Both directions are vectorized: decode flattens the list column once and
scatters values by parent row index (numpy fancy indexing); encode builds
the flat span arrays, sorts by (row, canonical order) and reassembles a
ListArray from offsets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import schema

# tag keys materialized as flat columns (the checks' effective schema,
# reference keys used throughout src/checks.py)
HOT_TAGS = [
    ("name", "name"),
    ("name:sr", "name_sr"),
    ("name:sr-Latn", "name_sr_latn"),
    ("place", "place"),
    ("is_in:country", "is_in_country"),
    ("wikipedia", "wikipedia"),
    ("wikidata", "wikidata"),
    ("highway", "highway"),
    ("int_name", "int_name"),
]
META_KEYS = [("comment", "comment"), ("check_description", "check_description"),
             ("vote", "vote")]
SUGGEST_KEYS = [("tag_1", "tag_1"), ("val_1", "val_1")]

# canonical span order keys
_ORDER = {"origin": 0, "seq": 1, "geom": 2}
for _i, (_k, _c) in enumerate(HOT_TAGS):
    _ORDER["tag:" + _k] = 3 + _i
_MEDIA_BASE = 3 + len(HOT_TAGS)
_ORDER["media:wiki"] = _MEDIA_BASE
_ORDER["media:wikidata"] = _MEDIA_BASE + 1
_ORDER["media:img"] = _MEDIA_BASE + 2
_META_BASE = _MEDIA_BASE + 3
for _i, (_k, _c) in enumerate(META_KEYS):
    _ORDER["meta:" + _k] = _META_BASE + _i
_SUG_BASE = _META_BASE + len(META_KEYS)
for _i, (_k, _c) in enumerate(SUGGEST_KEYS):
    _ORDER["suggest:" + _k] = _SUG_BASE + _i


def _scatter(texts: np.ndarray, rows: np.ndarray, n: int) -> np.ndarray:
    out = np.full(n, None, dtype=object)
    out[rows] = texts
    return out


def decode_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, spans) -> flat columns (schema.FLAT_COLUMNS).

    Zero per-row Python in the hot path: one list_flatten +
    list_parent_indices, then masked scatters.
    """
    n = batch.num_rows
    doc_id = batch["doc_id"].combine_chunks()
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    # dictionary-encode kinds ONCE: per-kind selection compares int codes,
    # not object strings (17 kinds x ~10 spans/doc otherwise dominates)
    kind_dict = pc.dictionary_encode(pc.struct_field(flat, "kind"))
    kind_codes = kind_dict.indices.to_numpy(zero_copy_only=False)
    kind_of = {k: i for i, k in enumerate(kind_dict.dictionary.to_pylist())}
    texts = pc.struct_field(flat, "text").to_numpy(zero_copy_only=False)
    media = pc.struct_field(flat, "media_ref").to_numpy(zero_copy_only=False)

    cols: dict[str, object] = {}
    # doc_id layout: "<map_slug>/<entity_type>/<osm_id>"
    did = doc_id.to_numpy(zero_copy_only=False)
    split3 = [s.split("/") for s in did]
    try:
        osm_ids = np.array([int(p[2]) for p in split3], dtype=np.int64)
    except (ValueError, IndexError):
        # explicit per-row error policy (the reference silently skips
        # entities raising AttributeError, src/sources/osm_source.py:33-36):
        # DROP malformed doc_ids and log the count — never fail the block
        import logging
        ok = np.array([len(p) == 3 and p[2].lstrip("-").isdigit()
                       for p in split3])
        logging.getLogger(__name__).warning(
            "decode_batch: dropping %d malformed doc_ids", (~ok).sum())
        return decode_batch(batch.filter(pa.array(ok)))
    cols["doc_id"] = did
    cols["map_slug"] = np.array([p[0] for p in split3], dtype=object)
    cols["entity_type"] = np.array([p[1] for p in split3], dtype=object)
    cols["osm_id"] = osm_ids

    def grab(kind: str) -> np.ndarray:
        code = kind_of.get(kind)
        if code is None:
            return np.full(n, None, dtype=object)
        m = kind_codes == code
        return _scatter(texts[m], parents[m], n)

    cols["origin"] = grab("origin")
    seq = np.full(n, -1, dtype=np.int64)
    m = kind_codes == kind_of.get("seq", -1)
    seq[parents[m]] = texts[m].astype(np.int64)
    cols["seq"] = seq
    lon = np.full(n, np.nan)
    lat = np.full(n, np.nan)
    m = kind_codes == kind_of.get("geom", -1)
    # geom text is always 'Point(<lon> <lat>)' (see encode_table)
    pts = [t[6:-1].split(" ") for t in texts[m]]
    lon[parents[m]] = np.array([p[0] for p in pts], dtype=np.float64)
    lat[parents[m]] = np.array([p[1] for p in pts], dtype=np.float64)
    cols["lon"] = lon
    cols["lat"] = lat
    for key, col in HOT_TAGS:
        cols[col] = grab("tag:" + key)
    for key, col in META_KEYS:
        cols[col] = grab("meta:" + key)
    for key, col in SUGGEST_KEYS:
        cols[col] = grab("suggest:" + key)
    # media image refs (not derivable from tags -> must round-trip)
    m_img = (kind_codes == kind_of.get("media", -1)) & (texts == "image")
    cols["media_img"] = _scatter(media[m_img], parents[m_img], n)

    arrays = []
    for name in schema.FLAT_COLUMNS:
        v = cols[name]
        if name in ("osm_id", "seq"):
            arrays.append(pa.array(v, type=pa.int64()))
        elif name in ("lat", "lon"):
            arrays.append(pa.array(v, type=pa.float64()))
        else:
            arrays.append(pa.array(v, type=pa.string()))
    return pa.table(dict(zip(schema.FLAT_COLUMNS, arrays)))


def encode_table(flat: pa.Table) -> pa.Table:
    """flat columns -> documents(doc_id, spans) in canonical span order."""
    df = flat.to_pandas()
    n = len(df)
    rows, orders, kinds, texts, medias = [], [], [], [], []

    def emit(mask: np.ndarray, order_key: str, kind, text, media=None):
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            return
        rows.append(idx)
        orders.append(np.full(len(idx), _ORDER[order_key], dtype=np.int64))
        kinds.append(np.full(len(idx), kind, dtype=object) if isinstance(kind, str)
                     else np.asarray(kind, dtype=object)[idx])
        texts.append(np.asarray(text, dtype=object)[idx] if not isinstance(text, str)
                     else np.full(len(idx), text, dtype=object))
        medias.append(np.asarray(media, dtype=object)[idx] if media is not None
                      and not isinstance(media, str)
                      else np.full(len(idx), media or "", dtype=object))

    all_rows = np.ones(n, dtype=bool)
    emit(all_rows, "origin", "origin", df["origin"].to_numpy(dtype=object))
    emit(all_rows, "seq", "seq", df["seq"].astype(np.int64).astype(str).to_numpy(dtype=object))
    geom_txt = ("Point(" + df["lon"].map("{:.7f}".format) + " "
                + df["lat"].map("{:.7f}".format) + ")").to_numpy(dtype=object)
    emit(all_rows, "geom", "geom", geom_txt)

    for key, col in HOT_TAGS:
        vals = df[col].to_numpy(dtype=object)
        emit(pd.notna(df[col]).to_numpy(), "tag:" + key, "tag:" + key, vals)

    # media spans derived from wiki/wikidata tags + attached imagery
    wp = df["wikipedia"]
    has_wp = pd.notna(wp).to_numpy()
    wp_ref = ("wiki://" + wp.str.replace(":", "/", n=1)).to_numpy(dtype=object)
    emit(has_wp, "media:wiki", "media", wp.to_numpy(dtype=object), wp_ref)
    wd = df["wikidata"]
    has_wd = pd.notna(wd).to_numpy()
    wd_ref = ("wikidata://" + wd).to_numpy(dtype=object)
    emit(has_wd, "media:wikidata", "media", wd.to_numpy(dtype=object), wd_ref)
    img = df["media_img"]
    has_img = pd.notna(img).to_numpy()
    emit(has_img, "media:img", "media", "image", img.to_numpy(dtype=object))

    for key, col in META_KEYS:
        emit(pd.notna(df[col]).to_numpy(), "meta:" + key, "meta:" + key,
             df[col].to_numpy(dtype=object))
    for key, col in SUGGEST_KEYS:
        emit(pd.notna(df[col]).to_numpy(), "suggest:" + key, "suggest:" + key,
             df[col].to_numpy(dtype=object))

    row = np.concatenate(rows)
    order = np.concatenate(orders)
    kind = np.concatenate(kinds)
    text = np.concatenate(texts)
    media = np.concatenate(medias)
    perm = np.lexsort((order, row))
    row, kind, text, media = row[perm], kind[perm], text[perm], media[perm]

    counts = np.bincount(row, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    # offset-in-row column
    off_in_row = (np.arange(len(row)) - offsets[row]).astype(np.int32)

    struct = pa.StructArray.from_arrays(
        [pa.array(kind, type=pa.string()), pa.array(text, type=pa.string()),
         pa.array(media, type=pa.string()), pa.array(off_in_row, type=pa.int32())],
        fields=list(schema.SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
    return pa.table({"doc_id": flat["doc_id"], "spans": spans})


def spans_equal(a: pa.Table, b: pa.Table) -> bool:
    """Span-sequence equality (kind, text, media_ref, order) per doc_id."""
    def norm(t: pa.Table):
        idx = pc.sort_indices(t["doc_id"].combine_chunks())
        t = t.take(idx)
        flat = pc.list_flatten(t["spans"].combine_chunks())
        return (t["doc_id"].to_pylist(),
                pc.struct_field(flat, "kind").to_pylist(),
                pc.struct_field(flat, "text").to_pylist(),
                pc.struct_field(flat, "media_ref").to_pylist(),
                pc.list_value_length(t["spans"].combine_chunks()).to_pylist())
    return norm(a) == norm(b)
