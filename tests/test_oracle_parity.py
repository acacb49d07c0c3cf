# -*- coding: utf-8 -*-
"""North-rule parity: the vectorized engine's flags equal the pure-Python
per-entity oracle on every configured map-check (same flagged entities per
check class, same messages, same fixability)."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from osmlint import config, oracle, pipeline, spans


@pytest.fixture(scope="module")
def parity_inputs(synth_small):
    d = synth_small
    wiki = pq.read_table(d + "/wiki_ref.parquet").to_pandas()
    wd = pq.read_table(d + "/wikidata_ref.parquet").to_pandas()
    wiki_d, wd_d = oracle.load_refs(d)
    flat = spans.decode_batch(pq.read_table(d + "/docs").select(
        ["doc_id", "spans"])).to_pandas()
    stage = pipeline.FlagStage(wiki, wd)
    return flat, stage, wiki_d, wd_d


@pytest.mark.parametrize("mc", config.default_map_checks(),
                         ids=lambda mc: mc.map_name)
def test_map_parity(parity_inputs, mc):
    flat, stage, wiki_d, wd_d = parity_inputs
    sub = flat[flat.map_slug == mc.slug].reset_index(drop=True)
    got = stage.flags_for(sub)
    got = got[got.map_name == mc.map_name]
    # engine-side dedup (A5 last-wins)
    got = got[got.groupby("osm_id")["seq"].transform("max") == got["seq"]]
    exp = oracle.flags_for_map(sub, mc.map_name, list(mc.checks), wiki_d, wd_d)
    key = ["doc_id", "check_name"]
    g = got.sort_values(key).reset_index(drop=True)[list(exp.columns)]
    e = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
    assert len(e) > 0
