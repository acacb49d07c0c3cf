# -*- coding: utf-8 -*-
"""End-to-end Ray Data pipeline tests: read -> decode -> PIP -> checks ->
flags -> dedup -> aggregates, asserted against the oracle."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from osmlint import config, oracle, pipeline, spans


@pytest.fixture(scope="module")
def flags_df(ray_session, synth_small):
    ds = pipeline.flags_dataset(synth_small, concurrency=1, batch_size=2048)
    return ds.to_pandas()


def _oracle_flags(synth_small):
    wiki_d, wd_d = oracle.load_refs(synth_small)
    flat = spans.decode_batch(pq.read_table(synth_small + "/docs").select(
        ["doc_id", "spans"])).to_pandas()
    out = []
    for mc in config.default_map_checks():
        sub = flat[flat.map_slug == mc.slug].reset_index(drop=True)
        out.append(oracle.flags_for_map(sub, mc.map_name, list(mc.checks),
                                        wiki_d, wd_d))
    return pd.concat(out, ignore_index=True)


def test_flags_match_oracle(flags_df, synth_small):
    exp = _oracle_flags(synth_small)
    key = ["map_name", "doc_id", "check_name"]
    g = flags_df.sort_values(key).reset_index(drop=True)[list(exp.columns)]
    e = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_summary_per_map(ray_session, flags_df, synth_small):
    import ray.data as rd
    got = pipeline.summary_per_map(rd.from_pandas(flags_df))
    exp = _oracle_flags(synth_small)
    # A1 oracle: per map, #entities / #errors / #fixable errors
    e = exp.groupby("map_name").apply(
        lambda g: pd.Series({
            "count_map_checks": g["osm_id"].nunique(),
            "count_map_errors": int((g["result"] == "CHECKED_ERROR").sum()),
            "count_map_fixable_errors": int(
                ((g["result"] == "CHECKED_ERROR") & g["fixable"]).sum()),
        }), include_groups=False).reset_index().sort_values("map_name")
    g = got.sort_values("map_name").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e.reset_index(drop=True), check_dtype=False)


def test_per_check_type(ray_session, flags_df, synth_small):
    import ray.data as rd
    got = pipeline.per_check_type(rd.from_pandas(flags_df))
    exp = _oracle_flags(synth_small)
    e = exp.groupby("check_name").apply(
        lambda g: pd.Series({
            "count_total_checks": len(g),
            "count_total_errors": int((g["result"] != "CHECKED_OK").sum()),
        }), include_groups=False).reset_index().sort_values("check_name")
    g = got[["check_name", "count_total_checks", "count_total_errors"]]
    pd.testing.assert_frame_equal(g.reset_index(drop=True),
                                  e.reset_index(drop=True), check_dtype=False)
    assert got["explanation"].notna().all()


def test_merge_overall(ray_session, flags_df):
    import ray.data as rd
    merged = pipeline.merge_overall(rd.from_pandas(flags_df)).to_pandas()
    # overall names are group names without the source suffix
    assert set(merged["map_overall"]) == {
        "Serbia checks", "Checks outside of Serbia", "Serbia checks extended"}
    # first-wins: at most one row per (overall, entity, check)
    dup = merged.groupby(["map_overall", "osm_id", "check_name"]).size()
    assert (dup == 1).all()
    # a serbia entity flagged by both PBF and a sophox map keeps distinct checks
    serbia = merged[merged["map_overall"] == "Serbia checks"]
    assert (serbia.groupby("osm_id")["check_name"].nunique() >= 1).all()


def test_pip_assignment(ray_session, synth_small):
    ds = pipeline.read_documents(synth_small)
    ds = ds.map_batches(pipeline.decode_and_index, batch_format="pyarrow")
    refs = pipeline.broadcast_refs(synth_small)
    ds = ds.map_batches(pipeline.PipAssign, batch_format="pyarrow",
                        fn_constructor_kwargs={
                            "countries_ref": refs["countries"],
                            "tiles_ref": refs["tiles"]},
                        concurrency=1, batch_size=2048)
    df = ds.to_pandas()
    # oracle: priority-ordered bbox containment
    countries = pq.read_table(synth_small + "/countries.parquet").to_pandas()
    import numpy as np
    exp = np.full(len(df), None, dtype=object)
    for r in countries.sort_values("priority", ascending=False).itertuples():
        hit = (df["lat"].between(r.minlat, r.maxlat)
               & df["lon"].between(r.minlon, r.maxlon)).to_numpy()
        exp[hit] = r.country
    assert (pd.Series(exp).fillna("-") == df["country"].fillna("-")).all()
    # tiles: every serbia-core point got a tile
    tiles = pq.read_table(synth_small + "/tiles.parquet").to_pandas()
    in_core = (df["lat"].between(tiles.minlat.min(), tiles.maxlat.max())
               & df["lon"].between(tiles.minlon.min(), tiles.maxlon.max()))
    assert (df.loc[in_core, "tile_id"] >= 0).mean() > 0.999


def test_config_from_json(synth_small):
    """§2.7 user-extension surface: the reference config.json contract
    (groups x maps x check FQNs, Cartesian expansion, registry-resolved)."""
    from osmlint import config, pipeline
    import pyarrow as pa
    cfg = {
        "Serbia checks": {
            "maps": {"PBF": "serbia_pbf"},
            "checks": ["checks.NameMissingCheck", "checks.NameCyrillicCheck"],
        },
    }
    mcs = config.from_json(cfg)
    assert [m.map_name for m in mcs] == ["Serbia checks (PBF)"]
    assert mcs[0].serbia_mode and mcs[0].slug == "serbia_pbf"
    # the custom suite actually drives FlagStage
    ds = pipeline.read_documents(synth_small)
    ds = ds.map_batches(pipeline.decode_and_index, batch_format="pyarrow")
    batch = ds.take_batch(512, batch_format="pyarrow")
    stage = pipeline.FlagStage(map_checks=mcs)
    out = stage(batch).to_pandas()
    assert set(out["check_name"]) <= {"checks.NameMissingCheck",
                                      "checks.NameCyrillicCheck"}
    import pytest
    with pytest.raises(KeyError, match="unknown check FQNs"):
        config.from_json({"G": {"maps": {"m": "s"},
                                "checks": ["checks.NopeCheck"]}})


def test_media_dedup_keeper_semantics(ray_session):
    from osmlint import media, queries
    sf = "/root/testdata/sf0.001"
    d = queries._synth(sf)
    out = media.media_dedup(d).to_pandas()
    feats = media.media_features(d).to_pandas()
    # keeper is the lexicographic min doc_id of its phash group; copy
    # counts sum back to the full media row count
    grp = feats.groupby("phash")["doc_id"]
    assert out["n_copies"].sum() == len(feats)
    m = out.set_index("phash")
    for ph, g in list(grp)[:50]:
        assert m.loc[ph, "doc_id"] == g.min()
        assert m.loc[ph, "n_copies"] == len(g)


def test_lint_flags_by_tile_consistent(ray_session):
    """The tile rollup totals the flag table exactly: summed n_results
    equals the flag row count, summed n_errors equals the CHECKED_ERROR
    rows, and every check_name in the flags appears in the rollup."""
    from osmlint import queries as qmod
    sf = "/root/testdata/sf0.001"
    rolled = qmod.lint_flags_by_tile(sf)
    flags = qmod.lint_flags(sf).to_pandas()
    assert int(rolled["n_results"].sum()) == len(flags)
    assert int(rolled["n_errors"].sum()) == \
        int((flags["result"] == "CHECKED_ERROR").sum())
    assert int(rolled["n_fixable"].sum()) == \
        int(((flags["result"] == "CHECKED_ERROR")
             & flags["fixable"]).sum())
    assert set(flags["check_name"]) == set(rolled["check_name"])
    assert (rolled["n_errors"] <= rolled["n_results"]).all()
    assert (rolled["n_fixable"] <= rolled["n_errors"]).all()
