# -*- coding: utf-8 -*-
"""geo_clusters (DBSCAN) — oracle parity at gate scale + DBSCAN
invariants against a brute-force all-pairs reference."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from osmlint import geo, geocluster, oracle_sql, synth

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(ray_session):
    d = synth.generate(SF)
    got = geocluster.geo_clusters(d).to_pandas()
    return d, got.sort_values(["osm_id", "entity_type"]) \
        .reset_index(drop=True)


@pytest.fixture(scope="module")
def brute(result):
    """All-pairs brute-force DBSCAN on the same deduped point set."""
    d, _ = result
    con = duckdb.connect()
    pts = con.execute(f"""
      SELECT osm_id*4 + CASE entity_type WHEN 'node' THEN 0
                        WHEN 'way' THEN 1 ELSE 2 END AS node, lat, lon
      FROM (SELECT f.*, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY seq DESC) AS rn
            FROM read_parquet('{d}/flat.parquet') f
            WHERE map_slug='serbia_pbf'
              AND place IN ('city','town','village')
              AND name IS NOT NULL) WHERE rn=1""").df()
    node = pts["node"].to_numpy(np.int64)
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    dist = geo.haversine_km(lat[:, None], lon[:, None],
                            lat[None, :], lon[None, :])
    adj = (dist <= geocluster.EPS_KM) & ~np.eye(len(node), dtype=bool)
    return node, adj


def test_core_degree_invariant(result, brute):
    """is_core <=> eps-neighborhood (incl. self) >= MIN_PTS."""
    _, got = result
    node, adj = brute
    deg = adj.sum(axis=1)
    core_nodes = set(node[deg >= geocluster.MIN_PTS - 1].tolist())
    got_nodes = got["osm_id"].to_numpy(np.int64) * 4 + \
        got["entity_type"].map(geocluster._ETYPE_CODE).to_numpy(np.int64)
    for n, is_core in zip(got_nodes.tolist(), got["is_core"].tolist()):
        assert is_core == (n in core_nodes)
    # every core point is in the output
    assert core_nodes <= set(got_nodes.tolist())


def test_noise_and_border_rules(result, brute):
    """Output = cores + non-cores with >= 1 core neighbor; noise absent;
    border label = min core-neighbor cluster; cluster_id = min member."""
    _, got = result
    node, adj = brute
    deg = adj.sum(axis=1)
    is_core = deg >= geocluster.MIN_PTS - 1
    has_core_nb = (adj & is_core[None, :]).any(axis=1)
    expect = set(node[is_core | has_core_nb].tolist())
    got_nodes = got["osm_id"].to_numpy(np.int64) * 4 + \
        got["entity_type"].map(geocluster._ETYPE_CODE).to_numpy(np.int64)
    assert set(got_nodes.tolist()) == expect
    # cluster_id is the minimum CORE member node of its cluster (labels
    # come from the closure over cores; borders attach afterwards)
    gm = pd.DataFrame({"node": got_nodes,
                       "cluster_id": got["cluster_id"].to_numpy(np.int64),
                       "is_core": got["is_core"].to_numpy(bool)})
    mins = gm[gm["is_core"]].groupby("cluster_id")["node"].min()
    assert (mins == mins.index).all()
    # cluster_size is the member count
    sz = got.groupby("cluster_id")["cluster_id"].transform("size")
    assert (sz.to_numpy() == got["cluster_size"].to_numpy()).all()


def test_oracle_parity(result):
    d, got = result
    exp = duckdb.connect().execute(oracle_sql.geo_clusters_sql(
        d, geocluster.EPS_KM, geocluster.MIN_PTS)).df() \
        .sort_values(["osm_id", "entity_type"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)],
        check_dtype=False)


def test_distributed_paths_agree(result):
    """The default run takes the local vectorized tail; force the FULLY
    distributed tail (small_threshold=0) AND the JOIN-based core-flag
    path (broadcast ceiling dropped) and require identical output."""
    d, got = result
    old = geocluster.BROADCAST_MAX
    geocluster.BROADCAST_MAX = 0
    geocluster._MEMBERS_CACHE.clear()      # knobs aren't in the cache key
    try:
        got2 = geocluster.geo_clusters(d, small_threshold=0).to_pandas() \
            .sort_values(["osm_id", "entity_type"]).reset_index(drop=True)
    finally:
        geocluster.BROADCAST_MAX = old
    pd.testing.assert_frame_equal(got, got2, check_dtype=False)


def test_distributed_broadcast_path_agrees(result):
    """Distributed tail with the BROADCAST core-flag path (ceiling
    intact) also matches the local kernel."""
    d, got = result
    geocluster._MEMBERS_CACHE.clear()      # drop the forced-join entry
    got2 = geocluster.geo_clusters(d, small_threshold=0).to_pandas() \
        .sort_values(["osm_id", "entity_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got2, check_dtype=False)


def test_geo_cluster_stats_invariants(result):
    """Stats rows aggregate the members exactly: counts match the
    member table, centroids sit inside the bbox, bbox spans <= 2*eps
    chains are not asserted (clusters chain arbitrarily) but every core
    count is positive (a cluster IS its core set)."""
    d, got = result
    stats = geocluster.geo_cluster_stats(d)
    bycl = got.groupby("cluster_id")
    assert set(stats["cluster_id"]) == set(got["cluster_id"].unique())
    for _, r in stats.iterrows():
        g = bycl.get_group(r["cluster_id"])
        assert r["n_points"] == len(g)
        assert r["n_core"] == int(g["is_core"].sum())
        assert r["n_core"] >= 1
        assert r["lat_min"] <= r["centroid_lat"] <= r["lat_max"]
        assert r["lon_min"] <= r["centroid_lon"] <= r["lon_max"]
    assert stats["n_points"].sum() == len(got)


def test_geo_cluster_diameter_brute(result):
    """Per-cluster max pairwise rounded haversine vs a brute force over
    the member coordinates; the reported pair attains it, the count
    matches the member table, and the diameter dominates the bbox
    edges' chord only loosely (no assertion — the pair identity IS the
    check)."""
    d, got = result
    con = duckdb.connect()
    pts = con.execute(f"""
      SELECT osm_id*4 + CASE entity_type WHEN 'node' THEN 0
                        WHEN 'way' THEN 1 ELSE 2 END AS node, lat, lon
      FROM (SELECT f.*, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY seq DESC) AS rn
            FROM read_parquet('{d}/flat.parquet') f
            WHERE map_slug='serbia_pbf'
              AND place IN ('city','town','village')
              AND name IS NOT NULL) WHERE rn=1""").df()
    coords = {int(r.node): (r.lat, r.lon) for r in pts.itertuples()}
    diam = geocluster.geo_cluster_diameter(d)
    code = {"node": 0, "way": 1, "relation": 2}
    mem = got.assign(node=got["osm_id"].to_numpy(np.int64) * 4
                     + got["entity_type"].map(code).to_numpy(np.int64))
    assert len(diam) == mem["cluster_id"].nunique()
    for _, r in diam.iterrows():
        nodes = np.sort(mem.loc[mem["cluster_id"] == r["cluster_id"],
                                "node"].to_numpy(np.int64))
        assert r["n_points"] == len(nodes)
        lat = np.array([coords[n][0] for n in nodes])
        lon = np.array([coords[n][1] for n in nodes])
        dm = geo.haversine_km(lat[:, None], lon[:, None],
                              lat[None, :], lon[None, :])
        d6 = np.floor(dm * 1e6 + 0.5).astype(np.int64)
        iu = np.triu_indices(len(nodes), k=1)
        best = d6[iu].max()
        assert r["diam_km"] == float(best) / 1e6
        hits = np.argwhere(np.triu(d6 == best, k=1))
        na, nb = min((int(nodes[i]), int(nodes[j])) for i, j in hits)
        assert int(r["osm_id_a"]) * 4 + code[r["entity_type_a"]] == na
        assert int(r["osm_id_b"]) * 4 + code[r["entity_type_b"]] == nb


def test_eps_pair_checkpoint_resume(result):
    """The pair mine checkpoints to fingerprinted parquet: dropping the
    in-memory cache resumes from disk with the identical pair set, and
    purge_disk removes the dirs (cold-run contract)."""
    import os
    d, _ = result
    a = geocluster.mined_eps_pairs(d).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(geocluster._PAIRS_CKPT_DIRS) >= 1
    ckpt = next(iter(geocluster._PAIRS_CKPT_DIRS))
    assert os.path.exists(os.path.join(ckpt, "_SUCCESS"))
    geocluster._PAIRS_CACHE.clear()          # simulate process restart
    b = geocluster.mined_eps_pairs(d).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    import osmlint
    osmlint.clear_caches(purge_disk=True)
    assert not os.path.exists(ckpt)
    # and a cold mine rebuilds the identical set
    c = geocluster.mined_eps_pairs(d).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, c)
