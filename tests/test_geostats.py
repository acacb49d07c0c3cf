# -*- coding: utf-8 -*-
"""Grid spatial statistics (Moran's I / Gi* / KDE heatmap) — textbook
brute-force recomputation from the raw point table, plus the candidate
-restriction invariant the KDE scale shape relies on."""

import duckdb
import numpy as np
import pytest

from osmlint import geo, geostats, synth

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def points(ray_session):
    d = synth.generate(SF)
    con = duckdb.connect()
    df = con.execute(
        f"SELECT lat, lon FROM read_parquet('{d}/flat.parquet')").df()
    lat, lon = df["lat"].to_numpy(), df["lon"].to_numpy()
    cells = geo.cell_id(lat, lon, geostats.CELL_RES).astype(np.int64)
    return d, lat, lon, cells


@pytest.fixture(scope="module")
def grid(points):
    """Occupied-cell counts + queen adjacency, brute-forced."""
    _, _, _, cells = points
    uniq, counts = np.unique(cells, return_counts=True)
    ix, iy = uniq % geostats.N_SIDE, uniq // geostats.N_SIDE
    adj = (np.abs(ix[:, None] - ix[None, :]) <= 1) \
        & (np.abs(iy[:, None] - iy[None, :]) <= 1)
    return uniq, counts.astype(np.int64), adj


def test_moran_i_brute(points, grid):
    d, _, _, _ = points
    uniq, n, adj = grid
    w = adj & ~np.eye(len(uniq), dtype=bool)        # queen, no self
    z = n - n.mean()
    s0 = int(w.sum())
    expect = (len(uniq) / s0) * float(z @ (w @ z)) / float(z @ z)
    got = geostats.moran_i(d)
    assert len(got) == 1
    assert int(got["n_cells"].iloc[0]) == len(uniq)
    assert int(got["s0"].iloc[0]) == s0
    assert got["moran_i"].iloc[0] == pytest.approx(expect, abs=2e-6)


def test_gi_star_brute(points, grid):
    d, _, _, _ = points
    uniq, x, adj = grid                             # adj includes self
    nn = len(uniq)
    xbar, s = x.mean(), x.std()                     # population sd
    t = adj @ x
    w = adj.sum(axis=1)
    denom = s * np.sqrt((nn * w - w * w) / (nn - 1.0))
    expect = (t - xbar * w) / denom
    got = geostats.gi_star(d)
    assert got["cell_id"].tolist() == uniq.tolist()
    assert got["n_docs"].tolist() == x.tolist()
    np.testing.assert_allclose(got["gi_z"].to_numpy(), expect, atol=2e-6)
    # hotspots really are hot: the max-z cell has an above-mean window sum
    hot = int(np.argmax(got["gi_z"].to_numpy()))
    assert t[hot] / w[hot] > xbar


def test_kde_brute_and_candidate_invariant(points):
    d, lat, lon, cells = points
    got = geostats.kde_heatmap(d)
    out_cells = got["cell_id"].to_numpy(np.int64)
    # brute contributions: every point x every OUTPUT cell center
    jx, jy = out_cells % geostats.N_SIDE, out_cells // geostats.N_SIDE
    clat = 90.0 - (jy + 0.5) * geostats.LAT_STEP
    clon = (jx + 0.5) * geostats.LON_STEP - 180.0
    dist = geo.haversine_km(lat[:, None], lon[:, None],
                            clat[None, :], clon[None, :])
    dist = np.floor(dist * 1e6 + 0.5) / 1e6
    within = dist <= geostats.KDE_CUTOFF_KM
    u = dist / geostats.KDE_CUTOFF_KM
    t = 1.0 - u * u
    micro = np.floor(t * t * 1000000.0 + 0.5).astype(np.int64)
    micro[~within] = 0
    np.testing.assert_array_equal(got["kde_micro"].to_numpy(np.int64),
                                  micro.sum(axis=0))
    np.testing.assert_array_equal(got["n_pts"].to_numpy(np.int64),
                                  within.sum(axis=0))
    # the 3x3 candidate restriction is lossless at this cutoff: every
    # (point, output-cell) pair within the cutoff is in the point's 3x3
    pix, piy = cells % geostats.N_SIDE, cells // geostats.N_SIDE
    in3x3 = (np.abs(pix[:, None] - jx[None, :]) <= 1) \
        & (np.abs(piy[:, None] - jy[None, :]) <= 1)
    assert not np.any(within & ~in3x3)
    # and no contributing center exists outside the output cell set:
    # output cells == exactly the 3x3 neighbors receiving >= 1 in-cutoff
    # contribution (engine emits only contribution-receiving cells)
    assert np.all(within.sum(axis=0) >= 1)


def test_kde_cutoff_fits_window():
    """The documented coverage bound: cutoff < 1.5 res-8 cell heights."""
    cell_height_km = geostats.LAT_STEP * 111.195
    assert geostats.KDE_CUTOFF_KM < 1.5 * cell_height_km


def test_ripley_k_brute(ray_session):
    """Cumulative pair counts vs an all-pairs brute force on the same
    deduped named-CTV point set; monotone non-decreasing curve; the
    normalizer is exactly 2*cnt/n^2."""
    from osmlint import geocluster
    d = synth.generate(SF)
    con = duckdb.connect()
    pts = con.execute(f"""
      SELECT lat, lon
      FROM (SELECT f.*, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY seq DESC) AS rn
            FROM read_parquet('{d}/flat.parquet') f
            WHERE map_slug='serbia_pbf'
              AND place IN ('city','town','village')
              AND name IS NOT NULL) WHERE rn=1""").df()
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    n = len(lat)
    dist = geo.haversine_km(lat[:, None], lon[:, None],
                            lat[None, :], lon[None, :])
    dist = np.floor(dist * 1e6 + 0.5) / 1e6
    iu = np.triu_indices(n, k=1)
    got = geocluster.ripley_k(d)
    assert got["r_km"].tolist() == list(geocluster.RIPLEY_BINS)
    for r, cnt, koa in zip(got["r_km"], got["n_pairs"], got["k_over_a"]):
        expect = int((dist[iu] <= r).sum())
        assert cnt == expect
        assert koa == (2.0 * cnt) / (n * n)
    assert (np.diff(got["n_pairs"].to_numpy()) >= 0).all()


def _named_pts(d):
    con = duckdb.connect()
    return con.execute(f"""
      SELECT lat, lon, CAST(length(name) AS BIGINT) AS val
      FROM (SELECT f.*, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY seq DESC) AS rn
            FROM read_parquet('{d}/flat.parquet') f
            WHERE map_slug='serbia_pbf'
              AND place IN ('city','town','village')
              AND name IS NOT NULL) WHERE rn=1""").df()


def test_semivariogram_brute(ray_session):
    """Per-bin squared-diff sums vs an all-pairs brute force; the bin
    partition of the pair set is exact (bin sums == cumulative Ripley
    counts at the last edge) and gamma is sq_sum/(2*n_pairs)."""
    from osmlint import geocluster
    d = synth.generate(SF)
    pts = _named_pts(d)
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    val = pts["val"].to_numpy(np.int64)
    dist = geo.haversine_km(lat[:, None], lon[:, None],
                            lat[None, :], lon[None, :])
    dist = np.floor(dist * 1e6 + 0.5) / 1e6
    iu = np.triu_indices(len(lat), k=1)
    d_, sq = dist[iu], (val[:, None] - val[None, :])[iu] ** 2
    got = geocluster.semivariogram(d)
    edges = np.asarray(geocluster.VARIO_BINS)
    prev = 0.0
    for e in edges:
        m = (d_ > prev) & (d_ <= e)
        row = got[got["r_km"] == e]
        if not m.any():
            assert row.empty
        else:
            assert int(row["n_pairs"].iloc[0]) == int(m.sum())
            assert int(row["sq_sum"].iloc[0]) == int(sq[m].sum())
            assert row["gamma"].iloc[0] == \
                float(sq[m].sum()) / (2.0 * float(m.sum()))
        prev = e
    assert int(got["n_pairs"].sum()) == int((d_ <= edges[-1]).sum())


def test_nn_stats_brute(ray_session):
    """The aggregate row vs an all-pairs brute force: per-point NN
    distance inside the eps band, isolated points counted exactly."""
    from osmlint import geocluster
    d = synth.generate(SF)
    pts = _named_pts(d)
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    n = len(lat)
    dist = geo.haversine_km(lat[:, None], lon[:, None],
                            lat[None, :], lon[None, :])
    dist = np.floor(dist * 1e6 + 0.5) / 1e6
    np.fill_diagonal(dist, np.inf)
    dist[dist > geocluster.EPS_KM] = np.inf
    nn = dist.min(axis=1)
    has = np.isfinite(nn)
    micro = np.floor(nn[has] * 1e6 + 0.5).astype(np.int64)
    got = geocluster.nn_stats(d)
    assert int(got["n_points"].iloc[0]) == n
    assert int(got["n_with_nn"].iloc[0]) == int(has.sum())
    assert int(got["n_isolated"].iloc[0]) == int((~has).sum())
    assert got["nn_min_km"].iloc[0] == float(micro.min()) / 1e6
    assert got["nn_max_km"].iloc[0] == float(micro.max()) / 1e6
    assert got["nn_mean_km"].iloc[0] == \
        (float(micro.sum()) / 1e6) / float(has.sum())


def test_kernel_surface_brute(ray_session):
    """Weighted-mean surface vs an all-points brute force over every
    named doc and every occupied 3x3 center; weights quantized the same
    way; surface == wv/w exactly."""
    d = synth.generate(SF)
    con = duckdb.connect()
    pts = con.execute(f"""
      SELECT lat, lon, CAST(length(name) AS BIGINT) AS val
      FROM read_parquet('{d}/flat.parquet') WHERE name IS NOT NULL""").df()
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    val = pts["val"].to_numpy(np.int64)
    got = geostats.kernel_surface(d)
    n_side = geostats.N_SIDE
    for _, r in got.head(12).iterrows():
        cid = int(r["cell_id"])
        cy, cx = cid // n_side, cid % n_side
        clat = 90.0 - (cy + 0.5) * geostats.LAT_STEP
        clon = (cx + 0.5) * geostats.LON_STEP - 180.0
        dd = geo.haversine_km(lat, lon, clat, clon)
        dd = np.floor(dd * 1e6 + 0.5) / 1e6
        sel = dd <= geostats.KDE_CUTOFF_KM
        u = dd[sel] / geostats.KDE_CUTOFF_KM
        t = 1.0 - u * u
        m = np.floor(t * t * 1e6 + 0.5).astype(np.int64)
        assert int(r["n_pts"]) == int(sel.sum())
        assert int(r["w_micro"]) == int(m.sum())
        assert int(r["wv_micro"]) == int((m * val[sel]).sum())
        assert r["surface"] == float(r["wv_micro"]) / float(r["w_micro"])


def test_bearing_rose_brute(points):
    """Sector histogram vs a brute force over all docs: same nearest
    center, same atan2 bearing, same rounding/wrap — and the sector
    partition is total (counts sum to the corpus size)."""
    d, lat, lon, _ = points
    import duckdb as ddb
    con = ddb.connect()
    tiles = con.execute(
        f"SELECT * FROM read_parquet('{d}/tiles.parquet') "
        f"ORDER BY tile_id").df()
    clat = ((tiles["minlat"] + tiles["maxlat"]) / 2.0).to_numpy()
    clon = ((tiles["minlon"] + tiles["maxlon"]) / 2.0).to_numpy()
    names = tiles["tile_name"].astype(str).tolist()
    dm = geo.haversine_km(lat[:, None], lon[:, None],
                          clat[None, :], clon[None, :])
    dm = np.floor(dm * 1e6 + 0.5) / 1e6
    idx = np.argmin(dm, axis=1)
    tl, tn = clat[idx], clon[idx]
    dlam = np.radians(tn) - np.radians(lon)
    y = np.sin(dlam) * np.cos(np.radians(tl))
    x = np.cos(np.radians(lat)) * np.sin(np.radians(tl)) \
        - np.sin(np.radians(lat)) * np.cos(np.radians(tl)) * np.cos(dlam)
    b = np.mod(np.degrees(np.arctan2(y, x)) + 360.0, 360.0)
    b = np.floor(b * 1e6 + 0.5) / 1e6
    sector = np.floor(b / 45.0).astype(np.int64)
    sector[sector == 8] = 0
    got = geostats.bearing_rose(d)
    assert int(got["n_docs"].sum()) == len(lat)
    import pandas as pd
    exp = pd.DataFrame({"tile_name": [names[i] for i in idx],
                        "sector": sector}) \
        .groupby(["tile_name", "sector"]).size().reset_index(name="n_docs") \
        .sort_values(["tile_name", "sector"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hilbert_curve_properties():
    """On the full 2^4 grid the transform is a bijection onto
    0..255 and consecutive curve positions are unit-Manhattan grid
    neighbors — the locality property the partition key exists for."""
    res = 4
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    d = geostats._hilbert_d(xs, ys, res)
    assert sorted(d.tolist()) == list(range(n * n))
    order = np.argsort(d)
    steps = (np.abs(np.diff(xs[order]))
             + np.abs(np.diff(ys[order])))
    assert (steps == 1).all()


def test_hilbert_index_and_pip_gaps_consistency(points):
    """hilbert_index is cell_index re-keyed (same cells, same counts,
    unique curve positions); pip_gaps totals the '(none)' docs the
    PIP join reports."""
    from osmlint import queries as qmod
    d, _, _, cells = points
    hi = geostats.hilbert_index(d)
    uniq, counts = np.unique(cells, return_counts=True)
    assert hi.sort_values("cell_id")["cell_id"].tolist() == uniq.tolist()
    assert hi.sort_values("cell_id")["n_docs"].tolist() == counts.tolist()
    assert hi["hilbert_d"].is_unique
    sf = "/root/testdata/sf0.001"
    gaps = qmod.geo_pip_gaps(sf)
    ptj = qmod.pip_tile_join(sf)
    none_total = int(ptj.loc[ptj["tile_name"] == "(none)",
                             "n_docs"].sum())
    assert int(gaps["n_gap"].sum()) == none_total > 0
