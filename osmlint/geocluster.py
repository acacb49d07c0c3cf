# -*- coding: utf-8 -*-
"""Density-based spatial clustering (DBSCAN) over the named-CTV points.

The reference's spatial reasoning is per-entity point-radius gating (the
20 km wiki gate, src/checks.py:541; ``wikibase:around`` circles in
sparql/*.sparql).  This operator generalizes it to the classic corpus-
level question — settlement agglomerations: group places that chain
together within ``eps_km`` of each other (Ester et al., "A Density-Based
Algorithm for Discovering Clusters", KDD'96).

Semantics (deterministic variant of DBSCAN):

* ``core`` point: >= ``min_pts`` points (itself included) within
  ``eps_km``;
* clusters: connected components of the core-core eps-graph, labeled by
  the minimum CORE member node id (isolated cores form singleton
  clusters; an attached border node may carry a smaller id — the label
  stays the core minimum);
* ``border`` point: a non-core with >= 1 core neighbor, assigned the
  MINIMUM cluster label among its core neighbors (classic DBSCAN's
  first-visitor assignment is scan-order-dependent; the min rule makes
  the output a pure function of the input);
* noise points are dropped from the output.

Ray-Data-idiomatic shape — no all-pairs, no driver loops:

1. shared deduped named-CTV projection (``dupnames.named_ctv_deduped``);
2. eps-pair mining with the same 9-cell replication trick as
   ``dupnames``: each point is emitted into its home cell (anchor) + 8
   neighbors at a resolution whose cell size exceeds ``eps_km``, so every
   qualifying pair shares the anchor's home cell; the shuffle key is the
   FINE cell hashed into a bounded bucket count (the ``_REDUCE_BUCKETS``
   rule — sparse cells would otherwise pay per-group overhead, and
   hashing the fine cell rather than a coarse ancestor scatters dense
   metros across all buckets), and each group runs one vectorized
   chunked anchors x copies expansion on the fine cell + haversine
   gate (``_eps_pairs_group``).  Work per group is bounded by
   eps-density (the candidate volume itself), not by global skew;
3. per-node eps-DEGREE via a bounded node-hash bucket reduce over pair
   endpoints (the ``_REDUCE_BUCKETS`` rule — no node-cardinality
   ``aggregate()``);
4. core flags on pairs: the core id set is broadcast (``ray.put`` once,
   searchsorted membership per batch) under ``BROADCAST_MAX`` nodes, and
   flips to two distributed left-outer joins above it — the same dual
   path as ``textops.dedup_apply``;
5. transitive closure via ``graph.cluster_labels`` (hybrid local
   pointer-jump / distributed min-label propagation); isolated cores ride
   along as self-loop edges;
6. border assignment: one join of the (non-core, core) pair orientation
   against the core labels + a bucketed min reduce;
7. cluster sizes: a bounded bucket count + one join back.

Oracle: the same pairs / degree / closure in DuckDB — the closure as a
fixed-round alternating min-propagation + pointer-jump CTE chain
(``oracle_sql.geo_clusters_sql``), the same algorithm as the engine's
local closure, with rounds >= 1.6x the measured convergence point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from . import caches, geo, graph
from .dupnames import named_ctv_deduped
from .pipeline import to_arrow

#: process-lifetime cache of the MATERIALIZED cluster-member table —
#: ``geo_clusters`` and ``geo_cluster_stats`` run back-to-back in the
#: driver's sweep and share the whole DBSCAN lineage; fingerprint-keyed
#: like the named-CTV projection cache.
_MEMBERS_CACHE: dict = caches.register({})

EPS_KM = 0.5
MIN_PTS = 4
#: res 15: cell height 180/2^15 = 0.0055 deg ~ 0.61 km and width
#: >= 0.83 km at 47N — both exceed EPS_KM, so ring-1 replication covers
#: every eps-pair over the Serbia extent.
RES = 15
GROUP_RES = 10
#: broadcast ceiling for the core id set (int64 ids: 128 MiB at 2^24),
#: mirroring textops.dedup_apply's keep-list threshold.
BROADCAST_MAX = 1 << 24

_ETYPE_CODE = {"node": 0, "way": 1, "relation": 2}
_ETYPE_NAME = np.array(["node", "way", "relation"], dtype=object)

_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
_OUT_SCHEMA = pa.schema([("osm_id", pa.int64()),
                         ("entity_type", pa.string()),
                         ("cluster_id", pa.int64()),
                         ("is_core", pa.bool_()),
                         ("cluster_size", pa.int64())])


def _to_nodes(batch: pa.Table) -> pa.Table:
    """doc_id '<map>/<etype>/<osm_id>' -> int64 node = osm_id*4 + code.

    The encoding is SQL-expressible (oracle mirrors it), so the min-node
    cluster label round-trips exactly."""
    df = batch.to_pandas()
    parts = df["doc_id"].str.split("/", expand=True)
    code = parts[1].map(_ETYPE_CODE).to_numpy(np.int64)
    node = parts[2].astype(np.int64).to_numpy() * 4 + code
    return pa.table({"node": pa.array(node, type=pa.int64()),
                     "lat": pa.array(df["lat"].to_numpy(np.float64)),
                     "lon": pa.array(df["lon"].to_numpy(np.float64))})


def _replicate(batch: pa.Table, *, res: int, group_res: int) -> pa.Table:
    """Emit each point into home cell (anchor) + ring-1 neighbors;
    ``gcell`` (coarse ancestor) is the shuffle key."""
    node = batch["node"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    home = geo.cell_id(lat, lon, res)
    neigh = geo.cell_neighbors(home, res)                  # (n, 8), -1 pad
    cells = np.concatenate([home[:, None], neigh], axis=1)  # (n, 9)
    rows = np.repeat(np.arange(len(node)), 9)
    flat = cells.reshape(-1)
    keep = flat >= 0
    rows, flat = rows[keep], flat[keep]
    # meta-bucket the shuffle key DIRECTLY on the fine cell: pairs are
    # only ever mined within one fine cell, so any partition of fine
    # cells is correct — hashing the fine cell (not its coarse
    # ancestor) scatters a dense metro's many cells across all buckets
    # instead of pinning the whole area to one straggler group (the
    # ancestor keying made one bucket 5x the mean at sf0.1).  Residual
    # skew is a single ultra-dense FINE cell — irreducible for this
    # algorithm without changing ``res``.  ``group_res`` stays in the
    # signature (callers key caches on it) but no longer shapes the
    # shuffle.
    del group_res
    gcell = _bucket_of(flat)
    return pa.table({
        "gcell": pa.array(gcell), "cell": pa.array(flat),
        "anchor": pa.array(flat == home[rows]),
        "node": pa.array(node[rows]),
        "lat": pa.array(lat[rows]), "lon": pa.array(lon[rows])})


#: mined-pair schema shared by the DBSCAN and range-join consumers:
#: ``dist_km`` is 6-dp floor-rounded; ``raw_ok`` is the UNrounded
#: ``d <= eps`` verdict (geo_clusters' gate — its oracle compares raw
#: haversine), while the rounded column serves geo_range_join's
#: ulp-stable gate.  The miner keeps every pair with raw
#: ``d <= eps + _ROUND_SLACK`` so both gates read from one set
#: (rounded <= eps implies raw < eps + 5e-7).
_MINE_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()),
    ("dist_km", pa.float64()), ("raw_ok", pa.bool_())])
_ROUND_SLACK = 1e-6
#: candidate rows expanded per numpy chunk inside a group kernel
#: (~320 MB of working set at 5 int64/float64 columns)
_CAND_CHUNK = 1 << 23


def _eps_pairs_group(g: pd.DataFrame, *, eps_km: float) -> pa.Table:
    """Anchor-driven same-fine-cell candidate expansion + haversine
    gate, fully vectorized: sort the group by fine cell, locate each
    anchor's cell run with ``searchsorted``, expand (anchor, candidate)
    index pairs with ``repeat``/``arange`` arithmetic, and gate in
    numpy — no pandas merge materializing the candidate frame (the
    merge was the 5x-mean straggler on the densest metro gcell).
    Anchors are processed in ``_CAND_CHUNK``-candidate chunks so the
    expansion stays memory-bounded regardless of cell density.  A pair
    (a < b) is emitted exactly once — in a's home cell, where b is
    present by replication (cell size >= eps + slack guarantees
    coverage)."""
    cell = g["cell"].to_numpy(np.int64)
    order = np.argsort(cell, kind="stable")
    cell = cell[order]
    node = g["node"].to_numpy(np.int64)[order]
    lat = g["lat"].to_numpy(np.float64)[order]
    lon = g["lon"].to_numpy(np.float64)[order]
    apos = np.nonzero(g["anchor"].to_numpy(bool)[order])[0]
    if not len(apos):
        return _MINE_SCHEMA.empty_table()
    left = np.searchsorted(cell, cell[apos], "left")
    cnt = np.searchsorted(cell, cell[apos], "right") - left
    csum = np.cumsum(cnt)
    total = int(csum[-1])
    cuts = np.searchsorted(csum, np.arange(_CAND_CHUNK, total,
                                           _CAND_CHUNK), "left") + 1
    bounds = np.concatenate([[0], cuts, [len(apos)]])
    outs = []
    for a0, a1 in zip(bounds[:-1], bounds[1:]):
        if a0 >= a1:
            continue
        c = cnt[a0:a1]
        tot = int(c.sum())
        if tot == 0:
            continue
        ai = np.repeat(apos[a0:a1], c)
        off = np.arange(tot, dtype=np.int64) \
            - np.repeat(np.cumsum(c) - c, c)
        bi = np.repeat(left[a0:a1], c) + off
        m = node[ai] < node[bi]
        ai, bi = ai[m], bi[m]
        d = geo.haversine_km(lat[ai], lon[ai], lat[bi], lon[bi])
        keep = d <= eps_km + _ROUND_SLACK
        ai, bi, d = ai[keep], bi[keep], d[keep]
        if not len(ai):
            continue
        outs.append(pa.table({
            "doc_a": pa.array(node[ai]), "doc_b": pa.array(node[bi]),
            "dist_km": pa.array(np.floor(d * 1e6 + 0.5) / 1e6),
            "raw_ok": pa.array(d <= eps_km)}))
    if not outs:
        return _MINE_SCHEMA.empty_table()
    return pa.concat_tables(outs)


_PAIRS_CACHE: dict = caches.register({})

#: bump when the mined-pair checkpoint SCHEMA changes (part of the
#: on-disk dir name, so an old checkpoint can never serve new code)
_PAIRS_CKPT_VERSION = 1

#: pair-checkpoint dirs this process created/reused (purged only on an
#: explicit ``clear_caches(purge_disk=True)`` — same policy as the
#: shingle checkpoints)
_PAIRS_CKPT_DIRS: set = set()


@caches.register_purger
def _purge_pair_checkpoints() -> None:
    import shutil
    for p in list(_PAIRS_CKPT_DIRS):
        shutil.rmtree(p, ignore_errors=True)
    _PAIRS_CKPT_DIRS.clear()


def mined_eps_pairs(data_dir: str, *, map_slug: str = "serbia_pbf",
                    eps_km: float = EPS_KM, res: int = RES,
                    group_res: int = GROUP_RES) -> rd.Dataset:
    """Shared eps-pair mining over the deduped named-CTV points —
    ``(doc_a, doc_b, dist_km, raw_ok)``, materialized and cached per
    (input fingerprint, eps, res) so ``geo_clusters``,
    ``geo_cluster_stats``, ``geo_range_join``, Ripley's K, the
    semivariogram and the NN stats mine the corpus once per driver
    sweep.

    The mine — the most expensive stage of the spatial family — is
    ALSO checkpointed to content-fingerprinted parquet (the
    ``shingle_checkpoint`` resume pattern): a re-run over the same
    input skips straight to the consumers, including across process
    restarts and ``clear_caches()``; ``clear_caches(purge_disk=True)``
    deletes the dirs for a genuinely cold run.  Root comes from
    ``$OSMLINT_CKPT_DIR`` (point it at a shared filesystem on a
    multi-node cluster so every worker sees all blocks)."""
    import hashlib as _hl
    import os
    import tempfile
    shard = os.path.join(data_dir, "docs", f"map={map_slug}")
    ckey = (shard, caches.path_fingerprint(shard), map_slug,
            eps_km, res, group_res, _PAIRS_CKPT_VERSION)
    if ckey in _PAIRS_CACHE:
        return _PAIRS_CACHE[ckey]
    root = os.environ.get(
        "OSMLINT_CKPT_DIR",
        os.path.join(tempfile.gettempdir(), "osmlint_ckpt"))
    out = os.path.join(
        root, "eps_pairs_" + _hl.md5(repr(ckey).encode()).hexdigest())
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        pairs = rd.read_parquet(out).materialize()
        _PAIRS_CACHE[ckey] = pairs
        _PAIRS_CKPT_DIRS.add(out)
        return pairs
    points = named_ctv_deduped(data_dir, map_slug=map_slug) \
        .map_batches(_to_nodes, batch_format="pyarrow")
    pairs = points.map_batches(
        _replicate, batch_format="pyarrow",
        fn_kwargs={"res": res, "group_res": group_res}) \
        .groupby("gcell").map_groups(
            _eps_pairs_group, batch_format="pandas",
            fn_kwargs={"eps_km": eps_km}) \
        .materialize()
    # an empty mine writes no parquet fragments (read-back would fail);
    # cache it in-memory only
    if pairs.count() > 0:
        import shutil
        shutil.rmtree(out, ignore_errors=True)
        pairs.write_parquet(out)
        open(os.path.join(out, "_SUCCESS"), "w").close()
        pairs = rd.read_parquet(out).materialize()
        _PAIRS_CKPT_DIRS.add(out)
    _PAIRS_CACHE[ckey] = pairs
    return pairs


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(v: np.ndarray) -> np.ndarray:
    from .textops import _REDUCE_BUCKETS
    return (((v.astype(np.uint64) * _GOLD) >> np.uint64(40))
            .astype(np.int64) % _REDUCE_BUCKETS)


def _count_reduce(ds: rd.Dataset, key: str, out: str) -> rd.Dataset:
    """groupby(key).count() through bounded key-hash buckets."""
    def bucketize(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        return pa.table({key: b[key].cast(pa.int64()),
                         "_mb": pa.array(_bucket_of(k))})

    def combine(g: pd.DataFrame) -> pa.Table:
        d = g.groupby(key, sort=False).size().reset_index(name=out)
        return pa.table({key: pa.array(d[key].to_numpy(np.int64)),
                         out: pa.array(d[out].to_numpy(np.int64))})

    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("_mb").map_groups(combine, batch_format="pandas")


def _endpoints(b: pa.Table) -> pa.Table:
    a = b["doc_a"].cast(pa.int64()).combine_chunks()
    d = b["doc_b"].cast(pa.int64()).combine_chunks()
    return pa.table({"node": pa.concat_arrays([a, d])})


#: local-tail ceiling, same rationale and order as ``graph.SMALL_EDGES``:
#: the eps-pair set is mined CANDIDATE volume (the same frame the pair
#: queries hand the driver), so below this it closes in one vectorized
#: numpy kernel instead of ~8 distributed stages of fixed cost.
SMALL_PAIRS = graph.SMALL_EDGES


def _local_members(df: pd.DataFrame, min_pts: int) -> pd.DataFrame:
    """Vectorized DBSCAN tail on a collected eps-pair frame: degrees ->
    core set -> core-core closure (``graph._local_components`` with core
    self-loops) -> min-label border attach -> sizes.  Semantics are
    IDENTICAL to the distributed tail (the dual-path test pins it)."""
    a = df["doc_a"].to_numpy(np.int64)
    b = df["doc_b"].to_numpy(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    deg = np.bincount(inv, minlength=len(nodes))
    core = deg >= (min_pts - 1)
    if not core.any():
        return _OUT_SCHEMA.empty_table().to_pandas()
    core_ids = nodes[core]
    m = core[ia] & core[ib]
    comp = graph._local_components(
        np.concatenate([nodes[ia[m]], core_ids]),
        np.concatenate([nodes[ib[m]], core_ids]))
    lab = comp.set_index("doc_id")["cluster_id"]
    members = pd.DataFrame({"node": core_ids,
                            "cluster_id": lab.loc[core_ids].to_numpy(),
                            "is_core": True})
    mx = core[ia] ^ core[ib]
    if mx.any():
        x = np.where(core[ia[mx]], ib[mx], ia[mx])     # non-core endpoint
        c = np.where(core[ia[mx]], ia[mx], ib[mx])     # core endpoint
        border = pd.DataFrame({
            "node": nodes[x],
            "cluster_id": lab.loc[nodes[c]].to_numpy()}) \
            .groupby("node", sort=False)["cluster_id"].min().reset_index()
        border["is_core"] = False
        members = pd.concat([members, border], ignore_index=True)
    sizes = members["cluster_id"].value_counts()
    out = pd.DataFrame({
        "osm_id": members["node"].to_numpy(np.int64) // 4,
        "entity_type": _ETYPE_NAME[members["node"].to_numpy(np.int64) % 4],
        "cluster_id": members["cluster_id"].to_numpy(np.int64),
        "is_core": members["is_core"].to_numpy(bool),
        "cluster_size": sizes.loc[members["cluster_id"]]
        .to_numpy(np.int64)})
    return out.sort_values(["osm_id", "entity_type"]).reset_index(drop=True)


def geo_clusters(data_dir: str, *, map_slug: str = "serbia_pbf",
                 eps_km: float = EPS_KM, min_pts: int = MIN_PTS,
                 res: int = RES, group_res: int = GROUP_RES,
                 small_threshold: int | None = None) -> rd.Dataset:
    """DBSCAN over the deduped named-CTV points of one map shard ->
    ``(osm_id, entity_type, cluster_id, is_core, cluster_size)`` for
    clustered points (noise dropped); ``cluster_id`` is the minimum
    CORE member's node encoding.  The materialized result is cached for
    the process lifetime (fingerprint-keyed) — ``geo_cluster_stats``
    shares the whole DBSCAN lineage.

    Hybrid tail, same thresholds as ``graph.cluster_labels``: at or
    under ``small_threshold`` eps-pairs the degree/core/closure/border
    chain runs as ONE vectorized numpy kernel on the collected pair
    frame; above it the fully distributed path below takes over
    (``small_threshold=0`` forces it — the dual-path test compares
    both)."""
    import os
    shard = os.path.join(data_dir, "docs", f"map={map_slug}")
    if small_threshold is None:
        small_threshold = SMALL_PAIRS
    ckey = (shard, caches.path_fingerprint(shard), map_slug,
            eps_km, min_pts, res, group_res, small_threshold == 0)
    if ckey in _MEMBERS_CACHE:
        return _MEMBERS_CACHE[ckey]
    pairs = mined_eps_pairs(data_dir, map_slug=map_slug, eps_km=eps_km,
                            res=res, group_res=group_res) \
        .map_batches(
            lambda b: b.filter(b["raw_ok"]).select(["doc_a", "doc_b"]),
            batch_format="pyarrow") \
        .materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        out = rd.from_arrow(_OUT_SCHEMA.empty_table())
        _MEMBERS_CACHE[ckey] = out
        return out
    if n_pairs <= small_threshold:
        mem = _local_members(pairs.to_pandas(), min_pts)
        out = rd.from_arrow(_OUT_SCHEMA.empty_table()) if mem.empty \
            else rd.from_pandas(mem).materialize()
        _MEMBERS_CACHE[ckey] = out
        return out

    deg = _count_reduce(pairs.map_batches(_endpoints,
                                          batch_format="pyarrow"),
                        "node", "c")
    core = deg.map_batches(
        lambda b: b.filter(pc.greater_equal(b["c"], min_pts - 1))
        .select(["node"]), batch_format="pyarrow").materialize()
    n_core = core.count()
    if n_core == 0:
        out = rd.from_arrow(_OUT_SCHEMA.empty_table())
        _MEMBERS_CACHE[ckey] = out
        return out

    # --- core flags on pairs: broadcast membership or distributed joins
    if n_core <= BROADCAST_MAX:
        core_ref = ray.put(np.sort(core.to_pandas()["node"]
                                   .to_numpy(np.int64)))

        def flag(b: pa.Table) -> pa.Table:
            cs = ray.get(core_ref)
            a = b["doc_a"].to_numpy(zero_copy_only=False)
            d = b["doc_b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(cs, a)
            ib = np.searchsorted(cs, d)
            ac = (ia < len(cs)) & (cs[np.minimum(ia, len(cs) - 1)] == a)
            bc = (ib < len(cs)) & (cs[np.minimum(ib, len(cs) - 1)] == d)
            return pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                             "a_core": pa.array(ac), "b_core": pa.array(bc)})

        flagged = pairs.map_batches(flag, batch_format="pyarrow") \
            .materialize()
    else:
        # distributed: two left-outer joins against the (node, _c) core
        # table; null _c <=> non-core.  Only 8-byte keys + 1-byte marker
        # ride the shuffle.
        marked = core.map_batches(
            lambda b: pa.table({"node": b["node"].cast(pa.int64()),
                                "_c": pa.array(np.ones(b.num_rows,
                                                       dtype=np.int8))}),
            batch_format="pyarrow")
        np_ = max(1, n_core // (1 << 18))
        j1 = pairs.join(marked, "left_outer", np_,
                        on=("doc_a",), right_on=("node",)) \
            .map_batches(lambda b: pa.table(
                {"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                 "a_core": pc.is_valid(b["_c"])}), batch_format="pyarrow")
        flagged = j1.join(marked, "left_outer", np_,
                          on=("doc_b",), right_on=("node",)) \
            .map_batches(lambda b: pa.table(
                {"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                 "a_core": b["a_core"],
                 "b_core": pc.is_valid(b["_c"])}), batch_format="pyarrow") \
            .materialize()

    # --- transitive closure over core-core edges + core self-loops
    # (self-loops carry isolated cores into the label table)
    cc_edges = flagged.map_batches(
        lambda b: b.filter(pc.and_(b["a_core"], b["b_core"]))
        .select(["doc_a", "doc_b"]), batch_format="pyarrow")
    selfloops = core.map_batches(
        lambda b: pa.table({"doc_a": b["node"].cast(pa.int64()),
                            "doc_b": b["node"].cast(pa.int64())}),
        batch_format="pyarrow")
    labels = graph.cluster_labels(cc_edges.union(selfloops),
                                  as_dataset=True)
    if isinstance(labels, pd.DataFrame):
        labels = rd.from_pandas(labels)
    labels = labels.map_batches(
        lambda b: pa.table({"node": b["doc_id"].cast(pa.int64()),
                            "cluster_id": b["cluster_id"]
                            .cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    # --- border points: (non-core, core) orientations -> min core label
    def mixed_rows(b: pa.Table) -> pa.Table:
        m1 = b.filter(pc.and_(b["a_core"], pc.invert(b["b_core"])))
        m2 = b.filter(pc.and_(b["b_core"], pc.invert(b["a_core"])))
        x = pa.concat_arrays([m1["doc_b"].combine_chunks(),
                              m2["doc_a"].combine_chunks()])
        c = pa.concat_arrays([m1["doc_a"].combine_chunks(),
                              m2["doc_b"].combine_chunks()])
        return pa.table({"x": x, "c": c})

    mixed = flagged.map_batches(mixed_rows,
                                batch_format="pyarrow").materialize()
    members = labels.map_batches(
        lambda b: b.append_column("is_core",
                                  pa.array(np.ones(b.num_rows,
                                                   dtype=bool))),
        batch_format="pyarrow")
    if mixed.count() > 0:
        np2 = max(1, min(8, mixed.count() // 256))
        j = mixed.join(labels, "inner", np2, on=("c",),
                       right_on=("node",))

        def min_label(g: pd.DataFrame) -> pa.Table:
            d = g.groupby("x", sort=False)["cluster_id"].min() \
                .reset_index()
            return pa.table({
                "node": pa.array(d["x"].to_numpy(np.int64)),
                "cluster_id": pa.array(d["cluster_id"]
                                       .to_numpy(np.int64)),
                "is_core": pa.array(np.zeros(len(d), dtype=bool))})

        def bucketize_x(b: pa.Table) -> pa.Table:
            x = b["x"].to_numpy(zero_copy_only=False)
            return pa.table({"x": b["x"].cast(pa.int64()),
                             "cluster_id": b["cluster_id"]
                             .cast(pa.int64()),
                             "_mb": pa.array(_bucket_of(x))})

        border = j.map_batches(bucketize_x, batch_format="pyarrow") \
            .groupby("_mb").map_groups(min_label, batch_format="pandas")
        members = members.union(border)
    members = members.materialize()

    # --- cluster sizes (core + border) + final decode
    sizes = _count_reduce(members.map_batches(
        lambda b: pa.table({"cl": b["cluster_id"].cast(pa.int64())}),
        batch_format="pyarrow"), "cl", "n")
    np3 = max(1, min(8, members.count() // 256))
    out = members.join(sizes, "inner", np3, on=("cluster_id",),
                       right_on=("cl",))

    def decode(b: pa.Table) -> pa.Table:
        nd = b["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "osm_id": pa.array(nd // 4),
            "entity_type": pa.array(_ETYPE_NAME[nd % 4]),
            "cluster_id": b["cluster_id"].cast(pa.int64()),
            "is_core": b["is_core"].cast(pa.bool_()),
            "cluster_size": b["n"].cast(pa.int64())})

    res_ds = out.map_batches(decode,
                             batch_format="pyarrow").materialize()
    _MEMBERS_CACHE[ckey] = res_ds
    return res_ds


_STATS_SCHEMA = pa.schema([
    ("cluster_id", pa.int64()), ("n_points", pa.int64()),
    ("n_core", pa.int64()),
    ("centroid_lat", pa.float64()), ("centroid_lon", pa.float64()),
    ("lat_min", pa.float64()), ("lat_max", pa.float64()),
    ("lon_min", pa.float64()), ("lon_max", pa.float64())])


def geo_cluster_stats(data_dir: str, *, map_slug: str = "serbia_pbf",
                      eps_km: float = EPS_KM, min_pts: int = MIN_PTS,
                      res: int = RES,
                      group_res: int = GROUP_RES) -> pd.DataFrame:
    """Per-cluster summary of the DBSCAN agglomerations — point/core
    counts, centroid and exact bounding box (the settlement-region
    digest a map product ships instead of raw members).

    Composition shape: ``geo_clusters`` members re-encode to int64
    nodes and join the (node, lat, lon) projection (both distributed);
    a cluster-hash bucket reduce computes all moments in one pass (every
    member of a cluster lands in one bucket, so in-bucket aggregation is
    final) — the driver sees #clusters rows.  Centroids are sum/count
    6-dp floor-rounded; bbox edges pass coordinates through untouched.
    A member table at or under the ``SMALL_PAIRS`` collect budget skips
    the distributed join and aggregates in one pandas merge (the same
    hybrid rule as the clustering tail; identical arithmetic)."""
    members = geo_clusters(data_dir, map_slug=map_slug, eps_km=eps_km,
                           min_pts=min_pts, res=res, group_res=group_res)
    members = members.materialize()
    if members.count() == 0:
        return _STATS_SCHEMA.empty_table().to_pandas()

    def encode(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        code = df["entity_type"].map(_ETYPE_CODE).to_numpy(np.int64)
        return pa.table({
            "node": pa.array(df["osm_id"].to_numpy(np.int64) * 4 + code),
            "cluster_id": pa.array(df["cluster_id"].to_numpy(np.int64)),
            "is_core": pa.array(df["is_core"].to_numpy(bool))})

    points = named_ctv_deduped(data_dir, map_slug=map_slug) \
        .map_batches(_to_nodes, batch_format="pyarrow")
    n_members = members.count()
    if n_members <= SMALL_PAIRS:
        mem = members.to_pandas()
        code = mem["entity_type"].map(_ETYPE_CODE).to_numpy(np.int64)
        mem = pd.DataFrame({
            "node": mem["osm_id"].to_numpy(np.int64) * 4 + code,
            "cluster_id": mem["cluster_id"].to_numpy(np.int64),
            "is_core": mem["is_core"].to_numpy(bool)})
        g = mem.merge(points.to_pandas(), on="node")
        d = g.groupby("cluster_id", sort=False).agg(
            n_points=("node", "size"), n_core=("is_core", "sum"),
            s_lat=("lat", "sum"), s_lon=("lon", "sum"),
            lat_min=("lat", "min"), lat_max=("lat", "max"),
            lon_min=("lon", "min"), lon_max=("lon", "max")).reset_index()
        n = d["n_points"].to_numpy(np.int64)
        out = pd.DataFrame({
            "cluster_id": d["cluster_id"].to_numpy(np.int64),
            "n_points": n,
            "n_core": d["n_core"].to_numpy(np.int64),
            "centroid_lat": np.floor(
                d["s_lat"].to_numpy() / n * 1e6 + 0.5) / 1e6,
            "centroid_lon": np.floor(
                d["s_lon"].to_numpy() / n * 1e6 + 0.5) / 1e6,
            "lat_min": d["lat_min"].to_numpy(np.float64),
            "lat_max": d["lat_max"].to_numpy(np.float64),
            "lon_min": d["lon_min"].to_numpy(np.float64),
            "lon_max": d["lon_max"].to_numpy(np.float64)})
        return out.sort_values("cluster_id").reset_index(drop=True)
    np_ = max(1, min(8, n_members // 50_000 + 1))
    j = members.map_batches(encode, batch_format="pyarrow") \
        .join(points, "inner", np_, on=("node",), right_on=("node",))

    def bucketize(b: pa.Table) -> pa.Table:
        c = b["cluster_id"].to_numpy(zero_copy_only=False)
        return b.append_column("_mb", pa.array(_bucket_of(c)))

    def combine(g: pd.DataFrame) -> pa.Table:
        d = g.groupby("cluster_id", sort=False).agg(
            n_points=("node", "size"), n_core=("is_core", "sum"),
            s_lat=("lat", "sum"), s_lon=("lon", "sum"),
            lat_min=("lat", "min"), lat_max=("lat", "max"),
            lon_min=("lon", "min"), lon_max=("lon", "max")).reset_index()
        n = d["n_points"].to_numpy(np.int64)
        return pa.table({
            "cluster_id": pa.array(d["cluster_id"].to_numpy(np.int64)),
            "n_points": pa.array(n),
            "n_core": pa.array(d["n_core"].to_numpy(np.int64)),
            "centroid_lat": pa.array(np.floor(
                d["s_lat"].to_numpy() / n * 1e6 + 0.5) / 1e6),
            "centroid_lon": pa.array(np.floor(
                d["s_lon"].to_numpy() / n * 1e6 + 0.5) / 1e6),
            "lat_min": pa.array(d["lat_min"].to_numpy(np.float64)),
            "lat_max": pa.array(d["lat_max"].to_numpy(np.float64)),
            "lon_min": pa.array(d["lon_min"].to_numpy(np.float64)),
            "lon_max": pa.array(d["lon_max"].to_numpy(np.float64))})

    out = j.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("_mb").map_groups(combine, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("cluster_id").reset_index(drop=True)


_DIAM_SCHEMA = pa.schema([
    ("cluster_id", pa.int64()), ("n_points", pa.int64()),
    ("diam_km", pa.float64()),
    ("osm_id_a", pa.int64()), ("entity_type_a", pa.string()),
    ("osm_id_b", pa.int64()), ("entity_type_b", pa.string())])


def _diam_group(g: pd.DataFrame) -> pa.Table:
    """Exact diameter (max pairwise 6-dp haversine) per cluster in the
    bucket; ties resolve to the lexicographically smallest (node_a,
    node_b) pair — well-defined because distances are ROUNDED before
    the argmax (raw numpy-vs-SQL trig ulps cannot reorder ties).
    Anchors expand in ``_CAND_CHUNK``-candidate chunks so a dense
    cluster cannot blow a worker's heap; exact diameter is
    intrinsically O(n^2) per cluster — the documented upgrade path for
    continent-sized clusters is a convex-hull + rotating-calipers
    prefilter, not a bigger box."""
    out = []
    for cid, grp in g.groupby("cluster_id", sort=False):
        node = grp["node"].to_numpy(np.int64)
        order = np.argsort(node)
        node = node[order]
        lat = grp["lat"].to_numpy(np.float64)[order]
        lon = grp["lon"].to_numpy(np.float64)[order]
        m = len(node)
        best, na, nb = np.int64(-1), np.int64(0), np.int64(0)
        step = max(1, _CAND_CHUNK // m)
        jj = np.arange(m)[None, :]
        for s in range(0, m, step):
            e = min(s + step, m)
            d = geo.haversine_km(lat[s:e, None], lon[s:e, None],
                                 lat[None, :], lon[None, :])
            d6 = np.floor(d * 1e6 + 0.5).astype(np.int64)
            d6[jj <= np.arange(s, e)[:, None]] = -1
            mx = d6.max() if d6.size else np.int64(-1)
            if mx < best or mx < 0:
                continue
            i, j = np.argwhere(d6 == mx)[0]      # row-major => lexmin
            ca, cb = node[s + i], node[j]
            if mx > best or (ca, cb) < (na, nb):
                best, na, nb = mx, ca, cb
        out.append((np.int64(cid), np.int64(m), float(best) / 1e6,
                    na, nb))
    cid, n, dk, na, nb = (np.array(x) for x in zip(*out))
    return pa.table({
        "cluster_id": pa.array(cid.astype(np.int64)),
        "n_points": pa.array(n.astype(np.int64)),
        "diam_km": pa.array(dk.astype(np.float64)),
        "osm_id_a": pa.array(na.astype(np.int64) // 4),
        "entity_type_a": pa.array(_ETYPE_NAME[na.astype(np.int64) % 4],
                                  type=pa.string()),
        "osm_id_b": pa.array(nb.astype(np.int64) // 4),
        "entity_type_b": pa.array(_ETYPE_NAME[nb.astype(np.int64) % 4],
                                  type=pa.string())})


def geo_cluster_diameter(data_dir: str, *, map_slug: str = "serbia_pbf",
                         eps_km: float = EPS_KM, min_pts: int = MIN_PTS,
                         res: int = RES,
                         group_res: int = GROUP_RES) -> pd.DataFrame:
    """Exact great-circle diameter of each DBSCAN agglomeration — the
    max pairwise 6-dp rounded distance among members, with the
    contributing pair decoded (tie -> lowest (node_a, node_b)).  The
    spatial-extent companion to ``geo_cluster_stats``'s bbox digest:
    eps-chained clusters stretch far beyond eps, and the diameter is
    the honest size measure a bbox diagonal only bounds.

    Shape: rides the cached DBSCAN member table (one clustering per
    sweep); members join the (node, lat, lon) projection distributed;
    a cluster-hash bucket reduce colocates each cluster once, and the
    in-group kernel is chunked vectorized all-pairs — work is
    sum(n_c^2) over clusters, never corpus-pairs, and the driver sees
    #clusters rows."""
    members = geo_clusters(data_dir, map_slug=map_slug, eps_km=eps_km,
                           min_pts=min_pts, res=res, group_res=group_res)
    if members.count() == 0:
        return _DIAM_SCHEMA.empty_table().to_pandas()

    def encode(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        code = df["entity_type"].map(_ETYPE_CODE).to_numpy(np.int64)
        return pa.table({
            "node": pa.array(df["osm_id"].to_numpy(np.int64) * 4 + code),
            "cluster_id": pa.array(df["cluster_id"]
                                   .to_numpy(np.int64))})

    points = named_ctv_deduped(data_dir, map_slug=map_slug) \
        .map_batches(_to_nodes, batch_format="pyarrow")
    np_ = max(1, min(8, members.count() // 50_000 + 1))
    j = members.map_batches(encode, batch_format="pyarrow") \
        .join(points, "inner", np_, on=("node",), right_on=("node",))

    def bucketize(b: pa.Table) -> pa.Table:
        c = b["cluster_id"].to_numpy(zero_copy_only=False)
        return b.append_column("_mb", pa.array(_bucket_of(c)))

    out = j.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("_mb").map_groups(_diam_group, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("cluster_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# distance-band spatial self-join (range join)
# ---------------------------------------------------------------------------

#: the range join shares the DBSCAN miner's eps/res configuration ON
#: PURPOSE: both read the same cached ``mined_eps_pairs`` table, so a
#: driver sweep running geo_clusters -> geo_cluster_stats ->
#: geo_range_join mines the corpus exactly once.
RANGE_EPS_KM = EPS_KM

_RANGE_SCHEMA = pa.schema([
    ("osm_id_a", pa.int64()), ("entity_type_a", pa.string()),
    ("osm_id_b", pa.int64()), ("entity_type_b", pa.string()),
    ("dist_km", pa.float64())])


def geo_range_join(data_dir: str, *, map_slug: str = "serbia_pbf",
                   eps_km: float = RANGE_EPS_KM, res: int = RES,
                   group_res: int = GROUP_RES) -> rd.Dataset:
    """Distance-band spatial self-join over the deduped named-CTV
    points: every pair of distinct named places within ``eps_km``
    (great-circle), emitted once (``node_a < node_b``) with the 6-dp
    rounded distance — the gate reads the ROUNDED value (same rule as
    ``geo.nearest_tile_batch``) so numpy-vs-DuckDB trig ulps cannot
    flip a boundary pair.

    Generalizes the reference's point-radius gating (the 20 km wiki
    distance gate, reference src/checks.py:541, and the
    ``wikibase:around`` circles in sparql/*.sparql) from
    one-point-vs-one-point to the corpus-level band join the north rule
    asks of a spatial engine.  Mining is ``mined_eps_pairs`` (shared
    with DBSCAN): 9-cell replication at a resolution whose cell size
    exceeds ``eps_km``, fine-cell hash into bounded meta-buckets, one
    vectorized chunked expansion per group — work per group is bounded
    by eps-density, never all-pairs, and the output streams (no
    driver-side pair list)."""
    mined = mined_eps_pairs(data_dir, map_slug=map_slug, eps_km=eps_km,
                            res=res, group_res=group_res)

    def decode(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less_equal(b["dist_km"], eps_km))
        na = t["doc_a"].to_numpy(zero_copy_only=False)
        nb = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "osm_id_a": pa.array(na // 4),
            "entity_type_a": pa.array(_ETYPE_NAME[na % 4],
                                      type=pa.string()),
            "osm_id_b": pa.array(nb // 4),
            "entity_type_b": pa.array(_ETYPE_NAME[nb % 4],
                                      type=pa.string()),
            "dist_km": t["dist_km"].cast(pa.float64())})

    return mined.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Ripley's K point-pattern statistic
# ---------------------------------------------------------------------------

RIPLEY_BINS = (0.1, 0.2, 0.3, 0.4, 0.5)


def ripley_k(data_dir: str, *, map_slug: str = "serbia_pbf",
             eps_km: float = EPS_KM, res: int = RES,
             group_res: int = GROUP_RES,
             bins: tuple = RIPLEY_BINS) -> pd.DataFrame:
    """Ripley's K clustering curve over the deduped named-CTV points:
    for each radius r, the count of unordered point pairs within r
    (great-circle, 6-dp-rounded before the gate) and the
    area-independent estimate K(r)/A = 2*cnt(r)/n^2 (the classic
    border-uncorrected K-hat with the study-area factor divided out,
    so no float area term enters the parity surface).  A flat curve
    ~pi*r^2/A means spatial randomness; super-linear growth means
    clustering at that scale — the point-pattern companion to the
    binary DBSCAN verdict.

    Shape: the pair set is ``mined_eps_pairs`` (shared with DBSCAN /
    ``geo_range_join`` — one corpus mine per sweep, bins must stay
    <= the mining eps); per-batch bin counts reduce to len(bins) rows,
    and n is one count() over the materialized point projection.
    Nothing pair-shaped reaches the driver."""
    assert max(bins) <= eps_km, "bins beyond the mining eps see no pairs"
    mined = mined_eps_pairs(data_dir, map_slug=map_slug, eps_km=eps_km,
                            res=res, group_res=group_res)
    edges = np.asarray(bins, dtype=np.float64)

    def partial(b: pa.Table) -> pa.Table:
        d = b["dist_km"].to_numpy(zero_copy_only=False)
        cnt = (d[None, :] <= edges[:, None]).sum(axis=1).astype(np.int64)
        return pa.table({"r_km": pa.array(edges),
                         "n_pairs": pa.array(cnt)})

    agg = (mined.map_batches(partial, batch_format="pyarrow")
           .groupby("r_km")
           .aggregate(rd.aggregate.Sum("n_pairs", alias_name="n_pairs"))
           .to_pandas())
    out = pd.DataFrame({"r_km": edges})
    out = out.merge(agg, on="r_km", how="left")
    out["n_pairs"] = out["n_pairs"].fillna(0).astype(np.int64)
    n = named_ctv_deduped(data_dir, map_slug=map_slug).count()
    out["k_over_a"] = (2.0 * out["n_pairs"].to_numpy(np.float64)) \
        / (n * n)
    return out.sort_values("r_km").reset_index(drop=True)


# ---------------------------------------------------------------------------
# empirical semivariogram + nearest-neighbor stats (eps-pair consumers)
# ---------------------------------------------------------------------------

#: semivariogram distance-bin edges — bins are (prev, cur] on the 6-dp
#: rounded distance; must stay <= the mining eps (same rule as Ripley).
VARIO_BINS = RIPLEY_BINS


def _node_values(data_dir: str, *, map_slug: str) -> tuple:
    """Sorted (node, value) arrays of the deduped named-CTV points —
    value is the CHARACTER length of the place name (code points, the
    same count DuckDB's ``length(varchar)`` returns).  The named-CTV
    projection is a sliver of the corpus (named city/town/village rows
    only), so the map broadcasts once via ``ray.put``; a corpus whose
    named-point universe outgrew worker heaps would switch this to the
    ``dedup_apply`` distributed-join rule."""
    pts = named_ctv_deduped(data_dir, map_slug=map_slug) \
        .map_batches(
            lambda b: pa.table({
                "node": _to_nodes(b)["node"],
                "val": pc.utf8_length(b["name"]).cast(pa.int64())}),
            batch_format="pyarrow").to_pandas()
    pts = pts.sort_values("node")
    return (pts["node"].to_numpy(np.int64), pts["val"].to_numpy(np.int64))


def semivariogram(data_dir: str, *, map_slug: str = "serbia_pbf",
                  eps_km: float = EPS_KM, res: int = RES,
                  group_res: int = GROUP_RES,
                  bins: tuple = VARIO_BINS) -> pd.DataFrame:
    """Empirical semivariogram of name length over the deduped
    named-CTV points: gamma(h) = sum (v_a - v_b)^2 / (2 * n_pairs)
    for unordered point pairs whose 6-dp rounded great-circle distance
    falls in bin (prev_edge, edge] — the classic Matheron estimator
    binned by distance band.  Rising gamma(h) means nearby places have
    more similar names than distant ones (spatial dependence of the
    attribute), the attribute-valued companion to Ripley's K.

    Shape: pairs come from the shared ``mined_eps_pairs`` cache (one
    corpus mine per driver sweep); per-pair values arrive via ONE
    broadcast node->value map (never a shuffle of the pair stream);
    per-batch bin partials are <= len(bins) integer rows (squared-diff
    sums are exact int64), and only non-empty bins are emitted so the
    float division cannot see a zero denominator.  Nothing pair-shaped
    reaches the driver."""
    assert max(bins) <= eps_km, "bins beyond the mining eps see no pairs"
    mined = mined_eps_pairs(data_dir, map_slug=map_slug, eps_km=eps_km,
                            res=res, group_res=group_res)
    ref = ray.put(_node_values(data_dir, map_slug=map_slug))
    edges = np.asarray(bins, dtype=np.float64)

    def partial(b: pa.Table) -> pa.Table:
        nodes, vals = ray.get(ref)
        t = b.filter(pc.less_equal(b["dist_km"], float(edges[-1])))
        if t.num_rows == 0:
            return pa.table({"r_km": pa.array([], type=pa.float64()),
                             "n_pairs": pa.array([], type=pa.int64()),
                             "sq_sum": pa.array([], type=pa.int64())})
        d = t["dist_km"].to_numpy(zero_copy_only=False)
        va = vals[np.searchsorted(nodes,
                                  t["doc_a"].to_numpy(zero_copy_only=False))]
        vb = vals[np.searchsorted(nodes,
                                  t["doc_b"].to_numpy(zero_copy_only=False))]
        sq = (va - vb) ** 2
        bi = np.searchsorted(edges, d, side="left")
        uniq, inv = np.unique(bi, return_inverse=True)
        return pa.table({
            "r_km": pa.array(edges[uniq]),
            "n_pairs": pa.array(np.bincount(inv).astype(np.int64)),
            "sq_sum": pa.array(np.bincount(inv, weights=sq)
                               .astype(np.int64))})

    agg = (mined.map_batches(partial, batch_format="pyarrow")
           .groupby("r_km")
           .aggregate(rd.aggregate.Sum("n_pairs", alias_name="n_pairs"),
                      rd.aggregate.Sum("sq_sum", alias_name="sq_sum"))
           .to_pandas())
    agg["n_pairs"] = agg["n_pairs"].astype(np.int64)
    agg["sq_sum"] = agg["sq_sum"].astype(np.int64)
    agg["gamma"] = agg["sq_sum"].map(float) \
        / (2.0 * agg["n_pairs"].map(float))
    return agg[["r_km", "n_pairs", "sq_sum", "gamma"]] \
        .sort_values("r_km").reset_index(drop=True)


def nn_stats(data_dir: str, *, map_slug: str = "serbia_pbf",
             eps_km: float = EPS_KM, res: int = RES,
             group_res: int = GROUP_RES) -> pd.DataFrame:
    """Nearest-neighbor distance statistics within the eps band over
    the deduped named-CTV points: each point's NN distance is the min
    6-dp rounded great-circle distance among its eps-pairs (points with
    no neighbor inside eps are counted as ``n_isolated`` — the border
    term a bounded-radius NN search cannot see, reported rather than
    hidden).  The Clark-Evans-style aggregate row carries n_points,
    n_with_nn, n_isolated and the min/max/mean NN distance.

    Shape: eps-pairs from the shared cache, both directions emitted as
    (node, micro-km int64); per-node min runs through the bounded
    ``_REDUCE_BUCKETS`` node-hash reduce (never a node-cardinality
    aggregate), each bucket group emits ONE partial (cnt, sum, min,
    max) row, and the driver combines <= 256 partials.  All distributed
    sums are integers (micro-km), so summation order cannot matter;
    the float conversions happen once on the final row with the same
    expression tree as the oracle."""
    mined = mined_eps_pairs(data_dir, map_slug=map_slug, eps_km=eps_km,
                            res=res, group_res=group_res)

    def both_dirs(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less_equal(b["dist_km"], eps_km))
        d = t["dist_km"].to_numpy(zero_copy_only=False)
        micro = np.floor(d * 1e6 + 0.5).astype(np.int64)
        node = np.concatenate([t["doc_a"].to_numpy(zero_copy_only=False),
                               t["doc_b"].to_numpy(zero_copy_only=False)])
        dm = np.concatenate([micro, micro])
        return pa.table({"node": pa.array(node),
                         "dm": pa.array(dm),
                         "_b": pa.array(_bucket_of(node))})

    def group_min(g: pd.DataFrame) -> pa.Table:
        nn = g.groupby("node")["dm"].min()
        return pa.table({
            "cnt": pa.array([np.int64(len(nn))]),
            "s": pa.array([np.int64(nn.to_numpy(np.int64).sum())]),
            "mn": pa.array([np.int64(nn.min())]),
            "mx": pa.array([np.int64(nn.max())])})

    parts = (mined.map_batches(both_dirs, batch_format="pyarrow")
             .groupby("_b").map_groups(group_min, batch_format="pandas")
             .to_pandas())
    n_points = int(named_ctv_deduped(data_dir, map_slug=map_slug).count())
    cnt = int(parts["cnt"].sum())
    s = int(parts["s"].sum())
    mn = int(parts["mn"].min()) if cnt else 0
    mx = int(parts["mx"].max()) if cnt else 0
    return pd.DataFrame({
        "n_points": pd.array([n_points], dtype="int64"),
        "n_with_nn": pd.array([cnt], dtype="int64"),
        "n_isolated": pd.array([n_points - cnt], dtype="int64"),
        "nn_min_km": [float(mn) / 1e6],
        "nn_max_km": [float(mx) / 1e6],
        "nn_mean_km": [(float(s) / 1e6) / float(cnt)] if cnt else [0.0]})
