# -*- coding: utf-8 -*-
"""Per-partition lineage: resumable partitioned output + metrics manifest.

North-rule requirement: every lint pass is resumable from checkpoint.
The unit of work is one input shard — a ``map=<slug>`` directory of the
hive-partitioned document table (mirroring the reference's one-process-
per-map sharding, src/main.py:223-232, but each partition here is itself a
distributed Dataset run).

Layout under ``out_dir``::

    part=<slug>/*.parquet     flag rows for that map shard
    _manifest.json            {partition: {rows_in, flags, errors, wall_s,
                               finished_at_iso}}  — written atomically
                               (tmp + rename) after EACH partition

``run_resumable`` skips partitions already present in the manifest, so a
killed run continues where it stopped; a finished partition's output
directory is replaced atomically, never appended to."""

from __future__ import annotations

import json
import os
import shutil
import time

import ray

from . import config as config_mod
from . import pipeline


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def load_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _save_manifest(out_dir: str, manifest: dict) -> None:
    p = _manifest_path(out_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, p)


def partitions(data_dir: str) -> list[str]:
    return pipeline.doc_partitions(data_dir)


def flags_for_partition(data_dir: str, slug: str):
    """The flagship chain restricted to one map shard."""
    import pyarrow as pa
    import ray.data as rd
    refs = pipeline.broadcast_refs(data_dir)
    path = os.path.join(data_dir, "docs", f"map={slug}")
    ds = rd.read_parquet(path, columns=["doc_id", "spans"])
    ds = ds.map_batches(pipeline.decode_and_index, batch_format="pyarrow")
    coll_ref = pipeline.collision_keys_ref(data_dir, [slug], read_path=path)
    ds = ds.map_batches(pipeline.dedup_filter, batch_format="pyarrow",
                        fn_kwargs={"collisions_ref": coll_ref})
    ds = ds.map_batches(pipeline.pip_assign_batch, batch_format="pyarrow",
                        fn_kwargs={"countries_ref": refs["countries"],
                                   "tiles_ref": refs["tiles"]})
    ds = ds.map_batches(pipeline.flag_batch, batch_format="pyarrow",
                        fn_kwargs={"wiki_ref_ref": refs["wiki_ref"],
                                   "wikidata_ref_ref": refs["wikidata_ref"]})
    return ds


def run_resumable(data_dir: str, out_dir: str, *,
                  fail_after: int | None = None) -> dict:
    """Run the lint pass partition-by-partition, skipping finished ones.

    ``fail_after`` (tests only): raise after N newly-completed partitions
    to simulate a mid-run crash."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir)
    done_new = 0
    for slug in partitions(data_dir):
        if slug in manifest:
            continue
        t0 = time.time()
        ds = flags_for_partition(data_dir, slug)
        part_dir = os.path.join(out_dir, f"part={slug}")
        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)
        ds.write_parquet(tmp_dir)
        os.replace(tmp_dir, part_dir)
        import pyarrow.parquet as pq
        flags = pq.read_table(part_dir, columns=["result"])
        n_err = flags.column("result").to_pandas().eq("CHECKED_ERROR").sum()
        manifest[slug] = {
            "flags": flags.num_rows,
            "errors": int(n_err),
            "wall_s": round(time.time() - t0, 3),
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        _save_manifest(out_dir, manifest)
        done_new += 1
        if fail_after is not None and done_new >= fail_after:
            raise RuntimeError(f"injected failure after {done_new} partitions")
    return manifest


def write_cell_sorted(data_dir: str, out_dir: str,
                      *, num_files: int | None = None) -> list[str]:
    """Tile-locality output layout (north-rule: range-partitioned sort on
    cell id): the decoded table globally sorted by Morton code — a Ray
    ``sort`` is a range-partition shuffle, so each output file covers a
    contiguous Z-order range and spatially close docs colocate."""
    import ray.data as rd
    ds = rd.read_parquet(os.path.join(data_dir, "docs"),
                         columns=["doc_id", "spans"])
    ds = ds.map_batches(pipeline.decode_and_index, batch_format="pyarrow")
    ds = ds.sort("morton")
    if num_files:
        ds = ds.repartition(num_files)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    return sorted(os.listdir(out_dir))
