# -*- coding: utf-8 -*-
"""The "no silent caps" surface: skew guards (MAX_BUCKET / MAX_POSTING)
must COUNT what they drop, not just log.

Pair-mining group kernels emit one SENTINEL row per skipped hot bucket —
``id_col = -(bucket size)``, partner column = a unique bucket key — which
rides the normal candidate dedup shuffle.  ``split_cap_sentinels`` then
materializes the (small, post-dedup) candidate set once, folds the
sentinels into a per-query metrics dict, and returns the real candidates.
The materialize is bounded by candidate volume — the declared cost driver
of every bucketed pair miner — and doubles as the barrier the verify join
needs anyway.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def split_cap_sentinels(cand: rd.Dataset, metrics: dict, query: str,
                        id_col: str, schema: pa.Schema) -> rd.Dataset:
    """Strip sentinel rows (``id_col < 0``) from the deduped candidate set,
    record ``{skipped_buckets, skipped_docs}`` under ``metrics[query]``,
    and return the real candidate pairs MATERIALIZED (downstream callers
    count() and join the result — a lazy filter would re-execute per
    consumer).  Blocks are normalized to ``schema`` — empty aggregate
    partitions emit zero-column blocks that would otherwise break the
    downstream acero join.

    Sentinel encoding assumes REAL ids are non-negative (the whole engine
    keys docs by int64 >= 0; ``shingle_pack_batch`` rejects negatives
    loudly), so ``id_col < 0`` can never strip a genuine candidate."""
    cand = cand.materialize()

    def neg(b: pa.Table) -> pa.Table:
        if id_col not in b.column_names:
            return schema.empty_table()
        return b.filter(pc.less(b[id_col], 0)).select(schema.names) \
            .cast(schema)

    def pos(b: pa.Table) -> pa.Table:
        if id_col not in b.column_names:
            return schema.empty_table()
        return b.filter(pc.greater_equal(b[id_col], 0)) \
            .select(schema.names).cast(schema)

    sent = cand.map_batches(neg, batch_format="pyarrow").to_pandas()
    metrics[query] = {
        "skipped_buckets": int(len(sent)),
        "skipped_docs": int((-sent[id_col]).sum()) if len(sent) else 0,
    }
    return cand.map_batches(pos, batch_format="pyarrow").materialize()
