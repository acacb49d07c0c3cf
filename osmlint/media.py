# -*- coding: utf-8 -*-
"""Multimodal (media span) processing stages.

The interleaved document table carries media as opaque references in
``kind="media"`` spans (``media_ref`` like ``img://<map>/<id>/photo.jpg``
for attached imagery, ``wiki://`` / ``wikidata://`` for linked resources —
see osmlint.spans).  This module is the engine-side plumbing for decoding
and featurizing them:

* schema, batching and output layout are REAL and tested;
* the byte-level decoders are stubs: no image/audio libraries exist in
  this environment, so ``decode_image`` raises ``NotImplementedError``
  unless a deterministic fake is requested.  ``media_features`` uses the
  deterministic fake (pure arithmetic on the entity id) so the pipeline is
  end-to-end runnable AND SQL-verifiable.

Batch-size note: real image payloads are large — run the decode stage with
a small ``batch_size`` and an actor pool holding the codec state; with the
fake decoder a fused task stage suffices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .pipeline import decode_and_index, read_documents

try:                                 # pragma: no cover - not in sandbox
    from PIL import Image            # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_image(payload: bytes):
    """Decode raw image bytes.  STUB: requires an imaging library that is
    not available in this environment."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; use fake_image_meta for the "
            "deterministic test double")
    raise NotImplementedError("real decode path not exercised in sandbox")


def fake_image_meta(osm_id: np.ndarray):
    """Deterministic stand-in for decode: metadata as pure arithmetic on the
    entity id (SQL-expressible, so the stage has a DuckDB oracle)."""
    osm_id = osm_id.astype(np.int64)
    width = 320 + (osm_id % 7) * 80
    height = 240 + (osm_id % 5) * 60
    n_bytes = width * height * 3
    phash = (osm_id * np.int64(2654435761)) % np.int64(1 << 31)
    return width, height, n_bytes, phash


def media_feature_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    has = df["media_img"].notna()
    sub = df[has]
    width, height, n_bytes, phash = fake_image_meta(sub["osm_id"].to_numpy())
    return pa.table({
        "doc_id": pa.array(sub["doc_id"].to_numpy(dtype=object),
                           type=pa.string()),
        "media_ref": pa.array(sub["media_img"].to_numpy(dtype=object),
                              type=pa.string()),
        "width": pa.array(width, type=pa.int64()),
        "height": pa.array(height, type=pa.int64()),
        "n_bytes": pa.array(n_bytes, type=pa.int64()),
        "phash": pa.array(phash, type=pa.int64()),
    })


def media_features(data_dir: str) -> rd.Dataset:
    """Every attached image span -> decoded metadata row (fake decoder)."""
    ds = read_documents(data_dir)
    ds = ds.map_batches(decode_and_index, batch_format="pyarrow")
    return ds.map_batches(media_feature_batch, batch_format="pyarrow")
