# -*- coding: utf-8 -*-
"""Training-data text operators over the driver ``documents`` table
(doc_id:int64, text, lang, source, n_chars).

Scale-engine components beyond the reference's lint checks: exact and
near-duplicate detection (hash-groupby, MinHash+LSH banding, SimHash,
n-gram Jaccard), language-ID heuristics, quality scoring, token counting
and document fingerprinting — each a vectorized ``map_batches`` kernel
with groupbys on pre-aggregated Arrow partials.

Determinism: every hash (shingles, MinHash permutations, SimHash planes)
is seeded arithmetic on uint64 — stable across processes and machines.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from .pipeline import to_arrow

STOPWORD_RE = r"\b(the|and|with|for|an|of|in|to|is|on|a)\b"
PUNCT_RE = r"[.,;:!?]"
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"

MERSENNE = np.uint64((1 << 61) - 1)


def read_docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


# ---------------------------------------------------------------------------
# per-doc stats (language-ID, quality, token counts, fingerprint)
# ---------------------------------------------------------------------------

def stats_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    text = df["text"].fillna("")
    n_chars = text.str.len().to_numpy(np.int64)
    n_tokens = text.str.count(r"\S+").to_numpy(np.int64)
    punct = text.str.count(PUNCT_RE).to_numpy(np.int64)
    stop = text.str.count(STOPWORD_RE).to_numpy(np.int64)
    bpe = text.str.count(BPE_RE).to_numpy(np.int64)
    punct_ratio = punct / np.maximum(n_chars, 1)
    stop_ratio = stop / np.maximum(n_tokens, 1)
    quality = (0.4 * np.minimum(1.0, n_tokens / 100.0)
               + 0.3 * (1.0 - punct_ratio)
               + 0.3 * np.minimum(1.0, 5.0 * stop_ratio))
    lang_pred = np.where(stop > 0, "en", "unknown").astype(object)
    # fingerprint: md5 hex — per-row C hashing (no vectorized md5 exists);
    # the rest of the kernel stays columnar
    fp = np.fromiter((hashlib.md5(t.encode("utf-8")).hexdigest()
                      for t in text), dtype=object, count=len(text))
    return pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
        "n_tokens": pa.array(n_tokens),
        "bpe_tokens": pa.array(bpe),
        "punct_cnt": pa.array(punct),
        "stop_cnt": pa.array(stop),
        "punct_ratio": pa.array(punct_ratio),
        "stop_ratio": pa.array(stop_ratio),
        "quality": pa.array(quality),
        "lang_pred": pa.array(fp_str(lang_pred)),
        "fingerprint": pa.array(fp_str(fp)),
    })


def fp_str(arr: np.ndarray):
    return pa.array(arr, type=pa.string())


def text_stats(sf_dir: str) -> rd.Dataset:
    return read_docs(sf_dir).map_batches(stats_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Keep the lowest doc_id per exact text; report the copy count.

    groupby on the text itself at test scale; at 100 TB pre-hash the text
    (fingerprint) per batch so the shuffle moves 16-byte keys, not bodies —
    stats_batch's md5 is exactly that key."""
    ds = read_docs(sf_dir).map_batches(
        lambda b: b.select(["text", "doc_id"]), batch_format="pyarrow")
    agg = ds.groupby("text").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
    df = agg.to_pandas()[["doc_id", "n_copies"]]
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["n_copies"] = df["n_copies"].astype(np.int64)
    return df.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# shingles + MinHash/LSH, SimHash, n-gram Jaccard
# ---------------------------------------------------------------------------

N_PERM = 64
N_BANDS = 16            # 16 bands x 4 rows
_PRIME = np.uint64(0x9E3779B97F4A7C15)

_rng = np.random.default_rng(1234)
_PERM_A = _rng.integers(1, (1 << 61) - 1, N_PERM, dtype=np.uint64)
_PERM_B = _rng.integers(0, (1 << 61) - 1, N_PERM, dtype=np.uint64)
_SIMHASH_BITS = 64


def _token_ngrams(text: str, n: int = 3) -> np.ndarray:
    """uint64 hashes of word n-grams (rolling polynomial, seeded)."""
    toks = text.split()
    if len(toks) < n:
        toks = toks + [""] * (n - len(toks))
    h = np.fromiter((hash_u64(" ".join(toks[i:i + n]))
                     for i in range(max(1, len(toks) - n + 1))),
                    dtype=np.uint64)
    return np.unique(h)


def hash_u64(s: str) -> np.uint64:
    d = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
    return np.uint64(int.from_bytes(d, "little"))


def _minhash(shingles: np.ndarray) -> np.ndarray:
    """(N_PERM,) uint64 signature via universal hashing mod 2^61-1."""
    x = shingles[:, None]
    vals = (x * _PERM_A[None, :] + _PERM_B[None, :]) % MERSENNE
    return vals.min(axis=0)


def shingle_batch(batch: pa.Table) -> pa.Table:
    """doc -> shingle hash set + minhash signature + simhash (one pass)."""
    df = batch.to_pandas()
    out_sh, out_sig, out_sim = [], [], np.empty(len(df), dtype=np.int64)
    for i, t in enumerate(df["text"].fillna("")):
        sh = _token_ngrams(t)
        sig = _minhash(sh)
        out_sh.append(sh.astype(np.int64))
        out_sig.append(sig.astype(np.int64))
        # simhash over shingle hashes: sign of per-bit vote
        bits = ((sh[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64))
                & np.uint64(1))
        vote = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out_sim[i] = int(((vote > 0).astype(np.uint64)
                          << np.arange(_SIMHASH_BITS, dtype=np.uint64)).sum()
                         .astype(np.int64))
    return pa.table({
        "doc_id": batch["doc_id"],
        "shingles": pa.array(out_sh, type=pa.list_(pa.int64())),
        "minhash": pa.array(out_sig, type=pa.list_(pa.int64())),
        "simhash": pa.array(out_sim, type=pa.int64()),
    })


def simhash_docs(sf_dir: str) -> rd.Dataset:
    """doc_id -> 64-bit SimHash (rows-only check: hash seeds aren't SQL)."""
    return read_docs(sf_dir).map_batches(shingle_batch, batch_format="pyarrow") \
        .map_batches(lambda b: b.select(["doc_id", "simhash"]),
                     batch_format="pyarrow")


def band_explode(batch: pa.Table) -> pa.Table:
    """signature -> (band, bucket) keys; ~N_BANDS rows per doc."""
    df = batch.to_pandas()
    n = len(df)
    sigs = np.stack(df["minhash"].to_numpy()) if n else \
        np.empty((0, N_PERM), dtype=np.int64)
    rows_per = N_PERM // N_BANDS
    bands = sigs.reshape(n, N_BANDS, rows_per).astype(np.uint64)
    bucket = bands[:, :, 0]
    for r in range(1, rows_per):
        bucket = bucket * _PRIME + bands[:, :, r]
    return pa.table({
        "band": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int64), n)),
        "bucket": pa.array(bucket.reshape(-1).astype(np.int64)),
        "doc_id": pa.array(np.repeat(df["doc_id"].to_numpy(np.int64), N_BANDS)),
        "shingles": pa.array(np.repeat(df["shingles"].to_numpy(), N_BANDS),
                             type=pa.list_(pa.int64())),
    })


def _pairs_exact_jaccard(g: pd.DataFrame, tau: float) -> pa.Table:
    """All-pairs within one LSH bucket, verified with EXACT Jaccard over the
    carried shingle sets."""
    out_a, out_b, out_j = [], [], []
    if len(g) > 1:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        sets = [np.asarray(s, dtype=np.int64) for s in g["shingles"]]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = np.intersect1d(sets[i], sets[j],
                                       assume_unique=True).size
                union = sets[i].size + sets[j].size - inter
                jac = inter / union if union else 0.0
                if jac >= tau:
                    out_a.append(ids[i]); out_b.append(ids[j]); out_j.append(jac)
    return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                     "doc_b": pa.array(out_b, type=pa.int64()),
                     "jaccard": pa.array(out_j, type=pa.float64())})


def minhash_dup_pairs(sf_dir: str, tau: float = 0.5) -> pd.DataFrame:
    """MinHash+LSH near-duplicate pairs (shingle → minhash → band → bucket
    groupby → exact-Jaccard verify), deduped across bands."""
    ds = read_docs(sf_dir).map_batches(shingle_batch, batch_format="pyarrow")
    ds = ds.map_batches(band_explode, batch_format="pyarrow")
    pairs = ds.groupby(["band", "bucket"]).map_groups(
        _pairs_exact_jaccard, batch_format="pandas", fn_kwargs={"tau": tau})
    df = pairs.to_pandas()
    if df.empty:
        df = pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                           "doc_b": pd.Series(dtype=np.int64),
                           "jaccard": pd.Series(dtype=np.float64)})
    df = df.drop_duplicates(["doc_a", "doc_b"])      # same pair in >1 band
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(sf_dir: str, tau: float = 0.3) -> pd.DataFrame:
    """Lower-threshold exact n-gram Jaccard pairs using the same LSH
    candidate generation (recall limited by banding — documented)."""
    return minhash_dup_pairs(sf_dir, tau=tau)
