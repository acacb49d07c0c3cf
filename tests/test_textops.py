# -*- coding: utf-8 -*-
"""Unit tests for the training-data text/dedup operators: constructed
fixtures with REAL duplicates and near-duplicates (the driver tables have
none), run through the same Ray pipelines."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osmlint import textops


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("docs")
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight with a happy friend of mine")
    near = base.replace("happy", "cheerful")          # 1-word change
    far = "completely different words about database engines and shuffles"
    rows = []
    for i in range(40):
        rows.append((i, f"unique document number {i} "
                        f"with some filler tokens {i * 7} {i * 13}",
                     "en", "srcA", 0))
    rows += [(100, base, "en", "srcA", 0), (101, base, "en", "srcB", 0),
             (102, near, "en", "srcA", 0), (103, far, "en", "srcA", 0)]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                     "n_chars"])
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    return str(d)


def test_exact_dedup(doc_dir):
    out = textops.dedup_exact(doc_dir)
    assert len(out) == 43                        # 44 docs, one exact dup pair
    kept = out.set_index("doc_id")["n_copies"]
    assert kept.loc[100] == 2                    # 100/101 same text, min wins
    assert 101 not in kept.index
    assert (kept.drop(100) == 1).all()


def test_minhash_near_dup(doc_dir):
    pairs = textops.minhash_dup_pairs(doc_dir, tau=0.5)
    assert (100, 101) in set(zip(pairs.doc_a, pairs.doc_b))
    assert {(100, 102), (101, 102)} & set(zip(pairs.doc_a, pairs.doc_b))
    # exact-duplicate jaccard is 1.0
    j = pairs.set_index(["doc_a", "doc_b"])["jaccard"]
    assert j.loc[(100, 101)] == 1.0
    # the unrelated doc never pairs
    assert 103 not in set(pairs.doc_a) | set(pairs.doc_b)


def test_simhash_properties(doc_dir):
    sh = textops.simhash_docs(doc_dir).to_pandas().set_index("doc_id")["simhash"]
    assert sh.loc[100] == sh.loc[101]            # identical text, same hash
    ham_near = bin(int(sh.loc[100]) ^ int(sh.loc[102])).count("1")
    ham_far = bin(int(sh.loc[100]) ^ int(sh.loc[103])).count("1")
    assert ham_near < ham_far                    # near-dup closer than far doc
    assert ham_near <= 16


def test_text_stats_kernel(doc_dir):
    stats = textops.text_stats(doc_dir).to_pandas().set_index("doc_id")
    row = stats.loc[100]
    t_base = ("the quick brown fox jumps over the lazy dog and runs far away "
              "into the deep green forest tonight with a happy friend of mine")
    assert row["n_tokens"] == len(t_base.split())
    assert row["lang_pred"] == "en"
    assert 0.0 <= row["quality"] <= 1.0
    import hashlib
    t = ("the quick brown fox jumps over the lazy dog and runs far away "
         "into the deep green forest tonight with a happy friend of mine")
    assert row["fingerprint"] == hashlib.md5(t.encode()).hexdigest()
    assert stats.loc[100, "stop_cnt"] >= 4       # the/and/with/a/of


def test_ngram_jaccard_lower_tau(doc_dir):
    pairs = textops.ngram_jaccard_pairs(doc_dir, tau=0.3)
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert (100, 101) in got and (100, 102) in got


def test_ngram_jaccard_equals_brute_force(doc_dir):
    """The inverted-index candidate generation has EXACT recall: the
    operator must equal a brute-force all-pairs Jaccard on the fixture."""
    pairs = textops.ngram_jaccard_pairs(doc_dir, tau=0.3)
    docs = pq.read_table(os.path.join(doc_dir, "documents.parquet")) \
        .to_pandas()
    h, off = textops._doc_shingles(docs["text"].fillna(""))
    ids = docs["doc_id"].to_numpy()
    exp = []
    for i in range(len(ids)):
        si = h[off[i]:off[i + 1]]
        for j in range(i + 1, len(ids)):
            sj = h[off[j]:off[j + 1]]
            inter = np.intersect1d(si, sj, assume_unique=True).size
            union = si.size + sj.size - inter
            jac = inter / union if union else 0.0
            if jac >= 0.3:
                a, b = sorted((ids[i], ids[j]))
                exp.append((a, b, jac))
    exp_df = pd.DataFrame(exp, columns=["doc_a", "doc_b", "jaccard"]) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pairs, exp_df)


def test_minhash_subset_of_exact(doc_dir):
    """LSH banding output is always a subset of the exact tau-pair set
    (verify is exact Jaccard on the full shingle sets)."""
    pairs = textops.minhash_dup_pairs(doc_dir, tau=0.5)
    allp = textops.ngram_jaccard_pairs(doc_dir, tau=0.5)
    assert set(zip(pairs.doc_a, pairs.doc_b)) <= \
        set(zip(allp.doc_a, allp.doc_b))


def test_simhash_dup_pairs(doc_dir):
    """Block-key bucketing finds every pair within max_hamming bits —
    the identical pair at hamming 0, and nothing outside the bound."""
    pairs = textops.simhash_dup_pairs(doc_dir, max_hamming=3)
    got = dict(zip(zip(pairs.doc_a, pairs.doc_b), pairs.hamming))
    assert got.get((100, 101)) == 0              # identical text
    # verify bound + exactness vs brute force over all simhashes
    sh = textops.simhash_docs(doc_dir).to_pandas() \
        .set_index("doc_id")["simhash"]
    ids = sorted(sh.index)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(int(sh[a]) ^ int(sh[b])).count("1")
            if h <= 3:
                exp[(a, b)] = h
    assert got == exp
