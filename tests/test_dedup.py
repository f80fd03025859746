"""Dedup family: exact hash-groupBy, minhash-LSH, simhash, n-gram Jaccard,
embedding-cosine — each validated against an independent brute-force oracle
(pure Python / DuckDB) on the driver's documents/embeddings tables."""

from __future__ import annotations

import re

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawler_spark.dedup import embedding as emb
from webcrawler_spark.dedup import exact, minhash, ngram, simhash


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120).cache()
    d.count()
    return d


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.toPandas()


def _toks(s):
    return [t for t in re.split("[^a-z0-9]+", s.lower()) if t]


def _shingles(s, n=3):
    t = _toks(s)
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def test_exact_dedup(spark):
    rows = [
        (1, "hello  world"),
        (2, "hello world"),   # same after collapse+lower
        (3, "HELLO WORLD"),
        (4, "different text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = exact.dedup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 3 and groups[0]["canonical_id"] == 1
    kept = sorted(r["doc_id"] for r in exact.drop_exact_duplicates(df).collect())
    assert kept == [1, 4]


def test_ngram_jaccard_vs_bruteforce(docs, docs_pd):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram.jaccard_pairs(docs, threshold=0.3).collect()
    }
    want = {}
    sh = {r.doc_id: _shingles(r.text) for r in docs_pd.itertuples()}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sh[a] or not sh[b]:
                continue
            j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            if round(j, 6) >= 0.3:
                want[(a, b)] = round(j, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_minhash_signatures_match_duckdb_oracle(docs, docs_pd, sf_dir):
    sig = minhash.signatures(docs).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet' LIMIT 120"
    )
    want = con.execute(
        minhash.minhash_signature_sql() + " ORDER BY doc_id"
    ).df()
    assert len(sig) == len(want)
    for c in sig.columns:
        assert (sig[c].values == want[c].values).all(), c


def test_minhash_near_duplicates_no_false_positives(docs, docs_pd):
    got = minhash.near_duplicates(docs, threshold=0.5).collect()
    sh = {r.doc_id: _shingles(r.text) for r in docs_pd.itertuples()}
    for r in got:
        j = len(sh[r["a"]] & sh[r["b"]]) / len(sh[r["a"]] | sh[r["b"]])
        assert round(j, 6) >= 0.5
        assert abs(r["jaccard"] - round(j, 6)) < 1e-6


def test_simhash_matches_duckdb_oracle(docs, sf_dir):
    got = simhash.simhash(docs).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet' LIMIT 120"
    )
    want = con.execute(simhash.simhash_oracle_sql() + " ORDER BY doc_id").df()
    assert (got["simhash"].values == want["simhash"].values).all()


def test_simhash_near_duplicates_complete(spark):
    # identical docs must be found at distance 0; chunk blocking may not
    # recall pairs beyond max_distance — verify returned distances exactly
    rows = [(1, "spark engine data pipeline test"), (2, "spark engine data pipeline test"),
            (3, "totally other words entirely unrelated content")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a"], r["b"]): r["distance"] for r in simhash.near_duplicates(df, max_distance=3).collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_embedding_cosine_pairs(spark, sf_dir):
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(80)
    got = {(r["a"], r["b"]): r["cos"] for r in emb.near_duplicate_pairs(vecs, threshold=0.3).collect()}
    pd = vecs.toPandas()
    m = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pd.itertuples()}
    ids = sorted(m)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = float(m[a] @ m[b] / (np.linalg.norm(m[a]) * np.linalg.norm(m[b])))
            if round(c, 6) >= 0.3:
                want[(a, b)] = round(c, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-5
