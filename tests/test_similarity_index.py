"""Similarity search (brute-force exact vs numpy; LSH precision) and
inverted-index build/search (A4/A5/J7/A6/O3/W3 vs pure-Python oracle)."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawler_spark.index.build import build_postings, vocabulary
from webcrawler_spark.index.search import search, snippets
from webcrawler_spark.similarity.ann import brute_force_topk, ivf_topk, lsh_topk
from webcrawler_spark.functions.text import STOPWORDS_EN


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100).cache()
    v.count()
    return v


def _np_topk(pd, qids, k=5):
    m = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pd.itertuples()}
    out = {}
    for q in qids:
        scores = []
        for nid, v in m.items():
            if nid == q:
                continue
            c = float(m[q] @ v / (np.linalg.norm(m[q]) * np.linalg.norm(v)))
            scores.append((round(c, 6), nid))
        scores.sort(key=lambda x: (-x[0], x[1]))
        out[q] = scores[:k]
    return out


def test_brute_force_topk_exact(vecs):
    qids = [0, 1, 2]
    queries = vecs.filter(F.col("vec_id").isin(qids))
    got = brute_force_topk(vecs, queries, k=5).collect()
    want = _np_topk(vecs.toPandas(), qids, 5)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["cos"], r["neighbor_id"], r["rank"]))
    for q in qids:
        rows = sorted(by_q[q], key=lambda x: x[2])
        for (cos, nid, rank), (wc, wn) in zip(rows, want[q]):
            assert abs(cos - wc) < 1e-5
            assert nid == wn, (q, rank)


def test_lsh_topk_precision(vecs):
    qids = [0, 1]
    queries = vecs.filter(F.col("vec_id").isin(qids))
    got = lsh_topk(vecs, queries, k=5, dim=64).collect()
    pd = vecs.toPandas()
    m = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pd.itertuples()}
    for r in got:
        a, b = m[r["query_id"]], m[r["neighbor_id"]]
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["cos"] - round(c, 6)) < 1e-5  # precision 1: exact cosines


def test_embedding_index_chunking_invariant(spark, vecs, tmp_path):
    """Incremental EmbeddingIndex: any ingest chunking answers topk
    identically to one-shot ingest; returned cosines are exact; a reopen
    from disk (fresh instance, same root) sees the carried state."""
    from webcrawler_spark.similarity.incremental import EmbeddingIndex

    queries = vecs.filter(F.col("vec_id") < 3)

    one = EmbeddingIndex(spark, str(tmp_path / "one"))
    assert one.add_batch(vecs) == vecs.count()
    want = sorted(map(tuple, one.topk(queries, k=5).collect()))
    # 100 vectors over 256 sign buckets → probes are sparse; every query
    # must still find SOME neighbor, with dense ranks from 1
    per_q = {}
    for q, n, cos, rank in want:
        per_q.setdefault(q, []).append(rank)
    assert set(per_q) == {0, 1, 2}
    assert all(sorted(rs) == list(range(1, len(rs) + 1)) for rs in per_q.values())

    three_root = str(tmp_path / "three")
    a = EmbeddingIndex(spark, three_root)
    a.add_batch(vecs.filter(F.col("vec_id") % 3 == 0))
    a.add_batch(vecs.filter(F.col("vec_id") % 3 == 1))
    b = EmbeddingIndex(spark, three_root)  # reopen from disk
    b.add_batch(vecs.filter(F.col("vec_id") % 3 == 2))
    got = sorted(map(tuple, b.topk(queries, k=5).collect()))
    assert got == want

    # precision 1: every returned cosine is the exact (rounded) cosine
    pd = vecs.toPandas()
    m = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pd.itertuples()}
    for q, n, cos, rank in got:
        a_, b_ = m[q], m[n]
        c = float(a_ @ b_ / (np.linalg.norm(a_) * np.linalg.norm(b_)))
        assert abs(cos - round(c, 6)) < 1e-5


def test_embedding_index_compaction_invariant(spark, vecs, tmp_path):
    """compact() rewrites the per-batch file adds into one file per sig
    partition: answers identical, data-file count strictly reduced, and
    ingest keeps working afterwards."""
    from webcrawler_spark.similarity.incremental import EmbeddingIndex
    from webcrawler_spark.storage.compaction import n_data_files

    idx = EmbeddingIndex(spark, str(tmp_path / "idx"))
    # 4 batches with IDENTICAL embeddings under shifted ids → every sig
    # partition accumulates one file per batch (the worst small-file case)
    for m in range(4):
        idx.add_batch(vecs.select(
            (F.col("vec_id") + 1000 * m).alias("vec_id"), "embedding"))
    queries = vecs.filter(F.col("vec_id") < 3)
    want = sorted(map(tuple, idx.topk(queries, k=5).collect()))
    before = n_data_files(idx._vec_dir)
    after = idx.compact()
    assert after < before
    assert sorted(map(tuple, idx.topk(queries, k=5).collect())) == want
    # appends after compaction still land and are visible
    idx.add_batch(vecs.select(
        (F.col("vec_id") + 4000).alias("vec_id"), "embedding"))
    again = idx.topk(queries, k=5).collect()
    assert len(again) >= len(want)


def test_ivf_topk_precision_and_cells(vecs):
    """IVF-flat: every returned cosine is exact (precision 1), ranks are
    dense per query, and every neighbor really lives in one of the
    query's nprobe probed cells (the IVF contract)."""
    qids = [0, 1, 2]
    queries = vecs.filter(F.col("vec_id").isin(qids))
    # lloyd_rounds=0 = the raw lowest-id quantizer: this test pins the
    # IVF probing CONTRACT against hand-computable centroids; the
    # trained path is covered by the lloyd/recall tests below
    got = ivf_topk(vecs, queries, k=5, n_cells=8, nprobe=2,
                   lloyd_rounds=0).collect()
    pd = vecs.toPandas()
    m = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pd.itertuples()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    cents = {cid: m[cid] for cid in range(8)}

    def cell_ranks(v):
        sc = sorted(((round(cos(v, c), 6), cid) for cid, c in cents.items()),
                    key=lambda x: (-x[0], x[1]))
        return [cid for _, cid in sc]

    by_q = {}
    for r in got:
        a, b = m[r["query_id"]], m[r["neighbor_id"]]
        assert abs(r["cos"] - round(cos(a, b), 6)) < 1e-5  # exact cosine
        assert cell_ranks(b)[0] in cell_ranks(a)[:2]       # neighbor in a probed cell
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    assert set(by_q) == set(qids)


def _np_lloyd(m: dict, n_cells: int, rounds: int):
    """Independent numpy twin of lloyd_centroids (round-before-argmin
    assignment, 6-dp per-cell means, empty cells carry)."""
    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    cents = [m[vid] for vid in sorted(i for i in m if i < n_cells)]
    for _ in range(rounds):
        cells: dict[int, list] = {}
        for vid, v in m.items():
            ranked = sorted(((-cos(v, c), cid) for cid, c in enumerate(cents)))
            cells.setdefault(ranked[0][1], []).append(v)
        cents = [
            np.round(np.mean(cells[cid], axis=0), 6) if cid in cells else old
            for cid, old in enumerate(cents)
        ]
    return cents


def test_lloyd_centroids_match_numpy_twin(vecs):
    from webcrawler_spark.similarity.ann import lloyd_centroids

    got = {r["cid"]: np.array(r["centroid"])
           for r in lloyd_centroids(vecs, n_cells=8, lloyd_rounds=3).collect()}
    pd = vecs.toPandas()
    m = {r.vec_id: np.array(r.embedding, dtype=np.float64)
         for r in pd.itertuples()}
    want = _np_lloyd(m, 8, 3)
    assert set(got) == set(range(8))
    for cid in range(8):
        assert np.allclose(got[cid], want[cid], atol=2e-6), cid


def test_ivf_trained_quantizer_objective_and_recall(spark):
    """The k-means point: on a clustered corpus whose first 8 ids all
    sit in ONE cluster, the lowest-id init leaves every other cluster
    far from every centroid — the quantizer represents the corpus by id
    accident, not structure. 3 Lloyd rounds must substantially raise the
    spherical k-means objective (mean cosine to the assigned centroid)
    while recall@5 under nprobe=2 stays high."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, 8))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    # ids 0..7: all cluster 0 (degenerate init); ids 8..71: round-robin
    for i in range(72):
        c = 0 if i < 8 else i % 4
        v = base[c] + rng.normal(scale=0.08, size=8)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m = {i: np.array(v, dtype=np.float64) for i, v in rows}
    qids = [8, 9, 10, 11]
    queries = df.filter(F.col("vec_id").isin(qids))
    truth = {}
    for r in brute_force_topk(df, queries, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    def objective(rounds):
        # the spherical k-means objective: mean cosine of every vector
        # to its assigned centroid — "how well do the cells represent
        # the corpus", the thing Lloyd provably improves
        cents = _np_lloyd(m, 8, rounds)
        return float(np.mean([
            max(cos(v, c) for c in cents) for v in m.values()
        ]))

    o0, o3 = objective(0), objective(3)
    # untrained centroids all sit in cluster 0: other clusters' vectors
    # are far from every centroid; training must close most of that gap
    assert o3 > o0 + 0.1, (o0, o3)

    def recall(rounds):
        got = {}
        for r in ivf_topk(df, queries, k=5, n_cells=8, nprobe=2,
                          lloyd_rounds=rounds).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(got.get(q, set()) & truth[q]) for q in qids) / (
            5 * len(qids))

    assert recall(3) >= 0.8, recall(3)


# --------------------------------------------------------------------------
# inverted index
# --------------------------------------------------------------------------

def _py_postings(rows, stopwords=STOPWORDS_EN):
    sw = set(stopwords)
    out = {}
    for doc_id, text in rows:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t and t not in sw]
        for pos, w in enumerate(toks):
            key = (doc_id, w)
            e = out.setdefault(key, [0, []])
            e[0] += 1
            e[1].append(pos)
    return out


@pytest.fixture(scope="module")
def doc_rows(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60).cache()
    df.count()
    return df


def test_postings_vs_python(doc_rows):
    got = {(r["doc"], r["word"]): (r["frequency"], r["positions"])
           for r in build_postings(doc_rows).collect()}
    rows = [(r.doc_id, r.text) for r in doc_rows.toPandas().itertuples()]
    want = _py_postings(rows)
    assert set(got) == set(want)
    for k, (f_, p) in want.items():
        assert got[k] == (f_, p), k


def test_vocabulary(doc_rows):
    postings = build_postings(doc_rows)
    vocab = {r["word"] for r in vocabulary(postings).collect()}
    rows = [(r.doc_id, r.text) for r in doc_rows.toPandas().itertuples()]
    want = {w for (_, w) in _py_postings(rows)}
    assert vocab == want


def test_search_scoring(spark, doc_rows):
    postings = build_postings(doc_rows).cache()
    hits = search(spark, postings, "table value").collect()
    rows = [(r.doc_id, r.text) for r in doc_rows.toPandas().itertuples()]
    want_post = _py_postings(rows)
    want_scores = {}
    for (doc, w), (f_, _) in want_post.items():
        if w in ("table", "value"):
            want_scores[doc] = want_scores.get(doc, 0) + f_
    got_scores = {r["doc"]: r["score"] for r in hits}
    assert got_scores == want_scores
    # ordering: score desc, doc asc (run-sqlite-search.py:55 + tiebreak)
    ordered = [(r["score"], r["doc"]) for r in hits]
    assert ordered == sorted(ordered, key=lambda x: (-x[0], x[1]))


def test_snippets_window(spark):
    # processing.py:123-134 — slice [index-3 : index+3] exclusive end:
    # 3 before + self + 2 after
    docs = spark.createDataFrame(
        [(1, "w0 w1 w2 w3 target w5 w6 w7 w8")], "doc_id long, text string"
    )
    postings = build_postings(docs, stopwords=())
    hits = search(spark, postings, "target")
    out = snippets(docs, hits, stopwords=()).collect()
    assert len(out) == 1
    assert out[0]["snippet"] == "w1 w2 w3 target w5 w6"


def test_index_sink_roundtrip(spark, sf_dir, tmp_path):
    """S9: postings persisted as word-bucketed parquet round-trip exactly,
    and a term lookup prunes to its bucket."""
    from pyspark.sql import functions as F

    from webcrawler_spark.index.build import build_postings, read_index, write_index
    from webcrawler_spark.tables import load

    d = load(spark, sf_dir, "documents")
    p = build_postings(d)
    root = str(tmp_path / "idx")
    write_index(p, root, buckets=8)
    back = read_index(spark, root)
    a = {(r["doc"], r["word"], r["frequency"], tuple(r["positions"]))
         for r in p.collect()}
    b = {(r["doc"], r["word"], r["frequency"], tuple(r["positions"]))
         for r in back.collect()}
    assert a == b
    # term lookup touches one bucket only (partition pruning on the
    # bucket directory column; bucket_of_term is the driver-side crc32 twin)
    from webcrawler_spark.index.build import bucket_of_term

    one = back.filter(
        (F.col("bucket") == bucket_of_term("table", 8))
        & (F.col("word") == "table")
    )
    assert one.count() > 0
    # the static filter reaches the scan as a PartitionFilter
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan or "bucket#" in plan


def test_search_indexed_matches_in_memory(spark, sf_dir, tmp_path):
    """The persisted-index lookup path (static bucket pruning) returns the
    same scored hits as the in-memory search (J7/A6/O3)."""
    from webcrawler_spark.index.build import build_postings, write_index
    from webcrawler_spark.index.search import search, search_indexed
    from webcrawler_spark.tables import load

    d = load(spark, sf_dir, "documents")
    p = build_postings(d)
    root = str(tmp_path / "idx2")
    write_index(p, root, buckets=8)
    q = "table value row"
    mem = [(r["doc"], r["score"]) for r in search(spark, p, q).collect()]
    idx = [(r["doc"], r["score"]) for r in search_indexed(spark, root, q, buckets=8).collect()]
    assert idx == mem and len(idx) > 0
    # the driver-side Arrow lookup service (interactive path, no Spark job)
    # returns the identical scored ranking from the same persisted index
    from webcrawler_spark.index.search import IndexLookupService, search_indexed_local

    svc = IndexLookupService(root, buckets=8)
    assert svc.lookup(q) == mem
    assert svc.lookup(q) == mem  # warm handle, same result
    assert search_indexed_local(root, q, buckets=8) == mem
    assert svc.lookup("") == []
    assert svc.lookup("zqxjkwv_notaword") == []


def test_bm25_matches_brute_force_twin(spark):
    # closed-form check: tiny corpus, Python-floats twin with the SAME
    # rounding points (6-dp ln, 6-dp contribution, 6-dp sum) as the
    # Catalyst plan and the DuckDB oracle
    import math

    from webcrawler_spark.index.bm25 import bm25_scores

    corpus = [
        (0, "table value row table table"),
        (1, "value of the row"),
        (2, "nothing relevant here"),
        (3, "table"),
        (4, ""),
    ]
    terms = ("table", "value", "row")
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [(r["doc_id"], r["n_hit_terms"], r["bm25"])
           for r in bm25_scores(df, terms).collect()]

    k1, b = 1.2, 0.75
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in corpus}
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    n = len(corpus)
    avgdl = round(sum(dl.values()) / len(dl), 6)
    tf = {(d, t): ts.count(t) for d, ts in toks.items() for t in set(ts) if t in terms}
    dfreq = {t: sum(1 for (_, t2) in tf if t2 == t) for t in terms}
    idf = {t: round(math.log(1.0 + (n - c + 0.5) / (c + 0.5)), 6)
           for t, c in dfreq.items() if c}
    scores: dict[int, list[float]] = {}
    for (d, t), f in tf.items():
        c = round(idf[t] * (f * (k1 + 1))
                  / (f + k1 * (1.0 - b + b * dl[d] / avgdl)), 6)
        scores.setdefault(d, []).append(c)
    want = sorted(
        ((d, len(cs), round(sum(cs), 6)) for d, cs in scores.items()),
        key=lambda r: (-r[2], r[0]),
    )
    assert got == want
    # doc 0 (3 distinct hits incl. tf=3 'table') must outrank single-hit
    # doc 3, and docs 2/4 (no query terms) must be absent
    assert got[0][0] == 0 and {r[0] for r in got} == {0, 1, 3}
