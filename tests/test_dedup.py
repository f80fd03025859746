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


# ---------------------------------------------------------------------------
# connected-components cluster assembly (dedup/cluster.py)
# ---------------------------------------------------------------------------

def _brute_components(edges):
    """Union-find oracle: component = min id reachable."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min so the root IS the component min
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def test_connected_components_vs_union_find(spark):
    from webcrawler_spark.dedup import cluster

    # chain (1-2-3-4), triangle (10,11,12), isolated pair (20,21),
    # a long path that needs >1 star round (30..37), cross links
    edges = [
        (1, 2), (2, 3), (3, 4),
        (10, 11), (11, 12), (12, 10),
        (20, 21),
        (30, 31), (31, 32), (32, 33), (33, 34), (34, 35), (35, 36), (36, 37),
        (4, 1),            # cycle back
        (37, 30),          # cycle back
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in cluster.connected_components(df).collect()
    }
    assert got == _brute_components(edges)


def test_connected_components_string_ids_and_empty(spark):
    from webcrawler_spark.dedup import cluster

    edges = [("d9", "d2"), ("d2", "d7"), ("x1", "x2")]
    got = {
        r["node"]: r["component"]
        for r in cluster.connected_components(spark.createDataFrame(edges, "a string, b string")).collect()
    }
    assert got == {"d9": "d2", "d2": "d2", "d7": "d2", "x1": "x1", "x2": "x1"}

    empty = spark.createDataFrame([], "a long, b long")
    assert cluster.connected_components(empty).collect() == []


def test_clusters_and_drop_near_duplicates(spark):
    from webcrawler_spark.dedup import cluster

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 5), (5, 3), (6, 7)], "a long, b long")
    cl = cluster.clusters(docs, pairs).collect()
    by_doc = {r["doc_id"]: r for r in cl}
    assert set(by_doc) == {1, 3, 5, 6, 7}
    assert all(by_doc[d]["cluster_id"] == 1 for d in (1, 3, 5))
    assert by_doc[1]["cluster_size"] == 3 and by_doc[1]["is_canonical"]
    assert not by_doc[3]["is_canonical"] and not by_doc[5]["is_canonical"]
    assert by_doc[6]["cluster_id"] == 6 and by_doc[6]["cluster_size"] == 2

    kept = sorted(
        r["doc_id"] for r in cluster.drop_near_duplicates(docs, pairs).collect()
    )
    assert kept == [0, 1, 2, 4, 6]   # victims 3,5,7 dropped; canonicals stay


def test_cluster_oracle_matches_spark(docs, sf_dir):
    """The driver-shaped check: Spark clusters() over LSH+verify pairs vs
    the recursive-CTE DuckDB oracle, value-for-value on the same 120-doc
    slice."""
    from webcrawler_spark.dedup import cluster

    pairs = minhash.near_duplicates(docs, threshold=0.2, bands=8, rows_per_band=2)
    got = cluster.clusters(docs, pairs.select("a", "b")).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet' LIMIT 120"
    )
    want = con.execute(
        cluster.clusters_oracle_sql(0.2, bands=8, rows_per_band=2)
    ).df()
    assert len(got) == len(want)
    g = got.sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
    w = want.sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
    assert (g["doc_id"].astype("int64") == w["doc_id"].astype("int64")).all()
    assert (g["cluster_id"].astype("int64") == w["cluster_id"].astype("int64")).all()
    assert (g["cluster_size"].astype("int64") == w["cluster_size"].astype("int64")).all()
    assert (g["is_canonical"].astype(bool) == w["is_canonical"].astype(bool)).all()


def test_connected_components_random_graph(spark):
    """Seeded random graph (mixed component sizes, multi-round chains)
    vs the union-find oracle — the adversarial shape for star rounds."""
    import random

    from webcrawler_spark.dedup import cluster

    rng = random.Random(7)
    nodes = list(range(200))
    edges = []
    # long path (needs several star rounds) + random edges + dups/reverses
    for i in range(60):
        edges.append((i, i + 1))
    for _ in range(120):
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
        if rng.random() < 0.2:
            edges.append((b, a))   # reverse duplicates must not matter
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in cluster.connected_components(df).collect()
    }
    assert got == _brute_components(edges)


def test_connected_components_multi_task_contraction(spark, monkeypatch):
    """Force the n_tasks > 1 path (tiny EDGES_PER_CONTRACTION_TASK): the
    partition-local union-find only sees slivers of each component, so
    the star rounds must do real cross-task merging — results must equal
    both the union-find oracle and the single-task shortcut."""
    import random

    from webcrawler_spark.dedup import cluster

    rng = random.Random(13)
    nodes = list(range(300))
    edges = [(i, i + 1) for i in range(80)]          # long path
    edges += [(100, j) for j in range(101, 126)]      # star hub
    for _ in range(150):
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
    df = spark.createDataFrame(edges, "a long, b long").repartition(8)
    want = _brute_components(edges)

    single = {
        r["node"]: r["component"]
        for r in cluster.connected_components(df).collect()
    }
    monkeypatch.setattr(cluster, "EDGES_PER_CONTRACTION_TASK", 16)
    multi = {
        r["node"]: r["component"]
        for r in cluster.connected_components(df).collect()
    }
    assert single == want
    assert multi == want


# ---------------------------------------------------------------------------
# incremental near-dup index (dedup/incremental.py)
# ---------------------------------------------------------------------------

def test_incremental_neardup_equals_batch(spark, docs, tmp_path_factory):
    """Processing the corpus in chunks through a (re-opened) NearDupIndex
    yields EXACTLY the batch pair set, each pair once, regardless of
    chunking — the carried-state contract."""
    from webcrawler_spark.dedup.incremental import NearDupIndex

    want = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash.near_duplicates(
            docs, threshold=0.2, bands=8, rows_per_band=2
        ).collect()
    }
    assert want, "fixture slice must contain near-dup pairs (non-vacuous)"

    root = str(tmp_path_factory.mktemp("neardup_idx"))
    got = {}
    for chunk in range(3):
        # re-open per batch: state must live entirely on disk
        idx = NearDupIndex(spark, root, threshold=0.2, bands=8, rows_per_band=2)
        batch = docs.filter(F.col("doc_id") % 3 == chunk)
        for r in idx.add_batch(batch).collect():
            key = (r["a"], r["b"])
            assert key not in got, f"pair {key} reported twice"
            got[key] = r["jaccard"]
    assert got == want


def test_semantic_dedup_vs_bruteforce(spark, sf_dir):
    """SemDeDup drop set == a numpy brute-force of the same spec: argmax
    rounded-cosine assignment to the 8 lowest-id centroids, drop iff a
    lower-id cell-mate sits within rounded cos >= tau."""
    from webcrawler_spark.dedup.semantic import semantic_dedup

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        r.vec_id: (r.cell, r.dup_of, r.keep)
        for r in semantic_dedup(vecs, n_cells=8, tau=0.32).collect()
    }

    pdf = vecs.orderBy("vec_id").toPandas()
    ids = pdf.vec_id.to_numpy()
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cents = Vn[np.argsort(ids)[:8]]
    cell = np.argmax(np.round(Vn @ cents.T, 6), axis=1)
    assert len(got) == len(ids)
    n_dropped = 0
    for c in range(8):
        idx = np.where(cell == c)[0]
        order = idx[np.argsort(ids[idx])]
        M = np.round(Vn[order] @ Vn[order].T, 6)
        for j, row in enumerate(order):
            lower = [i for i in range(j) if M[j, i] >= 0.32]
            dup_of = int(ids[order[lower[0]]]) if lower else None
            want = (c, dup_of, dup_of is None)
            assert got[int(ids[row])] == want, (int(ids[row]), got[int(ids[row])], want)
            n_dropped += dup_of is not None
    # non-vacuous on the synthetic embeddings at every sf
    assert 0 < n_dropped < len(ids)


def test_semantic_dedup_survivors_append_stable(spark, sf_dir):
    """Adding new (higher-id) vectors never evicts an existing survivor:
    min-id-wins inside a cell is append-stable by construction."""
    from webcrawler_spark.dedup.semantic import semantic_dedup

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    hi = vecs.agg(F.max("vec_id")).first()[0]
    subset = vecs.filter(F.col("vec_id") <= hi // 2)
    keep_subset = {
        r.vec_id for r in semantic_dedup(subset).filter("keep").collect()
    }
    keep_full = {
        r.vec_id for r in semantic_dedup(vecs).filter("keep").collect()
    }
    assert keep_subset and keep_subset.issubset(keep_full)


def test_span_dedup_hand_case(spark):
    """First occurrence keeps its span; later exact k-token windows lose
    every covered position; reassembly preserves order."""
    from webcrawler_spark.dedup.spans import span_dedup

    run = "one two three four five six seven eight"  # exactly k=8 tokens
    rows = [
        (0, f"intro {run} outro"),
        (1, f"unrelated prefix text {run}"),          # loses the run
        (2, "no shared window here at all today"),    # 7 tokens, untouched
        (3, ""),                                      # empty doc
    ]
    got = {
        r.doc_id: r
        for r in span_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), k=8
        ).collect()
    }
    assert got[0].n_removed == 0 and got[0].kept_text == f"intro {run} outro"
    assert got[1].n_removed == 8 and got[1].kept_text == "unrelated prefix text"
    assert got[2].n_removed == 0 and got[2].kept_text == rows[2][1]
    assert got[3] == (3, 0, 0, "")


def test_span_dedup_injected_corpus(spark, sf_dir):
    """On the driver corpus with the boilerplate injection: the
    min-doc_id occurrence keeps its copy, every later one loses >= the
    run length, and survivors are an order-preserving subsequence."""
    from webcrawler_spark.dedup.spans import span_dedup
    from webcrawler_spark.functions.text import tokens as spark_tokens

    alpha = (
        "shared boilerplate segment alpha with exactly twelve repeated"
        " filler tokens trailing here"
    )
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    injected = d.select(
        "doc_id",
        F.concat(
            "text",
            F.when(F.col("doc_id") % 5 == 0, F.lit(" " + alpha)).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = {r.doc_id: r for r in span_dedup(injected, k=8).collect()}
    toks = {
        r.doc_id: r.t
        for r in injected.select("doc_id", spark_tokens(F.col("text")).alias("t")).collect()
    }
    keepers = sorted(i for i in out if i % 5 == 0)
    assert out[keepers[0]].n_removed == 0
    for i in keepers[1:]:
        assert out[i].n_removed >= 12, (i, out[i].n_removed)
    # order-preserving subsequence check on every doc
    for i, r in out.items():
        kept = r.kept_text.split() if r.kept_text else []
        assert len(kept) == r.n_tokens - r.n_removed
        it = iter(toks[i])
        assert all(any(t == x for x in it) for t in kept), i
