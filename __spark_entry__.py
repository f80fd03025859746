"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship crawl query at sf0.001.
``queries()``   — one callable per implemented operator from SURVEY.md §2
                  plus the training-pipeline additions (dedup families,
                  similarity search, text analysis, multimodal).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL for every SQL-expressible
                  query, value-for-value (column names aligned, doubles
                  rounded, arrays sorted deterministically). Non-SQL ops
                  (crawl engine vs its own simulator oracle, image
                  invariants) are rows-only here but fully asserted in
                  tests/ (engine↔simulator equality, per-row invariants).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webcrawler_spark.dedup import cluster as _cluster
from webcrawler_spark.dedup import embedding as _emb
from webcrawler_spark.dedup import exact as _exact
from webcrawler_spark.dedup import minhash as _minhash
from webcrawler_spark.dedup import ngram as _ngram
from webcrawler_spark.dedup import semantic as _semantic
from webcrawler_spark.dedup import spans as _spans
from webcrawler_spark.dedup import simhash as _simhash
from webcrawler_spark.functions.hashing import PORTABLE_HASH64_DUCKDB
from webcrawler_spark.functions.text import (
    STOPWORDS_EN,
    TOKEN_SPLIT_RE,
    lang_id,
    quality_score,
    token_count,
    tokens,
)
from webcrawler_spark.index.build import build_postings
from webcrawler_spark.index.search import search as _search
from webcrawler_spark.similarity.ann import brute_force_topk, ivf_topk
from webcrawler_spark.streaming.events import sessionize, tumbling_counts
from webcrawler_spark.tables import load

# ---------------------------------------------------------------------------
# DuckDB SQL fragments shared across oracles (identical arithmetic to the
# Catalyst expressions in webcrawler_spark.functions.text / hashing)
# ---------------------------------------------------------------------------
_DUCK_TOKS = (
    "list_filter(regexp_split_to_array(lower({col}), '" + TOKEN_SPLIT_RE + "'), t -> t <> '')"
)
_DUCK_FP = PORTABLE_HASH64_DUCKDB.format(
    col="lower(regexp_replace(text, '\\s{{2,}}', ' ', 'g'))"
)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship over /root/testdata/sf0.001 (per the driver contract): the
    crawl-engine-shaped analytics stack on the documents corpus — exact
    dedup fingerprinting (J5/W2), token counts (X14), language-ID and
    quality scores, joined into one per-document summary with a duplicate
    flag — i.e. the training-data curation pass the engine runs over
    fetched pages at scale."""
    from webcrawler_spark.functions.text import fingerprint64

    sf = "/root/testdata/sf0.001"
    d = load(spark, sf, "documents")
    scored = d.select(
        "doc_id",
        fingerprint64(F.col("text")).alias("fingerprint"),
        token_count(F.col("text")).alias("n_tokens"),
        lang_id(F.col("text")).alias("lang_guess"),
        quality_score(F.col("text")).alias("quality"),
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        scored.withColumn("dup_rank", F.row_number().over(w))
        .withColumn("is_duplicate", F.col("dup_rank") > 1)
        .drop("dup_rank")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# queries — (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def _q_counts_by_type(spark, sf):
    # A2/A3: counts by type code (sql_selects.sql:6-12 shape) over events
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


def _q_recent_events(spark, sf):
    # O1: ORDER BY accessed_time DESC (sql_selects.sql:14 shape)
    return (
        load(spark, sf, "events")
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .select("event_id", "ts", "event_type")
        .limit(100)
    )


def _q_link_join(spark, sf):
    # J1: edge ⋈ vertex equi-join (sql_selects.sql:16-21 shape):
    # orders⋈customer with per-customer order counts
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .orderBy(F.desc("n_orders"), F.asc("c_custkey"))
        .limit(50)
    )


def _q_anti_join(spark, sf):
    # J2: the workhorse LEFT ANTI dedup join — customers with no 1998+
    # orders ("candidates not in the seen set"). The unfiltered variant
    # returns 0 rows at sf0.01 (every customer has some order), which
    # proved only that the plan compiles; this filter yields rows at every
    # sf (8 at sf0.01, 74 at sf0.1) so the driver hash checks real output.
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def _q_semi_join(spark, sf):
    # J7: broadcast semi join — parts that appear in lineitem with size>40
    p = load(spark, sf, "part").filter(F.col("p_size") > 40)
    li = load(spark, sf, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .select("p_partkey", "p_name", "p_size")
        .orderBy("p_partkey")
    )


def _q_frontier_pick(spark, sf):
    # W1: per-host FIFO pick — row_number over (partition by key order by seq);
    # orders stands in for the frontier, o_custkey for host
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))
        .orderBy("o_custkey")
    )


def _q_first_writer_dedup(spark, sf):
    # W2/J5: first-writer-wins exact-content dedup groups. The raw
    # documents table has no exact duplicates at sf0.01 (0 rows proved
    # nothing), so collisions are synthesized deterministically: every doc
    # takes the text of its group-of-5 base doc (doc_id - doc_id % 5) via
    # a self-join — the same trick url_canonicalize uses with part.
    d = load(spark, sf, "documents")
    base = d.select(F.col("doc_id").alias("bid"), "text")
    cloned = (
        d.select("doc_id", (F.col("doc_id") - F.col("doc_id") % 5).alias("bid"))
        .join(base, "bid")
        .select("doc_id", "text")
    )
    return _exact.dedup_groups(cloned).orderBy("canonical_id")


def _q_tpch_q1(spark, sf):
    # A1-A4 shape: the classic pricing-summary aggregation (partial+final agg)
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_top_duplicated(spark, sf):
    # A7: top-5 duplicated keys (report main.tex:179 shape) over lineitem partkeys
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("l_partkey"))
        .limit(5)
    )


def _q_tokens(spark, sf):
    # X14 token counting over documents
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.size(F.array_distinct(tokens(F.col("text")))).alias("n_distinct_tokens"),
    ).orderBy("doc_id")


def _q_lang_quality(spark, sf):
    # language-ID + quality scoring (training-pipeline text analysis)
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_guess"),
        quality_score(F.col("text")).alias("quality"),
    ).orderBy("doc_id")


def _q_fingerprint(spark, sf):
    # document fingerprinting: portable 60-bit hash of collapsed text
    from webcrawler_spark.functions.text import fingerprint64

    d = load(spark, sf, "documents")
    return d.select("doc_id", fingerprint64(F.col("text")).alias("fingerprint")).orderBy("doc_id")


def _q_postings(spark, sf):
    # A4: inverted-index build (frequency + ordered positions).
    # build_postings keeps positions as a real array<int>; the contract
    # projection serializes it to 'p0,p1,...' because the driver's
    # canonicalizer sorts/hashes rows with pandas and cannot hash list
    # cells (the one red row of round 1).
    d = load(spark, sf, "documents")
    return (
        build_postings(d)
        .select(
            "doc",
            "word",
            "frequency",
            F.array_join(
                F.transform("positions", lambda x: x.cast("string")), ","
            ).alias("positions"),
        )
        .orderBy("doc", "word")
    )


def _q_vocabulary(spark, sf):
    # A5: distinct vocabulary size
    d = load(spark, sf, "documents")
    p = build_postings(d)
    return p.agg(F.count_distinct("word").cast("long").alias("n_words"))


def _q_search(spark, sf):
    # J7+A6+O3: scored search for a fixed query over the built index
    d = load(spark, sf, "documents")
    postings = build_postings(d)
    return _search(spark, postings, "table value row").drop("all_positions")


def _q_bm25(spark, sf):
    # BM25 ranked retrieval for the same fixed query the frequency-ranked
    # search uses — the retrieval scorer a curation pipeline gates on
    # (not in the reference, whose search ranks by raw frequency)
    from webcrawler_spark.index.bm25 import bm25_scores

    d = load(spark, sf, "documents").select("doc_id", "text")
    return bm25_scores(d, ("table", "value", "row"))


def _q_max_freq_word(spark, sf):
    # A8: max-frequency word per site via max_by (report stats shape —
    # 'proizvodnja' 2,266 on one site, 'slovenije' 9,105 overall;
    # implementation-indexing/report/main.tex:97-98). Ties broken
    # deterministically by a portable (zero-padded total | word) key so
    # Spark max_by and DuckDB arg_max agree bit-for-bit.
    d = load(spark, sf, "documents")
    p = build_postings(d).join(
        d.select(F.col("doc_id").alias("doc"), "source"), "doc"
    )
    totals = p.groupBy("source", "word").agg(
        F.sum("frequency").cast("long").alias("total")
    )
    key = F.concat(F.lpad(F.col("total").cast("string"), 10, "0"), F.lit("|"), F.col("word"))
    return (
        totals.groupBy("source")
        .agg(
            F.max_by("word", key).alias("top_word"),
            F.max("total").cast("long").alias("top_total"),
        )
        .orderBy("source")
    )


def _q_page_data_types(spark, sf):
    # X1 + A3: content-type → DATA_TYPE (DatabaseHandler.java:230-247)
    # then GROUP BY data_type_code (sql_selects.sql:12), over synthetic
    # content types derived deterministically from part
    from webcrawler_spark.functions.mime import CONTENT_TYPE_TO_DATA_TYPE, data_type_code

    cts = list(CONTENT_TYPE_TO_DATA_TYPE) + ["text/html"]
    p = load(spark, sf, "part")
    ct = F.element_at(
        F.array(*[F.lit(c) for c in cts]), (F.col("p_partkey") % 6 + 1).cast("int")
    )
    return (
        p.select(data_type_code(ct).alias("data_type_code"))
        .filter(F.col("data_type_code").isNotNull())  # HTML falls through the switch
        .groupBy("data_type_code")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("data_type_code")
    )


def _q_graph_export(spark, sf):
    # S10: CSV vertex/edge graph export (sql_selects.sql:19-21) —
    # write the customer→order edge list + customer vertices as headered
    # CSV, read them back, and aggregate; proves the sink round-trips.
    import shutil
    import tempfile

    from webcrawler_spark.sources.sinks import export_graph_csv

    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    vertices = c.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("label"))
    edges = o.select(F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("dst"))
    root = tempfile.mkdtemp(prefix="graph_csv_")
    try:
        export_graph_csv(vertices, edges, root)
        v = spark.read.option("header", True).csv(f"{root}/vertices")
        e = spark.read.option("header", True).csv(f"{root}/edges")
        out = (
            e.select(F.col("src").cast("long").alias("id"))
            .join(v.select(F.col("id").cast("long"), "label"), "id")
            .groupBy("label")
            .agg(F.count("*").cast("long").alias("n_edges"))
            .orderBy(F.desc("n_edges"), F.asc("label"))
            .limit(25)
        )
        # collect + rebuild (25 rows): a localCheckpoint's blocks are not
        # reliable once the CSV source is rmtree'd (block loss forces a
        # recompute against the deleted directory)
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_minhash_signatures(spark, sf):
    # MinHash signatures (bit-for-bit portable arithmetic)
    return _minhash.signatures(load(spark, sf, "documents")).orderBy("doc_id")


def _q_simhash(spark, sf):
    # SimHash fingerprints (bit-for-bit portable arithmetic)
    return _simhash.simhash(load(spark, sf, "documents")).orderBy("doc_id")


def _q_ngram_jaccard(spark, sf):
    # n-gram Jaccard near-dup pairs, scale path: MinHash-LSH candidates
    # (8 bands × 2 rows — recall ≈ 1 for the j ≥ 0.9 pairs that exist in
    # this corpus) + exact shingle-Jaccard verify on candidates only.
    # Replaces the round-1 exact shared-shingle self-join whose d² blow-up
    # made it 55% of the whole bench suite; the exact form remains in
    # dedup.ngram for small corpora/recall audits.
    return _minhash.near_duplicates(
        load(spark, sf, "documents"), threshold=0.2, bands=8, rows_per_band=2
    )


def _q_dedup_clusters(spark, sf):
    # Near-dup CLUSTERS: connected components (alternating large/small
    # star, SoCC'14) over the LSH+verify pair set, min-id canonical
    # survivor per cluster — the transitive keep-one step a production
    # dedup pipeline runs after pair generation. Same pair parameters as
    # ngram_jaccard_pairs so the oracle mirrors the edge set exactly.
    docs = load(spark, sf, "documents")
    pairs = _minhash.near_duplicates(docs, threshold=0.2, bands=8, rows_per_band=2)
    out = _cluster.clusters(docs, pairs.select("a", "b"))
    # iterative lineage + per-round persists: materialize the (thin,
    # pair-participant-only) result for the driver like graph_export does
    return spark.createDataFrame(out.collect(), schema=out.schema)


def _q_dedup_survivors(spark, sf):
    # The deduplicated corpus: documents minus non-canonical near-dup
    # cluster members (left-anti on the thin victim set). The end-to-end
    # keep-one semantics of dedup/cluster.drop_near_duplicates.
    docs = load(spark, sf, "documents")
    pairs = _minhash.near_duplicates(docs, threshold=0.2, bands=8, rows_per_band=2)
    out = (
        _cluster.drop_near_duplicates(docs, pairs.select("a", "b"))
        .select("doc_id")
        .orderBy("doc_id")
    )
    return spark.createDataFrame(out.collect(), schema=out.schema)


def _q_embedding_neardup(spark, sf):
    # embedding-cosine near-duplicate pairs
    return _emb.near_duplicate_pairs(load(spark, sf, "embeddings"), threshold=0.3)


def _q_embedding_neardup_lsh(spark, sf):
    # embedding near-dup, 100-TB scale path: sign-random-projection LSH
    # buckets (integer-quantized signatures, Hamming-1 multiprobe) + exact
    # cosine on candidates only — replaces blocked all-pairs at scale
    return _emb.lsh_near_duplicate_pairs(load(spark, sf, "embeddings"), threshold=0.4)


def _q_semantic_dedup(spark, sf):
    # SemDeDup (Abbas et al. 2023): coarse-quantize the embedding space
    # (the seedless lowest-id centroids ivf_topk uses as its k-means
    # INIT — dedup cares about cell locality, not recall), then drop every vector
    # within cos 0.32 of a lower-id cell-mate — all-pairs work never
    # leaves a cell, which is what makes the method web-scale
    from webcrawler_spark.dedup.semantic import semantic_dedup

    return semantic_dedup(load(spark, sf, "embeddings"))


def _q_ann_topk(spark, sf):
    # brute-force cosine top-k for a fixed query set
    vecs = load(spark, sf, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 3)
    return brute_force_topk(vecs, queries, k=5)


def _q_ivf_topk(spark, sf):
    # IVF-flat ANN scale path with a TRAINED coarse quantizer: 3
    # deterministic Lloyd rounds (broadcast centroids, round-before-
    # argmin assignment, 6-dp per-cell means) from the lowest-id init,
    # then nearest-cell assignment + nprobe=2 cell search. The oracle
    # replays the Lloyd rounds as an unrolled CTE chain, so the k-means
    # training itself is driver-verified (similarity/ann.py)
    vecs = load(spark, sf, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 3)
    return ivf_topk(vecs, queries, k=5, n_cells=8, nprobe=2, lloyd_rounds=3)


def _q_incremental_ann(spark, sf):
    # the incremental EmbeddingIndex (similarity/incremental.py): corpus
    # ingested in TWO batches into a sig-partitioned parquet store, then
    # probed — answers must equal one-shot sign-LSH top-k over the whole
    # corpus (chunking invariance: the signature is a pure per-row
    # function). Oracle: the pure-SQL mirror of that one-shot form.
    import shutil
    import tempfile

    from webcrawler_spark.similarity.incremental import EmbeddingIndex

    vecs = load(spark, sf, "embeddings")
    root = tempfile.mkdtemp(prefix="embidx_")
    try:
        idx = EmbeddingIndex(spark, root)
        idx.add_batch(vecs.filter(F.col("vec_id") % 2 == 0))
        idx.add_batch(vecs.filter(F.col("vec_id") % 2 == 1))
        out = idx.topk(vecs.filter(F.col("vec_id") < 3), k=5)
        # collect + rebuild: the store root is rmtree'd in finally
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_tumbling(spark, sf):
    # streaming-analog tumbling window aggregation
    return tumbling_counts(load(spark, sf, "events"), minutes=60)


def _q_sessionize(spark, sf):
    # streaming-analog sessionization (lag + cumulative break count)
    return sessionize(load(spark, sf, "events"), gap_minutes=30)


def _q_url_canonicalize(spark, sf):
    # F1/F2/F7/X2 over synthetic URLs derived deterministically from part:
    # exercises scheme-reject, canonicalization, binary-extension typing
    from webcrawler_spark.functions.urls import (
        canonicalize_url,
        is_binary_extension,
        is_rejected_scheme,
        url_host,
    )

    p = load(spark, sf, "part")
    exts = F.array(*[F.lit(x) for x in ["", ".pdf", ".jpg", ".txt", ".html", ".zip"]])
    url = F.concat(
        F.lit("http://h"),
        (F.col("p_partkey") % 50).cast("string"),
        F.lit(".gov.si/p"),
        F.col("p_partkey").cast("string"),
        F.element_at(exts, (F.col("p_partkey") % 6 + 1).cast("int")),
        F.when(F.col("p_partkey") % 7 == 0, F.lit("?q=1#frag")).otherwise(F.lit("")),
    )
    d = p.select(F.col("p_partkey").alias("id"), url.alias("raw_url"))
    return d.select(
        "id",
        canonicalize_url(F.col("raw_url")).alias("canon_url"),
        url_host(F.col("raw_url")).alias("host"),
        is_rejected_scheme(F.col("raw_url")).alias("rejected"),
        is_binary_extension(canonicalize_url(F.col("raw_url"))).alias("is_binary"),
    ).orderBy("id")


def _q_crawl_pages(spark, sf):
    # end-to-end BSP crawl on the synthetic webgraph — non-SQL (the oracle
    # is the reference-semantics simulator, asserted in tests/test_crawl.py);
    # here the driver records the final page-type census (sql_selects.sql:2-12)
    import shutil
    import tempfile

    from webcrawler_spark.crawl.engine import CrawlEngine, CrawlConfig
    from webcrawler_spark.sources.fixtures import SEED_URLS, make_webgraph

    # 10 hosts × base 6 × 16 rounds: small enough for the driver's budget,
    # rich enough that the census carries all four page types (HTML /
    # BINARY / DUPLICATE / FRONTIER) plus both page_data code branches
    # (PDF and the zip → null fall-through)
    wg, robots = make_webgraph(n_hosts=10, pages_per_host_base=6)
    root = tempfile.mkdtemp(prefix="crawl_q_")
    # micro-scale crawl: whole-stage codegen recompiles every sub-step
    # (literal clock changes) and dominates wall time — disable for the
    # duration; production-scale runs keep it on (bench.py)
    prev_cg = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        eng = CrawlEngine(
            spark,
            spark.createDataFrame(wg),
            spark.createDataFrame(robots),
            list(SEED_URLS),
            CrawlConfig(store_root=root, max_rounds=16, checkpoint_every=8,
                        collect_metrics=False),
        )
        eng.run()
        census = eng.pages_df().groupBy("page_type_code").agg(
            F.count("*").cast("long").alias("n_pages")
        )
        # fold in the page_data delta (one row per BINARY page, S6/X1):
        # 'DATA:<code>' rows census the binary payload types alongside the
        # page types ('DATA:' alone = code fell through the 5-way switch)
        pd_df = eng.page_data_df()
        if pd_df is not None:
            census = census.unionByName(
                pd_df.groupBy(
                    F.concat(
                        F.lit("DATA:"), F.coalesce("data_type_code", F.lit(""))
                    ).alias("page_type_code")
                ).agg(F.count("*").cast("long").alias("n_pages"))
            )
        # fold in the site table (one row per first-dequeued domain,
        # DatabaseHandler.java:21-47): rows with live robots content vs
        # null-content rows (robots missing / an HTML page)
        st = eng.sites_df()
        if st is not None:
            census = census.unionByName(
                st.groupBy(
                    F.when(F.col("robots_content").isNotNull(),
                           F.lit("SITE:robots"))
                    .otherwise(F.lit("SITE:bare")).alias("page_type_code")
                ).agg(F.count("*").cast("long").alias("n_pages"))
            )
        out = census.orderBy("page_type_code")
        # collect + rebuild (census-sized): localCheckpoint blocks are not
        # reliable once the store root is rmtree'd (see _q_graph_export)
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", prev_cg)
        shutil.rmtree(root, ignore_errors=True)


def _q_image_invariants(spark, sf):
    # X16 per-row invariant: decode/phash/PSNR over the graft images table
    from webcrawler_spark.multimodal import verify_invariants
    from webcrawler_spark.sources.fixtures import make_images

    imgs = spark.createDataFrame(make_images(64))
    out = verify_invariants(imgs)
    return out.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("shape_ok").cast("int")).cast("long").alias("n_shape_ok"),
        F.sum(F.col("phash_ok").cast("int")).cast("long").alias("n_phash_ok"),
        F.sum(F.col("quality_ok").cast("int")).cast("long").alias("n_quality_ok"),
    )


def _q_image_phash_neardup(spark, sf):
    # Multimodal dedup: banded Hamming≤3 near-dup over the input_hint
    # table's phash column, corpus = graft images + deterministic
    # quality-70 jpeg re-encodes (the classic near-dup population: same
    # content, different encode). 4×16-bit bands give EXACT recall at
    # k≤3 by pigeonhole; popcount-verify prunes candidates only.
    # Rows-only for the driver (DuckDB cannot decode images); the
    # brute-force all-pairs oracle equality lives in tests/test_images.py.
    import pandas as pd

    from webcrawler_spark.dedup import phash as _phash
    from webcrawler_spark.functions.images import (
        decode_image, encode_image, phash64)
    from webcrawler_spark.sources.fixtures import make_images, render_image

    pdf = make_images(64)[["image_id", "phash"]]
    variants = []
    for i in range(0, 64, 2):
        iid = f"img{i:010d}"
        pixels, _w, _h, _fmt, _cap = render_image(iid)
        data = encode_image(pixels, "jpeg", quality=70)
        variants.append(
            {"image_id": iid + "_v70", "phash": phash64(decode_image(data))}
        )
    imgs = spark.createDataFrame(
        pd.concat([pdf, pd.DataFrame(variants)], ignore_index=True)
    )
    return _phash.phash_near_duplicates(imgs).orderBy("a", "b")


def _q_image_caption_pairs(spark, sf):
    # A+B graft integration: X4 image+alt extraction over the synthetic
    # webgraph -> payload ingest keyed by crc32 image_id -> input_hint
    # pair table -> per-row invariant incl. EXACT caption equality
    # (multimodal/pairs.py; end-to-end-from-a-real-crawl in
    # tests/test_image_pairs.py — here the extraction stage runs on the
    # static pages table so the query is crawl-free and fast)
    from webcrawler_spark.multimodal.pairs import (
        assemble_pairs, caption_records, distinct_caption_keys,
        ingest_payloads, verify_pairs)
    from webcrawler_spark.sources.fixtures import make_webgraph

    wg, _robots = make_webgraph(n_hosts=6, pages_per_host_base=6)
    pages = spark.createDataFrame(wg[["url", "img_srcs", "img_alts"]])
    keys = distinct_caption_keys(caption_records(pages))
    pairs = assemble_pairs(keys, ingest_payloads(keys))
    return verify_pairs(pairs).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.col("shape_ok").cast("int")).cast("long").alias("n_shape_ok"),
        F.sum(F.col("phash_ok").cast("int")).cast("long").alias("n_phash_ok"),
        F.sum(F.col("quality_ok").cast("int")).cast("long").alias("n_quality_ok"),
        F.sum(F.col("caption_ok").cast("int")).cast("long").alias("n_caption_ok"),
    )


def _q_image_features(spark, sf):
    # multimodal feature extraction: grid color features → mean per format
    from webcrawler_spark.multimodal import grid_features
    from webcrawler_spark.sources.fixtures import make_images

    pdf = make_images(64)
    imgs = spark.createDataFrame(pdf)
    feats = grid_features(imgs, grid=4)
    joined = feats.join(imgs.select("image_id", "fmt"), "image_id")
    return (
        joined.select(
            "fmt", F.aggregate("features", F.lit(0.0), lambda a, x: a + x).alias("s")
        )
        .groupBy("fmt")
        .agg(F.count("*").cast("long").alias("n"), F.round(F.avg("s"), 4).alias("mean_feature_sum"))
        .orderBy("fmt")
    )


def _q_extraction_golden(spark, sf):
    # X8-X13/J6/S7: mode-B XPath extraction over the reference's committed
    # input-extraction corpus, long format; the oracle is the reference's
    # own 8 golden data_*.json files as a VALUES relation (ground truth
    # constants, not derived from our pipeline)
    from webcrawler_spark.extract import golden as G

    corpus = G.read_extraction_corpus(spark)
    return G.mode_b_rows(corpus).orderBy("site", "page", "item", "field", "idx")


def _q_extraction_mode_a(spark, sf):
    # X8/X9/J6: mode-A pure-Catalyst regex extraction with PROD_ID/alt
    # key-joins; oracle = the overstock golden-anchored subset (fields
    # where the reference's mode A and mode B agree, i.e. everything but
    # SavingPercent's parens — checked transformed)
    from webcrawler_spark.extract import golden as G

    corpus = G.read_extraction_corpus(spark)
    return (
        G.mode_a_rows(corpus)
        .filter((F.col("site") == "overstock.com") & (F.col("field") != "SavingPercent"))
        .orderBy("page", "item", "field")
        .select("page", "item", "field", "value")
    )


def _q_doc_summary(spark, sf):
    # the entry() flagship, parameterized by sf_dir (oracle-checked)
    from webcrawler_spark.functions.text import fingerprint64

    d = load(spark, sf, "documents")
    scored = d.select(
        "doc_id",
        fingerprint64(F.col("text")).alias("fingerprint"),
        token_count(F.col("text")).alias("n_tokens"),
        lang_id(F.col("text")).alias("lang_guess"),
        quality_score(F.col("text")).alias("quality"),
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        scored.withColumn("dup_rank", F.row_number().over(w))
        .withColumn("is_duplicate", F.col("dup_rank") > 1)
        .drop("dup_rank")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# training-corpus curation (webcrawler_spark/curation.py)
# ---------------------------------------------------------------------------

# downsample dominant English, downsample zh (separate tokenizer track),
# keep the rest — rates in basis points out of 10000
_CURATION_RATES = {"en": 5000, "zh": 2500}


def _curation_corpus(spark, sf):
    # funnel input: the documents table plus re-keyed clones of every 7th
    # doc (~12% duplication — the raw table has no exact dups, a real
    # crawl does; clone ids sit above 1e6 so first-writer keeps originals)
    d = load(spark, sf, "documents").select("doc_id", "text", "lang")
    clones = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text", "lang"
    )
    return d.unionByName(clones)


def _q_corpus_curation(spark, sf):
    # the full text-curation funnel in one aggregation pass:
    # raw -> exact-dedup (first-writer on the J5 fingerprint) ->
    # quality gate (>= 0.75) -> per-language stratified hash sampling;
    # per-stage doc + token counts
    from webcrawler_spark.curation import curation_funnel

    return curation_funnel(_curation_corpus(spark, sf), _CURATION_RATES)


def _q_train_split(spark, sf):
    # deterministic, append-stable train/val/test assignment over the
    # funnel survivors (salted portable-hash buckets; 5% val, 5% test)
    from webcrawler_spark.curation import train_split

    return train_split(_curation_corpus(spark, sf), _CURATION_RATES)


def _q_shard_plan(spark, sf):
    # training-writer chunk plan: pack the curated train/val/test corpus
    # into contiguous ~4096-token shards (one window shuffle; a doc lands
    # where its exclusive prefix sum starts, so shards never split docs)
    from webcrawler_spark.curation import pack_shards, train_split

    split = train_split(_curation_corpus(spark, sf), _CURATION_RATES)
    return (
        pack_shards(split, 4096)
        .select("doc_id", "split", "shard_id")
        .orderBy("doc_id")
    )


def _q_sequence_pack(spark, sf):
    # GPT-style packed-pretraining layout over the curated corpus:
    # documents concatenated per split and cut every 2048 tokens, one row
    # per (doc x overlapped sequence) span — the loader-facing twin of
    # shard_plan (which never splits docs). One windowed prefix sum + a
    # <=2-row explode per doc; no join, no state.
    from webcrawler_spark.curation import pack_sequences, train_split

    split = train_split(_curation_corpus(spark, sf), _CURATION_RATES)
    return (
        pack_sequences(split.select("doc_id", "split", "n_tokens"), 2048)
        .orderBy("doc_id", "seq_id")
    )


def _q_token_histogram(spark, sf):
    # sequence-length planning: docs + tokens per power-of-two token-count
    # bin (integer CASE boundaries — no float log2 edge cases)
    from webcrawler_spark.curation import token_histogram

    return token_histogram(load(spark, sf, "documents"))


def _q_bpe_pairs(spark, sf):
    # tokenizer-training counting primitive: adjacent char-pair
    # frequencies for BPE's first merge step, computed over the word
    # VOCABULARY with multiplicities (one hash agg folds the corpus to
    # vocab; the explode touches each distinct word once) — top-50 by
    # merge score via TakeOrderedAndProject, no global sort
    from webcrawler_spark.functions.bpe import bpe_pair_counts

    return bpe_pair_counts(load(spark, sf, "documents"))


def _q_length_quantiles(spark, sf):
    # exact per-language token-length quantiles read off the LENGTH
    # HISTOGRAM (groupBy(lang, len) first; the cumulative window sees at
    # most |distinct lengths| rows per lang, never the corpus) — integer
    # type-1 quantiles, so portable where interpolation/sketches are not
    from webcrawler_spark.curation import length_quantiles

    return length_quantiles(load(spark, sf, "documents"))


def _q_incremental_curation(spark, sf):
    # the STATEFUL multi-batch pipeline vs ONE pure-SQL oracle: ingest
    # documents + exact clones + near-dup twins in two id-ordered batches
    # through IncrementalCurator (persisted fingerprint index + MinHash-
    # LSH NearDupIndex, parquet-append carried state), union the
    # per-batch survivors. Chunking-invariance makes this equal the
    # pairwise-precedent batch curation, which DuckDB mirrors value-for-
    # value (same fingerprints, same minhash band keys, same exact-
    # Jaccard verify, same hash sampling/split). Collect+rebuild before
    # the state dir is removed.
    import shutil
    import tempfile

    from webcrawler_spark.curation import IncrementalCurator

    d = load(spark, sf, "documents").select("doc_id", "text", "lang")
    clones = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text", "lang")
    twins = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq ww ee rr")).alias("text"),
        "lang")
    root = tempfile.mkdtemp(prefix="inccur_")
    try:
        cur = IncrementalCurator(spark, root, _CURATION_RATES)
        out1 = cur.add_batch(d)
        out2 = cur.add_batch(clones.unionByName(twins))
        out = out1.unionByName(out2).orderBy("doc_id")
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_pair_curation(spark, sf):
    # the image+caption twin of the curation funnel over the input_hint
    # pair table: caption gate (the empty-alt images a crawl genuinely
    # yields), resolution gate (w*h >= 4096), banded-phash near-dup
    # keep-one. Corpus: 64 graft images + quality-70 jpeg re-encodes of
    # every 4th (the near-dup population) with every 5th caption blanked.
    # Rows-only for the driver (DuckDB cannot decode images); the
    # brute-force union-find oracle equality lives in tests/test_curation.py.
    import pandas as pd

    from webcrawler_spark.curation import pair_curation_funnel
    from webcrawler_spark.functions.images import (
        decode_image, encode_image, phash64)
    from webcrawler_spark.sources.fixtures import make_images, render_image

    pdf = make_images(64)
    variants = []
    for i in range(0, 64, 4):
        iid = f"img{i:010d}"
        pixels, w, h, _fmt, cap = render_image(iid)
        data = encode_image(pixels, "jpeg", quality=70)
        variants.append({
            "image_id": iid + "_v70", "bytes": data, "w": w, "h": h,
            "fmt": "jpeg", "caption": cap,
            "phash": phash64(decode_image(data)),
        })
    corpus = pd.concat([pdf, pd.DataFrame(variants)], ignore_index=True)
    corpus.loc[corpus.index % 5 == 0, "caption"] = ""
    return pair_curation_funnel(spark.createDataFrame(corpus))


def _synth_pair_meta(spark, sf):
    """input_hint pair-table METADATA synthesized deterministically from
    `documents` (no bytes — the curation gates only read w/h/caption/
    phash): caption null every 13th / one-token every 17th doc,
    resolution straddling the 4096-pixel gate, and phash built from a
    portable 60-bit hash of a group key (every 3rd doc shares one of 25
    groups; every 5th of those flips one low bit) so banded-Hamming<=3
    clusters are non-vacuous and bit-for-bit reproducible in DuckDB."""
    d = load(spark, sf, "documents")
    grouped = F.col("doc_id") % 3 == 0
    key = F.when(
        grouped, F.concat(F.lit("g"), (F.col("doc_id") % 25).cast("string"))
    ).otherwise(F.concat(F.lit("u"), F.col("doc_id").cast("string")))
    flip = F.when(
        grouped & (F.col("doc_id") % 5 == 0),
        # shiftleft with a COLUMN bit position needs the SQL form (the
        # Python helper only takes a literal int)
        F.expr("shiftleft(cast(1 as bigint), cast(doc_id % 62 as int))"),
    ).otherwise(F.lit(0).cast("long"))
    caption = (
        F.when(F.col("doc_id") % 13 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 17 == 0, F.lit("x"))
        .otherwise(F.substring("text", 1, 40))
    )
    from webcrawler_spark.functions.hashing import portable_hash64

    return d.select(
        F.col("doc_id").alias("image_id"),
        (F.lit(32) + F.col("doc_id") % 97).cast("int").alias("w"),
        (F.lit(32) + F.col("doc_id") % 53).cast("int").alias("h"),
        caption.alias("caption"),
        portable_hash64(key).bitwiseXOR(flip).alias("phash"),
    )


def _q_pair_curation_meta(spark, sf):
    # the pair-curation DECISION logic (caption gate, resolution gate,
    # banded-phash Hamming<=3 keep-one election) made fully oracle-
    # checkable: same pair_curation_flags as the bytes-real pipeline
    # above, over synthesized metadata DuckDB can reproduce exactly —
    # the SQL mirror rebuilds the banding, the popcount verify, and the
    # connected-components election as a recursive CTE
    from webcrawler_spark.curation import pair_curation_flags

    return pair_curation_flags(_synth_pair_meta(spark, sf)).orderBy("image_id")


def _q_cross_modal_topk(spark, sf):
    # caption-query → top-5 image retrieval by the stand-in alignment
    # score: queries are three corpus captions (doc_id 1, 2, 4 — non-null
    # by the synth rules), candidates the whole pair table; self-matches
    # excluded, ties to the smaller image_id
    from webcrawler_spark.multimodal.alignment import cross_modal_topk

    meta = _synth_pair_meta(spark, sf)
    queries = meta.filter(F.col("image_id").isin(1, 2, 4)).select(
        F.col("image_id").alias("query_id"), "caption"
    )
    return cross_modal_topk(meta, queries, k=5).orderBy("query_id", "rank")


def _q_image_quality(spark, sf):
    # decoded-pixel screening gates (blur via Laplacian variance, flat/
    # exposure/entropy) over the deterministic fixture corpus — rows-only
    # (no SQL oracle can decode pixels); semantics pinned by
    # tests/test_image_quality.py closed-form + numpy-twin cases
    from webcrawler_spark.multimodal.quality import image_quality_stats, quality_gates
    from webcrawler_spark.sources.fixtures import make_images

    imgs = spark.createDataFrame(make_images(64)[["image_id", "bytes"]])
    out = quality_gates(image_quality_stats(imgs)).select(
        "image_id",
        F.round("luma_mean", 4).alias("luma_mean"),
        F.round("luma_std", 4).alias("luma_std"),
        F.round("lap_var", 4).alias("lap_var"),
        F.round("entropy", 4).alias("entropy"),
        "is_flat", "is_blurry", "is_extreme", "keep",
    ).orderBy("image_id")
    return out


def _q_audio_quality(spark, sf):
    # REAL RIFF/WAVE PCM decode (pure-stdlib chunk walker — the one audio
    # container needing no codec library) + screening gates (duration /
    # RMS loudness / clip fraction / silence fraction) over a
    # deterministic synthesized WAV corpus mixing widths, channel counts
    # and degenerate kinds so every gate fires both ways — rows-only (no
    # SQL oracle can parse PCM); semantics pinned by tests/test_audio.py
    # against an independent stdlib-`wave` + numpy recompute twin
    from webcrawler_spark.multimodal.av import (
        synth_wav,
        wav_quality_gates,
        wav_quality_stats,
    )

    kinds = ["tone", "silence", "clipped", "noise"]
    clips = [
        (
            f"clip{i:03d}",
            synth_wav(
                i,
                seconds=0.05 if i % 16 == 9 else 0.3 + (i % 4) * 0.2,
                rate=8000 if i % 2 == 0 else 16000,
                channels=1 + (i % 3 == 2),
                bits=8 if i % 5 == 3 else 16,
                kind=kinds[i % 4],
            ),
        )
        for i in range(64)
    ]
    df = spark.createDataFrame(clips, "clip_id string, bytes binary")
    return (
        wav_quality_gates(wav_quality_stats(df))
        .orderBy("clip_id")
    )


def _q_audio_pairs(spark, sf):
    # the audio-axis pair funnel (speech/audio-caption ingest shape):
    # real PCM decode + screening gates → caption gate → repeated-
    # caption keep-LONGEST election (two-phase domain_cap on the 60-bit
    # caption fingerprint) — one row per input pair with every stage
    # decision; planted duplicate captions + degenerate clips keep every
    # stage non-vacuous. Rows-only (gates read decoded PCM); semantics
    # pinned by tests/test_audio.py
    from webcrawler_spark.multimodal.av import audio_pair_funnel, synth_wav

    kinds = ["tone", "noise", "silence", "tone"]
    clips = [
        (
            f"ac{i:03d}",
            synth_wav(i, seconds=0.3 + (i % 5) * 0.15,
                      kind=kinds[i % 4]),
            # every 4th caption empty; others repeat in groups of 3
            "" if i % 4 == 3 else f"spoken caption {i // 3}",
        )
        for i in range(48)
    ]
    df = spark.createDataFrame(
        clips, "clip_id string, bytes binary, caption string"
    )
    return audio_pair_funnel(df).orderBy("clip_id")


def _q_video_frames(spark, sf):
    # REAL uncompressed RIFF AVI decode (pure-stdlib chunk walker — DIB
    # frames, bottom-up/BGR/row-padding honored) + frame sampling with
    # per-frame mean luminance over a deterministic synthesized AVI
    # corpus (gray + RGB + the WCVI fake-codec stream mixed in) —
    # rows-only (no SQL oracle can parse DIB); semantics pinned by
    # tests/test_video.py (hand-built golden byte layout + luma twin)
    from webcrawler_spark.multimodal.av import (
        sample_frames,
        synth_avi,
        synth_video,
    )

    clips = [
        (f"vid{i:03d}",
         synth_video(i) if i % 3 == 2
         else synth_avi(i, frames=8, rgb=(i % 2 == 1)))
        for i in range(24)
    ]
    df = spark.createDataFrame(clips, "video_id string, bytes binary")
    return sample_frames(df, every_n=4).orderBy("video_id", "frame_idx")


def _wds_synth_pairs(spark, sf):
    """Non-null-caption synth pairs with a deterministic SQL-computable
    image byte length (54-byte-header 24-bit raw bitmap: 54 + 3*w*h) —
    the WDS oracle needs lengths only; the bytes-real writer path is
    pinned by tests/test_webdataset.py over WCIM-encoded images."""
    return (
        _synth_pair_meta(spark, sf)
        .filter(F.col("caption").isNotNull())
        .withColumn(
            "img_len",
            (F.lit(54).cast("long") + 3 * F.col("w").cast("long") * F.col("h")),
        )
    )


_WDS_BUDGET = 1 << 18  # 256 KiB payload per shard at fixture scale


def _q_wds_plan(spark, sf):
    # training-export shard plan (WebDataset tar layout) over the pair
    # table: EXACT ustar size model (two 512 B member headers + payloads
    # block-padded), contiguous fill in image_id order via the two-level
    # prefix scan (per-bucket ROWS window + one bucket-count-sized stitch
    # window — no global single-reducer window at 10^10 pairs)
    from webcrawler_spark.multimodal.webdataset import plan_wds_shards

    planned = plan_wds_shards(
        _wds_synth_pairs(spark, sf),
        budget_bytes=_WDS_BUDGET,
        bucket=F.expr("image_id div 64"),
        img_len=F.col("img_len"),
        cap_len=F.octet_length("caption"),
    )
    return planned.select("image_id", "entry_bytes", "shard_id").orderBy(
        "image_id"
    )


def _q_wds_manifest(spark, sf):
    # the export ACTUALLY RUNS: one deterministic USTAR tar per shard
    # (mtime=0, key-ordered members, atomic rename), manifest sizes
    # MEASURED from the written files — and the DuckDB oracle predicts
    # every on-disk tar_bytes to the byte from the same size model.
    # Collect+rebuild before the tempdir is removed (graph_export rule).
    import shutil
    import tempfile

    from webcrawler_spark.multimodal.webdataset import (
        plan_wds_shards,
        write_webdataset,
    )

    pairs = _wds_synth_pairs(spark, sf).withColumn(
        "bytes", F.expr("cast(repeat('a', cast(img_len as int)) as binary)")
    )
    planned = plan_wds_shards(
        pairs, budget_bytes=_WDS_BUDGET, bucket=F.expr("image_id div 64")
    )
    d = tempfile.mkdtemp(prefix="wds_driver_")
    try:
        man = (
            write_webdataset(planned, d, fmt_col=None)
            .select("shard_id", "n_samples", "payload_bytes", "tar_bytes")
            .orderBy("shard_id")
        )
        return spark.createDataFrame(man.collect(), schema=man.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _q_patch_pack(spark, sf):
    # NaViT-style native-aspect packing: per-image ceil(w/16)*ceil(h/16)
    # patch tokens, variable-resolution images packed into ~40-token
    # sequences by the contiguous-fill rule within salted shards (no
    # single-reducer window); oversize images carry fits=false + NULL
    # plan. Budget 40 < the synth max grid (8*6=48) so the gate is
    # non-vacuous.
    from webcrawler_spark.multimodal.bucketing import patch_pack

    return patch_pack(
        _synth_pair_meta(spark, sf), patch=16, token_budget=40, shards=4
    ).orderBy("image_id")


def _q_pair_alignment(spark, sf):
    # image-caption alignment gate (the CLIP-score filter of LAION-style
    # curation) with deterministic hash-projection encoders — the swap
    # point for a real model is multimodal/alignment.py's *_embed pair;
    # the gate itself is pure narrow Catalyst (no shuffle, no UDF), so at
    # 10^10 pairs it fuses into the scan's codegen span
    from webcrawler_spark.multimodal.alignment import pair_alignment

    return pair_alignment(_synth_pair_meta(spark, sf)).orderBy("image_id")


def _q_pair_funnel(spark, sf):
    # the COMPOSED pair pipeline — alignment gate → caption/resolution
    # gates + banded-phash keep-one → caption dedup → aspect bucketing +
    # batch packing — one row per input pair with every stage decision
    # and the batch plan; the oracle mirrors the WHOLE composition, so
    # stage interactions (survivor sets feeding the next stage) are
    # verified end to end, not just each stage alone
    from webcrawler_spark.multimodal.funnel import pair_funnel

    # pin the synthesized metadata once: the funnel reads its input from
    # two branches (gate flags + alignment scores), and the md5-based
    # hash synthesis is the costlier half of the first materialization
    pairs = _synth_pair_meta(spark, sf).localCheckpoint(eager=True)
    # pagerank's cache-lifecycle pattern (__spark_entry__._q_pagerank):
    # sever the result with an executor-resident checkpoint, then drop
    # the funnel's two internal persists so nothing stays CacheManager-
    # pinned across the bench session's 50+ queries
    reg: list = []
    out = (
        pair_funnel(pairs, cache_registry=reg)
        .orderBy("image_id")
        .localCheckpoint(eager=True)
    )
    for cached in reg:
        cached.unpersist()
    return out


def _q_aspect_batches(spark, sf):
    # aspect-ratio bucketed batch packing over the input_hint pair table:
    # narrow array_min argmin onto the SDXL bucket menu, then batches
    # packed within (bucket_id, shard) so packing parallelism is
    # buckets*shards instead of ~9 single-task sorts at 10^10 rows
    from webcrawler_spark.multimodal.bucketing import aspect_bucket_batches

    return aspect_bucket_batches(
        _synth_pair_meta(spark, sf).select("image_id", "w", "h"),
        batch_size=8,
        shards=4,
    ).orderBy("image_id")


def _q_domain_cap(spark, sf):
    # per-domain diversity cap (RefinedWeb-style): top-8 docs by portable
    # quality per domain, with a synthesized hot domain (every 3rd doc)
    # so the two-phase skew path is exercised, not just the window
    from webcrawler_spark.curation import domain_cap
    from webcrawler_spark.functions.text import quality_score

    d = load(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("hot"))
        .otherwise(F.col("source"))
        .alias("domain"),
        quality_score(F.col("text")).alias("quality"),
    )
    return domain_cap(d, 8).orderBy("domain", "domain_rank")


def _domain_mixture_corpus(spark, sf):
    # skewed-domain view of documents: 3/4 of docs collapse into one hot
    # domain (the Zipf head a raw crawl has), the rest keep their source
    # — temperature flattening is non-vacuous only on a skewed mixture
    return load(spark, sf, "documents").select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 4 != 0, F.lit("hot.example"))
        .otherwise(F.col("source"))
        .alias("domain"),
    )


_DOMAIN_MIXTURE_DUCKDB = (
    "(SELECT doc_id, text, CASE WHEN doc_id % 4 <> 0 THEN 'hot.example' "
    "ELSE source END AS domain FROM documents)"
)


def _q_domain_mixture(spark, sf):
    # Pile/DoReMi-shaped mixture plan: per-domain token shares flattened
    # by a temperature-0.5 weight (floor(sqrt(tokens)) — engine-portable
    # where pow() is not), a half-corpus token budget split by weight,
    # and the per-domain sampling rate that realizes it. One map-side-
    # combining groupBy; the totals join is a 1-row broadcast.
    from webcrawler_spark.mixture import domain_mixture_plan

    return domain_mixture_plan(_domain_mixture_corpus(spark, sf))


def _q_mixture_sample(spark, sf):
    # the realized mixture: apply each domain's rate_bp with the salted
    # portable-hash bucket (append-stable, order-free) and census what
    # actually survived per domain — the check that the plan's rates do
    # flatten the hot domain toward its temperature-weighted target
    from webcrawler_spark.mixture import mixture_sample

    return mixture_sample(_domain_mixture_corpus(spark, sf))


def _q_url_gates(spark, sf):
    # FineWeb-style URL quality gates over a deterministically derived
    # URL corpus (documents carry no URL; trap shapes planted by doc_id
    # residue): length cap, digit-heavy slug, path depth, session-id
    # params, blocklist terms, repeated-segment crawler loop. All narrow
    # string predicates — a pushdown-friendly frontier filter at scale.
    from webcrawler_spark.functions.url_gates import (
        synthetic_urls,
        url_gate_flags,
    )

    urls = synthetic_urls(load(spark, sf, "documents"))
    return url_gate_flags(urls).orderBy("doc_id")


def _q_pagerank(spark, sf):
    # link-graph analytics the reference exports its edge CSV for
    # (sql_selects.sql:19-21), run natively: 5 fixed-point-INTEGER
    # PageRank iterations over a deterministic synthetic webgraph (two
    # pseudo-random out-links per page + a hub edge to node 0). Integer
    # mass out of 10^12 makes the result order-independent and therefore
    # engine-portable — float PageRank is not value-reproducible under
    # distributed summation. The only driver-side value is the node
    # count (one scalar, needed to size the teleport mass).
    from webcrawler_spark.graph import pagerank, synthetic_links

    docs = load(spark, sf, "documents")
    n = docs.count()
    nodes = docs.select(F.col("doc_id").alias("node"))
    reg: list = []
    ranks = pagerank(nodes, synthetic_links(docs, n), n, cache_registry=reg)
    # sever the plan with an executor-resident checkpoint, then drop the
    # iteration cache: the returned frame no longer references it, and
    # localCheckpoint blocks are ContextCleaner-collected once the driver
    # drops the frame — unlike a persist(), which the CacheManager pins
    # for the session (bench runs 50+ queries in one session)
    out = ranks.orderBy("node").localCheckpoint(eager=True)
    for cached in reg:
        cached.unpersist()
    return out


def _q_cocitation(spark, sf):
    # co-citation counts over the same synthetic webgraph: unordered page
    # pairs cited together by >= 2 common sources, each source's
    # contribution capped at its 64 smallest-dst edges first (the hub-cap
    # that stops one 10^5-out-link page emitting 5*10^9 pairs at scale)
    from webcrawler_spark.graph import cocitation, synthetic_links

    docs = load(spark, sf, "documents")
    return cocitation(synthetic_links(docs, docs.count()))


def _q_resize_plan(spark, sf):
    # cover-resize + center-crop parameters onto each image's aspect
    # bucket — the narrow, UDF-free plan the Arrow decode stage consumes
    from webcrawler_spark.multimodal.bucketing import resize_plan

    return resize_plan(
        _synth_pair_meta(spark, sf).select("image_id", "w", "h")
    ).orderBy("image_id")


def _q_caption_dedup(spark, sf):
    # cross-modal caption dedup over a synthesized pair table whose
    # captions actually repeat (7 "stock photo" groups, every 5th doc)
    # and go null (every 13th) — keep-best-resolution, fp-keyed
    from webcrawler_spark.curation import caption_dedup

    d = load(spark, sf, "documents")
    cap = (
        F.when(F.col("doc_id") % 13 == 0, F.lit(None).cast("string"))
        .when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("stock photo of a product "),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .otherwise(F.substring("text", 1, 40))
    )
    pairs = d.select(
        F.col("doc_id").alias("image_id"),
        (F.lit(32) + F.col("doc_id") % 97).cast("int").alias("w"),
        (F.lit(32) + F.col("doc_id") % 53).cast("int").alias("h"),
        cap.alias("caption"),
    )
    return caption_dedup(pairs).orderBy("image_id")


def _q_gopher_quality(spark, sf):
    # Gopher-style quality gating (Rae et al. 2021 §A1.1) over the derived
    # multi-line page corpus; every signal 6-dp-rounded before
    # thresholding so the keep decision is bit-portable to the oracle
    from webcrawler_spark.functions.gopher import gopher_signals
    from webcrawler_spark.sources.pages import synthetic_pages

    d = load(spark, sf, "documents")
    return gopher_signals(synthetic_pages(d)).orderBy("page_id")


def _q_collocations(spark, sf):
    # phrase-mining primitive: top-50 bigrams by association lift over
    # documents; count-ratio score (exp PMI) keeps it libm-free portable
    from webcrawler_spark.functions.collocations import collocations

    return collocations(load(spark, sf, "documents"))


def _q_repetition_signals(spark, sf):
    # Gopher §A1.2 repetition family over the same derived page corpus:
    # top-{2,3,4}-gram and dup-{5..10}-gram char fractions + dup-line
    # char fraction, one shared explode + hash-keyed aggregates
    from webcrawler_spark.functions.repetition import repetition_signals
    from webcrawler_spark.sources.pages import synthetic_pages

    d = load(spark, sf, "documents")
    return repetition_signals(synthetic_pages(d)).orderBy("page_id")


def _q_line_dedup(spark, sf):
    # C4-style cross-corpus line dedup (Raffel et al. 2020 §2.2): strip
    # lines recurring on >= 3 pages (the injected header/footer/nav
    # boilerplate), preserving remaining line order exactly
    from webcrawler_spark.dedup.lines import line_dedup
    from webcrawler_spark.sources.pages import synthetic_pages

    d = load(spark, sf, "documents")
    return line_dedup(synthetic_pages(d)).orderBy("page_id")


def _q_decontaminate(spark, sf):
    # GPT-3-style eval-set decontamination (Brown et al. 2020 app. C):
    # docs with doc_id % 97 == 0 form the held-out eval set; every
    # (doc_id % 10 == 3) corpus doc gets one eval text appended so the
    # flagged set is non-vacuous and deterministic at every sf
    from webcrawler_spark.dedup.decontaminate import decontaminate

    d = load(spark, sf, "documents").select("doc_id", "text")
    ev = d.filter(F.col("doc_id") % 97 == 0)
    inj = ev.select(
        (F.col("doc_id") / 97).cast("long").alias("k"), F.col("text").alias("etext")
    )
    corpus = (
        d.filter(F.col("doc_id") % 97 != 0)
        .withColumn("k", (F.col("doc_id") % 3).cast("long"))
        .join(F.broadcast(inj), "k", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 10 == 3) & F.col("etext").isNotNull(),
                F.concat(F.col("text"), F.lit(" "), F.col("etext")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return decontaminate(corpus, ev).orderBy("doc_id")


def _q_pii_redact(spark, sf):
    # PII scrub (RefinedWeb/Dolma-style): the word-soup corpus carries no
    # real PII, so deterministic emails / E.164 phones / IPv4s are
    # injected on doc_id % 7 residues (2, 4, 6) before redaction —
    # identically in the DuckDB oracle — keeping the counts non-vacuous
    from webcrawler_spark.functions.pii import redact_pii

    d = load(spark, sf, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 7 == 2,
                F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")),
            )
            .when(
                did % 7 == 4,
                F.concat(F.lit(" call +386"), (did + 1000000).cast("string"), F.lit(" today")),
            )
            .when(
                did % 7 == 6,
                F.concat(F.lit(" from 10.0."), (did % 256).cast("string"), F.lit(".25 logged")),
            )
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(injected).orderBy("doc_id")


_SPAN_ALPHA = (
    "shared boilerplate segment alpha with exactly twelve repeated filler"
    " tokens trailing here"
)
_SPAN_BETA = "common navigation footer beta block carrying ten duplicate filler tokens"


def _q_span_dedup(spark, sf):
    # exact-substring span dedup (Lee et al. 2022): the word-soup corpus
    # has no natural k-token repeats, so two fixed boilerplate sentences
    # are appended on doc_id % 5 == 0 / % 7 == 2 residues — identically
    # in the DuckDB oracle — giving every non-first occurrence a span to
    # lose while the min-(doc_id,pos) occurrence keeps its copy
    from webcrawler_spark.dedup.spans import span_dedup

    d = load(spark, sf, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 5 == 0, F.lit(" " + _SPAN_ALPHA)).otherwise(F.lit("")),
            F.when(did % 7 == 2, F.lit(" " + _SPAN_BETA)).otherwise(F.lit("")),
        ).alias("text"),
    )
    return span_dedup(injected)


def _q_dsir_weights(spark, sf):
    # DSIR (Xie et al. 2023): hashed unigram+bigram importance ratio
    # ln(p_target/p_raw) per doc, target = the corpus's English slice —
    # the bounded-model (n_buckets rows, broadcast) selection pass
    from webcrawler_spark.functions.dsir import dsir_weights

    d = load(spark, sf, "documents").select("doc_id", "text", "lang")
    return dsir_weights(
        d.select("doc_id", "text"),
        d.filter(F.col("lang") == "en").select("doc_id", "text"),
    ).orderBy("doc_id")


def _q_lm_quality(spark, sf):
    # CCNet-style mean unigram log-prob under a model estimated from the
    # corpus itself; hash-keyed model join, 6-dp rounding before the mean
    from webcrawler_spark.functions.lm import unigram_scores

    d = load(spark, sf, "documents").select("doc_id", "text")
    return unigram_scores(d).orderBy("doc_id")


def _q_bpe_merges(spark, sf):
    # the BPE merge LOOP (Sennrich 2016 §3): 12 rounds of top-pair ->
    # greedy left-to-right rewrite over the weighted vocab; state carried
    # between rounds is vocab-sized (persist-per-round like pagerank),
    # the rewrite is a narrow Catalyst fold (no shuffle, no Python)
    from webcrawler_spark.functions.bpe import bpe_merges

    return bpe_merges(load(spark, sf, "documents"), n_merges=12)


def _q_bpe_segment(spark, sf):
    # the ENCODE half of the tokenizer: segment the distinct-word vocab
    # with the learned merges (never corpus-sized data) — top-100 words
    # with their BPE segmentations after 12 merges
    from webcrawler_spark.functions.bpe import bpe_segment

    return bpe_segment(load(spark, sf, "documents"), n_merges=12, k=100)


def _q_bpe_encode(spark, sf):
    # the full corpus encode under the trained merges: segmented-vocab
    # broadcast join back to every token — per-doc BPE token counts plus
    # the first-8 symbol ids (ids = lexicographic rank in the ≤|alphabet|
    # + n_merges symbol inventory). Proves the vocab-join encode claim
    # end to end, with a conservation test (segment chars = word chars)
    # in tests/test_bpe_model_quality.py.
    from webcrawler_spark.functions.bpe import bpe_encode

    return bpe_encode(
        load(spark, sf, "documents"), n_merges=12, first_k=8
    ).orderBy("doc_id")


def _q_model_quality(spark, sf):
    # fastText-shaped learned quality filter: hashed unigram+bigram
    # features (same hasher as DSIR) x a broadcast weight vector; gate on
    # the logit (sigmoid is monotone -> no cross-engine exp). The weight
    # vector is the documented model seam; fixture LCG weights here.
    from webcrawler_spark.functions.model_quality import model_quality_scores

    d = load(spark, sf, "documents").select("doc_id", "text")
    return model_quality_scores(d).orderBy("doc_id")


def _trained_labels(spark, sf):
    # weak-supervision labels from the stack's OWN gates (the GPT-3
    # WebText-discriminator / CCNet-fastText pattern): positive = the
    # doc's derived page passes the Gopher gates AND the doc passes the
    # CCNet-style LM-quality gate; negative = the complement. 78.6%
    # positive at sf0.01 — non-vacuous both ways.
    from webcrawler_spark.functions.gopher import gopher_signals
    from webcrawler_spark.functions.lm import unigram_scores
    from webcrawler_spark.sources.pages import N_PAGES, synthetic_pages

    docs = load(spark, sf, "documents")
    d = docs.select("doc_id", "text")
    g = gopher_signals(synthetic_pages(docs)).select("page_id", "keep_gopher")
    lm = unigram_scores(d).select("doc_id", "keep_lm")
    return (
        d.select("doc_id")
        .join(lm, "doc_id")
        .withColumn("page_id", (F.col("doc_id") % N_PAGES).cast("int"))
        .join(g, "page_id")
        .select(
            "doc_id",
            (F.col("keep_gopher") & F.col("keep_lm")).cast("int").alias("y"),
        )
    )


def _q_model_quality_trained(spark, sf):
    # the CLOSED model seam: train the fastText-shaped filter in-Spark on
    # the weak labels above (N full-batch gradient rounds, each one
    # broadcast join + one map-combined aggregate + one aggregate-sized
    # collect — the pagerank/bpe bounded-loop shape), then score the
    # corpus through the UNCHANGED model_quality_scores seam. The oracle
    # replays the entire training loop as an unrolled CTE chain, so the
    # driver verifies training, not just scoring.
    from webcrawler_spark.functions.model_quality import (
        model_quality_scores,
        train_quality_model,
    )

    d = load(spark, sf, "documents").select("doc_id", "text")
    weights, bias = train_quality_model(d, _trained_labels(spark, sf))
    return model_quality_scores(d, weights=weights, bias=bias).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the round driver checks the FIRST 50 entries only
    # (CORRECTNESS_r01/02/03/04 = 27/33/50/50 rows). ROTATION POLICY
    # (round-4 review order #8): the window rotates so every SQL query
    # refreshes a driver-green row at least every other round —
    # CORRECTNESS_r05 ∪ r04 covers all of them. This round the window
    # holds: (a) the round-5 additions and behavior-changed queries,
    # (b) the 22 early-round entries r04 parked behind the window,
    # (c) the iterative/flagship mid-band. Entries parked behind the
    # window THIS round were all driver-green in CORRECTNESS_r04 and
    # stay covered every run by tools/check_contract.py + pytest.
    return {
        # --- round-5 additions + behavior-changed queries ---
        "model_quality_trained": _q_model_quality_trained,
        "bpe_encode": _q_bpe_encode,
        "ivf_topk": _q_ivf_topk,          # k-means-trained this round
        "pair_funnel": _q_pair_funnel,    # cache-lifecycle change
        "audio_quality": _q_audio_quality,  # rows-only (PCM decode)
        # --- rotated back in: the 22 entries r04 parked past the window ---
        "incremental_curation": _q_incremental_curation,
        "doc_summary": _q_doc_summary,
        "counts_by_type": _q_counts_by_type,
        "recent_events": _q_recent_events,
        "link_join": _q_link_join,
        "anti_join_unseen": _q_anti_join,
        "semi_join_terms": _q_semi_join,
        "frontier_pick": _q_frontier_pick,
        "top_duplicated": _q_top_duplicated,
        "token_counts": _q_tokens,
        "lang_quality": _q_lang_quality,
        "doc_fingerprint": _q_fingerprint,
        "postings": _q_postings,
        "max_freq_word": _q_max_freq_word,
        "page_data_types": _q_page_data_types,
        "graph_export": _q_graph_export,
        "vocabulary": _q_vocabulary,
        "tumbling_counts": _q_tumbling,
        "sessionize": _q_sessionize,
        "url_canonicalize": _q_url_canonicalize,
        "token_histogram": _q_token_histogram,
        "length_quantiles": _q_length_quantiles,
        # --- iterative/flagship mid-band ---
        "bpe_merges": _q_bpe_merges,
        "bpe_segment": _q_bpe_segment,
        "model_quality": _q_model_quality,
        "pagerank": _q_pagerank,
        "cocitation": _q_cocitation,
        "wds_plan": _q_wds_plan,
        "wds_manifest": _q_wds_manifest,
        "patch_pack": _q_patch_pack,
        "first_writer_dedup": _q_first_writer_dedup,
        "pricing_summary": _q_tpch_q1,
        "search_scores": _q_search,
        "bm25": _q_bm25,
        "minhash_signatures": _q_minhash_signatures,
        "simhash": _q_simhash,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_survivors": _q_dedup_survivors,
        "embedding_neardup_pairs": _q_embedding_neardup,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        "semantic_dedup": _q_semantic_dedup,
        "ann_topk": _q_ann_topk,
        "incremental_ann": _q_incremental_ann,
        "extraction_golden": _q_extraction_golden,
        # ------- driver's 50-row CORRECTNESS window ends here -------
        # --- parked this round (ALL driver-green in CORRECTNESS_r04;
        #     re-proven every run by tools/check_contract.py + pytest) ---
        "gopher_quality": _q_gopher_quality,
        "repetition_signals": _q_repetition_signals,
        "collocations": _q_collocations,
        "line_dedup": _q_line_dedup,
        "span_dedup": _q_span_dedup,
        "decontaminate": _q_decontaminate,
        "pii_redact": _q_pii_redact,
        "lm_quality": _q_lm_quality,
        "dsir_weights": _q_dsir_weights,
        "domain_cap": _q_domain_cap,
        "domain_mixture": _q_domain_mixture,
        "mixture_sample": _q_mixture_sample,
        "url_gates": _q_url_gates,
        "caption_dedup": _q_caption_dedup,
        "resize_plan": _q_resize_plan,
        "aspect_batches": _q_aspect_batches,
        "pair_curation_meta": _q_pair_curation_meta,
        "pair_alignment": _q_pair_alignment,
        "cross_modal_topk": _q_cross_modal_topk,
        "extraction_mode_a": _q_extraction_mode_a,
        "corpus_curation": _q_corpus_curation,
        "train_split": _q_train_split,
        "shard_plan": _q_shard_plan,
        "sequence_pack": _q_sequence_pack,
        "bpe_pairs": _q_bpe_pairs,
        # --- by-design rows-only (bytes/crawl pipelines; no SQL oracle,
        #     each anchored by pytest invariants instead) ---
        "crawl_pages": _q_crawl_pages,
        "image_invariants": _q_image_invariants,
        "image_features": _q_image_features,
        "image_caption_pairs": _q_image_caption_pairs,
        "image_phash_neardup": _q_image_phash_neardup,
        "image_quality": _q_image_quality,
        "video_frames": _q_video_frames,
        "audio_pairs": _q_audio_pairs,
        "pair_curation": _q_pair_curation,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

from webcrawler_spark.curation import (  # noqa: E402
    assign_split_duckdb as _assign_split_duckdb,
    hash_bucket_duckdb as _hash_bucket_duckdb,
    pack_shards_duckdb_expr as _pack_shards_duckdb,
    pack_sequences_duckdb_sql as _pack_sequences_duckdb,
    pow2_bin_duckdb as _pow2_bin_duckdb,
    rate_expr_duckdb as _rate_expr_duckdb,
)
from webcrawler_spark import curation as _curation  # noqa: E402
from webcrawler_spark import mixture as _mixture  # noqa: E402
from webcrawler_spark.dedup import decontaminate as _decon  # noqa: E402
from webcrawler_spark.dedup import lines as _lines  # noqa: E402
from webcrawler_spark.functions import bpe as _bpe  # noqa: E402
from webcrawler_spark.functions import gopher as _gopher  # noqa: E402
from webcrawler_spark.functions import repetition as _repetition  # noqa: E402
from webcrawler_spark.functions import collocations as _collocations  # noqa: E402
from webcrawler_spark.functions import dsir as _dsir  # noqa: E402
from webcrawler_spark.functions import lm as _lm  # noqa: E402
from webcrawler_spark.functions import model_quality as _model_quality  # noqa: E402
from webcrawler_spark.functions import pii as _pii  # noqa: E402
from webcrawler_spark.index import bm25 as _bm25  # noqa: E402
from webcrawler_spark.similarity import ann as _ann  # noqa: E402
from webcrawler_spark.sources import pages as _pages  # noqa: E402

# same deterministic PII injection as _q_pii_redact, in DuckDB
_PII_CORPUS_CTE = """
    SELECT doc_id,
           text || CASE
               WHEN doc_id % 7 = 2
                   THEN ' contact user' || doc_id::VARCHAR || '@example.com now'
               WHEN doc_id % 7 = 4
                   THEN ' call +386' || (doc_id + 1000000)::VARCHAR || ' today'
               WHEN doc_id % 7 = 6
                   THEN ' from 10.0.' || (doc_id % 256)::VARCHAR || '.25 logged'
               ELSE '' END AS text
    FROM documents
"""


# DuckDB twin of functions.text.quality_score (same arithmetic as the
# doc_summary/lang_quality oracles; expects columns text and t in scope)
_DUCK_QUALITY = """round((
                least(length(text) / 500.0, 1.0)
                + CASE WHEN length(text) > 0
                       THEN length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) * 1.0 / length(text)
                       ELSE 0.0 END
                + CASE WHEN len(t) > 0
                            AND (list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t)) BETWEEN 3 AND 12
                       THEN 1.0 ELSE 0.5 END
            ) / 3.0, 6)"""


def _curation_oracle_ctes() -> str:
    """Shared CTE chain mirroring curation_flags over the cloned corpus
    (see _curation_corpus): value-exact twins of fingerprint64,
    token_count, quality_score, the first-writer window, and the salted
    hash-bucket sampling decision."""
    toks = _DUCK_TOKS.format(col="text")
    quality = _DUCK_QUALITY
    bucket = _hash_bucket_duckdb("doc_id", "sample")
    rate = _rate_expr_duckdb("lang", _CURATION_RATES, 10000)
    return f"""corpus AS (
                SELECT doc_id, text, lang FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text, lang
                FROM documents WHERE doc_id % 7 = 0
            ),
            t AS (SELECT doc_id, lang, text, {toks} AS t FROM corpus),
            s AS (SELECT doc_id, lang, {_DUCK_FP} AS fp,
                         len(t)::INT AS n_tokens, {quality} AS quality
                  FROM t),
            f AS (SELECT *, (row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1) AS keep_dedup
                  FROM s),
            k AS (SELECT *,
                         keep_dedup AND quality >= 0.75 AS keep_quality,
                         keep_dedup AND quality >= 0.75 AND ({bucket} < {rate}) AS keep_sampled
                  FROM f)"""


def _incremental_ann_oracle() -> str:
    """Pure-SQL mirror of _q_incremental_ann's FINAL answer: sign-LSH
    top-5 over the whole corpus (chunked ingest ≡ one-shot by the pure
    per-row signature), asymmetric Hamming-1 probing on the query side,
    exact rounded cosine, ties broken by neighbor id."""
    from webcrawler_spark.dedup.embedding import (
        LSH_PLANES, sign_signature_duckdb)

    sig = sign_signature_duckdb(64, qv_expr="qv")
    probes = ", ".join(
        ["sig"] + [f"xor(sig, {1 << i})" for i in range(LSH_PLANES)])
    return f"""
        WITH v AS (
            SELECT vec_id::BIGINT AS id,
                   list_transform(embedding, x -> x::DOUBLE) AS v,
                   list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS qv
            FROM embeddings
        ), s AS (
            SELECT id, v, {sig} AS sig FROM v
        ), q AS (
            SELECT id AS query_id, v AS qvec,
                   unnest([{probes}]) AS bucket
            FROM s WHERE id < 3
        ), cand AS (
            SELECT DISTINCT p.query_id, c.id AS neighbor_id
            FROM q p JOIN s c ON c.sig = p.bucket AND c.id <> p.query_id
        ), scored AS (
            SELECT cd.query_id, cd.neighbor_id,
                   round(list_dot_product(x.v, y.v) /
                         (sqrt(list_dot_product(x.v, x.v)) *
                          sqrt(list_dot_product(y.v, y.v))), 6) AS cos
            FROM cand cd
            JOIN s x ON x.id = cd.query_id
            JOIN s y ON y.id = cd.neighbor_id
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC
            ) AS rank FROM scored
        )
        SELECT query_id, neighbor_id, cos, rank::INT AS rank
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """


def _pair_curation_meta_oracle() -> str:
    """Pure-SQL mirror of _q_pair_curation_meta: the synthesized metadata
    table, the caption/resolution gates, the 4x16-bit phash banding +
    popcount verify (bit semantics proven identical: arithmetic >> then
    mask, two's-complement bit_count), and the keep-one election as a
    recursive min-label CTE (same pattern as dedup/cluster.py's oracle)."""
    base_key = (
        "(CASE WHEN doc_id % 3 = 0 THEN 'g' || (doc_id % 25)::VARCHAR "
        "ELSE 'u' || doc_id::VARCHAR END)"
    )
    ph_base = PORTABLE_HASH64_DUCKDB.format(col=base_key)
    toks_cap = _DUCK_TOKS.format(col="caption")
    return f"""
        WITH RECURSIVE synth AS (
            SELECT doc_id AS image_id,
                   (32 + (doc_id % 97))::INT AS w,
                   (32 + (doc_id % 53))::INT AS h,
                   CASE WHEN doc_id % 13 = 0 THEN NULL
                        WHEN doc_id % 17 = 0 THEN 'x'
                        ELSE substring(text, 1, 40) END AS caption,
                   xor({ph_base},
                       CASE WHEN doc_id % 3 = 0 AND doc_id % 5 = 0
                            THEN (1::BIGINT << (doc_id % 62)::INT)
                            ELSE 0::BIGINT END) AS phash
            FROM documents
        ),
        gated AS (
            SELECT image_id, w, h, phash,
                   coalesce(caption IS NOT NULL
                            AND len({toks_cap}) >= 2, FALSE) AS caption_ok,
                   coalesce(caption IS NOT NULL AND len({toks_cap}) >= 2,
                            FALSE) AND w * h >= 4096 AS gate_ok
            FROM synth
        ),
        banded AS (
            SELECT image_id, phash, b.band,
                   ((phash >> (b.band * 16)) & 65535) AS key
            FROM gated, (SELECT unnest([0, 1, 2, 3]) AS band) b
            WHERE gate_ok
        ),
        pairs AS (
            SELECT DISTINCT l.image_id AS a, r.image_id AS b
            FROM banded l
            JOIN banded r ON l.band = r.band AND l.key = r.key
                         AND l.image_id < r.image_id
            WHERE bit_count(xor(l.phash, r.phash)) <= 3
        ),
        nodes AS (SELECT a AS n FROM pairs UNION SELECT b FROM pairs),
        edges AS (SELECT a AS u, b AS v FROM pairs
                  UNION SELECT b, a FROM pairs),
        reach(node, label) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
        ),
        lab AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node)
        SELECT g.image_id, g.caption_ok, g.gate_ok,
               g.gate_ok AND coalesce(l.node = l.cluster_id, TRUE) AS keep
        FROM gated g LEFT JOIN lab l ON l.node = g.image_id
        ORDER BY g.image_id
    """


def _wds_oracle_ctes() -> str:
    """Shared WDS-oracle prefix: the synthesized non-null-caption pair
    set with the deterministic raw-bitmap image length, the exact ustar
    per-sample cost (two 512 B headers + block-padded payloads), and the
    contiguous-fill shard assignment (flat window here — fixture scale;
    the Spark side's two-level bucket scan computes the same exclusive
    prefix because the bucket is order-aligned)."""
    return f"""
        synth AS (
            SELECT doc_id AS image_id,
                   (32 + (doc_id % 97))::INT AS w,
                   (32 + (doc_id % 53))::INT AS h,
                   CASE WHEN doc_id % 13 = 0 THEN NULL
                        WHEN doc_id % 17 = 0 THEN 'x'
                        ELSE substring(text, 1, 40) END AS caption
            FROM documents
        ),
        lens AS (
            SELECT image_id,
                   (54 + 3::BIGINT * w * h) AS img_len,
                   strlen(caption)::BIGINT AS cap_len
            FROM synth WHERE caption IS NOT NULL
        ),
        entries AS (
            SELECT image_id, img_len, cap_len,
                   (1024 + ((img_len + 511) // 512) * 512
                         + ((cap_len + 511) // 512) * 512)::BIGINT AS entry_bytes
            FROM lens
        ),
        sharded AS (
            SELECT image_id, img_len, cap_len, entry_bytes,
                   ((sum(entry_bytes) OVER (ORDER BY image_id
                                            ROWS UNBOUNDED PRECEDING)
                     - entry_bytes) // {_WDS_BUDGET})::BIGINT AS shard_id
            FROM entries
        )
    """


def _patch_pack_oracle() -> str:
    """Mirror of _q_patch_pack: the synth pair table (only image_id/w/h
    are read), then bucketing.patch_pack_duckdb's exact integer math."""
    from webcrawler_spark.multimodal.bucketing import patch_pack_duckdb

    return f"""
        WITH synth AS (
            SELECT doc_id AS image_id,
                   (32 + (doc_id % 97))::INT AS w,
                   (32 + (doc_id % 53))::INT AS h
            FROM documents
        ),
        {patch_pack_duckdb("synth", patch=16, token_budget=40, shards=4)}
        SELECT image_id, w, h, n_tokens, fits, shard,
               seq_id, seq_offset, is_overflow
        FROM ppk ORDER BY image_id
    """


def _wds_plan_oracle() -> str:
    return f"""
        WITH {_wds_oracle_ctes()}
        SELECT image_id, entry_bytes, shard_id
        FROM sharded ORDER BY image_id
    """


def _wds_manifest_oracle() -> str:
    # tar_bytes via the module's own size-model helper — predicts the
    # MEASURED on-disk file size of every shard the Spark side wrote
    from webcrawler_spark.multimodal.webdataset import tar_file_bytes_sql

    return f"""
        WITH {_wds_oracle_ctes()}
        SELECT shard_id,
               count(*)::BIGINT AS n_samples,
               sum(img_len + cap_len)::BIGINT AS payload_bytes,
               ({tar_file_bytes_sql("sum(entry_bytes)")})::BIGINT AS tar_bytes
        FROM sharded GROUP BY shard_id ORDER BY shard_id
    """


def _pair_alignment_oracle() -> str:
    """Pure-SQL mirror of _q_pair_alignment: the same synthesized pair
    metadata, then multimodal/alignment.py's score expression (hashed
    signed bag-of-words × phash sign pattern, exact-integer dot/norms,
    one round(…,6) on the final cosine) rebuilt by
    alignment_score_duckdb."""
    from webcrawler_spark.multimodal.alignment import alignment_score_duckdb

    base_key = (
        "(CASE WHEN doc_id % 3 = 0 THEN 'g' || (doc_id % 25)::VARCHAR "
        "ELSE 'u' || doc_id::VARCHAR END)"
    )
    ph_base = PORTABLE_HASH64_DUCKDB.format(col=base_key)
    score = alignment_score_duckdb("caption", "phash")
    return f"""
        WITH synth AS (
            SELECT doc_id AS image_id,
                   CASE WHEN doc_id % 13 = 0 THEN NULL
                        WHEN doc_id % 17 = 0 THEN 'x'
                        ELSE substring(text, 1, 40) END AS caption,
                   xor({ph_base},
                       CASE WHEN doc_id % 3 = 0 AND doc_id % 5 = 0
                            THEN (1::BIGINT << (doc_id % 62)::INT)
                            ELSE 0::BIGINT END) AS phash
            FROM documents
        ),
        scored AS (SELECT image_id, {score} AS align_score FROM synth)
        SELECT image_id, align_score, align_score > 0.0 AS aligned
        FROM scored ORDER BY image_id
    """


def _cross_modal_topk_oracle() -> str:
    """Mirror of _q_cross_modal_topk: caption_embed/phash_embed list
    fragments, integer dot, image norm exactly sqrt(dims), per-query
    row_number window."""
    from webcrawler_spark.multimodal.alignment import (
        DIMS,
        caption_embed_duckdb,
        phash_embed_duckdb,
    )

    base_key = (
        "(CASE WHEN doc_id % 3 = 0 THEN 'g' || (doc_id % 25)::VARCHAR "
        "ELSE 'u' || doc_id::VARCHAR END)"
    )
    ph_base = PORTABLE_HASH64_DUCKDB.format(col=base_key)
    qv = caption_embed_duckdb("caption", DIMS)
    iv = phash_embed_duckdb("phash", DIMS)
    dot = f"list_sum(list_transform(range(1, {DIMS} + 1), j -> qv[j] * iv[j]))"
    qn2 = f"list_sum(list_transform(range(1, {DIMS} + 1), j -> qv[j] * qv[j]))"
    return f"""
        WITH synth AS (
            SELECT doc_id AS image_id,
                   CASE WHEN doc_id % 13 = 0 THEN NULL
                        WHEN doc_id % 17 = 0 THEN 'x'
                        ELSE substring(text, 1, 40) END AS caption,
                   xor({ph_base},
                       CASE WHEN doc_id % 3 = 0 AND doc_id % 5 = 0
                            THEN (1::BIGINT << (doc_id % 62)::INT)
                            ELSE 0::BIGINT END) AS phash
            FROM documents
        ),
        q AS (
            SELECT image_id AS query_id, {qv} AS qv
            FROM synth WHERE image_id IN (1, 2, 4)
        ),
        imgs AS (SELECT image_id, {iv} AS iv FROM synth),
        scored AS (
            SELECT q.query_id, i.image_id,
                   CASE WHEN {qn2} = 0 THEN 0.0
                        ELSE round({dot}::DOUBLE
                                   / sqrt(({qn2} * {DIMS})::DOUBLE), 6)
                   END AS score
            FROM imgs i CROSS JOIN q
            WHERE i.image_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, image_id, score,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, image_id
                   )::INT AS rank
            FROM scored
        )
        SELECT query_id, image_id, score, rank
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank
    """


def _pair_funnel_oracle() -> str:
    """End-to-end SQL mirror of _q_pair_funnel: the synthesized pair
    metadata, the alignment score (alignment_score_duckdb), the gates +
    recursive-CTE phash election (as in _pair_curation_meta_oracle), the
    caption-fingerprint keep-best-resolution window among stage-1+2
    survivors, and the aspect/packing plan (aspect_batches_duckdb as a
    nested WITH) over the final survivor set."""
    from webcrawler_spark.multimodal.alignment import alignment_score_duckdb
    from webcrawler_spark.multimodal.bucketing import aspect_batches_duckdb

    base_key = (
        "(CASE WHEN doc_id % 3 = 0 THEN 'g' || (doc_id % 25)::VARCHAR "
        "ELSE 'u' || doc_id::VARCHAR END)"
    )
    ph_base = PORTABLE_HASH64_DUCKDB.format(col=base_key)
    toks_cap = _DUCK_TOKS.format(col="caption")
    score = alignment_score_duckdb("caption", "phash")
    cap_fp = PORTABLE_HASH64_DUCKDB.format(
        col="lower(regexp_replace(caption, '\\s{2,}', ' ', 'g'))"
    )
    return f"""
        WITH RECURSIVE synth AS (
            SELECT doc_id AS image_id,
                   (32 + (doc_id % 97))::INT AS w,
                   (32 + (doc_id % 53))::INT AS h,
                   CASE WHEN doc_id % 13 = 0 THEN NULL
                        WHEN doc_id % 17 = 0 THEN 'x'
                        ELSE substring(text, 1, 40) END AS caption,
                   xor({ph_base},
                       CASE WHEN doc_id % 3 = 0 AND doc_id % 5 = 0
                            THEN (1::BIGINT << (doc_id % 62)::INT)
                            ELSE 0::BIGINT END) AS phash
            FROM documents
        ),
        staged AS (
            SELECT image_id, w, h, caption, phash,
                   {score} AS align_score,
                   coalesce(caption IS NOT NULL
                            AND len({toks_cap}) >= 2, FALSE) AS caption_ok,
                   coalesce(caption IS NOT NULL AND len({toks_cap}) >= 2,
                            FALSE) AND w * h >= 4096 AS gate_ok
            FROM synth
        ),
        banded AS (
            SELECT image_id, phash, b.band,
                   ((phash >> (b.band * 16)) & 65535) AS key
            FROM staged, (SELECT unnest([0, 1, 2, 3]) AS band) b
            WHERE gate_ok
        ),
        cand AS (
            SELECT DISTINCT l.image_id AS a, r.image_id AS b
            FROM banded l
            JOIN banded r ON l.band = r.band AND l.key = r.key
                         AND l.image_id < r.image_id
            WHERE bit_count(xor(l.phash, r.phash)) <= 3
        ),
        nodes AS (SELECT a AS n FROM cand UNION SELECT b FROM cand),
        edges AS (SELECT a AS u, b AS v FROM cand
                  UNION SELECT b, a FROM cand),
        reach(node, label) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
        ),
        lab AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
        flags AS (
            SELECT s.*,
                   s.align_score > 0.0 AS aligned,
                   s.gate_ok AND coalesce(l.node = l.cluster_id, TRUE)
                       AS neardup_keep
            FROM staged s LEFT JOIN lab l ON l.node = s.image_id
        ),
        s1 AS (SELECT * FROM flags WHERE aligned AND neardup_keep),
        keyed AS (
            SELECT image_id, w, h,
                   CASE WHEN length(caption) > 0 THEN {cap_fp} END AS caption_fp,
                   (w::BIGINT * h::BIGINT) AS pixels
            FROM s1
        ),
        counts AS (
            SELECT caption_fp, count(*)::BIGINT AS n_dup
            FROM keyed WHERE caption_fp IS NOT NULL GROUP BY 1
        ),
        ranked AS (
            SELECT image_id, w, h, caption_fp, pixels,
                   row_number() OVER (
                       PARTITION BY caption_fp ORDER BY pixels DESC, image_id
                   ) AS rn
            FROM keyed WHERE caption_fp IS NOT NULL
        ),
        surv AS (
            SELECT r.image_id, r.w, r.h, c.n_dup
            FROM ranked r JOIN counts c USING (caption_fp) WHERE rn = 1
            UNION ALL
            SELECT image_id, w, h, 1::BIGINT AS n_dup
            FROM keyed WHERE caption_fp IS NULL
        ),
        plan AS (
            WITH {aspect_batches_duckdb("surv", batch_size=8, shards=4)}
        )
        SELECT f.image_id, f.align_score, f.aligned, f.caption_ok,
               f.gate_ok, f.neardup_keep, s.n_dup,
               (p.batch_id IS NOT NULL) AS selected,
               p.bucket_id, p.bucket_w, p.bucket_h, p.shard, p.batch_id,
               p.slot, coalesce(p.is_full, FALSE) AS is_full
        FROM flags f
        LEFT JOIN surv s ON s.image_id = f.image_id
        LEFT JOIN plan p ON p.image_id = f.image_id
        ORDER BY f.image_id
    """


def _resize_plan_oracle() -> str:
    from webcrawler_spark.multimodal.bucketing import resize_plan_duckdb

    return f"""
        WITH synth AS (
            SELECT doc_id AS image_id,
                   (32 + (doc_id % 97))::INT AS w,
                   (32 + (doc_id % 53))::INT AS h
            FROM documents
        ),
        {resize_plan_duckdb("synth")}
        ORDER BY image_id
    """


def _caption_dedup_oracle() -> str:
    """One-window mirror of _q_caption_dedup (two-phase election is
    output-invariant): same synthesized captions, same caption
    fingerprint (lower + whitespace-collapse + portable 60-bit hash)."""
    fp = PORTABLE_HASH64_DUCKDB.format(
        col="lower(regexp_replace(caption, '\\s{2,}', ' ', 'g'))"
    )
    return f"""
        WITH pairs AS (
            SELECT doc_id AS image_id,
                   (32 + (doc_id % 97))::INT AS w,
                   (32 + (doc_id % 53))::INT AS h,
                   CASE WHEN doc_id % 13 = 0 THEN NULL
                        WHEN doc_id % 5 = 0
                            THEN 'stock photo of a product ' || (doc_id % 7)::VARCHAR
                        ELSE substring(text, 1, 40) END AS caption
            FROM documents
        ),
        base AS (
            SELECT image_id,
                   CASE WHEN length(caption) > 0 THEN {fp} END AS caption_fp,
                   (w::BIGINT * h::BIGINT) AS pixels
            FROM pairs
        ),
        counts AS (
            SELECT caption_fp, count(*)::BIGINT AS n_dup
            FROM base WHERE caption_fp IS NOT NULL GROUP BY 1
        ),
        ranked AS (
            SELECT image_id, caption_fp, pixels,
                   row_number() OVER (
                       PARTITION BY caption_fp ORDER BY pixels DESC, image_id
                   ) AS rn
            FROM base WHERE caption_fp IS NOT NULL
        )
        SELECT image_id, caption_fp, pixels, n_dup
        FROM ranked JOIN counts USING (caption_fp) WHERE rn = 1
        UNION ALL
        SELECT image_id, caption_fp, pixels, 1::BIGINT AS n_dup
        FROM base WHERE caption_fp IS NULL
        ORDER BY image_id
    """


def _domain_cap_oracle() -> str:
    """One-window mirror of _q_domain_cap — the two-phase sharding in the
    engine is provably output-invariant, so the oracle needs only the
    plain per-domain row_number."""
    toks = _DUCK_TOKS.format(col="text")
    return f"""
        WITH t0 AS (SELECT doc_id, text, source, {toks} AS t FROM documents),
        scored AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'hot' ELSE source END AS domain,
                   {_DUCK_QUALITY} AS quality
            FROM t0
        ),
        ranked AS (
            SELECT doc_id, domain, quality,
                   row_number() OVER (
                       PARTITION BY domain ORDER BY quality DESC, doc_id
                   )::INT AS domain_rank
            FROM scored
        )
        SELECT doc_id, domain, quality, domain_rank
        FROM ranked WHERE domain_rank <= 8
        ORDER BY domain, domain_rank
    """


_DUCK_TOKS_LEN = "len(" + _DUCK_TOKS.format(col="text") + ")"


def _url_gates_oracle() -> str:
    """Mirror of _q_url_gates: the identical synthetic URL derivation,
    then the six gate predicates (same regex text, RE2-safe)."""
    from webcrawler_spark.functions.url_gates import (
        synthetic_urls_duckdb,
        url_gate_flags_duckdb,
    )

    flags = url_gate_flags_duckdb("url")
    cols = ",\n                   ".join(
        f"{expr} AS {name}" for name, expr in flags.items()
    )
    return f"""
        WITH urls AS ({synthetic_urls_duckdb()})
        SELECT doc_id, url,
                   {cols}
        FROM urls ORDER BY doc_id
    """


def _pagerank_oracle() -> str:
    """Chained-CTE mirror of _q_pagerank (it0..it5, identical integer
    arithmetic — see webcrawler_spark/graph.py on why integer)."""
    from webcrawler_spark.graph import pagerank_duckdb, synthetic_links_duckdb

    n = "SELECT count(*) FROM documents"
    return pagerank_duckdb(
        "SELECT doc_id AS node FROM documents",
        synthetic_links_duckdb(n),
        n,
    )


def _cocitation_oracle() -> str:
    """Mirror of _q_cocitation over the same synthetic edges."""
    from webcrawler_spark.graph import cocitation_duckdb, synthetic_links_duckdb

    return cocitation_duckdb(
        synthetic_links_duckdb("SELECT count(*) FROM documents")
    )


def _aspect_batches_oracle() -> str:
    """Pure-SQL mirror of _q_aspect_batches: the synthesized w/h columns,
    cross-join argmin onto the bucket menu (identical IEEE dist, ties to
    the smaller bucket_id — exactly the struct comparison array_min
    performs), then the same (bucket, shard) packing windows."""
    from webcrawler_spark.multimodal.bucketing import aspect_batches_duckdb

    return f"""
        WITH synth AS (
            SELECT doc_id AS image_id,
                   (32 + (doc_id % 97))::INT AS w,
                   (32 + (doc_id % 53))::INT AS h
            FROM documents
        ),
        {aspect_batches_duckdb("synth", batch_size=8, shards=4)}
        ORDER BY image_id
    """


def _incremental_curation_oracle() -> str:
    """One pure-SQL mirror of the whole stateful pipeline: corpus
    (documents + exact clones + near-dup twins) → first-writer exact
    dedup → pairwise-precedent near-dup drop (the minhash module's own
    DuckDB oracle, nested over the exact survivors) → quality gate →
    stratified sample → split."""
    from webcrawler_spark.dedup.minhash import near_duplicates_oracle_sql

    toks = _DUCK_TOKS.format(col="text")
    bucket = _hash_bucket_duckdb("doc_id", "sample")
    rate = _rate_expr_duckdb("lang", _CURATION_RATES, 10000)
    nd = near_duplicates_oracle_sql(0.8, table="exact_docs")
    return f"""
        WITH corpus AS (
            SELECT doc_id, text, lang FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text, lang
            FROM documents WHERE doc_id % 7 = 0
            UNION ALL
            SELECT doc_id + 2000000 AS doc_id, text || ' qq ww ee rr' AS text, lang
            FROM documents WHERE doc_id % 11 = 0
        ),
        t AS (SELECT doc_id, lang, text, {toks} AS t FROM corpus),
        s AS (SELECT doc_id, lang, text, {_DUCK_FP} AS fp,
                     len(t)::INT AS n_tokens, {_DUCK_QUALITY} AS quality
              FROM t),
        f AS (SELECT *, (row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1) AS keep_dedup
              FROM s),
        exact_docs AS (SELECT doc_id, text FROM f WHERE keep_dedup),
        nd AS ({nd}),
        surv AS (
            SELECT doc_id, lang, n_tokens FROM f
            WHERE keep_dedup
              AND doc_id NOT IN (SELECT b FROM nd)
              AND quality >= 0.75
              AND ({bucket} < {rate})
        )
        SELECT doc_id, lang, n_tokens,
               {_assign_split_duckdb("doc_id")} AS split
        FROM surv ORDER BY doc_id
    """


def oracle_sql() -> dict[str, str]:
    toks = _DUCK_TOKS.format(col="text")
    toks_nosw = (
        "list_filter(" + toks + ", t -> NOT list_contains("
        + "[" + ",".join(f"'{w}'" for w in STOPWORDS_EN) + "], t))"
    )
    sl = "[" + ",".join(f"'{w}'" for w in ("in","je","na","za","se","da","so","ki","pa","bi","po","ne","z","s","v","do","tudi","kot","od","le")) + "]"
    en = "[" + ",".join(f"'{w}'" for w in STOPWORDS_EN) + "]"
    de = "[" + ",".join(f"'{w}'" for w in ("der","die","und","das","von","zu","mit","den","im","ist","ein","eine","auf","für","des","sich","nicht","auch","es","dem")) + "]"

    def hits(sw):
        return f"(len(t) - len(list_filter(t, x -> NOT list_contains({sw}, x))))"

    return {
        "doc_summary": f"""
            WITH t AS (SELECT doc_id, text, {toks} AS t FROM documents),
            h AS (SELECT doc_id, text, t,
                         {hits(en)} AS en_h, {hits(sl)} AS sl_h, {hits(de)} AS de_h
                  FROM t),
            s AS (
                SELECT doc_id,
                       {_DUCK_FP} AS fingerprint,
                       len(t)::INT AS n_tokens,
                       CASE WHEN en_h >= sl_h AND en_h >= de_h AND en_h > 0 THEN 'en'
                            WHEN sl_h >= de_h AND sl_h > 0 THEN 'sl'
                            WHEN de_h > 0 THEN 'de' ELSE 'und' END AS lang_guess,
                       round((
                           least(length(text) / 500.0, 1.0)
                           + CASE WHEN length(text) > 0
                                  THEN length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) * 1.0 / length(text)
                                  ELSE 0.0 END
                           + CASE WHEN len(t) > 0
                                       AND (list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t)) BETWEEN 3 AND 12
                                  THEN 1.0 ELSE 0.5 END
                       ) / 3.0, 6) AS quality
                FROM h)
            SELECT doc_id, fingerprint, n_tokens, lang_guess, quality,
                   row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) > 1 AS is_duplicate
            FROM s ORDER BY doc_id
        """,
        "counts_by_type": """
            SELECT event_type, count(*)::BIGINT AS n, round(sum(value), 4) AS total_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "recent_events": """
            SELECT event_id, ts, event_type FROM events
            ORDER BY ts DESC, event_id ASC LIMIT 100
        """,
        "link_join": """
            SELECT c_custkey, c_name, count(*)::BIGINT AS n_orders,
                   round(sum(o_totalprice), 2) AS total_spend
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY n_orders DESC, c_custkey ASC LIMIT 50
        """,
        "anti_join_unseen": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
            )
            ORDER BY c_custkey
        """,
        "semi_join_terms": """
            SELECT p_partkey, p_name, p_size FROM part
            WHERE p_size > 40 AND p_partkey IN (SELECT l_partkey FROM lineitem)
            ORDER BY p_partkey
        """,
        "frontier_pick": """
            SELECT o_custkey, min(o_orderkey) AS first_orderkey
            FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
        "first_writer_dedup": f"""
            WITH cloned AS (
                SELECT d.doc_id, b.text
                FROM documents d JOIN documents b ON b.doc_id = d.doc_id - d.doc_id % 5
            )
            SELECT fingerprint, count(*)::BIGINT AS n_docs, min(doc_id) AS canonical_id
            FROM (SELECT doc_id, {_DUCK_FP} AS fingerprint FROM cloned)
            GROUP BY fingerprint
            HAVING count(*) >= 2
            ORDER BY canonical_id
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*)::BIGINT AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_duplicated": """
            SELECT l_partkey, count(*)::BIGINT AS n FROM lineitem
            GROUP BY l_partkey ORDER BY n DESC, l_partkey ASC LIMIT 5
        """,
        "token_counts": f"""
            SELECT doc_id, len({toks})::INT AS n_tokens,
                   len(list_distinct({toks}))::INT AS n_distinct_tokens
            FROM documents ORDER BY doc_id
        """,
        "lang_quality": f"""
            WITH t AS (SELECT doc_id, text, {toks} AS t FROM documents),
            h AS (SELECT doc_id, text, t,
                         {hits(en)} AS en_h, {hits(sl)} AS sl_h, {hits(de)} AS de_h
                  FROM t)
            SELECT doc_id,
                   CASE WHEN en_h >= sl_h AND en_h >= de_h AND en_h > 0 THEN 'en'
                        WHEN sl_h >= de_h AND sl_h > 0 THEN 'sl'
                        WHEN de_h > 0 THEN 'de' ELSE 'und' END AS lang_guess,
                   round((
                       least(length(text) / 500.0, 1.0)
                       + CASE WHEN length(text) > 0
                              THEN length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) * 1.0 / length(text)
                              ELSE 0.0 END
                       + CASE WHEN len(t) > 0
                                   AND (list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t)) BETWEEN 3 AND 12
                              THEN 1.0 ELSE 0.5 END
                   ) / 3.0, 6) AS quality
            FROM h ORDER BY doc_id
        """,
        "doc_fingerprint": f"""
            SELECT doc_id, {_DUCK_FP} AS fingerprint FROM documents ORDER BY doc_id
        """,
        "postings": f"""
            WITH tok AS (
                SELECT doc_id AS doc, unnest({toks_nosw}) AS word,
                       generate_subscripts({toks_nosw}, 1) - 1 AS pos
                FROM documents
            )
            SELECT doc, word, count(*)::INT AS frequency,
                   array_to_string(list_sort(list(pos)), ',') AS positions
            FROM tok GROUP BY doc, word ORDER BY doc, word
        """,
        "max_freq_word": f"""
            WITH tok AS (
                SELECT doc_id AS doc, unnest({toks_nosw}) AS word FROM documents
            ), p AS (
                SELECT doc, word, count(*)::INT AS frequency FROM tok GROUP BY doc, word
            ), totals AS (
                SELECT d.source, p.word, sum(p.frequency)::BIGINT AS total
                FROM p JOIN documents d ON d.doc_id = p.doc
                GROUP BY d.source, p.word
            )
            SELECT source,
                   arg_max(word, concat(lpad(total::VARCHAR, 10, '0'), '|', word)) AS top_word,
                   max(total)::BIGINT AS top_total
            FROM totals GROUP BY source ORDER BY source
        """,
        "page_data_types": """
            WITH ct AS (
                SELECT (['application/pdf', 'application/msword',
                         'application/vnd.openxmlformats-officedocument.wordprocessingml.document',
                         'application/vnd.ms-powerpoint',
                         'application/vnd.openxmlformats-officedocument.presentationml.presentation',
                         'text/html'])[(p_partkey % 6 + 1)::INT] AS c
                FROM part
            ), coded AS (
                SELECT CASE c
                    WHEN 'application/pdf' THEN 'PDF'
                    WHEN 'application/msword' THEN 'DOC'
                    WHEN 'application/vnd.openxmlformats-officedocument.wordprocessingml.document' THEN 'DOCX'
                    WHEN 'application/vnd.ms-powerpoint' THEN 'PPT'
                    WHEN 'application/vnd.openxmlformats-officedocument.presentationml.presentation' THEN 'PPTX'
                    END AS data_type_code
                FROM ct
            )
            SELECT data_type_code, count(*)::BIGINT AS n FROM coded
            WHERE data_type_code IS NOT NULL
            GROUP BY data_type_code ORDER BY data_type_code
        """,
        "graph_export": """
            SELECT c_name AS label, count(*)::BIGINT AS n_edges
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_name
            ORDER BY n_edges DESC, label ASC LIMIT 25
        """,
        "vocabulary": f"""
            WITH tok AS (SELECT unnest({toks_nosw}) AS word FROM documents)
            SELECT count(DISTINCT word)::BIGINT AS n_words FROM tok
        """,
        "search_scores": f"""
            WITH tok AS (
                SELECT doc_id AS doc, unnest({toks_nosw}) AS word FROM documents
            ), postings AS (
                SELECT doc, word, count(*)::INT AS frequency FROM tok GROUP BY doc, word
            )
            SELECT doc, sum(frequency)::BIGINT AS score
            FROM postings WHERE word IN ('table', 'value', 'row')
            GROUP BY doc ORDER BY score DESC, doc ASC
        """,
        "bm25": _bm25.bm25_oracle_sql(("table", "value", "row")),
        "minhash_signatures": _minhash.minhash_signature_sql() + " ORDER BY doc_id",
        "simhash": _simhash.simhash_oracle_sql() + " ORDER BY doc_id",
        "ngram_jaccard_pairs": _minhash.near_duplicates_oracle_sql(
            0.2, bands=8, rows_per_band=2
        ),
        "dedup_clusters": _cluster.clusters_oracle_sql(
            0.2, bands=8, rows_per_band=2
        ),
        "dedup_survivors": _cluster.survivors_oracle_sql(
            0.2, bands=8, rows_per_band=2
        ),
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(
                       list_dot_product(a.v, b.v) /
                       (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                   6) AS cos
            FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings) a
            JOIN (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings) b
              ON a.vec_id < b.vec_id
            WHERE round(
                       list_dot_product(a.v, b.v) /
                       (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                   6) >= 0.3
            ORDER BY a, b
        """,
        "embedding_neardup_lsh": _emb.lsh_near_duplicate_oracle_sql(0.4),
        "semantic_dedup": _semantic.semantic_dedup_oracle_sql(),
        "ann_topk": """
            WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
            ), q AS (SELECT * FROM v WHERE vec_id < 3),
            scored AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       round(list_dot_product(q.v, c.v) /
                             (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
                FROM q JOIN v c ON c.vec_id <> q.vec_id
            ), ranked AS (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM scored
            )
            SELECT query_id, neighbor_id, cos, rank::INT AS rank FROM ranked
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "ivf_topk": _ann.ivf_topk_oracle_sql(
            k=5, n_cells=8, nprobe=2, lloyd_rounds=3
        ),
        "tumbling_counts": """
            SELECT time_bucket(INTERVAL '60 minutes', ts) AS window_start,
                   event_type, count(*)::BIGINT AS n, round(sum(value), 4) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "sessionize": """
            WITH g AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS is_break
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT user_id, ts,
                       (sum(is_break) OVER (PARTITION BY user_id ORDER BY ts
                                            ROWS UNBOUNDED PRECEDING))::BIGINT AS session_no
                FROM g
            )
            SELECT user_id, session_no, count(*)::BIGINT AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no
        """,
        "url_canonicalize": """
            WITH d AS (
                SELECT p_partkey AS id,
                       'http://h' || (p_partkey % 50)::VARCHAR || '.gov.si/p'
                       || p_partkey::VARCHAR
                       || (['', '.pdf', '.jpg', '.txt', '.html', '.zip'])[(p_partkey % 6 + 1)::INT]
                       || CASE WHEN p_partkey % 7 = 0 THEN '?q=1#frag' ELSE '' END AS raw_url
                FROM part
            ), c AS (
                SELECT id, raw_url,
                       split_part(replace(split_part(raw_url, '#', 1), '.html', ''), '?', 1) AS canon_url
                FROM d
            )
            SELECT id, canon_url,
                   'h' || (id % 50)::VARCHAR || '.gov.si' AS host,
                   false AS rejected,
                   CASE WHEN canon_url LIKE '%.pdf' OR canon_url LIKE '%.jpg'
                             OR canon_url LIKE '%.zip' THEN true ELSE false END AS is_binary
            FROM c ORDER BY id
        """,
        "extraction_golden": _golden_oracle_values(),
        "extraction_mode_a": _golden_oracle_mode_a(),
        "corpus_curation": f"""
            WITH {_curation_oracle_ctes()}
            SELECT stage, n_docs, n_tokens FROM (
                SELECT '0_raw' AS stage, count(*)::BIGINT AS n_docs,
                       coalesce(sum(n_tokens), 0)::BIGINT AS n_tokens FROM k
                UNION ALL
                SELECT '1_exact_dedup', count(*) FILTER (WHERE keep_dedup)::BIGINT,
                       coalesce(sum(n_tokens) FILTER (WHERE keep_dedup), 0)::BIGINT FROM k
                UNION ALL
                SELECT '2_quality_gate', count(*) FILTER (WHERE keep_quality)::BIGINT,
                       coalesce(sum(n_tokens) FILTER (WHERE keep_quality), 0)::BIGINT FROM k
                UNION ALL
                SELECT '3_lang_sampled', count(*) FILTER (WHERE keep_sampled)::BIGINT,
                       coalesce(sum(n_tokens) FILTER (WHERE keep_sampled), 0)::BIGINT FROM k
            ) ORDER BY stage
        """,
        "train_split": f"""
            WITH {_curation_oracle_ctes()}
            SELECT doc_id, lang, n_tokens,
                   {_assign_split_duckdb("doc_id")} AS split
            FROM k WHERE keep_sampled ORDER BY doc_id
        """,
        "shard_plan": f"""
            WITH {_curation_oracle_ctes()},
            sp AS (
                SELECT doc_id, n_tokens,
                       {_assign_split_duckdb("doc_id")} AS split
                FROM k WHERE keep_sampled
            )
            SELECT doc_id, split,
                   {_pack_shards_duckdb(4096)} AS shard_id
            FROM sp ORDER BY doc_id
        """,
        "sequence_pack": f"""
            WITH {_curation_oracle_ctes()},
            sp AS (
                SELECT doc_id, n_tokens,
                       {_assign_split_duckdb("doc_id")} AS split
                FROM k WHERE keep_sampled
            )
            SELECT * FROM (
                {_pack_sequences_duckdb(2048, "sp", cols="doc_id, split, n_tokens")}
            ) ORDER BY doc_id, seq_id
        """,
        "token_histogram": f"""
            WITH n AS (SELECT len({toks})::INT AS n FROM documents)
            SELECT {_pow2_bin_duckdb("n")}::INT AS bin_lo,
                   count(*)::BIGINT AS n_docs,
                   sum(n)::BIGINT AS total_tokens
            FROM n GROUP BY 1 ORDER BY 1
        """,
        "bpe_pairs": _bpe.bpe_pair_counts_duckdb(_DUCK_TOKS.format(col="text")),
        "bpe_merges": _bpe.bpe_merges_duckdb(
            _DUCK_TOKS.format(col="text"), n_merges=12
        ),
        "bpe_segment": _bpe.bpe_segment_duckdb(
            _DUCK_TOKS.format(col="text"), n_merges=12, k=100
        ),
        "bpe_encode": _bpe.bpe_encode_duckdb(
            _DUCK_TOKS.format(col="text"), n_merges=12, first_k=8
        ),
        "model_quality": _model_quality.model_quality_oracle_sql(),
        "model_quality_trained": _model_quality.trained_quality_oracle_sql(
            labels_cte=f"""
                SELECT d.doc_id,
                       CASE WHEN g.keep_gopher AND l.keep_lm
                            THEN 1 ELSE 0 END AS y
                FROM documents d
                JOIN (SELECT page_id, keep_gopher FROM (
                    {_gopher.gopher_oracle_sql(_pages.synthetic_pages_duckdb())}
                )) g ON g.page_id = d.doc_id % {_pages.N_PAGES}
                JOIN (SELECT doc_id, keep_lm FROM (
                    {_lm.unigram_scores_oracle_sql('SELECT doc_id, text FROM documents')}
                )) l ON l.doc_id = d.doc_id
            """
        ),
        "length_quantiles": _curation.length_quantiles_duckdb(_DUCK_TOKS_LEN),
        "incremental_curation": _incremental_curation_oracle(),
        "incremental_ann": _incremental_ann_oracle(),
        "pair_curation_meta": _pair_curation_meta_oracle(),
        "pair_alignment": _pair_alignment_oracle(),
        "wds_plan": _wds_plan_oracle(),
        "patch_pack": _patch_pack_oracle(),
        "wds_manifest": _wds_manifest_oracle(),
        "pair_funnel": _pair_funnel_oracle(),
        "cross_modal_topk": _cross_modal_topk_oracle(),
        "aspect_batches": _aspect_batches_oracle(),
        "domain_cap": _domain_cap_oracle(),
        "domain_mixture": f"""
            WITH {_mixture.domain_mixture_plan_duckdb(
                _DOMAIN_MIXTURE_DUCKDB, _DUCK_TOKS_LEN)}
            SELECT * FROM mix_plan ORDER BY domain
        """,
        "mixture_sample": _mixture.mixture_sample_duckdb(
            _DOMAIN_MIXTURE_DUCKDB, _DUCK_TOKS_LEN
        ),
        "url_gates": _url_gates_oracle(),
        "pagerank": _pagerank_oracle(),
        "cocitation": _cocitation_oracle(),
        "caption_dedup": _caption_dedup_oracle(),
        "resize_plan": _resize_plan_oracle(),
        "gopher_quality": _gopher.gopher_oracle_sql(_pages.synthetic_pages_duckdb()),
        "repetition_signals": _repetition.repetition_oracle_sql(
            _pages.synthetic_pages_duckdb()
        ),
        "collocations": _collocations.collocations_oracle_sql(),
        "line_dedup": _lines.line_dedup_oracle_sql(_pages.synthetic_pages_duckdb()),
        "decontaminate": _decon.decontaminate_oracle_sql(
            corpus_cte="""
                SELECT d.doc_id,
                       CASE WHEN d.doc_id % 10 = 3 AND e.etext IS NOT NULL
                            THEN d.text || ' ' || e.etext
                            ELSE d.text END AS text
                FROM (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0) d
                LEFT JOIN (SELECT (doc_id // 97) AS k, text AS etext
                           FROM documents WHERE doc_id % 97 = 0) e
                  ON e.k = d.doc_id % 3
            """,
            eval_cte="SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0",
        ),
        "pii_redact": _pii.pii_oracle_sql(_PII_CORPUS_CTE),
        "lm_quality": _lm.unigram_scores_oracle_sql(
            "SELECT doc_id, text FROM documents"
        ),
        "dsir_weights": _dsir.dsir_weights_oracle_sql(
            "SELECT doc_id, text, lang FROM documents", "lang = 'en'"
        ),
        "span_dedup": _spans.span_dedup_oracle_sql(
            f"""
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 5 = 0 THEN ' {_SPAN_ALPHA}' ELSE '' END
                   || CASE WHEN doc_id % 7 = 2 THEN ' {_SPAN_BETA}' ELSE '' END
                   AS text
            FROM documents
            """
        ),
        # crawl_pages / image_invariants / image_features /
        # image_caption_pairs / pair_curation: non-SQL-expressible
        # (engine vs simulator oracle and pandas-UDF image pipelines) —
        # rows-only here; pair_curation's brute-force union-find oracle
        # equality lives in tests/test_curation.py.
    }


def _sql_escape(s: str) -> str:
    return s.replace("'", "''")


def _golden_oracle_values() -> str:
    """The 8 committed data_*.json goldens flattened as a VALUES relation."""
    from webcrawler_spark.extract import golden as G

    vals = ",\n".join(
        f"('{_sql_escape(s)}','{_sql_escape(p)}',{i},'{_sql_escape(f)}',{ix},'{_sql_escape(v)}')"
        for s, p, i, f, ix, v in G.golden_rows()
    )
    return (
        f"SELECT * FROM (VALUES {vals}) AS t(site, page, item, field, idx, value) "
        "ORDER BY site, page, item, field, idx"
    )


def _golden_oracle_mode_a() -> str:
    """Overstock goldens minus SavingPercent (mode A drops its parens)."""
    from webcrawler_spark.extract import golden as G

    vals = ",\n".join(
        f"('{_sql_escape(p)}',{i},'{_sql_escape(f)}','{_sql_escape(v)}')"
        for s, p, i, f, ix, v in G.golden_rows()
        if s == "overstock.com" and f != "SavingPercent"
    )
    return (
        f"SELECT * FROM (VALUES {vals}) AS t(page, item, field, value) "
        "ORDER BY page, item, field"
    )
