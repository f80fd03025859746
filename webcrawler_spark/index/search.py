"""Search over the inverted index (SURVEY.md §3.3: J7 + A6 + O3 + W3).

Reference: one SQLite SELECT per query term, per-doc merge in Python,
score = Σ frequency, snippets re-read the source file and slice ±3 tokens
around each position (run-sqlite-search.py:24-55; processing.py:123-134 —
the slice end is exclusive ⇒ 3 before + 2 after + self).

Here: broadcast the tiny term list into the postings (J7), one groupBy
per doc (A6), order by score (O3); snippets come from the stored token
array + positions — no re-read of source documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_spark.functions.text import STOPWORDS_EN, remove_stopwords, tokens


def search(
    spark: SparkSession, postings: DataFrame, query: str,
    positions_by_term: bool = False,
) -> DataFrame:
    """score(doc) = Σ frequency over matched terms, descending (A6/O3).

    ``positions_by_term=True`` orders ``all_positions`` the reference's
    way for snippets: grouped by query term in query order, ascending
    within a term (run-sqlite-search.py:24-44 merges each term's stored
    CSV in term order) — the order the published snippet screenshots
    show. Default stays globally sorted (the driver-oracle contract)."""
    terms = [t for t in query.lower().split(" ") if t]
    terms_df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms)], "word string, term_ord int")
    joined = postings.join(F.broadcast(terms_df), "word", "inner")   # J7
    if positions_by_term:
        all_pos = F.flatten(F.transform(
            F.array_sort(F.collect_list(F.struct("term_ord", "positions"))),
            lambda x: x["positions"],
        ))
    else:
        all_pos = F.sort_array(F.flatten(F.collect_list("positions")))
    return (
        joined.groupBy("doc")
        .agg(
            F.sum("frequency").cast("long").alias("score"),
            all_pos.alias("all_positions"),
        )
        .orderBy(F.desc("score"), F.asc("doc"))
    )


def search_indexed(
    spark: SparkSession, index_path: str, query: str, buckets: int = 16,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """Term lookup against the PERSISTED index (S9 + J7/A6/O3): the terms'
    crc32 buckets are computed driver-side (``bucket_of_term``), so the
    parquet scan carries a static ``bucket IN (...)`` partition filter —
    only the term buckets' files are ever opened, the reference's
    index-vs-full-scan latency story (report/main.tex:105-118) at Spark
    partition granularity.

    ``index_df``: pass ``read_index(spark, path)`` opened ONCE for a
    lookup service — re-opening per query re-lists files and re-reads
    footers on the driver (~60 ms here), which the reference's held-open
    SQLite connection does not pay either. No row data is cached; every
    lookup still scans the pruned parquet buckets."""
    from webcrawler_spark.index.build import bucket_of_term, read_index

    terms = [t for t in query.lower().split(" ") if t]
    bucket_ids = sorted({bucket_of_term(t, buckets) for t in terms})
    if index_df is None:
        index_df = read_index(spark, index_path)
    postings = index_df.filter(
        F.col("bucket").isin(bucket_ids) & F.col("word").isin(terms)
    )
    # literal isin, NOT the J7 broadcast join: a lookup's terms are a
    # handful of literals, so the isin reaches the parquet scan as a
    # PushedFilter (row-group pruning inside the pruned buckets) and the
    # broadcast-exchange job disappears — halves interactive latency.
    # search() keeps the join form for term sets that are themselves data.
    return (
        postings.groupBy("doc")
        .agg(F.sum("frequency").cast("long").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc"))
    )


class IndexLookupService:
    """Interactive term lookups over the persisted S9 index, served
    driver-side with Arrow — no Spark job per query.

    Why this is the right 100-TB shape: the index is BUILT by Spark
    (distributed groupBy + bucketed parquet write), but a point lookup
    touches exactly the terms' crc32 bucket directories and, inside them,
    only row groups whose ``word`` min/max statistics overlap the terms
    (``write_index`` sorts by word within files precisely so those stats
    are tight). That is a few MB of IO — launching a distributed job for
    it pays ~100-300 ms of fixed scheduler latency per action (measured
    in bench.py), which the reference's held-open SQLite connection
    (run-sqlite-search.py:24-55) does not pay. Serving lookups from one
    node against shared storage is the standard index-serving split:
    ``search_indexed`` (the Spark path) remains for batch scoring and for
    term sets that are themselves data.

    The service keeps one ``pyarrow.dataset`` handle open per bucket
    (file listing + parquet footers parsed once, the SQLite-connection
    analog); row DATA is never cached — every lookup re-reads the pruned
    row groups.
    """

    def __init__(self, index_path: str, buckets: int = 16):
        self._root = f"{index_path}/postings"
        self._buckets = buckets
        self._ds: dict[int, object] = {}

    def _bucket_ds(self, bucket: int):
        import os

        import pyarrow.dataset as pads

        if bucket not in self._ds:
            path = f"{self._root}/bucket={bucket}"
            # a bucket no indexed word hashes into is never written
            self._ds[bucket] = (
                pads.dataset(path, format="parquet") if os.path.isdir(path) else None
            )
        return self._ds[bucket]

    def lookup(self, query: str) -> list[tuple]:
        """[(doc, score)] — score = Σ frequency over matched terms,
        descending score then ascending doc: exactly ``search_indexed``
        (A6/O3), equality-tested in test_similarity_index.py."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from webcrawler_spark.index.build import bucket_of_term

        terms = [t for t in query.lower().split(" ") if t]
        if not terms:
            return []
        by_bucket: dict[int, list[str]] = {}
        for t in terms:
            by_bucket.setdefault(bucket_of_term(t, self._buckets), []).append(t)
        parts = []
        for b, ts in sorted(by_bucket.items()):
            ds = self._bucket_ds(b)
            if ds is not None:
                parts.append(ds.to_table(
                    columns=["doc", "frequency"],
                    filter=pc.field("word").isin(ts),
                ))
        if not parts:
            return []
        hits = pa.concat_tables(parts)
        if hits.num_rows == 0:
            return []
        agg = hits.group_by("doc").aggregate([("frequency", "sum")])
        agg = agg.sort_by([("frequency_sum", "descending"), ("doc", "ascending")])
        return list(zip(
            agg.column("doc").to_pylist(),
            (int(s) for s in agg.column("frequency_sum").to_pylist()),
        ))


def search_indexed_local(index_path: str, query: str, buckets: int = 16) -> list[tuple]:
    """One-shot convenience wrapper over :class:`IndexLookupService`."""
    return IndexLookupService(index_path, buckets=buckets).lookup(query)


def search_scan(docs: DataFrame, query: str,
                doc_col: str = "doc", text_col: str = "text",
                stopwords: tuple[str, ...] = STOPWORDS_EN,
                tokenizer=tokens) -> DataFrame:
    """The reference's 'manual checking' baseline (run-basic-search.py):
    tokenize EVERY document per query and count matches — no index. Kept
    as the comparison anchor for the search-latency bench."""
    tok = remove_stopwords(tokenizer(F.col(text_col)), stopwords)
    terms = [t for t in query.lower().split(" ") if t]
    tarr = F.array(*[F.lit(t) for t in terms])
    score = F.size(F.filter(tok, lambda w: F.array_contains(tarr, w)))
    return (
        docs.select(F.col(doc_col).alias("doc"), score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc"))
        .withColumn("score", F.col("score").cast("long"))
    )


def snippets(
    docs: DataFrame,
    hits: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    tokenizer=tokens,
) -> DataFrame:
    """W3: ±3-token context per hit position — exclusive slice end, so
    3 before + self + 2 after, joined with ' ... ' (processing.py:123-134).
    ``tokenizer``/``stopwords`` must match the postings build so positions
    index the same filtered token stream."""
    tok = remove_stopwords(tokenizer(F.col(text_col)), stopwords)
    d = docs.select(F.col(doc_col).alias("doc"), tok.alias("toks"))
    j = hits.join(d, "doc", "inner")
    frag = F.transform(
        F.col("all_positions"),
        lambda p: F.concat_ws(
            " ",
            F.slice(
                F.col("toks"),
                F.greatest(p - 2, F.lit(1)),           # 1-based: pos-3 .. pos+2
                F.when(p - 2 < 1, p + 3).otherwise(F.lit(6)),
            ),
        ),
    )
    return j.select("doc", "score", F.concat_ws(" ... ", frag).alias("snippet"))
