"""Inverted-index build — the reference indexer re-expressed as one
aggregation (SURVEY.md §3.3, A4/A5).

Reference: per-doc token loop accumulating frequency + a CSV string of
positions, row-at-a-time SQLite inserts (processing.py:101-121). Here:
tokenize → posexplode → groupBy(word, doc) → count + sorted position
array. Spark gives partial (map-side) aggregation and batch writes for
free; the CSV `indexes` column becomes a real array<int>.

Scale: the groupBy shuffles on (word, doc) — high cardinality, well
distributed; hot words (stopwords are already filtered, F12) don't
concentrate because doc is part of the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.functions.text import STOPWORDS_EN, remove_stopwords, tokens


def build_postings(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    tokenizer=tokens,
) -> DataFrame:
    """postings(doc, word, frequency, positions) — positions are 0-based
    token indices *after* stopword removal, mirroring the reference which
    indexes positions in its filtered token list (processing.py:101-116).
    ``tokenizer`` defaults to the ASCII X14 approximation; pass
    ``text.tokens_unicode`` for non-ASCII corpora."""
    tok = remove_stopwords(tokenizer(F.col(text_col)), stopwords)
    return (
        docs.select(F.col(doc_col).alias("doc"), F.posexplode(tok).alias("pos", "word"))
        .groupBy("doc", "word")
        .agg(
            F.count("*").cast("int").alias("frequency"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def vocabulary(postings: DataFrame) -> DataFrame:
    """A5: IndexWord — distinct vocabulary."""
    return postings.select("word").distinct()


def bucket_of_term(term: str, buckets: int = 16) -> int:
    """Driver-side twin of the index bucket function — crc32 is the same
    standard polynomial in ``zlib`` and Spark's ``F.crc32``, so a term's
    bucket is computable without a Spark job and the search path can
    STATICALLY prune the parquet partition filter to the term buckets."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % buckets


def write_index(postings: DataFrame, path: str, buckets: int = 16) -> None:
    """S9: persist the inverted index as parquet tables — the batch-write
    replacement for the reference's row-at-a-time SQLite executemany
    (processing.py:66-73). ``postings/`` is laid out in hash buckets of
    ``word`` (directory partition on a stable bucket of the join key) so
    a term lookup (J7) prunes to one bucket; ``words/`` is the IndexWord
    table. The bucket hash is crc32 (identical in zlib and the JVM — see
    ``bucket_of_term``) so lookups prune with static partition filters."""
    from pyspark.sql import functions as F

    (
        postings.withColumn(
            "bucket", F.pmod(F.crc32(F.col("word").cast("binary")), F.lit(buckets))
        )
        # word-sorted within each output file so parquet row-group min/max
        # stats on `word` are tight: a term lookup then prunes ROW GROUPS
        # inside the pruned bucket, not just the bucket directory — at
        # 100 TB a bucket holds many row groups and this is what keeps a
        # point lookup at a few MB of IO (local sort, no shuffle)
        .sortWithinPartitions("bucket", "word")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    vocabulary(postings).write.mode("overwrite").parquet(f"{path}/words")


def read_index(spark, path: str) -> DataFrame:
    """Read back the S9 postings table (bucket column retained so term
    filters prune partitions)."""
    return spark.read.parquet(f"{path}/postings")
