"""N-gram Jaccard near-duplicate pairs — the exact (non-approximate)
companion to minhash LSH, for corpora where full pairwise-within-block is
affordable.

Blocking: explode each doc's distinct shingle set and join on shingle id —
pairs sharing zero shingles are never materialized (the join IS the
blocking). The shared-shingle count comes out of the same join via a
groupBy, so Jaccard needs no second pass over text.

Scale: the shingle join shuffles on shingle id; ultra-common shingles are
hot keys — cap them with a document-frequency filter (`max_df`), the
standard trick (a shingle in >max_df docs is blocklisted; near-identical
docs still share many rarer shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.functions.text import ngrams, tokens


def shingle_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    sh = F.array_distinct(ngrams(tokens(F.col(text_col)), n))
    return docs.select(F.col(id_col).alias("doc_id"), sh.alias("sh")).filter(F.size("sh") > 0)


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """(a, b, jaccard ≥ threshold), a < b, over n-gram shingle sets.

    With ``max_df``, shingles appearing in more than max_df documents are
    removed from the *universe* before anything else — Jaccard is then
    computed over the remaining informative shingles (set sizes included).
    This caps the d² pair blow-up of hot shingles (the standard trick) and
    is a well-defined metric, not a truncation artifact.
    """
    sets = shingle_sets(docs, id_col, text_col, n)
    if max_df is None:
        ex = sets.select("doc_id", F.size("sh").alias("sz"), F.explode("sh").alias("g"))
    else:
        e0 = sets.select("doc_id", F.explode("sh").alias("g"))
        df_counts = e0.groupBy("g").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
        e0 = e0.join(df_counts.select("g"), "g", "left_semi")
        sz = e0.groupBy("doc_id").agg(F.count("*").alias("sz"))
        ex = e0.join(sz, "doc_id")
    l, r = ex.alias("l"), ex.alias("r")
    shared = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.sz").alias("sza"),
            F.col("r.sz").alias("szb"),
        )
        .agg(F.count("*").cast("double").alias("inter"))
    )
    return (
        shared.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
        .orderBy("a", "b")
    )
