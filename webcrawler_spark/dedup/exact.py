"""Exact deduplication — hash-groupBy (the J5/W2 pattern generalized to a
training-data pipeline op).

Semantics: identity = the whitespace-collapsed, lowercased text (the
reference's duplicate definition, WebCrawler.java:230-231); the earliest
row (min id) in each group is canonical; all group members map to it.

Scale: one shuffle on the 60-bit fingerprint; the md5-based fingerprint is
uniform, so no skew. Exact-confirm on the raw text guards hash collisions
(reference semantics are exact equality) — at 60 bits the collision
probability at 10^10 rows is ~3%, so the confirm join is not optional at
scale; it's included here and costs nothing extra (same shuffle key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.functions.text import collapse_ws, fingerprint64


def dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per duplicate *group* (n_docs ≥ 2): fingerprint, size, canonical id."""
    norm = F.lower(collapse_ws(F.col(text_col)))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            fingerprint64(F.col(text_col)).alias("fingerprint"),
            norm.alias("norm_text"),
        )
        .groupBy("fingerprint", "norm_text")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("canonical_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .select("fingerprint", "n_docs", "canonical_id")
    )


def drop_exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id row per identical-text group (first-writer-wins W2)."""
    from pyspark.sql import Window

    w = Window.partitionBy(fingerprint64(F.col(text_col)), F.lower(collapse_ws(F.col(text_col)))).orderBy(id_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
