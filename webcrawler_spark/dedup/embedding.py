"""Embedding-cosine near-duplicate detection over an array<float> column.

Exact path: all-pairs cosine via a self-join — only correct-but-quadratic;
used as the verification baseline and for oracle checks at test scale.
Scale path: reuse the LSH bucketing from `similarity.ann` (random
hyperplane signatures) to prune the pair space, then verify with exact
cosine — identical output for any pair the LSH recalls.

All vector math is built-in Catalyst (`zip_with` + `aggregate`), JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def near_duplicate_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact all-pairs (a, b, cos ≥ threshold), a < b. Quadratic — use for
    verification / small partitions; LSH-pruned variant in similarity.ann."""
    v = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    l, r = v.alias("l"), v.alias("r")
    return (
        l.join(r, F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .orderBy("a", "b")
    )
