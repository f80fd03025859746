"""Embedding-cosine near-duplicate detection over an array<float> column.

Exact path (`near_duplicate_pairs`): blocked all-pairs — rows are hashed
into B blocks, every unordered block pair becomes one `applyInPandas`
group whose task runs a numpy/BLAS matmul over the two blocks' matrices.
Exact results (identical pair set to a naive self-join), Arrow-batched,
O(n²d) flops done in vectorized C instead of per-element Catalyst
lambdas, and shuffle volume O(n·B) rows. Block count scales with input
(B ≈ √(n / rows_per_block)) so each task's matmul stays cache-friendly.
True web scale (10^9+ rows) uses `similarity.ann`'s LSH bucketing to
prune the pair space first — exact all-pairs is quadratic by definition.

`cosine`/`dot`/`norm` Column helpers stay JVM-side (zip_with/aggregate)
for per-pair use in other modules.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs (a, b, cos ≥ threshold), a < b — blocked numpy
    matmul per block pair (see module docstring).

    ``id_col`` must be integral (the output schema is long); a non-numeric
    id would silently cast to NULL, so fail fast instead.
    """
    id_type = embeddings.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise TypeError(
            f"near_duplicate_pairs requires an integral {id_col!r} column, got {id_type}"
        )
    v = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(n_blocks)).alias("blk"),
    )
    # replicate each row into every unordered block pair it participates in
    pair_keys = F.array(*[
        F.struct(
            F.least(F.col("blk"), F.lit(j)).alias("b1"),
            F.greatest(F.col("blk"), F.lit(j)).alias("b2"),
        )
        for j in range(n_blocks)
    ])
    tagged = v.select(
        "id", "v", "blk", F.explode(F.array_distinct(pair_keys)).alias("bp")
    ).select("id", "v", "blk", F.col("bp.b1").alias("b1"), F.col("bp.b2").alias("b2"))

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        b1, b2 = int(pdf["b1"].iloc[0]), int(pdf["b2"].iloc[0])
        ids = pdf["id"].to_numpy()
        m = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        u = m / norms[:, None]
        if b1 == b2:
            c = u @ u.T
            ia, ib = np.triu_indices(len(ids), k=1)
            aa, bb = ids[ia], ids[ib]
            cc = c[ia, ib]
        else:
            left = pdf["blk"].to_numpy() == b1
            if left.all() or (~left).all():
                return pd.DataFrame({"a": [], "b": [], "cos": []}).astype(
                    {"a": "int64", "b": "int64", "cos": "float64"})
            c = u[left] @ u[~left].T
            la, rb = ids[left], ids[~left]
            ia, ib = np.nonzero(np.ones_like(c, dtype=bool))
            aa, bb = la[ia], rb[ib]
            cc = c.ravel()
        aa2 = np.minimum(aa, bb)
        bb2 = np.maximum(aa, bb)
        cc = np.round(cc, 6)
        keep = cc >= threshold
        return pd.DataFrame({"a": aa2[keep], "b": bb2[keep], "cos": cc[keep]})

    return (
        tagged.groupBy("b1", "b2")
        .applyInPandas(block_pairs, schema="a long, b long, cos double")
        .orderBy("a", "b")
    )
