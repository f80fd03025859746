"""SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication" —
public method): cluster the embedding space with a coarse quantizer,
then drop every document whose embedding is within cosine ``tau`` of a
lower-id document IN THE SAME CLUSTER. Clustering bounds the pairwise
work — the all-pairs comparison never leaves a cell, which is the whole
point of the method at web scale.

Not in the reference — a training-data-pipeline addition required by the
brief (embedding-dedup family, next to the exact/LSH paths in
``dedup/embedding.py``).

Determinism / oracle portability (the driver hash-checks this against
DuckDB): the quantizer is the same seedless one as ``similarity/ann.py``
``ivf_topk`` — centroids are the K lowest-id corpus vectors; a
production build would Lloyd-refine them, which moves cell boundaries
but not the algorithm. Cell assignment and the tau gate both compare
``round(cos, 6)`` so neither decision can straddle a ulp across engines.

Scale shape (100 TB): the assignment pass is a broadcast of K centroids
+ a per-row argmax (N*K dot products, zero shuffle). The dedup pass
shuffles once on the cell id; within a cell the join is all-pairs, so K
must grow with N to keep cells bounded (SemDeDup's own prescription —
the paper uses K=50,000 for LAION-440M; cells of ~10k vectors keep the
per-cell quadratic term trivial). A hot cell is a skew risk: cap it by
splitting on a salt of the id and comparing salt-pairs, or simply raise
K. Everything is Catalyst expressions — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webcrawler_spark.dedup.embedding import cosine

# non-vacuous on the synthetic word-soup embeddings at every sf
# (~25-60% of vectors land within 0.32 of a lower-id cell-mate)
DEFAULT_TAU = 0.32
DEFAULT_CELLS = 8


def semantic_dedup(
    embeddings: DataFrame,
    n_cells: int = DEFAULT_CELLS,
    tau: float = DEFAULT_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell, dup_of, keep) for every input vector.

    ``dup_of`` is the LOWEST-id same-cell vector with cos >= tau (NULL
    when none exists); ``keep`` = dup_of IS NULL. Keeping the min-id
    representative makes the survivor set append-stable: adding new
    (higher-id) vectors never evicts an existing survivor.
    """
    cents = embeddings.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
    )
    v = embeddings.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # assignment: argmax of the ROUNDED centroid cosine, ties -> lower cid
    scored = v.join(F.broadcast(cents)).withColumn(
        "ccos", F.round(cosine(F.col("v"), F.col("centroid")), 6)
    )
    w = Window.partitionBy("vid").orderBy(F.desc("ccos"), F.asc("cid"))
    assigned = (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select("vid", "v", F.col("cid").alias("cell"))
    )
    # within-cell: does a lower-id cell-mate sit within tau?
    lo = assigned.select(
        F.col("vid").alias("a"), F.col("v").alias("av"), "cell"
    )
    hi = assigned.select(
        F.col("vid").alias("b"), F.col("v").alias("bv"), "cell"
    )
    dups = (
        lo.join(hi, "cell")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", F.round(cosine(F.col("av"), F.col("bv")), 6))
        .filter(F.col("cos") >= tau)
        .groupBy("b")
        .agg(F.min("a").alias("dup_of"))
    )
    return (
        assigned.join(dups, assigned.vid == dups.b, "left")
        .select(
            F.col("vid").alias(id_col),
            "cell",
            "dup_of",
            F.col("dup_of").isNull().alias("keep"),
        )
        .orderBy(id_col)
    )


def semantic_dedup_oracle_sql(
    n_cells: int = DEFAULT_CELLS,
    tau: float = DEFAULT_TAU,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror: identical seedless centroids, rounded-cosine argmax
    assignment, and rounded tau gate."""

    def cos(a, b):
        return (
            f"round(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
        )

    return f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
        ), cents AS (
            SELECT vec_id AS cid, v AS centroid FROM v WHERE vec_id < {n_cells}
        ), cassign AS (
            SELECT v.vec_id, v.v, c.cid, {cos('v.v', 'c.centroid')} AS ccos
            FROM v CROSS JOIN cents c
        ), assigned AS (
            SELECT vec_id, v, cid AS cell FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
                FROM cassign
            ) WHERE crank = 1
        ), dups AS (
            SELECT hi.vec_id AS b, min(lo.vec_id) AS dup_of
            FROM assigned lo JOIN assigned hi
              ON lo.cell = hi.cell AND lo.vec_id < hi.vec_id
            WHERE {cos('lo.v', 'hi.v')} >= {tau}
            GROUP BY hi.vec_id
        )
        SELECT a.vec_id, a.cell, d.dup_of,
               d.dup_of IS NULL AS keep
        FROM assigned a LEFT JOIN dups d ON d.b = a.vec_id
        ORDER BY a.vec_id
    """
