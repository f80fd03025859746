"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact cosine top-k per query: broadcast the
  (small) query set against the corpus, rank with a per-query window.
  The correctness baseline, and the right plan whenever |queries| is
  broadcast-sized — the corpus side streams with no shuffle until the
  final per-query top-k (TakeOrderedAndProject-shaped).

* ``lsh_topk`` — a scale path: random-hyperplane signatures (Charikar
  SimHash for cosine, public technique) bucket the corpus; each query
  probes only its own bucket (and optional multi-probe neighbors at
  Hamming distance 1). Recall < 1 by construction; any returned neighbor
  carries its *exact* cosine, so precision is 1.

* ``ivf_topk`` — the second scale path (IVF-flat): a deterministic
  coarse quantizer (centroids = the K lowest-id corpus vectors — a
  seedless sample, so the DuckDB oracle can mirror it exactly; a
  production build would Lloyd-refine them, which only moves the cell
  boundaries, not the algorithm) assigns every vector to its
  nearest-centroid cell; a query probes its ``nprobe`` nearest cells and
  brute-forces only those. Assignment is one broadcast of K centroids +
  a per-row argmax (the classic IVF build cost, N·K dot products, no
  shuffle); search touches ~nprobe/K of the corpus. Same contract as
  LSH: recall < 1, returned cosines exact.

Hyperplanes are deterministic (seed 42) module-level constants, dimension-
agnostic via modular indexing; generated once, embedded in closures as
Spark array literals — JVM-evaluated, no Python UDF.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webcrawler_spark.dedup.embedding import cosine

NUM_PLANES = 8
_SEED = 42


def _planes(dim: int) -> list[list[float]]:
    rng = random.Random(_SEED)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(NUM_PLANES)]


def _signature(vec, dim: int):
    sig = None
    for i, p in enumerate(_planes(dim)):
        lit = F.array(*[F.lit(x) for x in p])
        d = F.aggregate(F.zip_with(vec, lit, lambda a, b: a * b), F.lit(0.0), lambda a, v: a + v)
        bit = F.when(d > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << i)
        sig = bit if sig is None else sig + bit
    return sig


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos, rank ≤ k); self-matches excluded."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: (query_id, neighbor_id, cos, rank ≤ k) searching only
    the query's ``nprobe`` nearest centroid cells (see module docstring).

    Cell assignment ranks centroids by ``round(cos, 6)`` DESC, centroid id
    ASC — rounding BEFORE ranking keeps the argmax stable across engines
    (raw doubles can order differently in the last ulp)."""
    cents = corpus.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
    )

    def assign(df, idn, vn, keep):
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        scored = (
            df.select(F.col(id_col).alias(idn), v.alias(vn))
            .join(F.broadcast(cents))
            .withColumn("ccos", F.round(cosine(F.col(vn), F.col("centroid")), 6))
        )
        w = Window.partitionBy(idn).orderBy(F.desc("ccos"), F.asc("cid"))
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= keep)
            .select(idn, vn, F.col("cid").alias("cell"))
        )

    c = assign(corpus, "neighbor_id", "cv", 1)
    q = assign(queries, "query_id", "qv", nprobe)
    scored = (
        c.join(F.broadcast(q), ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Bucketed ANN: exact cosine within matching signature buckets."""
    def with_sig(df, idn, vn):
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        return df.select(
            F.col(id_col).alias(idn), v.alias(vn), _signature(v, dim).alias("sig")
        )

    c = with_sig(corpus, "neighbor_id", "cv")
    q = with_sig(queries, "query_id", "qv")
    if multiprobe:
        # probe own bucket + all Hamming-1 neighbors (flip each bit)
        probes = F.array(*([F.col("sig")] + [
            F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(NUM_PLANES)
        ]))
        q = q.select("query_id", "qv", F.explode(probes).alias("sig"))
    scored = (
        c.join(F.broadcast(q), ["sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
        .dropDuplicates(["query_id", "neighbor_id"])
        .orderBy("query_id", "rank")
    )
