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

* ``ivf_topk`` — the second scale path (IVF-flat): a TRAINED coarse
  quantizer — deterministic k-means (init = the K lowest-id corpus
  vectors, a seedless sample; then ``lloyd_rounds`` Lloyd iterations:
  broadcast centroids → nearest-cell assignment by round(cos, 6) with
  id tie-break → per-cell element-wise mean rounded to 6 dp — spherical
  k-means, Dhillon & Modha 2001, public method) assigns every vector to
  its nearest-centroid cell; a query probes its ``nprobe`` nearest cells
  and brute-forces only those. Every Lloyd round is one broadcast of K
  centroids + one map-combined (cell, dim) mean aggregate + one
  K-row (aggregate-sized) collect — the bounded-loop shape of
  graph.pagerank and functions/bpe.py; the DuckDB oracle replays the
  rounds as an unrolled CTE chain, so training is verified, not just
  search. Assignment is N·K dot products, no shuffle; search touches
  ~nprobe/K of the corpus. Same contract as LSH: recall < 1, returned
  cosines exact. Empty cells keep their previous centroid.

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


def lloyd_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    lloyd_rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic spherical k-means coarse quantizer: (cid, centroid).

    Init = the K lowest-id vectors; each round assigns every corpus
    vector to its nearest centroid (round(cos, 6) DESC, cid ASC) and
    replaces each centroid with the element-wise mean of its cell,
    rounded to 6 dp. Centroids are collected per round (K·dim doubles —
    aggregate-sized) so each round's plan is flat and the centroid join
    is broadcast by construction. Empty cells keep their previous
    centroid (possible once means drift; the fixed tie-break makes it
    deterministic)."""
    spark = corpus.sparkSession
    vecs = corpus.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    cents = [
        (int(r["vid"]), list(r["v"]))
        for r in vecs.filter(F.col("vid") < n_cells).collect()
    ]
    cents = [(i, v) for i, (_, v) in enumerate(sorted(cents))]
    for _ in range(lloyd_rounds):
        cdf = spark.createDataFrame(
            cents, "cid int, centroid array<double>"
        )
        scored = vecs.join(F.broadcast(cdf)).withColumn(
            "ccos", F.round(cosine(F.col("v"), F.col("centroid")), 6)
        )
        # argmax by (ccos DESC, cid ASC) as a map-combined max(struct)
        # aggregate — (ccos, -cid) is unique per vid, so this equals the
        # row_number window exactly while skipping its sort shuffle
        # (at 10^9 vectors the per-round sort is the cost that matters)
        assigned = (
            scored.groupBy("vid")
            .agg(F.max(F.struct(
                F.col("ccos"), (-F.col("cid")).alias("ncid"), F.col("v")
            )).alias("m"))
            .select(
                (-F.col("m.ncid")).cast("int").alias("cid"),
                F.posexplode("m.v").alias("pos", "x"),
            )
        )
        means = (
            assigned.groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .collect()
        )
        new = {int(r["cid"]): list(r["centroid"]) for r in means}
        cents = [(cid, new.get(cid, old)) for cid, old in cents]
    return spark.createDataFrame(cents, "cid int, centroid array<double>")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    lloyd_rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: (query_id, neighbor_id, cos, rank ≤ k) searching only
    the query's ``nprobe`` nearest centroid cells over the k-means-trained
    quantizer (see module docstring; ``lloyd_rounds=0`` = the raw
    lowest-id quantizer).

    Cell assignment ranks centroids by ``round(cos, 6)`` DESC, centroid id
    ASC — rounding BEFORE ranking keeps the argmax stable across engines
    (raw doubles can order differently in the last ulp)."""
    cents = lloyd_centroids(corpus, n_cells, lloyd_rounds, id_col, vec_col)

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


_DUCK_COS = ("round(list_dot_product({a}, {b}) / "
             "(sqrt(list_dot_product({a}, {a})) * "
             "sqrt(list_dot_product({b}, {b}))), 6)")


def ivf_topk_oracle_sql(
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    lloyd_rounds: int = 3,
    table: str = "embeddings",
    query_pred: str = "vec_id < 3",
) -> str:
    """DuckDB mirror of ``ivf_topk`` including the k-means training:
    Lloyd rounds unrolled as a MATERIALIZED CTE chain c0 → c{R} (each
    c{r} is referenced twice — assignment + empty-cell carry — so
    inlining would double the plan per round), then the cell-probed
    search against c{R}."""
    cos_vc = _DUCK_COS.format(a="v.v", b="c.centroid")
    ctes = [f"""v AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM {table}
        )""",
            f"""c0 AS (
            SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cid,
                   v AS centroid
            FROM v WHERE vec_id < {n_cells}
        )"""]
    for r in range(1, lloyd_rounds + 1):
        p = r - 1
        ctes.append(f"""a{r} AS (
            SELECT vid, vv, cid FROM (
                SELECT v.vec_id AS vid, v.v AS vv, c.cid,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY {cos_vc} DESC, c.cid ASC) AS crank
                FROM v CROSS JOIN c{p} c
            ) WHERE crank = 1
        )""")
        ctes.append(f"""m{r} AS (
            SELECT cid, list(m ORDER BY pos) AS centroid FROM (
                SELECT cid, pos, round(avg(vv[pos]), 6) AS m
                FROM (SELECT cid, vv, unnest(range(1, len(vv) + 1)) AS pos
                      FROM a{r})
                GROUP BY cid, pos
            ) GROUP BY cid
        )""")
        ctes.append(f"""c{r} AS MATERIALIZED (
            SELECT p.cid, coalesce(m.centroid, p.centroid) AS centroid
            FROM c{p} p LEFT JOIN m{r} m USING (cid)
        )""")
    cn = f"c{lloyd_rounds}"
    cos_qc = _DUCK_COS.format(a="p.qv", b="c.cv")
    return ("WITH " + ",\n".join(ctes) + f""",
        cassign AS (
            SELECT v.vec_id, v.v, c.cid,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cos_vc} DESC, c.cid ASC) AS crank
            FROM v CROSS JOIN {cn} c
        ),
        corpus AS (
            SELECT vec_id AS neighbor_id, v AS cv, cid AS cell
            FROM cassign WHERE crank = 1
        ),
        probes AS (
            SELECT vec_id AS query_id, v AS qv, cid AS cell
            FROM cassign WHERE crank <= {nprobe} AND ({query_pred})
        ),
        scored AS (
            SELECT p.query_id, c.neighbor_id, {cos_qc} AS cos
            FROM probes p JOIN corpus c
              ON c.cell = p.cell AND c.neighbor_id <> p.query_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC
            ) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos, rank::INT AS rank FROM ranked
        WHERE rank <= {k} ORDER BY query_id, rank
    """)


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
