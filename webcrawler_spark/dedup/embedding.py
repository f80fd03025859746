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

import random

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


# ---------------------------------------------------------------------------
# LSH-bucketed near-dup — the 100-TB scale path (no all-pairs anywhere)
# ---------------------------------------------------------------------------

LSH_PLANES = 8
_LSH_SEED = 43


def _sign_planes(dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes (Charikar sign-random-projection with
    Rademacher vectors, public technique) — shared verbatim with the
    DuckDB oracle generator below."""
    rng = random.Random(_LSH_SEED)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(LSH_PLANES)]


def sign_signature_udf(dim: int = 64):
    """Arrow UDF computing the portable integer sign signature in one
    (n,dim)@(dim,planes) int64 matmul (see lsh_near_duplicate_pairs for
    why integer quantization and why HALF_UP is reproduced via the exact
    frac comparison, not floor(abs+0.5)). Shared by the batch LSH path
    and the incremental EmbeddingIndex (similarity/incremental.py)."""
    P = np.asarray(_sign_planes(dim), dtype=np.int64).T  # (dim, LSH_PLANES)
    shifts = (1 << np.arange(LSH_PLANES, dtype=np.int64))

    @F.pandas_udf("long")
    def sig_udf(vec: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(x, dtype=np.float64) for x in vec]) * 1000.0
        A = np.abs(M)
        base = np.floor(A)
        Q = ((base + (A - base >= 0.5)) * np.sign(M)).astype(np.int64)
        bits = (Q @ P) > 0
        return pd.Series((bits * shifts).sum(axis=1))

    return sig_udf


def sign_signature_duckdb(dim: int = 64, qv_expr: str = "qv") -> str:
    """The same signature as a DuckDB SQL expression over an
    integer-quantized vector list (``round(x*1000)::BIGINT`` per
    element) — shared by every oracle that mirrors the sign buckets."""
    planes = _sign_planes(dim)
    terms = []
    for i, p in enumerate(planes):
        arr = "[" + ",".join(str(x) for x in p) + "]"
        dot = (f"list_sum(list_transform(range(1, {dim} + 1), "
               f"j -> {qv_expr}[j] * ({arr})[j]))")
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


def lsh_near_duplicate_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
) -> DataFrame:
    """(a, b, cos ≥ threshold), a < b, restricted to pairs whose sign
    signatures are within Hamming distance 1 — the LSH-defined near-dup
    metric that replaces `near_duplicate_pairs`'s blocked all-pairs at
    scale: the bucket join shuffles only equal signature keys, the exact
    cosine runs on candidates only.

    Portability: signature bits come from INTEGER dot products — the
    embedding is quantized to round(x·1000) and the planes are ±1 — so
    bit values are exact and identical in any engine regardless of
    floating summation order (a float dot's sign near 0 is not portable).
    """
    target = embeddings.sparkSession.sparkContext.defaultParallelism
    if embeddings.rdd.getNumPartitions() < target:
        # single-file parquet arrives as 1 partition; the signature lambdas
        # are interpreted (no codegen for higher-order fns) — spread first
        embeddings = embeddings.repartition(target)
    # signatures in ONE Arrow batch matmul instead of LSH_PLANES separate
    # interpreted `aggregate` passes (higher-order fns never reach codegen
    # and re-evaluate per element; warm best-of-3 end-to-end at sf0.1:
    # 2.87 s -> 2.21 s, and a numpy (n,dim)@(dim,planes) int64 matmul is
    # the 100-TB shape regardless).
    # Quantization matches Catalyst/DuckDB round() exactly: HALF_UP away
    # from zero on the binary double. NOT floor(abs+0.5) — adding 0.5 can
    # round UP in FP for the largest double below a .5 tie
    # (0.49999999999999994+0.5 == 1.0) where BigDecimal HALF_UP gives 0.
    # frac = abs - floor(abs) is EXACT for |v| < 2^52, so comparing it to
    # 0.5 reproduces HALF_UP bit-for-bit in every engine.
    sig_udf = sign_signature_udf(dim)

    v = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        sig_udf(F.col(vec_col)).alias("sig"),
    )
    # ASYMMETRIC multiprobe: the left side sits only in its own signature
    # bucket; the right side probes its own + all single-bit-flipped
    # buckets. A pair collides iff sig_l == sig_r or sig_l == sig_r^2^i —
    # i.e. the candidate metric is STRICT Hamming ≤ 1 (symmetric two-sided
    # probing admits Hamming-2 pairs through two different flips), and the
    # probe self-join explodes 1×9 instead of 9×9. The DuckDB oracle
    # mirrors the same asymmetric probe set bit-for-bit.
    probes = F.array(*([F.col("sig")] + [
        F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(LSH_PLANES)
    ]))
    left = v.select("id", "v", F.col("sig").alias("bucket"))
    right = v.select("id", "v", F.explode(probes).alias("bucket"))
    l, r = left.alias("l"), right.alias("r")
    cand = (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") != F.col("r.id")))
        .select(F.least("l.id", "r.id").alias("a"), F.greatest("l.id", "r.id").alias("b"),
                F.when(F.col("l.id") < F.col("r.id"), F.col("l.v")).otherwise(F.col("r.v")).alias("va"),
                F.when(F.col("l.id") < F.col("r.id"), F.col("r.v")).otherwise(F.col("l.v")).alias("vb"))
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
        .orderBy("a", "b")
    )


def lsh_near_duplicate_oracle_sql(
    threshold: float, table: str = "embeddings",
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> str:
    """DuckDB mirror of `lsh_near_duplicate_pairs` — same planes, same
    integer signature arithmetic, same ASYMMETRIC Hamming-1 probing
    (left = own signature bucket, right = own + single-bit flips)."""
    sig = sign_signature_duckdb(dim, qv_expr="qv")
    probes = ", ".join(["sig"] + [f"xor(sig, {1 << i})" for i in range(LSH_PLANES)])
    return f"""
        WITH v AS (
            SELECT {id_col}::BIGINT AS id,
                   list_transform({vec_col}, x -> x::DOUBLE) AS v,
                   list_transform({vec_col}, x -> round(x::DOUBLE * 1000)::BIGINT) AS qv
            FROM {table}
        ), s AS (
            SELECT id, v, {sig} AS sig FROM v
        ), banded AS (
            SELECT id, v, unnest([{probes}]) AS bucket FROM s
        ), cand AS (
            SELECT DISTINCT least(l.id, r.id) AS a, greatest(l.id, r.id) AS b
            FROM s l JOIN banded r ON l.sig = r.bucket AND l.id <> r.id
        ), scored AS (
            SELECT c.a, c.b,
                   round(list_dot_product(x.v, y.v) /
                         (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))),
                   6) AS cos
            FROM cand c JOIN s x ON x.id = c.a JOIN s y ON y.id = c.b
        )
        SELECT a, b, cos FROM scored WHERE cos >= {threshold} ORDER BY a, b
    """
