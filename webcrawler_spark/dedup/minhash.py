"""MinHash + LSH near-duplicate detection (shingle → minhash → band →
bucket-join), built entirely from portable integer arithmetic so the
driver's DuckDB oracle can verify it bit-for-bit.

Pipeline (classic Broder '97 / LSH banding, public technique):
  1. shingles: 3-token n-grams of the tokenized text
  2. shingle id: 60-bit md5 hash reduced mod M (31-bit) so a*x+b stays
     inside int64 in BOTH engines (Spark ANSI overflow-safe)
  3. k=NUM_PERM permutations h_i(x) = (A[i]*x + B[i]) mod P, P=2^31-1;
     signature[i] = min over shingles
  4. bands of r rows; band key = (band_index, hash of the band slice);
     docs sharing any band key are candidate pairs
  5. verify: exact 3-gram Jaccard on candidates (no false positives
     survive — LSH only prunes)

Scale: step 3 is explode(k)×shuffle-free (map-side agg by doc), step 4
shuffles on band keys (uniform), step 5 touches only candidate pairs.
A/B constants are module-level literals shared with the oracle-SQL
generator (`minhash_oracle_sql`).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.functions.hashing import PORTABLE_HASH64_DUCKDB, portable_hash64
from webcrawler_spark.functions.text import TOKEN_SPLIT_RE, ngrams, tokens

NUM_PERM = 16
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS
P = 2_147_483_647  # 2^31 - 1
M = 2_147_483_647

_rng = random.Random(42)
A = [_rng.randrange(1, P) for _ in range(NUM_PERM)]
B = [_rng.randrange(0, P) for _ in range(NUM_PERM)]


def _shingle_ids(text_col):
    sh = ngrams(tokens(text_col), 3)
    return F.array_distinct(F.transform(sh, lambda s: portable_hash64(s) % M))


def signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc_id + minhash signature columns mh0..mh{k-1} (docs with <1 shingle dropped)."""
    ids = _shingle_ids(F.col(text_col))
    d = docs.select(F.col(id_col).alias("doc_id"), ids.alias("sh")).filter(F.size("sh") > 0)
    cols = [
        F.array_min(F.transform(F.col("sh"), lambda x: (F.lit(A[i]) * x + F.lit(B[i])) % P)).alias(f"mh{i}")
        for i in range(NUM_PERM)
    ]
    return d.select("doc_id", *cols)


def candidate_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (a, b), a < b, sharing ≥1 LSH band bucket."""
    sig = signatures(docs, id_col, text_col)
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws("_", *[F.col(f"mh{bi * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]).alias("key"),
        )
        for bi in range(BANDS)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.key") == F.col("r.key"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def near_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", threshold: float = 0.8
) -> DataFrame:
    """LSH candidates verified by exact 3-gram Jaccard ≥ threshold."""
    pairs = candidate_pairs(docs, id_col, text_col)
    sh = docs.select(F.col(id_col).alias("doc_id"), _shingle_ids(F.col(text_col)).alias("sh"))
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sha"), "a")
        .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "shb"), "b")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")).cast("double"))
        .withColumn("uni", (F.size("sha") + F.size("shb") - F.col("inter")).cast("double"))
        .withColumn("jaccard", F.round(F.col("inter") / F.col("uni"), 6))
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("a", "b", "jaccard").orderBy("a", "b")


# ---------------------------------------------------------------------------
# DuckDB oracle generator — same constants, same arithmetic
# ---------------------------------------------------------------------------

def _duck_shingles(text_col: str) -> str:
    toks = f"list_filter(regexp_split_to_array(lower({text_col}), '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - 2, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+2], ' '))"
    )
    h = PORTABLE_HASH64_DUCKDB.format(col="g")
    return f"list_distinct(list_transform({grams}, g -> {h} % {M}))"


def minhash_signature_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    sh = _duck_shingles(text_col)
    mins = ", ".join(
        f"list_min(list_transform(sh, x -> ({A[i]}::BIGINT * x + {B[i]}) % {P})) AS mh{i}"
        for i in range(NUM_PERM)
    )
    return (
        f"SELECT {id_col} AS doc_id, {mins} "
        f"FROM (SELECT {id_col}, {sh} AS sh FROM {table}) "
        f"WHERE len(sh) > 0"
    )
