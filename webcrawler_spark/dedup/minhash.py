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


def _spread(df: DataFrame) -> DataFrame:
    """Single-file parquet reads arrive as 1 partition; the shingle/minhash
    lambdas are interpreted (higher-order functions skip codegen), so
    spread small inputs across cores first. No-op at scale, where the scan
    already has ≥ parallelism partitions."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingle_id_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sh) — distinct 3-gram shingle ids, computed in staged
    projections so each HOF lambda binds a materialized column attribute
    (inlining `tokens(text)` into the ngrams lambda makes the interpreted
    evaluator re-tokenize per element — O(n²) per doc)."""
    return (
        _spread(docs)
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("tok"))
        .select("doc_id", ngrams(F.col("tok"), 3).alias("grams"))
        .select(
            "doc_id",
            F.array_distinct(
                F.transform("grams", lambda s: portable_hash64(s) % M)
            ).alias("sh"),
        )
    )


def signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc_id + minhash signature columns mh0..mh{k-1} (docs with <1 shingle dropped).

    The <1-shingle filter is ``size(tok) >= 3`` (equivalent: a doc has a
    3-gram iff it has ≥3 tokens), NOT ``size(sh) > 0``: predicate pushdown
    substitutes the filtered column's defining expression into the
    condition, so filtering on ``sh`` re-evaluates the md5-per-gram chain
    per doc (25% measured at sf0.1) where filtering on ``tok`` re-runs
    only the cheap tokenizer. Round 2 fixed the same re-evaluation with a
    ``repartition`` exchange barrier; this form needs no exchange at all
    (the 16 ``mh`` columns reference ``sh`` 16×, which CollapseProject
    never inlines — it only collapses cheap or singly-referenced
    producers). Best-of-3 at sf0.1/32 cores: 4.1s, tied with the barrier
    form minus its exchange, vs 5.5s with the pushdown re-evaluation."""
    d = (
        _spread(docs)
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("tok"))
        .filter(F.size("tok") >= 3)
        .select("doc_id", ngrams(F.col("tok"), 3).alias("grams"))
        .select(
            "doc_id",
            F.array_distinct(
                F.transform("grams", lambda s: portable_hash64(s) % M)
            ).alias("sh"),
        )
    )
    cols = [
        F.array_min(F.transform(F.col("sh"), lambda x: (F.lit(A[i]) * x + F.lit(B[i])) % P)).alias(f"mh{i}")
        for i in range(NUM_PERM)
    ]
    return d.select("doc_id", *cols)


def band_keys(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """(doc_id, band, key) — the LSH banding of each doc's signature, the
    probe/store unit of the incremental index (`dedup.incremental`)."""
    assert bands * rows_per_band == NUM_PERM
    sig = signatures(docs, id_col, text_col)
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws("_", *[F.col(f"mh{bi * rows_per_band + r}") for r in range(rows_per_band)]).alias("key"),
        )
        for bi in range(bands)
    ]
    return sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def candidate_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """Distinct (a, b), a < b, sharing ≥1 LSH band bucket.

    ``bands × rows_per_band`` must equal NUM_PERM; narrower bands (more
    of them) raise recall at lower similarity — (8, 2) catches j ≥ 0.9
    pairs with probability ≈ 1 − (1 − 0.81)^8 ≈ 1.
    """
    banded = band_keys(docs, id_col, text_col, bands, rows_per_band)
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.key") == F.col("r.key"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def near_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.8,
    bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """LSH candidates verified by exact 3-gram Jaccard ≥ threshold.

    This is the 100-TB shape for n-gram near-dup detection: the band join
    shuffles only equal band keys (similar docs), the exact verify touches
    candidates only — no quadratic shared-shingle blow-up. The exact
    companion (`dedup.ngram.jaccard_pairs`) remains for small corpora and
    for recall audits.
    """
    pairs = candidate_pairs(docs, id_col, text_col, bands, rows_per_band)
    sh = shingle_id_sets(docs, id_col, text_col)
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


def near_duplicates_oracle_sql(
    threshold: float,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> str:
    """DuckDB mirror of `near_duplicates`: same signatures, same band
    keys, same exact-Jaccard verify — the LSH-defined metric is fully
    deterministic so the oracle reproduces it value-for-value."""
    assert bands * rows_per_band == NUM_PERM
    sig = minhash_signature_sql(table, id_col, text_col)
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS key FROM sig".format(
            b=bi,
            cols=", ".join(f"mh{bi * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for bi in range(bands)
    )
    sh = _duck_shingles(text_col)
    return f"""
        WITH sig AS ({sig}),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM bands l JOIN bands r
              ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
        ),
        shs AS (SELECT {id_col} AS doc_id, {sh} AS sh FROM {table}),
        j AS (
            SELECT c.a, c.b,
                   round(
                       len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                       (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
                   6) AS jaccard
            FROM cand c
            JOIN shs sa ON sa.doc_id = c.a
            JOIN shs sb ON sb.doc_id = c.b
        )
        SELECT a, b, jaccard FROM j WHERE jaccard >= {threshold} ORDER BY a, b
    """


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
