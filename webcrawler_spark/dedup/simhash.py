"""SimHash near-duplicate fingerprinting (Charikar '02, public technique).

simhash(doc) = 64-bit word where bit j = sign of Σ_tokens (±1 by bit j of
the token hash). Near-dups = pairs within Hamming distance d; candidate
blocking by splitting the fingerprint into d+1 chunks (pigeonhole: any
pair within distance d agrees on ≥1 chunk).

Portable construction: token hash = 60-bit md5 hash (same in DuckDB), bit
tests via integer shift+mask — Spark `shiftright`/bitwise & and DuckDB
`>> / &` agree on BIGINT. NUM_BITS=32 keeps the per-doc aggregation at 32
sum expressions (columnar, map-side combined).

Scale: explode(tokens) → groupBy(doc) with 32 conditional sums — one
shuffle on doc id; fingerprint comparison joins block on chunk values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.functions.hashing import PORTABLE_HASH64_DUCKDB, portable_hash64
from webcrawler_spark.functions.text import TOKEN_SPLIT_RE, tokens

NUM_BITS = 32
CHUNKS = 4
CHUNK_BITS = NUM_BITS // CHUNKS


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 32-bit fingerprint in a BIGINT column."""
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", portable_hash64(F.col("tok")))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(NUM_BITS)
    ]
    agg = t.groupBy("doc_id").agg(*sums)
    fp = None
    for j in range(NUM_BITS):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << j).cast("long")
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.alias("simhash"))


def hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def near_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_distance: int = 3
) -> DataFrame:
    """Pairs (a, b, distance ≤ max_distance) via chunk-blocked join."""
    sh = simhash(docs, id_col, text_col)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright(F.col("simhash"), c * CHUNK_BITS)
                    .bitwiseAND(F.lit((1 << CHUNK_BITS) - 1))
                    .alias("val"),
                )
                for c in range(CHUNKS)
            ])
        ).alias("ck"),
    ).select("doc_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val"))
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(r, (F.col("l.chunk") == F.col("r.chunk")) & (F.col("l.val") == F.col("r.val"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            hamming(F.col("l.simhash"), F.col("r.simhash")).cast("int").alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
        .distinct()
        .orderBy("a", "b")
    )


def simhash_oracle_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB SQL computing identical fingerprints."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_col}), '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )
    h = PORTABLE_HASH64_DUCKDB.format(col="tok")
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(NUM_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN 1 ELSE 0 END)::BIGINT * {1 << j}"
        for j in range(NUM_BITS)
    )
    return f"""
        WITH toks AS (
            SELECT {id_col} AS doc_id, unnest({toks}) AS tok FROM {table}
        ), hashed AS (
            SELECT doc_id, {h} AS h FROM toks
        ), agg AS (
            SELECT doc_id, {sums} FROM hashed GROUP BY doc_id
        )
        SELECT doc_id, {fp} AS simhash FROM agg
    """
