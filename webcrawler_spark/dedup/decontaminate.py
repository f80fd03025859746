"""Eval-set decontamination by n-gram overlap (Brown et al. 2020, GPT-3
appendix C — public method): flag training documents that share any
n-token gram with a held-out benchmark/eval set.

Not in the reference — a training-data-pipeline addition required by the
brief (dedup/curation family). Fully oracle-checkable
(`decontaminate_oracle_sql`).

Scale shape (100 TB): the eval side is small by definition (benchmarks
are thousands of documents, not billions), so its distinct gram-hash set
is computed once and BROADCAST; the corpus side streams through a narrow
gram-hash explode into the broadcast inner join, then one
groupBy(doc_id) with partial aggregation. The only exchange carries
(doc_id, 60-bit gram hash) pairs for MATCHING grams only — at a sane
contamination rate that is a vanishing fraction of the corpus. Clean
documents are restored by a final left join against the corpus ids
(broadcast of the small matched-count side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import PORTABLE_HASH64_DUCKDB, portable_hash64
from ..functions.text import TOKEN_SPLIT_RE, ngrams, tokens

NGRAM_N = 8  # GPT-3 used 13-grams at web scale; 8 keeps test docs (~35 tokens) meaningful


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gh) — distinct 60-bit hashes of the doc's n-token grams."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    ngrams(tokens(F.col(text_col)), n), lambda g: portable_hash64(g)
                )
            )
        ).alias("gh"),
    )


def decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    n: int = NGRAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shared_ngrams, contaminated) for EVERY corpus doc."""
    eval_grams = (
        _gram_hashes(evalset, id_col, text_col, n).select("gh").distinct()
    )
    matched = (
        _gram_hashes(corpus, id_col, text_col, n)
        .join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared_ngrams"))
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(F.broadcast(matched), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared_ngrams"), F.lit(0)).cast("long").alias("n_shared_ngrams"),
            (F.coalesce(F.col("n_shared_ngrams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _duck_gram_hashes(table: str, id_col: str, text_col: str, n: int) -> str:
    """DuckDB subquery producing the identical (doc_id, gh) pairs."""
    toks = (
        "list_filter(regexp_split_to_array(lower(" + text_col + "), '"
        + TOKEN_SPLIT_RE + "'), t -> t <> '')"
    )
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )
    gh = PORTABLE_HASH64_DUCKDB.format(col="g")
    return (
        f"SELECT {id_col} AS doc_id, unnest(list_distinct(list_transform({grams}, g -> {gh}))) AS gh "
        f"FROM {table}"
    )


def decontaminate_oracle_sql(
    corpus_cte: str,
    eval_cte: str,
    n: int = NGRAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: ``WITH corpus AS ({corpus_cte}), evalset AS ({eval_cte})``."""
    return f"""
        WITH corpus AS ({corpus_cte}),
        evalset AS ({eval_cte}),
        eg AS (SELECT DISTINCT gh FROM ({_duck_gram_hashes('evalset', id_col, text_col, n)})),
        cg AS ({_duck_gram_hashes('corpus', id_col, text_col, n)}),
        m AS (
            SELECT doc_id, count(*)::BIGINT AS n_shared_ngrams
            FROM cg JOIN eg USING (gh)
            GROUP BY doc_id
        )
        SELECT c.{id_col} AS doc_id,
               coalesce(m.n_shared_ngrams, 0)::BIGINT AS n_shared_ngrams,
               coalesce(m.n_shared_ngrams, 0) > 0 AS contaminated
        FROM corpus c LEFT JOIN m ON m.doc_id = c.{id_col}
        ORDER BY doc_id
    """
