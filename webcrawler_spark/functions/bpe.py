"""BPE merge-pair statistics — the counting primitive a byte-pair-
encoding tokenizer trainer iterates (Sennrich et al. 2016): the
frequency of every adjacent symbol pair across the corpus, here for the
first merge step (symbols = characters).

A training-data pipeline runs this to fit the tokenizer ON the corpus
it just curated; the brief's "token counting (whitespace + a BPE-ish
regex)" axis gets its training-side counterpart.

Scale shape (100 TB) — the classic BPE trick, distributed: pair counts
are computed over the WORD VOCABULARY WITH MULTIPLICITIES, never the
corpus. One hash aggregate folds 10^13 token occurrences into a 10^7-row
(word, count) vocab; the pair explode then touches each distinct word
once, weighted by its count — the explode factor is word length, bounded
by ~40 chars, over vocab-sized input. The final top-K is
``orderBy().limit()`` = TakeOrderedAndProject (per-partition heaps, no
global sort shuffle).

Portability: pairs come from ``substring(word, i, 2)`` over an exploded
1..len-1 integer sequence — identical semantics in Spark and DuckDB
(splitting on the empty regex differs between engines; substring does
not). Counts are exact longs; ties in the top-K break on the pair's
binary string order (tokens are [a-z0-9], where UTF8-binary and DuckDB
collation agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    k: int = 50) -> DataFrame:
    """Top-``k`` adjacent character pairs by corpus frequency:
    (pair, n_positions, n_occurrences) — n_positions = distinct (word,
    position) sites in the vocab, n_occurrences = those sites weighted
    by each word's corpus count (BPE's merge score)."""
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
        .filter(F.length("word") >= 2)
    )
    pairs = vocab.select(
        "word", "wc",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
    ).select(
        F.expr("substring(word, i, 2)").alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_positions"),
            F.sum("wc").cast("long").alias("n_occurrences"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(k)
    )


def bpe_pair_counts_duckdb(toks_expr: str, table: str = "documents",
                           k: int = 50) -> str:
    """Full SELECT mirroring ``bpe_pair_counts``. ``toks_expr`` is the
    portable token-list fragment over the table's text column."""
    return f"""
        WITH bpe_vocab AS (
            SELECT word, count(*)::BIGINT AS wc FROM (
                SELECT unnest({toks_expr}) AS word FROM {table}
            ) GROUP BY 1 HAVING len(word) >= 2
        ),
        bpe_pairs AS (
            SELECT substring(word, i, 2) AS pair, wc FROM (
                SELECT word, wc, unnest(range(1, len(word))) AS i
                FROM bpe_vocab
            )
        )
        SELECT pair,
               count(*)::BIGINT AS n_positions,
               sum(wc)::BIGINT AS n_occurrences
        FROM bpe_pairs
        GROUP BY 1 ORDER BY n_occurrences DESC, pair LIMIT {k}
    """
