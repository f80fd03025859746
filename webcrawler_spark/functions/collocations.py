"""Collocation mining: top-K token bigrams by association lift
(lift = P(xy) / (P(x)·P(y)), the exponential of PMI — same ranking,
but expressed as one division of exact integer counts so the score is
bit-portable to DuckDB without trusting libm's log).

A training-data pipeline uses this to find multi-word expressions worth
fusing into single tokens (phrase mining, Mikolov et al. 2013 word2vec
§4 uses the same count-ratio score) and to audit corpora for templated
boilerplate (abnormally high-lift pairs).

Scale shape (100 TB):

* bigram and unigram counts are hash aggregates with map-side partial
  combine — the exchange carries each DISTINCT gram once, not each
  occurrence;
* the ``min_count`` filter lands BEFORE the joins, pruning the Zipf tail
  (the overwhelming majority of distinct bigrams are hapaxes) so the two
  count-lookup joins move only the surviving head;
* the final top-K is ``orderBy(...).limit(K)`` which Spark plans as
  TakeOrderedAndProject — per-partition heaps, no global sort shuffle.

lift arithmetic: (c_xy · N_uni) / (c_x · c_y) with the numerator and
denominator multiplied as exact longs, one double division, rounded to
6 dp — identical IEEE in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_SPLIT_RE, ngrams, tokens

DEFAULT_MIN_COUNT = 5
DEFAULT_K = 50


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = DEFAULT_MIN_COUNT,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Top-k (w1, w2, c_pair, lift) bigrams by lift, ties broken by
    (w1, w2); only pairs with c_pair >= min_count are scored."""
    tok = docs.select(tokens(F.col(text_col)).alias("tok"))
    uni = (
        tok.select(F.explode("tok").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    n_uni = uni.agg(F.sum("c")).collect()[0][0]  # one scalar, driver-side
    bi = (
        tok.select(F.explode(ngrams(F.col("tok"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c_pair"))
        .filter(F.col("c_pair") >= min_count)
        .select(
            F.split("g", " ")[0].alias("w1"),
            F.split("g", " ")[1].alias("w2"),
            "c_pair",
        )
    )
    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .select(
            "w1",
            "w2",
            "c_pair",
            F.round(
                (F.col("c_pair") * F.lit(int(n_uni))).cast("double")
                / (F.col("c1") * F.col("c2")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "w1", "w2").limit(k)


def collocations_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    min_count: int = DEFAULT_MIN_COUNT,
    k: int = DEFAULT_K,
) -> str:
    """DuckDB mirror of `collocations`."""
    toks = (
        "list_filter(regexp_split_to_array(lower(" + text_col + "), '"
        + TOKEN_SPLIT_RE
        + "'), t -> t <> '')"
    )
    return f"""
        WITH t AS (SELECT {toks} AS tok FROM {table}),
        uni AS (
            SELECT w, count(*)::BIGINT AS c
            FROM (SELECT unnest(tok) AS w FROM t) GROUP BY w
        ),
        n AS (SELECT sum(c)::BIGINT AS n_uni FROM uni),
        bi AS (
            SELECT g[1] AS w1, g[2] AS w2, count(*)::BIGINT AS c_pair
            FROM (
                SELECT unnest(list_transform(
                           range(1, greatest(len(tok) - 1, 0) + 1),
                           i -> tok[i:i+1])) AS g
                FROM t
            )
            GROUP BY w1, w2
            HAVING count(*) >= {min_count}
        )
        SELECT w1, w2, c_pair,
               round((c_pair * n.n_uni)::DOUBLE
                     / (u1.c * u2.c)::DOUBLE, 6) AS lift
        FROM bi
        JOIN uni u1 ON u1.w = bi.w1
        JOIN uni u2 ON u2.w = bi.w2
        CROSS JOIN n
        ORDER BY lift DESC, w1, w2
        LIMIT {k}
    """
