"""BM25 ranked retrieval over the document corpus (Robertson &
Sparck Jones probabilistic relevance framework; the Okapi BM25 form with
the Lucene ``ln(1 + (N - df + 0.5)/(df + 0.5))`` non-negative idf).

Not in the reference — its search path ranks by raw summed term
frequency (A6/O3, ``run-sql-search.py``); BM25 is the standard scorer a
training-data pipeline needs for retrieval-based quality filtering and
decontamination triage, so it joins the suite as a first-class query
(`bm25` in ``__spark_entry__``) with a DuckDB oracle.

Portability (the driver hash-checks scores against DuckDB):

* the only libm call, ``ln``, is rounded to 6 dp immediately (the
  ``functions/lm.py`` pattern), so a last-ulp difference between the
  JVM's and DuckDB's log cannot propagate;
* every other operation is IEEE basic arithmetic (+ - * /) written in
  the SAME expression order on both sides, with the non-dyadic k1/b
  literals cast to DOUBLE in the oracle (DuckDB otherwise parses ``1.2``
  as DECIMAL and computes ``tf * (k1+1)`` exactly, diverging from
  Spark's double multiply by up to 1 ulp before the round);
* ``avgdl`` is rounded to 6 dp before use, the per-term contribution is
  rounded to 6 dp before the per-doc sum, and the final sum is rounded
  to 6 dp — the per-doc sum reassociates at most |terms| ≈ 3 doubles,
  far inside the 6-dp guard band.

Scale shape (100 TB): doc lengths are ONE map-side-combined hash
aggregate over the exploded corpus (the exchange carries (doc_id, count)
partials, never token text); the tf aggregate is filtered to the query
terms BEFORE its shuffle, so it exchanges only matching occurrences; N
and avgdl are 1-row broadcast cross joins; the idf side is |terms| rows,
broadcast. No window, no collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.functions.text import TOKEN_SPLIT_RE, tokens

K1 = 1.2
B = 0.75


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(doc_id, n_hit_terms, bm25) for every doc containing ≥1 query term,
    ranked best-first (ties broken by doc_id)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    # 1-row frames: corpus size and 6-dp-rounded mean doc length
    n_docs = docs.select(F.count("*").cast("long").alias("n")).select("n")
    avgdl = dl.agg(F.round(F.avg("dl"), 6).alias("avgdl")).select("avgdl")
    tf = (
        tok.filter(F.col("t").isin(list(terms)))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    idf = (
        tf.groupBy("t")
        .agg(F.count("*").cast("long").alias("dfreq"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "t",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("dfreq") + F.lit(0.5))
                    / (F.col("dfreq") + F.lit(0.5))
                ),
                6,
            ).alias("idf"),
        )
    )
    contrib = (
        tf.join(F.broadcast(idf), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "doc_id",
            F.round(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_hit_terms"),
            F.round(F.sum("c"), 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
    )


def bm25_oracle_sql(
    terms: tuple[str, ...],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB mirror — identical tokenizer, idf form, rounding points, and
    expression order, with k1/b literals cast to DOUBLE so both engines
    perform the same double ops (see module docstring)."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_col}), '{TOKEN_SPLIT_RE}'), "
        "t -> t <> '')"
    )
    term_list = ", ".join("'" + t + "'" for t in terms)
    return f"""
        WITH tok AS (
            SELECT {id_col} AS doc_id, unnest({toks}) AS t FROM {table}
        ),
        dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id),
        n_docs AS (SELECT count(*)::BIGINT AS n FROM {table}),
        avgdl AS (SELECT round(avg(dl), 6) AS avgdl FROM dl),
        tf AS (
            SELECT doc_id, t, count(*)::BIGINT AS tf FROM tok
            WHERE t IN ({term_list}) GROUP BY doc_id, t
        ),
        idf AS (
            SELECT t, round(ln(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5)), 6) AS idf
            FROM (SELECT t, count(*)::BIGINT AS dfreq FROM tf GROUP BY t), n_docs
        ),
        contrib AS (
            SELECT tf.doc_id,
                   round(idf * (tf * {k1 + 1!r}::DOUBLE)
                         / (tf + {k1!r}::DOUBLE
                            * (1.0 - {b!r}::DOUBLE + {b!r}::DOUBLE * dl / avgdl)),
                   6) AS c
            FROM tf JOIN idf USING (t) JOIN dl USING (doc_id), avgdl
        )
        SELECT doc_id, count(*)::INT AS n_hit_terms, round(sum(c), 6) AS bm25
        FROM contrib GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id ASC
    """
