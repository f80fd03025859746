"""CCNet-style language-model quality scoring (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data" — public method): score each document by its mean token
log-probability under a unigram model ESTIMATED FROM THE CORPUS ITSELF,
then gate on the score. CCNet uses a KenLM 5-gram; the unigram form
keeps the statistic fully distributed and oracle-checkable while
preserving the pipeline shape (model pass → broadcast → scoring pass).

Not in the reference — a training-data-pipeline addition required by the
brief (quality-scoring family).

Portability (the driver hash-checks this against DuckDB):

* tokens are keyed by their portable 60-bit hash end to end, so both
  engines aggregate and join on identical integer keys;
* the per-token log-probability ``ln(c / N)`` is rounded to 6 dp BEFORE
  the per-doc mean, so both engines average identical values and the
  final ``round(mean, 6)`` cannot straddle a ulp;
* the keep decision compares the ROUNDED score, making it bit-portable.

Scale shape (100 TB): the model pass is one hash aggregate keyed by
(60-bit token hash) — map-side partial aggregation, the exchange never
carries token text. The scoring pass re-explodes the corpus and joins
the model on the hash: broadcast when the vocabulary fits (~10M types
x 16B = 160 MB — fine), else an ordinary shuffled join on the 8-byte
key; then one groupBy(doc_id) mean with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import PORTABLE_HASH64_DUCKDB, portable_hash64
from .text import TOKEN_SPLIT_RE, tokens

# gate on mean token log-prob (natural log). Word-soup docs in the test
# tables score in a tight ~[-3.72, -3.38] band (small vocab → frequent
# tokens); the threshold sits at ~p10 of that band so the flag is
# non-vacuous at every sf. The comparison uses the 6-dp-rounded score,
# so the decision is identical in both engines wherever the cut lands.
MIN_AVG_LOGPROB = -3.41


def _doc_token_hashes(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    ).select("doc_id", portable_hash64(F.col("t")).alias("gh"))


def unigram_scores(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_avg_logprob: float = MIN_AVG_LOGPROB,
) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob, keep_lm) for every corpus doc.

    Docs with zero tokens get avg_logprob = NULL and keep_lm = false.
    """
    tok = _doc_token_hashes(corpus, id_col, text_col)
    counts = tok.groupBy("gh").agg(F.count("*").alias("c"))
    n_total = counts.agg(F.sum("c").alias("n")).select("n")
    model = counts.crossJoin(F.broadcast(n_total)).select(
        "gh", F.round(F.log(F.col("c") / F.col("n")), 6).alias("lp")
    )
    scored = (
        tok.join(F.broadcast(model), "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "avg_logprob",
            F.coalesce(F.col("avg_logprob") >= min_avg_logprob, F.lit(False)).alias(
                "keep_lm"
            ),
        )
    )


def unigram_scores_oracle_sql(
    corpus_cte: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_avg_logprob: float = MIN_AVG_LOGPROB,
) -> str:
    """DuckDB mirror over ``WITH corpus AS ({corpus_cte})`` — identical
    tokenizer, hash keys, 6-dp-rounded ln, and gate."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_col}), '{TOKEN_SPLIT_RE}'), "
        "t -> t <> '')"
    )
    gh = PORTABLE_HASH64_DUCKDB.format(col="t")
    return f"""
        WITH corpus AS ({corpus_cte}),
        tok AS (
            SELECT {id_col} AS doc_id, {gh} AS gh
            FROM (SELECT {id_col}, unnest({toks}) AS t FROM corpus)
        ),
        model AS (
            SELECT gh, round(ln(count(*) * 1.0 / (SELECT count(*) FROM tok)), 6) AS lp
            FROM tok GROUP BY gh
        ),
        scored AS (
            SELECT doc_id, count(*)::INT AS n_tokens, round(avg(lp), 6) AS avg_logprob
            FROM tok JOIN model USING (gh)
            GROUP BY doc_id
        )
        SELECT c.{id_col} AS doc_id,
               coalesce(s.n_tokens, 0)::INT AS n_tokens,
               s.avg_logprob,
               coalesce(s.avg_logprob >= {min_avg_logprob}, false) AS keep_lm
        FROM corpus c LEFT JOIN scored s ON s.doc_id = c.{id_col}
        ORDER BY doc_id
    """
