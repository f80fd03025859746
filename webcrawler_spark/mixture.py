"""Domain mixture reweighting — the Pile/DoReMi-shaped selection step a
training-data pipeline runs AFTER per-document curation: decide how many
tokens each domain (source) contributes to the final corpus, flattening
the raw crawl's Zipf head with a temperature exponent, then sample each
domain at the per-domain rate that realizes the target mixture.

Not in the reference (its pipeline ends at index/extract); part of the
brief's training-data-pipeline axis, like `curation.py`.

Arithmetic portability contract (the driver value-hashes Spark vs
DuckDB): every derived quantity is either an exact BIGINT or produced by
an IEEE-correctly-rounded primitive on BIGINT inputs:

* temperature weight = floor(sqrt(tokens)) — i.e. temperature 0.5.
  sqrt is correctly rounded in IEEE 754, and for t < 2^50 the true root
  is never within an ulp of the wrong integer, so floor(sqrt) is
  engine-portable where a general pow(t, alpha) is not (libm powers
  differ in the last ulp and floor() would amplify that to an
  off-by-one).
* divisions use floor(a / b) with a < 2^53: a and b are exact doubles
  and a non-divisible quotient is at least 1/b > ulp away from any
  integer, so the floor is deterministic (same argument as
  `curation.pack_shards_duckdb_expr`, the house float-floor idiom).
* the sampling decision reuses `curation.hash_bucket` (md5-derived,
  identical value in DuckDB).

Scale shape (100 TB): the plan is one map-side-combining groupBy(domain)
producing an aggregate-sized frame (domains number in the 10^5s at web
scale, not 10^9s); the totals join is a 1-row cross join and the
rate join back onto documents is a broadcast. The per-row keep decision
is a narrow hash compare — no second shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.curation import SAMPLE_BUCKETS, hash_bucket, hash_bucket_duckdb
from webcrawler_spark.functions.text import token_count

MIXTURE_SALT = "mixture"


def _floor_div(a: Column, b: Column) -> Column:
    # exact for a < 2^53 (module docstring); mirrors DuckDB floor(a/b)
    return F.floor(a / b).cast("long")


def domain_mixture_plan(
    df: DataFrame,
    budget_bp: int = 5000,
    domain_col: str = "domain",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain sampling plan for a token budget of budget_bp/10000 of
    the corpus: (domain, n_docs, n_tokens, share_bp, weight,
    target_tokens, rate_bp), ordered by domain.

    * share_bp — the domain's raw share of corpus tokens (basis points);
    * weight — floor(sqrt(n_tokens)): temperature-0.5 flattening, so a
      domain with 100x the tokens gets only 10x the weight;
    * target_tokens — floor(budget * weight / sum(weights));
    * rate_bp — min(10000, floor(target_tokens / n_tokens * 10000)): the
      per-domain deterministic sampling rate `mixture_sample` applies.

    A cold domain whose fair share exceeds its size caps at 10000 (we
    never upsample; epoch-repeat policy is the trainer's knob, not a
    corpus operator).
    """
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens"),
    ).withColumn("weight", F.floor(F.sqrt(F.col("n_tokens"))).cast("long"))
    tot = per.agg(
        F.sum("n_tokens").alias("_t"), F.sum("weight").alias("_w")
    )
    budget = _floor_div(F.col("_t") * F.lit(budget_bp), F.lit(SAMPLE_BUCKETS))
    plan = per.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "n_tokens",
        _floor_div(F.col("n_tokens") * F.lit(SAMPLE_BUCKETS), F.col("_t")).alias(
            "share_bp"
        ),
        "weight",
        _floor_div(budget * F.col("weight"), F.col("_w")).alias("target_tokens"),
    )
    return plan.withColumn(
        "rate_bp",
        F.least(
            F.lit(SAMPLE_BUCKETS).cast("long"),
            _floor_div(
                F.col("target_tokens") * F.lit(SAMPLE_BUCKETS), F.col("n_tokens")
            ),
        ),
    ).orderBy("domain")


def mixture_sample(
    df: DataFrame,
    budget_bp: int = 5000,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Realized mixture after applying the plan's per-domain rates with
    deterministic hash sampling: (domain, rate_bp, n_docs_kept,
    n_tokens_kept) per domain, ordered by domain. Append-stable: a doc's
    keep decision is a pure function of (salt, doc_id, its domain's
    rate), so re-runs and late-arriving domains never flip prior keeps
    unless the plan itself shifts."""
    plan = domain_mixture_plan(df, budget_bp, domain_col, text_col)
    keyed = df.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).alias("_id"),
        token_count(F.col(text_col)).alias("_n"),
    )
    kept = keyed.join(
        F.broadcast(plan.select("domain", "rate_bp")), "domain"
    ).filter(hash_bucket(F.col("_id"), MIXTURE_SALT) < F.col("rate_bp"))
    return (
        kept.groupBy("domain", "rate_bp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
            F.sum("_n").cast("long").alias("n_tokens_kept"),
        )
        .orderBy("domain")
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors
# ---------------------------------------------------------------------------

def domain_mixture_plan_duckdb(
    from_clause: str,
    toks_len_expr: str,
    budget_bp: int = 5000,
    domain_expr: str = "domain",
) -> str:
    """CTE chain ending in `mix_plan` with exactly domain_mixture_plan's
    rows. `toks_len_expr` is the engine-portable token count of the text
    column (the `_DUCK_TOKS` length fragment)."""
    B = SAMPLE_BUCKETS
    return f"""
        mix_per AS (
            SELECT {domain_expr} AS domain,
                   count(*)::BIGINT AS n_docs,
                   sum({toks_len_expr})::BIGINT AS n_tokens,
                   floor(sqrt(sum({toks_len_expr})))::BIGINT AS weight
            FROM {from_clause} GROUP BY 1
        ),
        mix_tot AS (
            SELECT sum(n_tokens)::BIGINT AS _t, sum(weight)::BIGINT AS _w
            FROM mix_per
        ),
        mix_plan AS (
            SELECT domain, n_docs, n_tokens,
                   floor(n_tokens * {B} * 1.0 / _t)::BIGINT AS share_bp,
                   weight,
                   floor(floor(_t * {budget_bp} * 1.0 / {B}) * weight * 1.0 / _w)::BIGINT
                       AS target_tokens,
                   least({B}, floor(floor(floor(_t * {budget_bp} * 1.0 / {B})
                       * weight * 1.0 / _w) * {B} * 1.0 / n_tokens))::BIGINT AS rate_bp
            FROM mix_per, mix_tot
        )
    """


def mixture_sample_duckdb(
    from_clause: str,
    toks_len_expr: str,
    budget_bp: int = 5000,
    domain_expr: str = "domain",
    id_expr: str = "doc_id",
) -> str:
    """Full SELECT mirroring `mixture_sample` (uses the plan CTEs)."""
    bucket = hash_bucket_duckdb(id_expr, MIXTURE_SALT)
    return f"""
        WITH {domain_mixture_plan_duckdb(from_clause, toks_len_expr, budget_bp, domain_expr)}
        SELECT d.domain, p.rate_bp,
               count(*)::BIGINT AS n_docs_kept,
               sum({toks_len_expr})::BIGINT AS n_tokens_kept
        FROM (SELECT {domain_expr} AS domain, {id_expr} AS doc_id, text
              FROM {from_clause}) d
        JOIN mix_plan p USING (domain)
        WHERE {bucket} < p.rate_bp
        GROUP BY 1, 2 ORDER BY 1
    """
