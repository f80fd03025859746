"""DSIR-style data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" — public
method): score every raw document by the log importance ratio
``ln(p_target(x) / p_raw(x))`` under bag-of-hashed-n-gram unigram models
estimated from a TARGET corpus (the distribution you want more of) and
the RAW corpus itself. DSIR then gumbel-resamples by the weight; the
deterministic, oracle-checkable core implemented here is the weight
itself plus a fixed threshold gate (resampling is one extra column of
seeded noise at the caller's discretion).

Not in the reference — a training-data-pipeline addition required by the
brief (quality-scoring / selection family, next to ``functions/lm.py``).

Features are DSIR's: unigrams AND bigrams hashed into ``n_buckets``
buckets (the paper uses 10k; both models are Laplace-smoothed
``(c+1)/(N+B)`` so unseen buckets are defined). Portability (the driver
hash-checks this against DuckDB):

* features are keyed by ``portable_hash64 % n_buckets`` end to end, so
  both engines aggregate and join on identical integer keys;
* the per-bucket log-ratio is rounded to 6 dp BEFORE the per-doc mean,
  and the keep gate compares the ROUNDED mean, so no decision can
  straddle a ulp across engines.

Scale shape (100 TB): one hash aggregate keyed by the integer bucket
(map-side partial; the exchange never carries token text, and the model
is at most ``n_buckets`` rows — broadcast-sized by construction, unlike
a raw vocabulary). The scoring pass re-explodes the corpus and joins the
broadcast model, then one groupBy(doc_id) mean. Identical shape to
``functions/lm.py`` with a bounded model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import PORTABLE_HASH64_DUCKDB, portable_hash64
from .text import TOKEN_SPLIT_RE, tokens

# 1024 buckets keeps Laplace smoothing meaningful on the small test
# corpora while exercising the real hashed-feature collision behavior;
# the gate at 0.0 ("looks more target than raw") keeps ~20% of the
# synthetic corpus at every sf — non-vacuous in both directions.
DEFAULT_BUCKETS = 1024
MIN_AVG_LOGRATIO = 0.0


def _doc_features(df: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(doc_id, fb) — one row per unigram+bigram occurrence, keyed by the
    portable feature-hash bucket."""
    t = tokens(F.col(text_col))
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(t, bigrams)).alias("f"),
    ).select(
        "doc_id", F.pmod(portable_hash64(F.col("f")), F.lit(n_buckets)).alias("fb")
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    min_avg_logratio: float = MIN_AVG_LOGRATIO,
) -> DataFrame:
    """(doc_id, n_feats, avg_logratio, keep_dsir) for every raw doc.

    ``target`` may overlap ``raw`` (DSIR's own setup scores the raw pool
    against a target drawn elsewhere, but self-inclusion only shifts the
    ratio, not the ordering). Docs with zero features get NULL weight
    and keep_dsir = false.
    """
    feats = _doc_features(raw, id_col, text_col, n_buckets)
    tfeats = _doc_features(target, id_col, text_col, n_buckets)

    raw_counts = feats.groupBy("fb").agg(F.count("*").alias("cr"))
    tgt_counts = tfeats.groupBy("fb").agg(F.count("*").alias("ct"))
    totals = raw_counts.agg(F.sum("cr").alias("nr")).crossJoin(
        tfeats.agg(F.count("*").alias("nt"))
    )
    model = (
        raw_counts.join(tgt_counts, "fb", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "fb",
            F.round(
                F.log(
                    ((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("nt") + n_buckets))
                    / ((F.col("cr") + 1.0) / (F.col("nr") + n_buckets))
                ),
                6,
            ).alias("lr"),
        )
    )
    scored = (
        feats.join(F.broadcast(model), "fb")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_feats"),
            F.round(F.avg("lr"), 6).alias("avg_logratio"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            "avg_logratio",
            F.coalesce(
                F.col("avg_logratio") >= min_avg_logratio, F.lit(False)
            ).alias("keep_dsir"),
        )
    )


def dsir_weights_oracle_sql(
    raw_cte: str,
    target_pred: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    min_avg_logratio: float = MIN_AVG_LOGRATIO,
) -> str:
    """DuckDB mirror over ``WITH raw AS ({raw_cte})``; the target corpus
    is ``SELECT * FROM raw WHERE {target_pred}``. Identical tokenizer,
    feature hashing, Laplace smoothing, and rounded gate."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_col}), '{TOKEN_SPLIT_RE}'), "
        "t -> t <> '')"
    )
    fh = PORTABLE_HASH64_DUCKDB.format(col="f")
    return f"""
        WITH raw AS ({raw_cte}),
        flists AS (
            SELECT {id_col} AS doc_id,
                   list_concat(
                       t,
                       list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
                   ) AS fs,
                   ({target_pred}) AS is_target
            FROM (SELECT *, {toks} AS t FROM raw)
        ),
        feats AS (
            SELECT doc_id, ({fh}) % {n_buckets} AS fb, is_target
            FROM (SELECT doc_id, unnest(fs) AS f, is_target FROM flists)
        ),
        model AS (
            SELECT fb,
                   round(ln(
                       ((sum(CASE WHEN is_target THEN 1 ELSE 0 END) + 1.0)
                        / ((SELECT count(*) FROM feats WHERE is_target) + {n_buckets}))
                       / ((count(*) + 1.0)
                          / ((SELECT count(*) FROM feats) + {n_buckets}))
                   ), 6) AS lr
            FROM feats GROUP BY fb
        ),
        scored AS (
            SELECT doc_id, count(*)::INT AS n_feats, round(avg(lr), 6) AS avg_logratio
            FROM feats JOIN model USING (fb)
            GROUP BY doc_id
        )
        SELECT r.{id_col} AS doc_id,
               coalesce(s.n_feats, 0)::INT AS n_feats,
               s.avg_logratio,
               coalesce(s.avg_logratio >= {min_avg_logratio}, false) AS keep_dsir
        FROM raw r LEFT JOIN scored s ON s.doc_id = r.{id_col}
        ORDER BY doc_id
    """
