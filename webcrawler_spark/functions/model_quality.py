"""fastText-shaped learned quality filter (Joulin et al. 2016, "Bag of
Tricks for Efficient Text Classification" — public method; the
GPT-3/CCNet-style learned quality classifier the curation stack was
missing next to its heuristic gates Gopher/CCNet/DSIR).

Model = a linear classifier over hashed bag-of-n-gram features: hashed
unigram+bigram buckets (the SAME feature hasher as ``functions/dsir.py``
— one pipeline, one feature space) × a broadcast weight vector + bias.
fastText scores sigmoid(w·f/n + bias); sigmoid is strictly monotone, so
the keep gate ``sigmoid(z) >= 0.5`` is EXACTLY ``z >= 0`` — we report the
logit and gate on it, which keeps the oracle bit-comparable without a
cross-engine ``exp()`` (libm exp is not guaranteed identically rounded
between the JVM and DuckDB; see index/bm25.py for the same policy on
``ln``).

THE MODEL SEAM (like multimodal/alignment.py:47): ``model_quality_scores``
accepts any (fb:int, w:double) weights DataFrame + bias — a production
pipeline trains one elsewhere (fastText, sklearn SGD on hashed features)
and drops it in; every downstream shape is unchanged because the model
is just a broadcast join. The bundled ``fixture_weights`` stand-in is an
explicit integer LCG over the bucket id — deterministic, portable,
value-identical in DuckDB — so the driver's oracle can verify the full
scoring path end to end.

Portability: features keyed by ``portable_hash64 % n_buckets`` (integer
join keys both engines); fixture weights are exact at 6 dp by integer
construction; the per-doc mean of 6-dp weights is a double mean rounded
to 6 dp before the gate (same tolerance policy as functions/dsir.py —
reorder error ~1e-13 against a 5e-7 rounding grid).

Scale shape (100 TB): the model is ``n_buckets`` rows — broadcast by
construction, never a shuffled join; scoring is one explode + broadcast
join + one map-combined groupBy(doc_id) mean. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dsir import _doc_features
from .hashing import PORTABLE_HASH64_DUCKDB
from .text import TOKEN_SPLIT_RE

DEFAULT_BUCKETS = 1024
DEFAULT_BIAS = 0.0

# fixture weight LCG: w(fb) = round(((fb*1103515245 + 12345) % 2048)/1024
# - 1.0, 6) in [-1, 1). Max product ~1.13e12 — exact in int64 and in
# DuckDB's BIGINT; division by the power-of-two 1024 is exact in double.
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2048


def fixture_weights(spark: SparkSession,
                    n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Deterministic stand-in weight vector (fb, w) — the documented
    model seam's default. Replace with trained weights in production."""
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("fb"),
        F.round(
            ((F.col("id") * _LCG_A + _LCG_C) % _LCG_M) / F.lit(1024.0)
            - F.lit(1.0),
            6,
        ).alias("w"),
    )


def model_quality_scores(
    df: DataFrame,
    weights: DataFrame | None = None,
    bias: float = DEFAULT_BIAS,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(doc_id, n_feats, logit, keep_model) for every document.

    ``logit`` = round(mean feature weight + bias, 6); ``keep_model`` =
    logit >= 0 ≡ sigmoid(logit) >= 0.5. Docs with no features score NULL
    and are dropped (keep_model = false).
    """
    if weights is None:
        weights = fixture_weights(df.sparkSession, n_buckets)
    feats = _doc_features(df, id_col, text_col, n_buckets)
    scored = (
        feats.join(F.broadcast(weights), "fb")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_feats"),
            F.round(F.avg("w") + F.lit(bias), 6).alias("logit"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            "logit",
            F.coalesce(F.col("logit") >= 0, F.lit(False)).alias(
                "keep_model"
            ),
        )
    )


def model_quality_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    bias: float = DEFAULT_BIAS,
) -> str:
    """DuckDB mirror: identical tokenizer, feature hasher, fixture-LCG
    weights, rounded mean, and gate."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_col}), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )
    fh = PORTABLE_HASH64_DUCKDB.format(col="f")
    return f"""
        WITH flists AS (
            SELECT {id_col} AS doc_id,
                   list_concat(
                       t,
                       list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
                   ) AS fs
            FROM (SELECT *, {toks} AS t FROM {table})
        ),
        feats AS (
            SELECT doc_id, ({fh}) % {n_buckets} AS fb
            FROM (SELECT doc_id, unnest(fs) AS f FROM flists)
        ),
        w AS (
            SELECT fb, round((((fb * {_LCG_A} + {_LCG_C}) % {_LCG_M})
                              / 1024.0) - 1.0, 6) AS w
            FROM (SELECT unnest(range(0, {n_buckets})) AS fb)
        ),
        scored AS (
            SELECT doc_id, count(*)::INT AS n_feats,
                   round(avg(w) + {bias!r}::DOUBLE, 6) AS logit
            FROM feats JOIN w USING (fb) GROUP BY doc_id
        )
        SELECT d.{id_col} AS doc_id,
               coalesce(s.n_feats, 0)::INT AS n_feats,
               s.logit,
               coalesce(s.logit >= 0, false) AS keep_model
        FROM {table} d LEFT JOIN scored s ON s.doc_id = d.{id_col}
        ORDER BY doc_id
    """
