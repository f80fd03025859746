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


# ---------------------------------------------------------------------------
# TRAINING — close the model seam (the GPT-3 WebText-vs-CommonCrawl /
# CCNet-fastText discriminator pattern, both public): fit the SAME linear
# model by full-batch gradient descent on weak-supervision labels the
# curation stack already produces (callers typically use keep_gopher ∧
# keep_lm — positive = "passes the heuristic gates", negative = the
# complement), so the trained filter generalizes the gates into one score.
#
# Portability (the trained vector must be bit-identical in DuckDB so the
# driver can verify the WHOLE training loop, not just scoring):
# * the sigmoid is replaced by its clipped first-order expansion
#   p = clamp(0.5 + z/4, 0, 1) — the classic surrogate keeps every
#   update RATIONAL (no libm exp, whose last-ulp rounding differs
#   between engines; same policy as the logit gate above and bm25's ln).
#   z/4 and 0.5+· are exact double ops, so p and err = p − y are exact
#   given z;
# * z and every gradient are quantized to the 1e-6 grid before use, and
#   weights after every update — NOT with the engines' round(x, 6)
#   (round() quantizes boundary-adjacent doubles differently per engine
#   — measured: a 12-round trajectory straddled a 1e-6 boundary by
#   round 5) but with the explicitly-constructed
#   ``floor(x·1e6 + 0.5)/1e6``: multiply, add, floor, divide are each
#   deterministic IEEE-754 ops evaluated identically by Spark, DuckDB,
#   and CPython, so the whole weight trajectory is bit-identical BY
#   CONSTRUCTION, with no probabilistic straddle argument. The float-sum
#   reorder error (~1e-13) still sits under the 5e-7 grid, as in
#   functions/dsir.py;
# * the bias is feature fb = −1 with x = 1.0 — one uniform update rule,
#   one gradient aggregate covering it.
#
# Scale shape (100 TB): the per-doc feature shares (doc_id, fb, x) are
# computed ONCE (one explode + two hash aggregates) and checkpointed;
# each round is one broadcast join of the ≤(n_buckets+1)-row weight
# vector + one map-combined groupBy(fb) gradient aggregate + one
# aggregate-sized collect (≤ n_buckets+1 rows, like PageRank's per-round
# dangling-mass read and BPE's top-pair read). N rounds = N small jobs;
# nothing in the loop grows with corpus size.
# ---------------------------------------------------------------------------

# 12 rounds at lr 0.25 reaches 0.934 accuracy on the weak labels at
# sf0.01 (base rate 0.786; the lm-gate-only ceiling is ~0.89) — measured
# over the lr×rounds grid; larger lr oscillates under the clamp.
DEFAULT_ROUNDS = 12
DEFAULT_LR = 0.25
_MAX_TRAIN_BUCKETS = 4096  # per-round collect is n_buckets+1 rows — keep
                           # it aggregate-sized (similarity/incremental.py's
                           # MAX_PROBE_BUCKETS policy)


def _q6(c):
    """Spark column: quantize to the 1e-6 grid via floor(x·1e6 + 0.5)/1e6
    — bit-identical across engines (see portability note above)."""
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def _q6_py(v: float) -> float:
    import math

    return math.floor(v * 1000000.0 + 0.5) / 1000000.0


def _q6_sql(expr: str) -> str:
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"


def _doc_feature_shares(df: DataFrame, id_col: str, text_col: str,
                        n_buckets: int) -> DataFrame:
    """(doc_id, fb, x): x = occurrence share of bucket fb in the doc
    (shares sum to 1 per doc), plus the bias pseudo-feature (−1, 1.0).
    Docs with zero features emit only... nothing — they carry no signal
    and are excluded from training (scoring gives them NULL, as before).
    """
    cnt = (
        _doc_features(df, id_col, text_col, n_buckets)
        .groupBy("doc_id", "fb")
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    nd = cnt.groupBy("doc_id").agg(F.sum("cnt").alias("n_d"))
    real = cnt.join(nd, "doc_id").select(
        "doc_id", "fb", (F.col("cnt") / F.col("n_d")).alias("x")
    )
    bias = nd.select("doc_id", F.lit(-1).alias("fb"), F.lit(1.0).alias("x"))
    return real.unionByName(bias)


def train_quality_model(
    df: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    n_rounds: int = DEFAULT_ROUNDS,
    lr: float = DEFAULT_LR,
) -> tuple[DataFrame, float]:
    """Fit the linear quality model on ``labels`` (doc_id, y ∈ {0,1});
    returns (weights DataFrame (fb:int, w:double), bias:float) ready for
    ``model_quality_scores(df, weights=w, bias=b)``.

    Full-batch gradient descent, ``n_rounds`` rounds (fixed count — the
    artifact must be deterministic, not convergence-gated):
    z_d = q6(Σ_fb w·x); p_d = clamp(0.5 + z/4, 0, 1);
    grad_fb = q6(Σ_d (p_d − y_d)·x / N);
    w ← q6(w − lr·pre_fb·grad_fb) with the Jacobi (diagonal)
    preconditioner pre_fb = q6(N / Σ_d x²), computed once: bucket
    shares are ~1/n_feats while the bias feature is 1.0, so an
    unpreconditioned step moves the bias ~10⁴× faster than any bucket
    weight and the model collapses to the base rate (measured); the
    diagonal Newton scale equalizes the per-coordinate curvature.
    See the portability note above for why this is engine-exact."""
    if n_buckets > _MAX_TRAIN_BUCKETS:
        raise ValueError(
            f"n_buckets={n_buckets} > {_MAX_TRAIN_BUCKETS}: the per-round "
            "gradient collect must stay aggregate-sized"
        )
    spark = df.sparkSession
    feats = (
        _doc_feature_shares(df, id_col, text_col, n_buckets)
        .join(labels.select(F.col(id_col).alias("doc_id"),
                            F.col("y").cast("double").alias("y")), "doc_id")
        .localCheckpoint(eager=True)  # reused every round; flat lineage
    )
    n_docs = feats.filter(F.col("fb") == -1).count()
    if n_docs == 0:
        raise ValueError("train_quality_model: no labeled docs with features")
    # Jacobi preconditioner, one aggregate + one aggregate-sized collect
    # (bias row: Σx² = N → pre = 1.0 exactly)
    pre = {
        int(r["fb"]): r["pre"]
        for r in feats.groupBy("fb")
        .agg(_q6(F.lit(float(n_docs)) / F.sum(F.col("x") * F.col("x")))
             .alias("pre"))
        .collect()
    }
    w = {fb: 0.0 for fb in range(-1, n_buckets)}
    for _ in range(n_rounds):
        wdf = spark.createDataFrame(
            [(fb, wv) for fb, wv in w.items()], "fb int, w double"
        )
        z = (
            feats.join(F.broadcast(wdf), "fb")
            .groupBy("doc_id", "y")
            .agg(_q6(F.sum(F.col("w") * F.col("x"))).alias("z"))
            .select(
                "doc_id",
                (
                    F.least(
                        F.greatest(F.lit(0.5) + F.col("z") / 4, F.lit(0.0)),
                        F.lit(1.0),
                    )
                    - F.col("y")
                ).alias("err"),
            )
        )
        grads = (
            feats.join(z, "doc_id")
            .groupBy("fb")
            .agg(_q6(F.sum(F.col("err") * F.col("x")) / n_docs)
                 .alias("g"))
            .collect()
        )
        for row in grads:
            fb = int(row["fb"])
            # parenthesized to match the oracle's lr * (pre * g) —
            # float multiply is not associative for arbitrary lr
            w[fb] = _q6_py(w[fb] - lr * (pre[fb] * row["g"]))
    weights = spark.createDataFrame(
        [(fb, wv) for fb, wv in w.items() if fb >= 0], "fb int, w double"
    )
    return weights, w[-1]


def trained_quality_oracle_sql(
    labels_cte: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    n_rounds: int = DEFAULT_ROUNDS,
    lr: float = DEFAULT_LR,
    bias: float = DEFAULT_BIAS,
) -> str:
    """DuckDB mirror of train_quality_model + model_quality_scores with
    the trained weights: the gradient loop unrolled as a MATERIALIZED-CTE
    chain (w0 → w{n_rounds}, the functions/bpe.py pattern — each w{r} is
    referenced twice, so inlining would blow up the plan tree), then the
    standard scoring SELECT joined against w{n_rounds}.

    ``labels_cte`` must yield (doc_id, y) for the training docs."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_col}), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )
    fh = PORTABLE_HASH64_DUCKDB.format(col="f")
    ctes = [f"""labels AS MATERIALIZED ({labels_cte})""",
            f"""flists AS (
            SELECT {id_col} AS doc_id,
                   list_concat(
                       t,
                       list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
                   ) AS fs
            FROM (SELECT *, {toks} AS t FROM {table})
        )""",
            f"""fcnt AS (
            SELECT doc_id, ({fh}) % {n_buckets} AS fb, count(*)::DOUBLE AS cnt
            FROM (SELECT doc_id, unnest(fs) AS f FROM flists)
            GROUP BY doc_id, fb
        )""",
            """nd AS (SELECT doc_id, sum(cnt) AS n_d FROM fcnt GROUP BY doc_id)""",
            """feats AS MATERIALIZED (
            SELECT f.doc_id, f.fb, f.cnt / n.n_d AS x, l.y::DOUBLE AS y
            FROM fcnt f JOIN nd n USING (doc_id) JOIN labels l USING (doc_id)
            UNION ALL
            SELECT n.doc_id, -1 AS fb, 1.0 AS x, l.y::DOUBLE AS y
            FROM nd n JOIN labels l USING (doc_id)
        )""",
            """nn AS (SELECT count(*)::DOUBLE AS n FROM feats WHERE fb = -1)""",
            f"""pre AS MATERIALIZED (
            SELECT fb, {_q6_sql('(SELECT n FROM nn) / sum(x * x)')} AS pre
            FROM feats GROUP BY fb
        )""",
            f"""w0 AS (
            SELECT (fb - 1)::INT AS fb, 0.0::DOUBLE AS w
            FROM (SELECT unnest(range(0, {n_buckets + 1})) AS fb)
        )"""]
    for r in range(1, n_rounds + 1):
        p = r - 1
        ctes.append(f"""e{r} AS (
            SELECT doc_id,
                   least(greatest(0.5 + z / 4, 0.0), 1.0) - y AS err
            FROM (
                SELECT f.doc_id, f.y,
                       {_q6_sql(f'sum(w.w * f.x)')} AS z
                FROM feats f JOIN w{p} w USING (fb)
                GROUP BY f.doc_id, f.y
            )
        )""")
        ctes.append(f"""g{r} AS (
            SELECT f.fb,
                   {_q6_sql('sum(e.err * f.x) / (SELECT n FROM nn)')} AS g
            FROM feats f JOIN e{r} e USING (doc_id)
            GROUP BY f.fb
        )""")
        ctes.append(f"""w{r} AS MATERIALIZED (
            SELECT w.fb,
                   {_q6_sql(f'w.w - {lr!r} * coalesce(p.pre * g.g, 0.0)')} AS w
            FROM w{p} w
            LEFT JOIN g{r} g USING (fb)
            LEFT JOIN pre p USING (fb)
        )""")
    wn = f"w{n_rounds}"
    return ("WITH " + ",\n".join(ctes) + f"""
        , occ AS (
            SELECT doc_id, ({fh}) % {n_buckets} AS fb
            FROM (SELECT doc_id, unnest(fs) AS f FROM flists)
        ),
        scored AS (
            SELECT o.doc_id, count(*)::INT AS n_feats,
                   round(avg(w.w)
                         + (SELECT w FROM {wn} WHERE fb = -1)
                         + {bias!r}::DOUBLE,
                         6) AS logit
            FROM occ o JOIN {wn} w USING (fb)
            GROUP BY o.doc_id
        )
        SELECT d.{id_col} AS doc_id,
               coalesce(s.n_feats, 0)::INT AS n_feats,
               s.logit,
               coalesce(s.logit >= 0, false) AS keep_model
        FROM {table} d LEFT JOIN scored s ON s.doc_id = d.{id_col}
        ORDER BY doc_id
    """)


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
