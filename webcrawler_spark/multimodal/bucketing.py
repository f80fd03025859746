"""Aspect-ratio bucketing + deterministic batch packing for image+caption
pairs (the input_hint table).

Multimodal trainers can't batch a 640x1536 portrait with a 1536x640
landscape: every batch must share one target shape. The standard answer
(public SDXL recipe, NovelAI aspect-bucketing writeup) is a fixed menu of
target shapes of ~equal pixel area; each image joins the bucket whose
aspect ratio is nearest its own, and batches are formed within a bucket.

Two stages, both deliberately cheap at 100 TB:

* **Bucket assignment is a narrow expression** — no join, no shuffle.
  The bucket menu is ~9 literals, so the argmin is a Catalyst
  ``array_min`` over an inline array of (dist, bucket) structs (struct
  comparison is lexicographic, so min dist wins and ties break to the
  smaller bucket_id). This stays inside whole-stage codegen and
  vectorizes; a broadcast-join formulation would shuffle nothing either
  but costs a join operator per row.

* **Packing parallelism is explicit.** A naive ``row_number() OVER
  (PARTITION BY bucket)`` funnels the whole corpus through ~9 reducers —
  fine at sf0.01, a single-task sort at 10^10 rows. So rows are first
  salted into ``shards`` deterministic sub-streams (portable 60-bit hash
  of image_id, so the plan is reproducible run-to-run and in the DuckDB
  oracle), and batches are packed within (bucket_id, shard): parallelism
  = n_buckets x shards, per-reducer work bounded at N/(buckets*shards),
  and each (bucket, shard) leaves at most one ragged batch — flagged
  ``is_full`` so the training writer can drop or pad them. At cluster scale
  set shards ~= executor-cores so every core packs independently.

Distance metric: linear ratio distance |w/h - bw/bh|, evaluated as
abs(w*bh - h*bw)/bh — the integer cross-multiplication is exact, the
single division by a literal is the same IEEE-754 operation in Spark and
DuckDB, so the argmin is bit-portable without any rounding epsilon.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from webcrawler_spark.functions.hashing import (
    PORTABLE_HASH64_DUCKDB,
    portable_hash64,
)

# (bucket_id, target_w, target_h): the public SDXL ~1024^2-pixel menu,
# ordered square-first so ratio ties prefer the squarer shape.
ASPECT_BUCKETS: list[tuple[int, int, int]] = [
    (0, 1024, 1024),
    (1, 1152, 896),
    (2, 896, 1152),
    (3, 1216, 832),
    (4, 832, 1216),
    (5, 1344, 768),
    (6, 768, 1344),
    (7, 1536, 640),
    (8, 640, 1536),
]

_SHARD_SALT = "batchshard"


def aspect_bucket_struct(w: Column, h: Column) -> Column:
    """Narrow argmin over the bucket menu: a struct (dist, bucket_id,
    bucket_w, bucket_h) whose array_min is the nearest-ratio bucket.
    Zero shuffle; stays in whole-stage codegen."""
    wl = w.cast("long")
    hl = h.cast("long")
    entries = [
        F.struct(
            (F.abs(wl * F.lit(bh) - hl * F.lit(bw)).cast("double")
             / F.lit(float(bh))).alias("dist"),
            F.lit(bid).alias("bucket_id"),
            F.lit(bw).alias("bucket_w"),
            F.lit(bh).alias("bucket_h"),
        )
        for bid, bw, bh in ASPECT_BUCKETS
    ]
    return F.array_min(F.array(*entries))


def shard_of(image_id: Column, shards: int, salt: str = _SHARD_SALT) -> Column:
    """Deterministic packing shard in [0, shards): portable hash, so the
    batch plan is stable across runs and engines."""
    return F.pmod(
        portable_hash64(F.concat(F.lit(salt + "|"), image_id.cast("string"))),
        F.lit(shards),
    ).cast("int")


def aspect_bucket_batches(
    pairs: DataFrame, batch_size: int = 8, shards: int = 4
) -> DataFrame:
    """The batch plan: (image_id, bucket_id, bucket_w, bucket_h, shard,
    batch_id, slot, is_full) — every batch holds exactly batch_size images
    of one bucket shape except at most one trailing ragged batch per
    (bucket, shard), flagged is_full=false.

    One shuffle, keyed by (bucket_id, shard) — parallelism is
    len(ASPECT_BUCKETS) * shards, chosen by the caller to match the
    cluster. Within a reducer the order is image_id, so the plan is a
    pure function of the input set (append-stability is NOT promised —
    packing is a final materialization step, not incremental state)."""
    assigned = (
        pairs.select("image_id", "w", "h")
        .withColumn("_b", aspect_bucket_struct(F.col("w"), F.col("h")))
        .select(
            "image_id",
            F.col("_b.bucket_id").alias("bucket_id"),
            F.col("_b.bucket_w").alias("bucket_w"),
            F.col("_b.bucket_h").alias("bucket_h"),
        )
        .withColumn("shard", shard_of(F.col("image_id"), shards))
    )
    w_rn = Window.partitionBy("bucket_id", "shard").orderBy("image_id")
    # group total over the SAME partitioning as the row_number — one
    # exchange serves both; a window keyed by (bucket, shard, batch_id)
    # would re-shuffle. A batch is full iff it isn't the ragged tail:
    # (batch_id+1)*B <= group total.
    w_grp = Window.partitionBy("bucket_id", "shard")
    return (
        assigned.withColumn("_rn", F.row_number().over(w_rn) - 1)
        .withColumn("_total", F.count(F.lit(1)).over(w_grp))
        .withColumn("batch_id", F.floor(F.col("_rn") / F.lit(batch_size)).cast("long"))
        .withColumn("slot", F.pmod(F.col("_rn"), F.lit(batch_size)).cast("int"))
        .withColumn(
            "is_full",
            (F.col("batch_id") + 1) * F.lit(batch_size) <= F.col("_total"),
        )
        .drop("_rn", "_total")
    )


def resize_plan(pairs: DataFrame) -> DataFrame:
    """Per-image preprocessing plan onto its aspect bucket: cover-resize
    then center-crop (the standard trainer transform). All arithmetic is
    narrow — zero shuffle, zero UDF; the actual pixel work happens later
    in the Arrow decode pipeline, which consumes these parameters.

    * scale     = max(bucket_w/w, bucket_h/h)  (cover: no letterboxing)
    * resized_w/h = round(dim * scale)  — >= the bucket dims by
      construction up to the rounding half-step, clamped with greatest()
    * crop_x/y  = floor((resized - bucket)/2)  (center crop)

    Doubles stay portable: one division and one multiplication of exact
    integers, identical IEEE ops in DuckDB (`resize_plan_duckdb`)."""
    b = aspect_bucket_struct(F.col("w"), F.col("h"))
    scale = F.greatest(
        b["bucket_w"].cast("double") / F.col("w").cast("double"),
        b["bucket_h"].cast("double") / F.col("h").cast("double"),
    )
    resized_w = F.greatest(
        F.round(F.col("w").cast("double") * scale, 0).cast("int"), b["bucket_w"]
    )
    resized_h = F.greatest(
        F.round(F.col("h").cast("double") * scale, 0).cast("int"), b["bucket_h"]
    )
    return pairs.select(
        "image_id",
        "w",
        "h",
        b["bucket_id"].alias("bucket_id"),
        b["bucket_w"].alias("bucket_w"),
        b["bucket_h"].alias("bucket_h"),
        resized_w.alias("resized_w"),
        resized_h.alias("resized_h"),
        F.floor((resized_w - b["bucket_w"]) / 2).cast("int").alias("crop_x"),
        F.floor((resized_h - b["bucket_h"]) / 2).cast("int").alias("crop_y"),
    )


def resize_plan_duckdb(pairs_cte: str) -> str:
    """DuckDB mirror of resize_plan over (image_id, w, h)."""
    buckets = ", ".join(f"({bid}, {bw}, {bh})" for bid, bw, bh in ASPECT_BUCKETS)
    return f"""
        menu(bucket_id, bucket_w, bucket_h) AS (VALUES {buckets}),
        scored AS (
            SELECT p.image_id, p.w, p.h, m.bucket_id, m.bucket_w, m.bucket_h,
                   row_number() OVER (
                       PARTITION BY p.image_id
                       ORDER BY abs(p.w::BIGINT * m.bucket_h
                                    - p.h::BIGINT * m.bucket_w)::DOUBLE
                                / m.bucket_h,
                                m.bucket_id
                   ) AS pick
            FROM {pairs_cte} p CROSS JOIN menu m
        ),
        planned AS (
            SELECT image_id, w, h, bucket_id, bucket_w, bucket_h,
                   greatest(round(w::DOUBLE * greatest(bucket_w::DOUBLE / w,
                                                       bucket_h::DOUBLE / h),
                                  0)::INT, bucket_w) AS resized_w,
                   greatest(round(h::DOUBLE * greatest(bucket_w::DOUBLE / w,
                                                       bucket_h::DOUBLE / h),
                                  0)::INT, bucket_h) AS resized_h
            FROM scored WHERE pick = 1
        )
        SELECT image_id, w, h, bucket_id, bucket_w, bucket_h,
               resized_w, resized_h,
               ((resized_w - bucket_w) // 2)::INT AS crop_x,
               ((resized_h - bucket_h) // 2)::INT AS crop_y
        FROM planned
    """


def aspect_batches_duckdb(
    pairs_cte: str, batch_size: int = 8, shards: int = 4
) -> str:
    """DuckDB mirror of aspect_bucket_batches over a CTE/table named
    `pairs_cte` with columns (image_id, w, h). Argmin via cross join +
    row_number (the oracle need not share the engine's physical plan,
    only its result); dist is the identical IEEE expression."""
    buckets = ", ".join(f"({bid}, {bw}, {bh})" for bid, bw, bh in ASPECT_BUCKETS)
    h = PORTABLE_HASH64_DUCKDB.format(
        col=f"('{_SHARD_SALT}|' || image_id::VARCHAR)"
    )
    return f"""
        menu(bucket_id, bucket_w, bucket_h) AS (VALUES {buckets}),
        scored AS (
            SELECT p.image_id, m.bucket_id, m.bucket_w, m.bucket_h,
                   row_number() OVER (
                       PARTITION BY p.image_id
                       ORDER BY abs(p.w::BIGINT * m.bucket_h
                                    - p.h::BIGINT * m.bucket_w)::DOUBLE
                                / m.bucket_h,
                                m.bucket_id
                   ) AS pick
            FROM {pairs_cte} p CROSS JOIN menu m
        ),
        assigned AS (
            SELECT image_id, bucket_id, bucket_w, bucket_h,
                   ({h} % {shards})::INT AS shard
            FROM scored WHERE pick = 1
        ),
        numbered AS (
            SELECT *, row_number() OVER (
                       PARTITION BY bucket_id, shard ORDER BY image_id
                   ) - 1 AS rn
            FROM assigned
        ),
        packed AS (
            SELECT image_id, bucket_id, bucket_w, bucket_h, shard,
                   (rn // {batch_size})::BIGINT AS batch_id,
                   (rn % {batch_size})::INT AS slot
            FROM numbered
        )
        SELECT image_id, bucket_id, bucket_w, bucket_h, shard, batch_id, slot,
               count(*) OVER (PARTITION BY bucket_id, shard, batch_id)
                   = {batch_size} AS is_full
        FROM packed
    """


def patch_tokens(w: Column, h: Column, patch: int = 16) -> Column:
    """Native-aspect ViT patch count: ceil(w/p) * ceil(h/p), exact
    integer arithmetic (floor of a small-int double division is exact)."""
    p = F.lit(patch).cast("long")
    return (
        F.floor((w.cast("long") + p - F.lit(1)) / p)
        * F.floor((h.cast("long") + p - F.lit(1)) / p)
    ).cast("long")


def patch_pack(
    pairs: DataFrame,
    patch: int = 16,
    token_budget: int = 1024,
    shards: int = 4,
) -> DataFrame:
    """NaViT-style native-aspect packing plan (Dehghani et al. 2023,
    "Patch n' Pack", public method): images are NEVER resized to a
    common shape — each costs its own patch-token count — and variable-
    resolution images pack together into ~token_budget sequences by the
    same contiguous-fill rule as ``curation.pack_shards`` (an image lands
    in the sequence where its exclusive token prefix starts, so images
    never split and a sequence overflows by at most one image, flagged
    ``is_overflow``). The complement of aspect-bucket batching
    (``aspect_bucket_batches``): that trades aspect fidelity for uniform
    shapes; this keeps native resolution and trades uniform shapes for
    attention masking.

    One row per input image: (image_id, w, h, n_tokens, fits, shard,
    seq_id, seq_offset, is_overflow). Images with n_tokens > token_budget
    can never pack: fits=false, NULL plan columns (gate or down-sample
    upstream). Parallelism is explicit like the batch packer's: rows
    salt into ``shards`` deterministic sub-streams and the prefix window
    runs per shard — no single-reducer window at 10^10 images.
    DuckDB mirror in ``patch_pack_duckdb``."""
    base = (
        pairs.select("image_id", "w", "h")
        .withColumn("n_tokens", patch_tokens(F.col("w"), F.col("h"), patch))
        .withColumn("fits", F.col("n_tokens") <= F.lit(int(token_budget)))
        .withColumn("shard", shard_of(F.col("image_id"), shards))
    )
    w_sh = (
        Window.partitionBy("shard")
        .orderBy("image_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = (F.sum("n_tokens").over(w_sh) - F.col("n_tokens")).cast("long")
    b = F.lit(int(token_budget)).cast("long")
    packed = (
        base.filter("fits")
        .withColumn("_pre", prefix)
        .withColumn("seq_id", F.floor(F.col("_pre") / b).cast("long"))
        .withColumn("seq_offset", (F.col("_pre") - F.col("seq_id") * b).cast("long"))
        .withColumn("is_overflow", F.col("seq_offset") + F.col("n_tokens") > b)
        .select("image_id", "seq_id", "seq_offset", "is_overflow")
    )
    return base.join(packed, "image_id", "left").select(
        "image_id", "w", "h", "n_tokens", "fits", "shard",
        "seq_id", "seq_offset",
        # a non-packed image overflows nothing: real false, not NULL
        # (engines disagree on null-bool pandas representation — same
        # rule as the funnel's is_full)
        F.coalesce("is_overflow", F.lit(False)).alias("is_overflow"),
    )


def patch_pack_duckdb(
    pairs_cte: str, patch: int = 16, token_budget: int = 1024, shards: int = 4
) -> str:
    """DuckDB mirror of ``patch_pack`` over (image_id, w, h)."""
    h = PORTABLE_HASH64_DUCKDB.format(
        col=f"('{_SHARD_SALT}|' || image_id::VARCHAR)"
    )
    p, b = int(patch), int(token_budget)
    return f"""
        ppk_base AS (
            SELECT image_id, w, h,
                   (((w + {p - 1}) // {p}) * ((h + {p - 1}) // {p}))::BIGINT
                       AS n_tokens,
                   ({h} % {shards})::INT AS shard
            FROM {pairs_cte}
        ),
        ppk_fit AS (
            SELECT *, (sum(n_tokens) OVER (PARTITION BY shard
                           ORDER BY image_id ROWS UNBOUNDED PRECEDING)
                       - n_tokens)::BIGINT AS _pre
            FROM ppk_base WHERE n_tokens <= {b}
        ),
        ppk AS (
            SELECT b.image_id, b.w, b.h, b.n_tokens,
                   (b.n_tokens <= {b}) AS fits, b.shard,
                   (f._pre // {b})::BIGINT AS seq_id,
                   (f._pre % {b})::BIGINT AS seq_offset,
                   coalesce((f._pre % {b}) + b.n_tokens > {b}, FALSE)
                       AS is_overflow
            FROM ppk_base b LEFT JOIN ppk_fit f USING (image_id)
        )
    """
