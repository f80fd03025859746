"""The crawl round *kernel* at production batch size — the compute that one
BSP round performs per sub-step once the frontier is wide (10^10-URL scale:
millions of eligible URLs per tick), extracted from the engine for scaling
measurement.

Why this exists: on a single machine the full BSP loop is wall-clock-bound
by the politeness budget (each tick's eligible set at fixture scale is
tiny, so the driver's ~10 jobs/sub-step dominate and more cores cannot
help). On a 1000-executor cluster the same loop runs the SAME dataflow
below over millions of rows per sub-step — that dataflow is what must
scale, and it is what `bench.py` measures at two parallelism levels for
the north_rule's two-cluster-size criterion.

Stages (mirroring engine._substep, citations in engine.py):
  candidates → F1 scheme filter → F2 canonicalize → host → F4 containment
  → F7 binary-ext → robots prefix filter → in-batch first-occurrence
  window (U3/W1) → LEFT ANTI vs seen (F5/J2) → content fingerprint
  dedup first-writer window (J5/W2)

Inputs are generated *inside Spark* (range + column expressions — no
driver-side data), deterministic in (n_candidates, n_seen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webcrawler_spark.functions.text import collapse_ws
from webcrawler_spark.functions.urls import (
    canonicalize_url,
    in_containment,
    is_binary_extension,
    is_rejected_scheme,
    url_host,
)


def synth_candidates(spark: SparkSession, n: int, n_hosts: int = 50_000) -> DataFrame:
    """n messy candidate links: ~1.5 raw URLs per canonical target, with
    query strings / fragments / '.html' noise / traps / out-of-scope hosts."""
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % n_hosts).alias("h"),
        (F.col("id") % 7).alias("noise"),
        ((F.col("id") * 2654435761) % 1000003).alias("salt"),
    )
    host = F.when(
        F.col("h") % 11 == 0, F.concat(F.lit("x"), F.col("h").cast("string"), F.lit(".example.com"))
    ).otherwise(F.concat(F.lit("h"), F.col("h").cast("string"), F.lit(".gov.si")))
    page = (F.col("id") * 13) % (n // 2 + 1)  # ~2 raw urls per target page
    raw = F.concat(
        F.lit("http://"), host, F.lit("/p"), page.cast("string"),
        F.when(F.col("noise") == 0, F.lit(".html")).otherwise(F.lit("")),
        F.when(F.col("noise") == 1, F.lit("?utm_source=x&ref=1")).otherwise(F.lit("")),
        F.when(F.col("noise") == 2, F.lit("#section")).otherwise(F.lit("")),
        F.when(F.col("noise") == 3, F.lit(".pdf")).otherwise(F.lit("")),
    )
    raw = F.when(F.col("salt") % 97 == 0, F.lit("javascript:void(0)")).otherwise(raw)
    return base.select(
        F.col("id").alias("parent_seq"),
        (F.col("id") % 40).alias("pos"),
        raw.alias("raw"),
    )


def synth_seen(spark: SparkSession, n: int, n_hosts: int = 50_000) -> DataFrame:
    return spark.range(n).select(
        F.concat(
            F.lit("http://h"), ((F.col("id") * 7) % n_hosts).cast("string"),
            F.lit(".gov.si/p"), F.col("id").cast("string"),
        ).alias("url")
    )


def synth_texts(spark: SparkSession, n: int) -> DataFrame:
    """n page texts with ~25% duplicate groups (report main.tex:157 ratio)."""
    dup = (F.col("id") % 4 == 0)
    key = F.when(dup, (F.col("id") % 997).cast("string")).otherwise(F.col("id").cast("string"))
    words = F.concat_ws(
        "  ",
        F.lit("podatki  storitve"), key, F.lit("uprava register"),
        F.sha2(key, 256), F.lit("evidenca\tpotrdilo"), F.sha2(F.concat(key, F.lit("x")), 256),
    )
    return spark.range(n).select(F.col("id").alias("seq"), words.alias("text"))


def admission_kernel(spark: SparkSession, n_candidates: int, n_seen: int) -> DataFrame:
    """F1-F7 + robots-prefix + in-batch window + seen anti-join (J2)."""
    cand = synth_candidates(spark, n_candidates)
    seen = synth_seen(spark, n_seen)
    c = (
        cand.filter(~is_rejected_scheme(F.col("raw")))
        .withColumn("url", canonicalize_url(F.col("raw")))
        .filter(F.col("url") != "")
        .withColumn("host", url_host(F.col("url")))
        .filter(F.col("host").isNotNull())
        .filter(in_containment(F.col("host")))
        .filter(~is_binary_extension(F.col("url")))
        .filter(~F.col("url").contains("/private/"))
    )
    # first-occurrence per url via hash aggregate (min_by), NOT a window:
    # partial (map-side) aggregation + no sort — the scalable form of U3
    c = c.groupBy("url").agg(
        F.min_by(F.struct("host", "parent_seq", "pos"), F.struct("parent_seq", "pos")).alias("f")
    ).select("url", "f.host", "f.parent_seq", "f.pos")
    return c.join(seen, "url", "left_anti").select("url", "host", "parent_seq", "pos")


def dedup_kernel(spark: SparkSession, n_texts: int) -> DataFrame:
    """J5/W2: fingerprint + first-writer-wins on whitespace-collapsed text."""
    t = synth_texts(spark, n_texts)
    norm = F.lower(collapse_ws(F.col("text")))
    f = t.select("seq", F.xxhash64(norm).alias("fp"))
    firsts = f.groupBy("fp").agg(F.min("seq").alias("first_seq"))
    return f.join(firsts, "fp").select(
        "seq", (F.col("seq") != F.col("first_seq")).alias("is_duplicate")
    )


def run_round_kernel(spark: SparkSession, n_candidates: int = 4_000_000,
                     n_seen: int = 2_000_000, n_texts: int = 1_000_000) -> dict:
    """One production-scale round: admission + content dedup; returns counts."""
    admitted = admission_kernel(spark, n_candidates, n_seen)
    n_admitted = admitted.count()
    deduped = dedup_kernel(spark, n_texts)
    n_dup = deduped.filter("is_duplicate").count()
    return {"n_candidates": n_candidates, "n_admitted": n_admitted,
            "n_texts": n_texts, "n_duplicates": n_dup}
