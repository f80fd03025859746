"""Streaming-analog operators over the events table (SURVEY.md §2.9).

The reference is a polling loop, not a stream processor; its streaming-
shaped semantics (micro-batch rounds, per-key state, stop conditions) live
in the crawl engine. This module adds the standard event-stream operators
a production pipeline needs, in BOTH forms:

* batch DataFrame form (oracle-checkable against DuckDB), and
* Structured Streaming form (readStream → watermark → window → memory
  sink), exercised in tests via processAllAvailable().

Same logical plan either way — Catalyst compiles `window()` to the same
tumbling-window bucketing the batch expression spells out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Per (window_start, event_type): count + value sum. Batch form."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via lag + cumulative gap count (guide pattern):
    session breaks when the per-user gap exceeds `gap_minutes`."""
    wu = Window.partitionBy("user_id").orderBy("ts")
    # cast via TIMESTAMP (session tz = UTC): TIMESTAMP_NTZ → BIGINT directly
    # is disallowed in Spark 4
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(wu)
    with_break = events.withColumn(
        "is_break", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    sessions = with_break.withColumn(
        "session_no",
        F.sum("is_break").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_no")
    )


def streaming_tumbling_counts(
    spark: SparkSession, parquet_path: str, minutes: int = 60, watermark: str = "2 hours"
) -> DataFrame:
    """Structured Streaming form of `tumbling_counts` (memory-sink smoke).

    Returns the collected result after processAllAvailable(). Watermark
    bounds state for late data; with the file source replayed once the
    output matches the batch form."""
    schema = spark.read.parquet(parquet_path).schema
    stream = spark.readStream.schema(schema).parquet(parquet_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_counts_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(
            "SELECT * FROM tumbling_counts_stream ORDER BY window_start, event_type"
        )
    finally:
        q.stop()
