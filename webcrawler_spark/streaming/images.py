"""Structured-Streaming form of the image-payload invariant check.

The batch pipeline (``multimodal.verify_invariants``) is a stateless
Arrow ``mapInPandas`` — exactly the shape Structured Streaming composes
with for free. This module runs it over a ``readStream`` file feed of
input_hint pair rows (image_id, bytes, w, h, fmt, caption, phash) with
the native parquet SINK, so the write side is exactly-once by
construction (the file sink's commit log, not foreachBatch's
at-least-once), and each ``availableNow`` pass verifies only newly
landed files — the streaming analog of re-running the invariant gate
per crawl round.

Scale shape: per micro-batch cost is |new files| decode work; Arrow
batches keep the Python boundary vectorized; no state store is needed
(the check is per-row pure)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from webcrawler_spark.multimodal import verify_invariants

__all__ = ["stream_image_invariants"]


def stream_image_invariants(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain newly landed image-pair files through the invariant check,
    appending (image_id, shape_ok, phash_ok, quality_ok, psnr_db) rows to
    ``out_dir``. Re-invoke after more files land (same checkpoint) to
    verify only the new arrivals."""
    if schema is None:
        schema = spark.read.parquet(input_path).schema
    query = (
        verify_invariants(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_path)
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
