"""Structured-Streaming form of the WebDataset training-shard export —
the continuous version of ``multimodal/webdataset.py``: image+caption
pair files land (e.g. the crawl's per-round pair deltas), each
micro-batch is planned and written as its own set of tar shards, and a
manifest table accumulates one row per written shard.

    readStream(pair parquet dir) → foreachBatch(plan → write tars →
    append manifest) → out_dir/batch=NNNNN/shard-NNNNNN.tar

Exactly-once story (foreachBatch itself is at-least-once):

* tar writes are IDEMPOTENT without any marker: the writer is
  deterministic to the byte (USTAR, mtime=0, key-ordered members) and
  lands via tmp-file + atomic rename, so a replayed batch re-writes
  identical files over identical names — tested in
  ``tests/test_webdataset.py`` (write determinism).
* the manifest APPEND is the non-idempotent step, so it is guarded by a
  per-batch DONE marker (same pattern as ``streaming/curation.py``):
  replay of a completed batch skips both the re-write and the
  double-append.

Shard ids are per-batch (each batch plans from byte offset 0 under its
own ``batch=NNNNN`` directory), so shard names are deterministic
functions of (batch_id, within-batch plan) — stable across replay and
resume — and a training loader globs ``batch=*/shard-*.tar``.

Scale shape: per micro-batch cost is one |batch|-sized plan (three thin
exchanges) plus one write task per produced shard; steady-state cost
tracks the ARRIVAL RATE, not the accumulated corpus. The within-batch
prefix window defaults to a single bucket — a micro-batch is
arrival-rate-sized, not corpus-sized; pass ``bucket`` for feeds whose
single drop is itself huge."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_spark.multimodal.webdataset import (
    plan_wds_shards,
    write_webdataset,
)

__all__ = ["stream_webdataset"]


def stream_webdataset(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    budget_bytes: int = 1 << 28,
    schema=None,
    id_col: str = "image_id",
    fmt_col: str | None = "fmt",
    bucket: Column | None = None,
    max_files_per_trigger: int = 1,
) -> int:
    """One ``availableNow`` drain: every not-yet-exported pair file
    becomes tar shards under ``out_dir/batch=NNNNN/`` plus manifest rows
    under ``out_dir/_manifest``; returns the number of micro-batches
    actually exported. Re-invoke after more files land (same
    ``checkpoint_dir``) to export only the new arrivals."""
    if schema is None:
        schema = spark.read.parquet(input_path).schema
    marker_root = os.path.join(out_dir, "_done")
    os.makedirs(marker_root, exist_ok=True)
    exported = {"n": 0}

    def _export(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_root, f"batch_{batch_id}")
        if os.path.exists(marker):
            return  # replay of a completed batch (see module docstring)
        planned = plan_wds_shards(
            batch_df,
            budget_bytes=budget_bytes,
            bucket=bucket if bucket is not None else F.lit(0),
            order_col=id_col,
        )
        man = write_webdataset(
            planned,
            os.path.join(out_dir, f"batch={batch_id:05d}"),
            id_col=id_col,
            fmt_col=fmt_col,
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        man.write.mode("append").parquet(os.path.join(out_dir, "_manifest"))
        os.makedirs(marker, exist_ok=True)
        exported["n"] += 1

    query = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .writeStream.foreachBatch(_export)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return exported["n"]
