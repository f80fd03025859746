"""Structured-Streaming form of the WebDataset training-shard export —
the continuous version of ``multimodal/webdataset.py``: image+caption
pair files land (e.g. the crawl's per-round pair deltas), each
micro-batch is planned and written as its own set of tar shards, and a
manifest table accumulates one row per written shard.

    readStream(pair parquet dir) → foreachBatch(plan → write tars →
    append manifest) → out_dir/batch=NNNNN/shard-NNNNNN.tar

Exactly-once story (foreachBatch itself is at-least-once):

* tar writes are IDEMPOTENT without any marker: the writer is
  deterministic to the byte (USTAR, mtime=0, corpus-ordered members)
  and lands via attempt-unique tmp file + atomic rename, so a replayed
  batch re-writes identical files over identical names — tested in
  ``tests/test_webdataset.py`` (write determinism).
* the manifest is written per batch to its own ``_manifest/batch=NNNNN``
  directory with mode=overwrite, so a replay (including a crash between
  manifest write and marker creation) REWRITES identical rows instead of
  double-appending; the per-batch DONE marker only skips redundant
  re-work.
* reusing an ``out_dir`` with a FRESH checkpoint would replay batch ids
  from 0 against stale markers and silently skip NEW data — detected at
  start and raised loudly.

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
    if os.path.isdir(marker_root) and os.listdir(marker_root) and not os.path.isdir(
        checkpoint_dir
    ):
        raise RuntimeError(
            f"out_dir {out_dir!r} carries DONE markers from a previous "
            f"export but checkpoint_dir {checkpoint_dir!r} is fresh: batch "
            "ids would restart at 0 and stale markers would silently skip "
            "NEW data. Reuse the original checkpoint, or export into a "
            "fresh out_dir."
        )
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
        )
        # per-batch partition-dir overwrite, never a shared append: replay
        # after a crash in the window before the marker lands rewrites
        # IDENTICAL rows (batch_id comes back as the partition column when
        # the _manifest root is read)
        man.write.mode("overwrite").parquet(
            os.path.join(out_dir, "_manifest", f"batch_id={int(batch_id)}")
        )
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
