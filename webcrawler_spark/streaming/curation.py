"""Structured-Streaming front end for the incremental curation funnel.

``IncrementalCurator`` (curation.py) already gives batch-chunking-
invariant curation over an id-ordered feed; this module drives it from a
real ``readStream`` file source so a continuously-landing corpus (e.g.
the crawl's per-round document deltas, whose monotone ``vseq`` ids give
the required id ordering for free) is curated as it arrives:

    readStream(parquet dir) → foreachBatch(curator.add_batch) →
    survivors appended to one output parquet table.

Exactly-once story (the part foreachBatch does NOT give by itself —
foreachBatch is at-least-once, Structured Streaming programming guide,
"Using Foreach and ForeachBatch"):

* The stream checkpoint makes file ingestion resumable: a restarted
  query re-fires only the last in-flight micro-batch, never completed
  ones.
* Per-batch DONE markers (written after the survivor append, keyed by
  the deterministic ``batch_id`` foreachBatch supplies) make a replay of
  a COMPLETED batch a no-op instead of a double-ingest.
* A crash in the narrow window inside one batch (curator state advanced
  but output/marker not yet written) is detected loudly on replay — the
  curator's high-water mark precedes this batch's min id with no marker
  present — and raised with a recovery hint, never silently dropped or
  double-counted. Making that window atomic needs a transactional sink
  (the crawl engine's manifest-gated commit, crawl/engine.py, is the
  pattern; Iceberg snapshots at production).

Scale shape: each micro-batch does exactly the work of one
``add_batch`` — |batch|-sized shuffles probed against partition-pruned
persisted state — so steady-state cost tracks the arrival rate, not the
accumulated corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["stream_curation"]


def _marker_dir(curator) -> str:
    return f"{curator.root}/stream_done"


def stream_curation(
    spark: SparkSession,
    input_path: str,
    curator,
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    max_files_per_trigger: int = 1,
) -> int:
    """Run one ``availableNow`` pass of the curation stream: ingest every
    not-yet-processed file under ``input_path``, append survivors to
    ``out_dir``, return the number of micro-batches actually ingested.

    Call again after more files land (same ``checkpoint_dir``) to curate
    only the new arrivals — the streaming analog of calling
    ``curator.add_batch`` per drop. Files must land in id order (each
    file's min id above every earlier file's max), which the crawl's
    monotone per-round ``vseq`` deltas satisfy by construction; the
    curator's high-water mark turns a violation into a loud error.

    ``availableNow`` + ``maxFilesPerTrigger=1`` (default) processes each
    file as its own micro-batch in file order, then terminates — a
    drain-the-backlog trigger that leaves a resumable checkpoint, which
    is the right shape for a crawl that commits document deltas round by
    round.
    """
    if schema is None:
        schema = spark.read.parquet(input_path).schema
    os.makedirs(_marker_dir(curator), exist_ok=True)
    ingested = {"n": 0}

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        marker = f"{_marker_dir(curator)}/batch_{batch_id}"
        if os.path.exists(marker):
            return  # replay of a completed batch — drop it (idempotence)
        lo = batch_df.agg({id_col: "min"}).collect()[0][0]
        hwm = curator.high_water_mark()
        if lo is not None and hwm is not None and lo <= hwm:
            raise RuntimeError(
                f"stream batch {batch_id} (min {id_col}={lo}) is at or "
                f"below the curator high-water mark {hwm} with no DONE "
                "marker: a previous run crashed between curator-state "
                "append and output commit. Recover by rebuilding the "
                "curator root from the last consistent snapshot, or by "
                "replaying the feed into a fresh root."
            )
        out = curator.add_batch(
            batch_df, id_col=id_col, text_col=text_col, strata_col=strata_col
        )
        out.write.mode("append").parquet(out_dir)
        os.makedirs(marker, exist_ok=True)
        ingested["n"] += 1

    query = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return ingested["n"]
