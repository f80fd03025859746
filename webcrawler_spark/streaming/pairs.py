"""Image+caption PAIR ASSEMBLY as a structured stream over the crawl's
own delta output.

The crawl commits an ``image_captions`` delta dir per round
(crawl/engine.py); the payload store holds bytes keyed by image_id
(multimodal/pairs.py). Batch assembly joins the two after the fact —
this module does it AS THE DELTAS LAND: ``readStream`` over the store's
``image_captions/delta_*`` file feed → per micro-batch key dedup +
anti-join against the carried ``paired`` id state → stream-static inner
join with the payload table → input_hint pair rows appended.

Semantics: FIRST-ARRIVAL-WINS per src — the first micro-batch that
carries a src emits its pair (min alt within that batch); later
re-discoveries of the same src are dropped by the carried state. This is
the online form of ``distinct_caption_keys``'s global min-alt pick; the
two agree whenever a src's caption is consistent across pages (the
fixture web and any content-keyed fetcher — the pair test asserts exact
equality on a real crawl store), and they can differ only in WHICH
caption a multi-captioned src keeps, never in which srcs are paired.

Exactly-once: same protocol as streaming/curation.py — checkpointed file
source, per-batch DONE markers for replay idempotence, batch keys staged
to immutable parquet before any state append so no plan ever reads a dir
it is about to write.

Scale shape: per micro-batch work is |new captions|: a batch-local
groupBy, a broadcast-able anti-join against id-only state, and an
image_id equi-join into the payload table (unique keys both sides — no
fanout, no skew concentration; see multimodal/pairs.py)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_spark.multimodal.pairs import (
    assemble_pairs,
    distinct_caption_keys,
)

__all__ = ["stream_pair_assembly"]


def stream_pair_assembly(
    spark: SparkSession,
    captions_path: str,
    payloads: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    state_root: str,
    schema=None,
    max_files_per_trigger: int = 1,
) -> int:
    """One ``availableNow`` drain: assemble pairs for every caption file
    not yet processed; returns the number of micro-batches ingested.
    Re-invoke after more crawl rounds commit (same checkpoint/state) to
    pair only the newly discovered images."""
    if schema is None:
        schema = spark.read.parquet(captions_path).schema
    os.makedirs(state_root, exist_ok=True)
    paired_dir = f"{state_root}/paired"
    done_dir = f"{state_root}/stream_done"
    os.makedirs(done_dir, exist_ok=True)
    ingested = {"n": 0}

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        marker = f"{done_dir}/batch_{batch_id}"
        if os.path.exists(marker):
            return  # replay of a completed batch
        keys = distinct_caption_keys(batch_df)
        if os.path.exists(f"{paired_dir}/_SUCCESS"):
            keys = keys.join(
                spark.read.parquet(paired_dir), "image_id", "left_anti")
        # stage to immutable parquet BEFORE appending state (the curator's
        # rule): both consumers below read the staged copy
        stage = f"{state_root}/staging/batch_{batch_id}"
        keys.write.mode("overwrite").parquet(stage)
        keys = spark.read.parquet(stage)
        assemble_pairs(keys, payloads).write.mode("append").parquet(out_dir)
        keys.select("image_id").write.mode("append").parquet(paired_dir)
        os.makedirs(marker, exist_ok=True)
        ingested["n"] += 1

    query = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(captions_path)
        .writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return ingested["n"]
