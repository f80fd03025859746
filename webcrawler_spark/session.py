"""SparkSession factory.

Tuned for local[N] single-JVM testing but with every knob chosen to be the
right one on a real multi-executor cluster too: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow on (all per-row logic in
this engine is vectorized pandas UDFs), UTC session timezone (duckdb oracle
comparison), shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "webcrawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    Under ``spark-submit`` pass ``master=""`` — the builder then leaves the
    master untouched so the submit command line (master URL, executor
    count) wins while the tuned SQL confs still apply
    (tools/submit_crawl.py uses this). ``extra_conf`` layers caller
    overrides on top of the defaults.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # high-cardinality string-keyed joins (the J2 seen anti-join, J5
        # content joins) are 3× faster as shuffled-hash than sort-merge —
        # no sort of millions of URL strings; AQE still handles skew/spill
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # whole-stage-codegen methods between ~8 KB of bytecode (the JVM
        # JIT's DontCompileHugeMethods limit) and Spark's 64 KB fallback
        # ceiling run in the JVM *bytecode interpreter* — measured 33×
        # slower than per-operator codegen on the admission filter chain
        # (105 s → 3.2 s per 16M rows at 16 cores). Cap generated methods
        # at the JIT limit so oversized stages fall back to per-operator
        # codegen (small, JIT-compiled classes) instead.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image rows can be multi-MB: keep Arrow batches small so a batch of
        # binary payloads fits comfortably in a python worker
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    if master:
        b = b.master(master)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
