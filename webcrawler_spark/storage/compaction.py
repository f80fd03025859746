"""Small-file compaction for append-only incremental state dirs.

Every incremental index in this repo grows by parquet FILE ADDS — the
curator's fingerprint dir, ``NearDupIndex``'s band/shingle dirs, the
``EmbeddingIndex`` signature partitions. That is the right per-batch
cost model (never rewrite carried state on ingest), but after many
batches each partition holds one tiny file per batch: at 10^5 ingests a
probe pays 10^5 footer reads per touched partition and the namenode/
object-store pays the listing. The standard fix (what Iceberg's
``rewrite_data_files`` / OPTIMIZE does) is an OFFLINE compaction pass
that rewrites each partition's many small files into few large ones —
results are invariant; only file counts change.

``compact_parquet_dir`` is that pass over a plain parquet dir:

  1. read the dir (partition columns preserved),
  2. write a compacted copy to ``<dir>.__compact_tmp`` —
     ``files_per_partition`` output files per partition-dir (repartition
     by the partition columns), or a plain coalesce when the dir is
     unpartitioned,
  3. atomically swap: rename old → ``<dir>.__compact_old``, tmp → dir,
     delete old.

The swap is two directory renames — crash between them leaves either
the old dir or both (the leftover is re-usable/removable; the data dir
is never absent AND incomplete). Readers in THIS engine open state dirs
per job (no long-lived handles), matching the single-driver ingest
model; a multi-writer production deployment would do this through the
table format's transaction log instead (the SnapshotStore/Iceberg
boundary, storage/snapshots.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = [
    "compact_parquet_dir", "n_data_files", "recover_compaction",
]


def n_data_files(path: str) -> int:
    """Count parquet data files under ``path`` (compaction's metric)."""
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
    files_per_partition: int = 1,
    sort_within: list[str] | None = None,
) -> int:
    """Rewrite ``path`` with few large files per partition; returns the
    data-file count after. Contents are invariant (tested); only layout
    changes. ``partition_by`` must name the dir's existing partition
    columns (they are re-applied to the compacted copy). ``sort_within``
    re-sorts rows inside each output task so row-group min/max stats
    keep pruning on those columns after the rewrite (the EmbeddingIndex
    keeps ``sig`` clustered this way)."""
    tmp = path.rstrip("/") + ".__compact_tmp"
    old = path.rstrip("/") + ".__compact_old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)  # crashed mid-swap last time — roll back
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    df = spark.read.parquet(path)
    if partition_by:
        # one shuffle keyed by the partition columns: all rows of one
        # partition value land in one task → exactly one file per
        # partition dir (files_per_partition applies to the flat case;
        # partitioned dirs compact to the minimum)
        keys = [F.col(c) for c in partition_by]
        out = df.repartition(*keys)
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        out.write.partitionBy(*partition_by).mode("overwrite").parquet(tmp)
    else:
        df.coalesce(max(1, files_per_partition)).write.mode(
            "overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return n_data_files(path)


def recover_compaction(root: str) -> dict:
    """Repair the leftovers of a compaction that crashed mid-swap, for
    any dir tree this module writes (index dirs or a crawl store).

    The swap protocol renames ``X`` → ``X.__compact_old`` then
    ``X.__compact_tmp`` → ``X``; a crash can leave (a) only the ``old``
    (data dir absent — roll the old back), (b) both (swap completed but
    the old was not deleted — drop the old), or (c) a stale ``tmp``
    (pre-swap crash — drop the tmp; the source data was never touched).
    Returns {path: action} for everything repaired. Idempotent; safe to
    run at every startup."""
    actions: dict[str, str] = {}
    for dirpath, dirnames, _files in os.walk(root, topdown=True):
        for d in list(dirnames):
            p = os.path.join(dirpath, d)
            if d.endswith(".__compact_old"):
                main = p[: -len(".__compact_old")]
                if os.path.exists(main):
                    shutil.rmtree(p)
                    actions[p] = "removed (swap had completed)"
                else:
                    os.rename(p, main)
                    actions[p] = "rolled back (swap never completed)"
                dirnames.remove(d)
            elif d.endswith(".__compact_tmp"):
                shutil.rmtree(p)
                actions[p] = "removed (pre-swap leftover)"
                dirnames.remove(d)
    return actions


def compact_crawl_store(spark: SparkSession, store_root: str) -> dict:
    """Merge each crawl table's COMMITTED per-round delta dirs into one
    delta at the resume cursor — the store-level form of the index
    compaction above (Iceberg's snapshot-expire + rewrite in one move for
    this parquet layout). Run between crawl runs (the engine re-lists
    deltas at startup); a resumed run reconstructs identical state
    because every reconstruction (frontier/seen/eviction counting —
    crawl/engine.py:_load_state) is a pure function of delta ROWS, which
    a merge preserves exactly.

    Per table: dirs ``delta_r{N}`` with N ≤ the manifest cursor merge
    into one ``delta_r{cursor}`` inside a shadow TABLE dir, everything
    else (orphan dirs past the cursor — a crash's leftovers the cursor
    already ignores) is carried over by rename, then the whole table dir
    is swapped in two renames. A crash between them leaves the table
    under its ``.__compact_old`` name with all data intact (recovery:
    rename it back); merged source data is deleted only after the swap
    succeeds. Returns {table: data-file count after} for compacted
    tables."""
    import glob
    import json

    recover_compaction(store_root)  # heal any prior crash's leftovers
    mpath = os.path.join(store_root, "MANIFEST.json")
    if not os.path.exists(mpath):
        return {}  # nothing ever committed here
    with open(mpath) as f:
        manifest = json.load(f)
    last = manifest.get("meta", {}).get("last_round")
    if last is None:
        return {}
    out = {}
    tables = sorted(
        d for d in os.listdir(store_root)
        if os.path.isdir(os.path.join(store_root, d))
        and glob.glob(os.path.join(store_root, d, "delta_r*"))
    )
    for table in tables:
        tdir = os.path.join(store_root, table)
        dirs = [
            p for p in sorted(glob.glob(os.path.join(tdir, "delta_r*")))
            if int(p.rsplit("delta_r", 1)[-1]) <= last
        ]
        if len(dirs) <= 1:
            continue
        tmp_tdir, old_tdir = tdir + ".__compact_tmp", tdir + ".__compact_old"
        shutil.rmtree(tmp_tdir, ignore_errors=True)
        shutil.rmtree(old_tdir, ignore_errors=True)
        merged = spark.read.parquet(*dirs)
        merged.coalesce(max(1, spark.sparkContext.defaultParallelism // 4)) \
            .write.mode("overwrite") \
            .parquet(os.path.join(tmp_tdir, f"delta_r{last:06d}"))
        for entry in sorted(os.listdir(tdir)):
            p = os.path.join(tdir, entry)
            if p not in dirs:
                os.rename(p, os.path.join(tmp_tdir, entry))
        os.rename(tdir, old_tdir)
        os.rename(tmp_tdir, tdir)
        shutil.rmtree(old_tdir)
        out[table] = n_data_files(tdir)
    return out
