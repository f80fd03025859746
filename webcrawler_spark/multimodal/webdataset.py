"""WebDataset-style tar shard export for the image+caption pair table —
the training-writer step that turns the curated corpus into the sharded
`.tar` files an image-model data loader streams.

The WebDataset convention (public format: webdataset/webdataset, also
consumed by img2dataset/OpenCLIP pipelines) stores one sample as
adjacent tar members sharing a key — here ``<key>.<fmt>`` (image bytes)
and ``<key>.txt`` (UTF-8 caption) — across a directory of
``shard-NNNNNN.tar`` files of roughly uniform size.

Three pieces, each independently verifiable:

* ``plan_wds_shards`` — assigns every pair a ``shard_id`` by the same
  contiguous-fill rule as ``curation.pack_shards`` (a sample lands in
  the shard where its EXCLUSIVE byte prefix sum starts, so samples are
  never split and corpus order is preserved), over an EXACT ustar size
  model: each tar member costs one 512-byte header plus its payload
  zero-padded to a 512-byte block, so a sample's cost is
  ``1024 + pad512(image_bytes) + pad512(caption_utf8_bytes)``.
* ``write_webdataset`` — one task per shard writes one deterministic
  tar (USTAR format, mtime=0, uid=gid=0, entries in corpus order,
  attempt-unique tmp file + atomic rename) and returns a manifest row
  with the MEASURED file
  size; because the size model is exact, the manifest's ``tar_bytes``
  equals ``pad_record(sum(entry_bytes) + 1024)`` — the driver query's
  DuckDB oracle predicts real on-disk file sizes to the byte.
* ``read_webdataset`` — binaryFile scan + Arrow-batched tar parse back
  to (key, bytes, caption, fmt) rows; the round-trip is byte-exact
  (tested against the WCIM-encoded fixture images).

Scale shape (10^10 pairs / 100 TB): the planner's prefix sum is
two-level — a ROWS window WITHIN each caller-supplied order-aligned
bucket (parallel across buckets) plus one bucket-count-sized window for
the bucket offsets (broadcast back) — so no stage ever funnels the
corpus through one reducer; the writer moves each image's bytes exactly
once, through the one groupBy(shard_id) exchange that physically
co-locates a shard with its writer task, and per-task memory is bounded
by ``budget_bytes`` (one shard). The writer targets a shared/mounted
filesystem path; an object-store deployment swaps the ``open``/rename
for a multipart put behind the same function boundary.

Reference tie-in: the reference crawler stores images one row at a time
through JDBC (crawler/DatabaseHandler.java image insert path); this is
the bulk-export counterpart its corpus would need to feed an image
trainer, not a port of it.
"""

from __future__ import annotations

import io
import os
import tarfile
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BLOCK = 512          # tar member header/payload block
RECORD = 10240       # tar end-of-archive record size (GNU default -b20)
_HDR_PER_SAMPLE = 2 * BLOCK  # image member header + caption member header


def _pad512(n: Column) -> Column:
    # integer-exact ceil to the tar block: (n + 511) & ~511 in two's
    # complement — no float division anywhere near the size model
    return (n + F.lit(BLOCK - 1).cast("long")).bitwiseAND(
        F.lit(-BLOCK).cast("long")
    )


def tar_entry_bytes(img_len: Column, cap_len: Column) -> Column:
    """Exact ustar cost of one (image, caption) sample: two 512-byte
    member headers plus each payload zero-padded to a 512-byte block."""
    return (
        F.lit(_HDR_PER_SAMPLE).cast("long")
        + _pad512(img_len.cast("long"))
        + _pad512(cap_len.cast("long"))
    )


def tar_file_bytes_sql(content_expr: str) -> str:
    """DuckDB/Spark-portable SQL for the on-disk size of a tar whose
    member content totals ``content_expr`` bytes: + 1024 end-of-archive
    zero blocks, rounded up to the 10240-byte record."""
    return (
        f"((({content_expr}) + {2 * BLOCK} + {RECORD - 1}) // {RECORD}) * {RECORD}"
    )


def plan_wds_shards(
    pairs: DataFrame,
    budget_bytes: int,
    bucket: Column,
    order_col: str = "image_id",
    img_len: Column | None = None,
    cap_len: Column | None = None,
) -> DataFrame:
    """``pairs`` + (entry_bytes, shard_id): contiguous fill in
    ``order_col`` order — a sample lands in the shard where its
    EXCLUSIVE prefix sum starts (same rule as ``curation.pack_shards``),
    so a shard overflows by at most one sample and corpus order is
    preserved (curriculum-safe).

    ``bucket`` MUST be order-aligned (monotone non-decreasing in
    ``order_col``, e.g. ``image_id div 4096`` or an ingest date): the
    prefix sum is computed per bucket in parallel and stitched with one
    bucket-count-sized window, so the global-window single-reducer
    bottleneck never exists. Captions must be non-null (gate upstream;
    the funnel's survivors always are).
    """
    img_len = img_len if img_len is not None else F.octet_length("bytes")
    cap_len = cap_len if cap_len is not None else F.octet_length("caption")
    e = pairs.withColumn("entry_bytes", tar_entry_bytes(img_len, cap_len))
    # a NULL bucket would silently vanish in the offset equi-join below —
    # fail loudly instead (NULL also can't be order-aligned)
    e = e.withColumn(
        "_bkt",
        F.when(bucket.isNotNull(), bucket.cast("long")).otherwise(
            F.raise_error(
                F.lit(
                    "plan_wds_shards: NULL bucket value — the bucket "
                    "expression must be non-null and order-aligned"
                )
            ).cast("long")
        ),
    )
    # within-bucket inclusive running sum: parallel across buckets
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = e.withColumn("_run", F.sum("entry_bytes").over(w_in))
    # bucket offsets: aggregate to one row per bucket, window over THAT
    # (bucket-count-sized — thousands of rows at 10^10 pairs), broadcast
    # the offsets back
    offs = (
        e.groupBy("_bkt")
        .agg(F.sum("entry_bytes").alias("_tot"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_tot").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("long"),
            ),
        )
        .select("_bkt", "_off")
    )
    prefix_excl = F.col("_off") + F.col("_run") - F.col("entry_bytes")
    return (
        e.join(F.broadcast(offs), "_bkt")
        .withColumn(
            "shard_id",
            F.floor(prefix_excl / F.lit(int(budget_bytes))).cast("long"),
        )
        .drop("_bkt", "_run", "_off")
    )


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name)
    ti.size = size
    ti.mtime = 0          # deterministic bytes: re-running the export
    ti.uid = ti.gid = 0   # produces identical shards (tested)
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def write_webdataset(
    planned: DataFrame,
    out_dir: str,
    id_col: str = "image_id",
    fmt_col: str | None = "fmt",
) -> DataFrame:
    """Write one ``shard-NNNNNN.tar`` per distinct ``shard_id`` in
    ``planned`` (a ``plan_wds_shards`` result); returns the manifest
    (shard_id, path, n_samples, payload_bytes, tar_bytes) with
    ``tar_bytes`` MEASURED from the written file.

    One shard = one task (the groupBy exchange co-locates a shard's
    bytes with its writer); per-task memory is bounded by the planner's
    ``budget_bytes``. Writes are atomic and race-safe under speculative
    execution: each attempt writes an attempt-unique tmp file, the
    same-directory ``os.replace`` is atomic, and both attempts produce
    byte-identical tars, so whichever lands last changes nothing.
    Members are written in ``id_col``'s NATIVE order (the planner's
    corpus order), not the string-cast order of the key."""
    fmt_expr = (
        F.col(fmt_col) if fmt_col and fmt_col in planned.columns else F.lit("img")
    )
    slim = planned.select(
        F.col("shard_id"),
        F.col(id_col).alias("_ord"),
        F.col(id_col).cast("string").alias("key"),
        F.col("bytes"),
        F.col("caption"),
        fmt_expr.alias("fmt"),
    )
    os.makedirs(out_dir, exist_ok=True)

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["shard_id"].iloc[0])
        pdf = pdf.sort_values("_ord", kind="mergesort")
        if not pdf["key"].is_unique:
            dup = pdf["key"][pdf["key"].duplicated()].iloc[0]
            raise ValueError(
                f"duplicate key {dup!r} in shard {sid}: tar member names "
                "would collide and a reader would silently drop samples — "
                "dedup upstream"
            )
        if (pdf["fmt"] == "txt").any() or pdf["fmt"].isna().any():
            raise ValueError(
                "fmt must be non-null and != 'txt' (member name would "
                "collide with the caption's .txt or stringify as 'None')"
            )
        path = os.path.join(out_dir, f"shard-{sid:06d}.tar")
        tmp = f"{path}.inprogress.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        payload = 0
        with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tf:
            for key, img, cap, fmt in zip(
                pdf["key"], pdf["bytes"], pdf["caption"], pdf["fmt"]
            ):
                if cap is None:
                    raise ValueError(
                        f"null caption for key {key!r}: gate pairs before export"
                    )
                img = bytes(img)
                cap_b = str(cap).encode("utf-8")
                tf.addfile(_tarinfo(f"{key}.{fmt}", len(img)), io.BytesIO(img))
                tf.addfile(_tarinfo(f"{key}.txt", len(cap_b)), io.BytesIO(cap_b))
                payload += len(img) + len(cap_b)
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "path": [path],
                "n_samples": [len(pdf)],
                "payload_bytes": [payload],
                "tar_bytes": [os.path.getsize(path)],
            }
        )

    return slim.groupBy("shard_id").applyInPandas(
        _write,
        "shard_id long, path string, n_samples long, payload_bytes long, "
        "tar_bytes long",
    )


def read_webdataset(spark: SparkSession, path_glob: str) -> DataFrame:
    """Parse a webdataset directory back to (key, bytes, caption, fmt)
    rows — binaryFile scan (one task per tar, tars are splittable-enough
    at the shard budget) + in-memory tar walk per file."""
    raw = spark.read.format("binaryFile").load(path_glob)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"key": [], "bytes": [], "caption": [], "fmt": []}
            for content in pdf["content"]:
                samples: dict[str, dict] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf.getmembers():
                        key, _, ext = m.name.rpartition(".")
                        data = tf.extractfile(m).read()
                        s = samples.setdefault(key, {})
                        if ext == "txt":
                            s["caption"] = data.decode("utf-8")
                        else:
                            s["bytes"], s["fmt"] = data, ext
                for key in sorted(samples):
                    s = samples[key]
                    out["key"].append(key)
                    out["bytes"].append(s.get("bytes"))
                    out["caption"].append(s.get("caption"))
                    out["fmt"].append(s.get("fmt"))
            yield pd.DataFrame(out)

    return raw.select("content").mapInPandas(
        _parse, "key string, bytes binary, caption string, fmt string"
    )
