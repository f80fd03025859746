"""INCREMENTAL embedding similarity index — the carried-state form of
sign-LSH ANN that a continuously-ingesting pipeline runs: arriving
embedding batches append their (vec_id, vector, signature) rows to a
parquet store partitioned by signature bucket; queries probe only their
own + Hamming-1 buckets and brute-force exact cosine inside them.

This closes the similarity family's incremental story next to
``dedup.incremental.NearDupIndex`` (text near-dups) and the crawl's
seen-set sidecars: same cost model — appends are parquet file adds that
never rewrite carried state, probes touch only the partitions their
bucket set selects (the probe list is pushed down as a partition filter,
so a 9-bucket probe reads 9/256 of the store regardless of corpus
size).

Batch equivalence (tested): an index built over a corpus in ANY chunking
answers ``topk`` exactly like ``similarity.ann``-style sign-LSH top-k
over the whole corpus, because the signature is a pure per-row function
(``dedup.embedding.sign_signature_udf`` — integer-quantized, engine-
portable) and top-k is a pure function of the accumulated bucket
contents.

Scale: bucket skew mirrors the batch LSH path's (a dominant sign
pattern → a hot partition); the exact-cosine stage inside a bucket is
the same candidate-only work either way, and AQE skew splitting applies
to the probe join. At 10^10 vectors the store is additionally
sub-bucketable by ``hash(vec_id)`` within each signature partition,
like the seen-set shards.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webcrawler_spark.dedup.embedding import (
    LSH_PLANES,
    cosine,
    sign_signature_udf,
)

__all__ = ["EmbeddingIndex"]


class EmbeddingIndex:
    """Parquet-backed incremental sign-LSH ANN index. Open (or create)
    at ``root``; ``add_batch`` per arriving batch; ``topk`` to query the
    everything-so-far corpus."""

    def __init__(self, spark: SparkSession, root: str, dim: int = 64) -> None:
        self.spark = spark
        self.root = root
        self.dim = dim
        os.makedirs(root, exist_ok=True)

    @property
    def _vec_dir(self) -> str:
        return f"{self.root}/vectors"

    def _have_state(self) -> bool:
        return os.path.exists(f"{self._vec_dir}/_SUCCESS")

    def _with_sig(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        return df.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
            sign_signature_udf(self.dim)(F.col(vec_col)).alias("sig"),
        )

    # -- ingest -----------------------------------------------------------
    def add_batch(
        self, vectors: DataFrame, id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> int:
        """Append one batch; returns its row count. Pure file adds,
        partitioned by signature bucket (the probe unit)."""
        batch = self._with_sig(vectors, id_col, vec_col)
        # shuffle by sig BEFORE the partitioned write: all rows of one
        # bucket land in one task → ONE file per touched sig dir per batch
        # (an unshuffled write fans out to |tasks| x |sigs per task| tiny
        # files — the small-files problem compact() exists to fix, created
        # at write time for no benefit)
        (batch.repartition(F.col("sig"))
         .write.partitionBy("sig").mode("append").parquet(self._vec_dir))
        # row count from the INPUT frame: batch.count() would re-run the
        # whole signature UDF pipeline a second time just to count rows the
        # select above cannot have added or dropped (parquet inputs answer
        # it from footer metadata)
        return vectors.count()

    # -- maintenance --------------------------------------------------------
    def compact(self) -> int:
        """Offline small-file compaction (storage/compaction.py): rewrite
        each signature partition's per-batch file adds into one file.
        Results invariant; run between ingests."""
        from webcrawler_spark.storage.compaction import compact_parquet_dir

        if not self._have_state():
            return 0
        return compact_parquet_dir(
            self.spark, self._vec_dir, partition_by=["sig"])

    # -- query ------------------------------------------------------------
    def topk(
        self, queries: DataFrame, k: int = 5, id_col: str = "vec_id",
        vec_col: str = "embedding", multiprobe: bool = True,
    ) -> DataFrame:
        """(query_id, neighbor_id, cos, rank ≤ k) over everything indexed
        so far; self-matches excluded; exact cosine inside the probed
        buckets (own + Hamming-1 when ``multiprobe``)."""
        q = self._with_sig(queries, id_col, vec_col).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "sig"
        )
        if multiprobe:
            probes = F.array(*([F.col("sig")] + [
                F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(LSH_PLANES)
            ]))
            q = q.select("query_id", "qv", F.explode(probes).alias("sig"))
        # queries are broadcast-sized by contract (same as ann.brute_force):
        # collecting their probe buckets is an aggregate-sized action that
        # buys PARTITION PRUNING on the store — the scan touches only the
        # probed sig directories, never the whole corpus
        buckets = [r["sig"] for r in q.select("sig").distinct().collect()]
        c = (
            self.spark.read.parquet(self._vec_dir)
            .filter(F.col("sig").isin(buckets))
            .select(F.col("vec_id").alias("neighbor_id"),
                    F.col("v").alias("cv"), "sig")
        )
        scored = (
            c.join(F.broadcast(q), ["sig"])
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id",
                    F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"))
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank")
            .orderBy("query_id", "rank")
        )
