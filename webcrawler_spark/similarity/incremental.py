"""INCREMENTAL embedding similarity index — the carried-state form of
sign-LSH ANN that a continuously-ingesting pipeline runs: arriving
embedding batches append their (vec_id, vector, signature) rows to a
parquet store laid out two-level — directory partitioning by the
signature GROUP (``sig >> GROUP_SHIFT``, 16 dirs), signature itself a
sorted in-file column; queries probe only their own + Hamming-1 buckets
and brute-force exact cosine inside them.

This closes the similarity family's incremental story next to
``dedup.incremental.NearDupIndex`` (text near-dups) and the crawl's
seen-set sidecars: same cost model — appends are parquet file adds that
never rewrite carried state (the two-level layout caps each ingest's
commit at 16 files instead of one per touched signature, the cost that
dominated the suite's `incremental_ann` timing), and probes touch only
the group dirs their bucket set selects (partition pruning) then skip
within-file row groups via the sorted ``sig`` column's min/max stats —
a 9-bucket probe still reads ~9/256 of the store's rows regardless of
corpus size.

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

__all__ = ["EmbeddingIndex", "MAX_PROBE_BUCKETS"]

# Probe-collect guard: 2^LSH_PLANES signature buckets exist at most
# (256 at the default 8 planes), so any legitimate query set's probe
# list is ≤ min(|queries|·(planes+1), 2^planes); the ceiling exists to
# fail fast on a corpus-sized queries frame, not to tune.
MAX_PROBE_BUCKETS = 4096

# Two-level store layout: directory partitioning by sig >> GROUP_SHIFT
# (16 group dirs at 8 planes) caps an ingest's commit at 16 files while
# the sorted in-file ``sig`` column keeps probe pruning via parquet
# row-group stats — the "batch sig dirs in a two-level layout" shape.
GROUP_SHIFT = 4


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
        """Append one batch; returns its row count. Pure file adds into
        the two-level layout: directories are the ``sig_grp`` groups
        (``sig >> GROUP_SHIFT``, 16 dirs at the defaults), ``sig`` itself
        is a sorted data column inside each file. An ingest therefore
        commits AT MOST 16 files/dirs instead of one per touched sig
        (up to 256) — object-store commit cost per batch drops ~16×
        while probes still prune: partition pruning on ``sig_grp``, then
        parquet row-group min/max on the sorted ``sig`` column."""
        batch = self._with_sig(vectors, id_col, vec_col).withColumn(
            "sig_grp", F.shiftright("sig", GROUP_SHIFT))
        # shuffle by sig_grp BEFORE the partitioned write: all rows of one
        # group land in one task → ONE file per touched group dir per
        # batch (an unshuffled write fans out to |tasks| x |groups per
        # task| tiny files — the small-files problem compact() exists to
        # fix, created at write time for no benefit); the within-task sort
        # clusters each sig's rows so row-group stats prune probes
        (batch.repartition(F.col("sig_grp"))
         .sortWithinPartitions("sig")
         .write.partitionBy("sig_grp").mode("append").parquet(self._vec_dir))
        # row count from the INPUT frame: batch.count() would re-run the
        # whole signature UDF pipeline a second time just to count rows the
        # select above cannot have added or dropped (parquet inputs answer
        # it from footer metadata)
        return vectors.count()

    # -- maintenance --------------------------------------------------------
    def compact(self) -> int:
        """Offline small-file compaction (storage/compaction.py): rewrite
        each sig_grp partition's per-batch file adds into one file
        (re-sorted by ``sig`` so row-group pruning survives).
        Results invariant; run between ingests."""
        from webcrawler_spark.storage.compaction import compact_parquet_dir

        if not self._have_state():
            return 0
        return compact_parquet_dir(
            self.spark, self._vec_dir, partition_by=["sig_grp"],
            sort_within=["sig"])

    # -- query ------------------------------------------------------------
    def topk(
        self, queries: DataFrame, k: int = 5, id_col: str = "vec_id",
        vec_col: str = "embedding", multiprobe: bool = True,
    ) -> DataFrame:
        """(query_id, neighbor_id, cos, rank ≤ k) over everything indexed
        so far; self-matches excluded; exact cosine inside the probed
        buckets (own + Hamming-1 when ``multiprobe``).

        CONTRACT: ``queries`` is broadcast-sized (an interactive query
        set, not a corpus — same contract as ``ann.brute_force``). The
        probe-bucket collect below is bounded by |queries|·(planes+1)
        and guarded at ``MAX_PROBE_BUCKETS``; a corpus-sized misuse
        fails loudly here instead of flooding the driver and the
        ``isin`` filter. For corpus×corpus similarity use the batch
        ``dedup.embedding`` paths."""
        q = self._with_sig(queries, id_col, vec_col).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "sig"
        )
        if multiprobe:
            probes = F.array(*([F.col("sig")] + [
                F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(LSH_PLANES)
            ]))
            q = q.select("query_id", "qv", F.explode(probes).alias("sig"))
        # queries are broadcast-sized by contract (see docstring):
        # collecting their probe buckets is an aggregate-sized action that
        # buys PARTITION PRUNING on the store — the scan touches only the
        # probed sig directories, never the whole corpus
        buckets = [r["sig"] for r in q.select("sig").distinct().collect()]
        if len(buckets) > MAX_PROBE_BUCKETS:
            raise ValueError(
                f"topk probe set has {len(buckets)} distinct buckets "
                f"(> {MAX_PROBE_BUCKETS}): queries must be broadcast-sized "
                "(see topk docstring); use the batch dedup.embedding paths "
                "for corpus-scale similarity"
            )
        groups = sorted({b >> GROUP_SHIFT for b in buckets})
        c = (
            self.spark.read.parquet(self._vec_dir)
            # two-level pruning: sig_grp is the partition column (dir
            # pruning), sig hits the sorted column's row-group stats
            .filter(F.col("sig_grp").isin(groups) & F.col("sig").isin(buckets))
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
