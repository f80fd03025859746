"""INCREMENTAL near-duplicate detection — the carried-state form of
MinHash-LSH dedup that a continuously-ingesting pipeline (this crawl, or
any training-data feed) actually runs: each arriving batch probes a
persisted band-signature index, reports its near-dup pairs (batch↔index
and batch↔batch), and appends its own signatures — the near-dup analog
of the crawl's seen-set sidecar.

Semantics (exactly batch-equivalent, tested): processing a corpus in ANY
chunking yields the SAME pair set as ``minhash.near_duplicates`` over
the whole corpus, each pair reported exactly once — in the batch where
its LATER member arrives. This holds because LSH band keys are a pure
function of the document, so the union over batches of
{pairs with ≥1 member in this batch, other member already indexed or in
this batch} is precisely the all-pairs band-collision set.

Storage layout (``root/``):
  bands/     (doc_id, band, key)   — the probe unit, parquet,
                                     partitioned by ``band`` so a probe
                                     join prunes to matching band dirs
  shingles/  (doc_id, sh)          — exact-verify state (distinct
                                     3-gram shingle ids per doc)

Scale: a batch probe shuffles |batch|·bands rows against the band dirs
it touches (equi-join on band+key; at 10^10 docs the band store is
additionally bucketable by ``hash(key)`` like the seen-set shards); the
exact verify joins shingle sets for CANDIDATES only. Appends are pure
parquet file adds — no rewrite of carried state, the same cost model as
the Bloom sidecar's copy-on-write delta updates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_spark.dedup.minhash import (
    BANDS,
    ROWS_PER_BAND,
    band_keys,
    shingle_id_sets,
)


class NearDupIndex:
    """Parquet-backed incremental MinHash-LSH index. Open (or create) at
    ``root``; call :meth:`add_batch` per arriving batch of documents."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        threshold: float = 0.8,
        bands: int = BANDS,
        rows_per_band: int = ROWS_PER_BAND,
    ) -> None:
        self.spark = spark
        self.root = root
        self.threshold = threshold
        self.bands = bands
        self.rows_per_band = rows_per_band
        os.makedirs(root, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _have_state(self) -> bool:
        return os.path.exists(f"{self.root}/bands/_SUCCESS")

    def stored_bands(self) -> DataFrame | None:
        if not self._have_state():
            return None
        return self.spark.read.parquet(f"{self.root}/bands")

    def stored_shingles(self) -> DataFrame | None:
        if not self._have_state():
            return None
        return self.spark.read.parquet(f"{self.root}/shingles")

    # -- ingest -----------------------------------------------------------
    def add_batch(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Report this batch's near-dup pairs, then index the batch.

        Returns (a, b, jaccard), a < b, exact 3-gram Jaccard ≥ threshold,
        covering batch↔index and batch↔batch pairs — each corpus pair
        appears in exactly one batch's result (see module docstring).
        The batch's bands/shingles are appended AFTER the probe frames
        are staged, and the returned frame is computed from the staged
        inputs, so callers may consume it lazily."""
        nb = band_keys(docs, id_col, text_col, self.bands, self.rows_per_band)
        sh_new = shingle_id_sets(docs, id_col, text_col)
        old_b = self.stored_bands()
        old_sh = self.stored_shingles()

        # within-batch candidates: standard a<b band collision
        l, r = nb.alias("l"), nb.alias("r")
        cand_bb = l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        ).select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))

        # batch↔index candidates: new doc probes stored bands (either id
        # order — the indexed doc may sort above or below the new one)
        if old_b is not None:
            o = old_b.alias("o")
            n = nb.alias("n")
            cand_bi = n.join(
                o,
                (F.col("n.band") == F.col("o.band"))
                & (F.col("n.key") == F.col("o.key"))
                & (F.col("n.doc_id") != F.col("o.doc_id")),
            ).select(
                F.least("n.doc_id", "o.doc_id").alias("a"),
                F.greatest("n.doc_id", "o.doc_id").alias("b"),
            )
            cand = cand_bb.union(cand_bi)
        else:
            cand = cand_bb
        cand = cand.distinct()

        sh_all = sh_new if old_sh is None else sh_new.unionByName(old_sh)
        j = (
            cand.join(sh_all.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sha"), "a")
            .join(sh_all.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "shb"), "b")
            .withColumn("inter", F.size(F.array_intersect("sha", "shb")).cast("double"))
            .withColumn("uni", (F.size("sha") + F.size("shb") - F.col("inter")).cast("double"))
            .withColumn("jaccard", F.round(F.col("inter") / F.col("uni"), 6))
            .filter(F.col("jaccard") >= self.threshold)
            .select("a", "b", "jaccard")
            .orderBy("a", "b")
        )
        # materialize the result BEFORE appending state: the probe plan
        # reads root/bands and root/shingles, and appending first would
        # make the lazy plan see the batch's own rows on the index side.
        # localCheckpoint keeps the pinned result EXECUTOR-resident (a
        # collect here would land a pathological hot-cluster batch's
        # quadratic pair set on the driver); blocks are ContextCleaner-
        # collected once the caller drops the frame
        out = j.localCheckpoint(eager=True)

        nb.write.mode("append").partitionBy("band").parquet(f"{self.root}/bands")
        sh_new.write.mode("append").parquet(f"{self.root}/shingles")
        return out

    # -- maintenance --------------------------------------------------------
    def compact(self) -> tuple[int, int]:
        """Offline small-file compaction (storage/compaction.py): rewrite
        each band partition / the shingle dir into few large files.
        Results invariant; run between ingests, not during one."""
        from webcrawler_spark.storage.compaction import compact_parquet_dir

        if not self._have_state():
            return (0, 0)
        nb = compact_parquet_dir(
            self.spark, f"{self.root}/bands", partition_by=["band"])
        ns = compact_parquet_dir(self.spark, f"{self.root}/shingles")
        return (nb, ns)
