"""Snapshot store — per-round table versions with a manifest.

The design target is Iceberg (`north_rule`: frontier/seen/host_state in
salted host-hash-partitioned Iceberg tables, snapshot per crawl round,
resume from snapshot). The Iceberg runtime jars are not in this sandbox
(SURVEY.md §7 step 3 fallback), so this module provides the same contract
over parquet + a JSON manifest: every `commit(round)` is an atomic-enough
snapshot; `latest_round()` + `read(table)` give checkpoint/resume; old
snapshots remain for time travel. All writers/readers go through this one
boundary so an Iceberg catalog can replace it without touching the engine.

Layout:
    <root>/<table>/r<round>/*.parquet
    <root>/MANIFEST.json   {"rounds": [..], "tables": {t: last_round}}
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        # heal any mid-swap leftovers of an interrupted offline compaction
        # (storage/compaction.py) before anything reads the tree
        from webcrawler_spark.storage.compaction import recover_compaction

        recover_compaction(root)
        self._manifest_path = os.path.join(root, "MANIFEST.json")
        self._manifest = self._load_manifest()

    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"rounds": [], "tables": {}}

    def _save_manifest(self) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def path(self, table: str, round_: int) -> str:
        return os.path.join(self.root, table, f"r{round_}")

    def write(self, table: str, df: DataFrame, round_: int) -> DataFrame:
        """Write a table version; returns the re-read (checkpointed) frame —
        callers continue from the materialized data, truncating lineage."""
        p = self.path(table, round_)
        df.write.mode("overwrite").parquet(p)
        self._manifest["tables"][table] = round_
        if round_ not in self._manifest["rounds"]:
            self._manifest["rounds"].append(round_)
        self._save_manifest()
        return self.spark.read.parquet(p)

    def read(self, table: str, round_: int | None = None) -> DataFrame | None:
        r = self._manifest["tables"].get(table) if round_ is None else round_
        if r is None:
            return None
        p = self.path(table, r)
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def latest_round(self) -> int | None:
        return max(self._manifest["rounds"]) if self._manifest["rounds"] else None

    # -- small scalar metadata (resume cursor: last round, next seq, clock) --

    def set_meta(self, **kv) -> None:
        self._manifest.setdefault("meta", {}).update(kv)
        self._save_manifest()

    def get_meta(self, key: str, default=None):
        return self._manifest.get("meta", {}).get(key, default)

    def mark_round(self, round_: int) -> None:
        if round_ not in self._manifest["rounds"]:
            self._manifest["rounds"].append(round_)
        self._save_manifest()
