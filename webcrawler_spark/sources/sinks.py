"""File sinks — the reference's export surfaces re-expressed as batch
DataFrame writes.

* S8  JSON sink  — the extractor dumps per-page dicts as ``data_<page>.json``
  with ``ensure_ascii=False, indent=4`` (run-extraction.py:390-392).
  ``write_json`` is the distributed form (``df.write.json``, one part per
  partition); ``write_golden_json`` reproduces the reference's exact
  single-file artifact shape for golden-byte comparison (driver-side by
  design: one small JSON document per *page*, not a data table).
* S10 CSV graph export — ``COPY (SELECT ...) TO ... CSV HEADER`` for the
  crawl link graph's vertices and edges (sql_selects.sql:19-21).

Scale: both are plain ``df.write`` — partition-parallel, no collect. The
golden writer is only for the 8 fixed reference artifacts (bytes, not
scale).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def export_graph_csv(vertices: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """S10: headered CSV export of a (vertices, edges) graph."""
    vertices.write.mode("overwrite").option("header", True).csv(f"{out_dir}/vertices")
    edges.write.mode("overwrite").option("header", True).csv(f"{out_dir}/edges")


def write_json(df: DataFrame, path: str) -> None:
    """S8 distributed form: newline-delimited JSON, one file per partition."""
    df.write.mode("overwrite").json(path)


def write_golden_json(data, path: str) -> None:
    """S8 reference-artifact form: one pretty-printed JSON document per
    page, ``ensure_ascii=False, indent=4`` (run-extraction.py:391-392)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=4)
