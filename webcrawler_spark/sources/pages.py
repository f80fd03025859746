"""Derived multi-line "page" corpus for line-level operators.

The driver's `documents` table is single-line word soup (no ``\\n``), but
the line-level training-pipeline operators (Gopher repetition signals,
C4-style cross-corpus line dedup) are defined over multi-line pages with
shared boilerplate. This module derives such a corpus DETERMINISTICALLY
from `documents` — in Spark and, value-for-value, in DuckDB — so those
operators stay fully oracle-checkable by the driver:

* page_id = doc_id % N_PAGES groups ~docs/N_PAGES member lines per page,
  ordered by doc_id;
* every page gets the same header + footer boilerplate line and a per-site
  (page_id % N_SITES) nav line — the lines a C4-style line dedup must
  find and strip;
* member lines are decorated to exercise the Gopher line signals:
  doc_id % 8 == 7 → the line is replaced with a constant spam line
  (since N_PAGES is a multiple of 8 this concentrates spam on pages
  7, 15, 23, ... — at sf ≥ 0.01 those pages fail the Gopher
  dup-line/top-bigram gates, keeping the keep flag non-vacuous),
  else doc_id % 11 == 0 → bullet prefix "- ", else doc_id % 13 == 0 →
  ellipsis suffix " ...".

At 100 TB the same derivation is a narrow map + one groupBy(page_id) —
no data is collected to the driver and no Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_PAGES = 40
N_SITES = 5
HEADER = "crawled by gov si spider all rights reserved"
FOOTER = "cookie policy accept decline"
NAV_PREFIX = "site nav menu "
SPAM_LINE = "buy now buy now buy now"


def _member_line(doc_id, text):
    return (
        F.when(doc_id % 8 == 7, F.lit(SPAM_LINE))
        .when(doc_id % 11 == 0, F.concat(F.lit("- "), text))
        .when(doc_id % 13 == 0, F.concat(text, F.lit(" ...")))
        .otherwise(text)
    )


def synthetic_pages(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(page_id int, site int, lines array<string>) — see module docstring."""
    did = F.col(id_col)
    member = docs.select(
        (did % N_PAGES).cast("int").alias("page_id"),
        F.struct(did.alias("doc_id"), _member_line(did, F.col(text_col)).alias("line")).alias("m"),
    )
    return (
        member.groupBy("page_id")
        .agg(F.array_sort(F.collect_list("m")).alias("ms"))
        .select(
            "page_id",
            (F.col("page_id") % N_SITES).cast("int").alias("site"),
            F.concat(
                F.array(
                    F.lit(HEADER),
                    F.concat(F.lit(NAV_PREFIX), (F.col("page_id") % N_SITES).cast("string")),
                ),
                F.transform("ms", lambda m: m["line"]),
                F.array(F.lit(FOOTER)),
            ).alias("lines"),
        )
    )


def synthetic_pages_duckdb(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB CTE body producing the identical (page_id, site, lines) rows.

    Use as ``WITH pages AS ({synthetic_pages_duckdb()}) ...``.
    """
    return f"""
        SELECT page_id, (page_id % {N_SITES})::INT AS site,
               ['{HEADER}',
                '{NAV_PREFIX}' || (page_id % {N_SITES})::VARCHAR]
               || list(line ORDER BY doc_id)
               || ['{FOOTER}'] AS lines
        FROM (
            SELECT ({id_col} % {N_PAGES})::INT AS page_id, {id_col} AS doc_id,
                   CASE WHEN {id_col} % 8 = 7 THEN '{SPAM_LINE}'
                        WHEN {id_col} % 11 = 0 THEN '- ' || {text_col}
                        WHEN {id_col} % 13 = 0 THEN {text_col} || ' ...'
                        ELSE {text_col} END AS line
            FROM {table}
        )
        GROUP BY page_id
    """
