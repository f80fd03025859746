"""C4-style cross-corpus line deduplication (Raffel et al. 2020, §2.2 —
public paper): strip lines that recur across many pages (boilerplate —
headers, footers, nav bars) while preserving each page's remaining line
order exactly.

Not in the reference — a training-data-pipeline addition required by the
brief (dedup family). Fully oracle-checkable: `line_dedup_oracle_sql`
reproduces it value-for-value in DuckDB.

Scale shape (100 TB):

* lines are keyed by their portable 60-bit hash, so the boilerplate
  aggregate (groupBy line-hash → count distinct pages) shuffles
  (long, int) pairs, never line text;
* the boilerplate set is tiny by construction (lines on ≥ min_pages
  pages) → broadcast LEFT ANTI join back against the exploded lines,
  no second full shuffle;
* reassembly is one groupBy(page_id) with map-side partial aggregation;
  order is restored from the carried position, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import PORTABLE_HASH64_DUCKDB, portable_hash64

MIN_PAGES = 3  # a line on >= this many distinct pages is boilerplate


def line_dedup(
    pages: DataFrame,
    min_pages: int = MIN_PAGES,
    id_col: str = "page_id",
    lines_col: str = "lines",
) -> DataFrame:
    """(page_id, n_lines, n_removed, clean_text) — see module docstring."""
    pid = F.col(id_col)
    ln = pages.select(
        pid.alias("page_id"),
        F.posexplode(F.col(lines_col)).alias("pos", "line"),
    ).withColumn("lh", portable_hash64(F.col("line")))

    boiler = (
        ln.groupBy("lh")
        .agg(F.countDistinct("page_id").alias("np"))
        .filter(F.col("np") >= min_pages)
        .select("lh")
    )
    kept = ln.join(F.broadcast(boiler), "lh", "left_anti")
    clean = kept.groupBy("page_id").agg(
        F.count("*").cast("int").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
            ),
        ).alias("clean_text"),
    )
    return (
        pages.select(pid.alias("page_id"), F.size(F.col(lines_col)).alias("n_lines"))
        .join(clean, "page_id", "left")
        .select(
            "page_id",
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0))).cast("int").alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def line_dedup_oracle_sql(pages_cte: str, min_pages: int = MIN_PAGES) -> str:
    """DuckDB mirror over ``WITH pages AS ({pages_cte})`` — identical line
    hash, identical boilerplate rule, identical ordered reassembly."""
    lh = PORTABLE_HASH64_DUCKDB.format(col="line")
    return f"""
        WITH pages AS ({pages_cte}),
        ln AS (
            SELECT page_id, unnest(lines) AS line,
                   generate_subscripts(lines, 1) AS pos
            FROM pages
        ),
        lnh AS (SELECT page_id, pos, line, {lh} AS lh FROM ln),
        boiler AS (
            SELECT lh FROM lnh GROUP BY lh
            HAVING count(DISTINCT page_id) >= {min_pages}
        ),
        kept AS (
            SELECT * FROM lnh WHERE lh NOT IN (SELECT lh FROM boiler)
        ),
        clean AS (
            SELECT page_id, count(*)::INT AS n_kept,
                   string_agg(line, chr(10) ORDER BY pos) AS clean_text
            FROM kept GROUP BY page_id
        )
        SELECT p.page_id, len(p.lines)::INT AS n_lines,
               (len(p.lines) - coalesce(c.n_kept, 0))::INT AS n_removed,
               coalesce(c.clean_text, '') AS clean_text
        FROM pages p LEFT JOIN clean c USING (page_id)
        ORDER BY p.page_id
    """
