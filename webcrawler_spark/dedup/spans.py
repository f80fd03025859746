"""Exact-substring (span-level) deduplication in the shape of Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better" (public
method): any k-token window whose exact text occurs earlier in the
corpus (first occurrence = lexicographically least (doc_id, position))
is a duplicated span; every position covered by a NON-first occurrence
is removed and the document is reassembled from the surviving tokens in
order. The paper builds a suffix array over the concatenated corpus;
the distributed equivalent here keys every k-token window by a 60-bit
hash of its text — the same fixed-window formulation the paper's own
released implementation exposes (k = their 50-token threshold; smaller
here so the operator is non-vacuous on short synthetic docs).

Not in the reference — a training-data-pipeline addition required by the
brief (dedup family; this is the SPAN-level member next to doc-level
exact/MinHash and line-level C4 dedup in ``dedup/lines.py``).

Portability (the driver hash-checks this against DuckDB): windows are
keyed by ``portable_hash64`` of the space-joined window text, positions
are 0-based in both engines, and the first-occurrence election orders by
(doc_id, position) — no floats anywhere.

Scale shape (100 TB): the window exchange carries only ``(wh: int64,
doc_id, wpos)`` — never text — and the first-occurrence election is one
partial-aggregating groupBy on the 8-byte hash. Removed positions come
back to each document as ONE array-valued row (collect_set over the few
duplicated positions, not an explode of every token), so reassembly is a
narrow per-row ``filter(tokens, (t, i) -> ...)`` with no second shuffle
of the corpus text. Hash collisions at 60 bits are ~N²/2⁶¹ for N
windows; the paper's own hash-bucket prefilter has the same property —
a confirm-on-text pass (as in ``crawl/engine`` content dedup) slots in
between election and removal if exactness below that rate is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.functions.hashing import portable_hash64
from webcrawler_spark.functions.text import tokens

DEFAULT_K = 8


def span_dedup(
    corpus: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, kept_text) for every corpus doc.

    ``kept_text`` is the space-joined surviving tokens in original order
    ('' when everything was removed or the doc had no tokens).
    """
    base = corpus.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    ).withColumn("n", F.size("t"))

    # one row per k-token window, keyed by the 60-bit hash of its text
    win = (
        base.filter(F.col("n") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n") - k),
                    lambda i: portable_hash64(
                        F.array_join(F.slice("t", i + 1, k), " ")
                    ),
                )
            ).alias("wpos", "wh"),
        )
    )

    # first occurrence per window hash = min (doc_id, wpos); every other
    # occurrence marks its k positions for removal
    first = win.groupBy("wh").agg(
        F.min(F.struct("doc_id", "wpos")).alias("first")
    )
    dups = win.join(first, "wh").filter(
        F.struct("doc_id", "wpos") != F.col("first")
    )
    removed = (
        dups.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("wpos"), F.col("wpos") + (k - 1))
            ).alias("rpos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("rpos").alias("removed"))
    )

    kept = F.filter(
        "t", lambda tok, i: ~F.array_contains(F.col("removed"), i)
    )
    return (
        base.join(removed, "doc_id", "left")
        .withColumn("removed", F.coalesce("removed", F.array()))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.size("removed").alias("n_removed"),
            F.array_join(kept, " ").alias("kept_text"),
        )
        .orderBy("doc_id")
    )


def span_dedup_oracle_sql(
    corpus_cte: str,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror over ``WITH corpus AS ({corpus_cte})`` — identical
    tokenizer, window hash, 0-based positions, and (doc_id, wpos)
    first-occurrence election. The oracle reassembles by explode +
    anti-join + ordered string_agg (clarity over scale — it is the
    oracle, not the plan)."""
    from webcrawler_spark.functions.hashing import PORTABLE_HASH64_DUCKDB
    from webcrawler_spark.functions.text import TOKEN_SPLIT_RE

    toks = (
        f"list_filter(regexp_split_to_array(lower({text_col}), '{TOKEN_SPLIT_RE}'), "
        "x -> x <> '')"
    )
    wh = PORTABLE_HASH64_DUCKDB.format(
        col=f"array_to_string(list_slice(t, i, i + {k} - 1), ' ')"
    )
    return f"""
        WITH corpus AS ({corpus_cte}),
        tk AS (SELECT {id_col} AS doc_id, {toks} AS t FROM corpus),
        win AS (
            SELECT doc_id, i - 1 AS wpos, {wh} AS wh
            FROM (
                SELECT doc_id, t, unnest(range(1, len(t) - {k} + 2)) AS i
                FROM tk WHERE len(t) >= {k}
            )
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY wh ORDER BY doc_id, wpos) AS rn
            FROM win
        ),
        removed AS (
            SELECT DISTINCT doc_id, unnest(range(wpos, wpos + {k})) AS rpos
            FROM ranked WHERE rn > 1
        ),
        tokpos AS (
            SELECT doc_id, unnest(t) AS tok, unnest(range(0, len(t))) AS pos
            FROM tk
        ),
        kept AS (
            SELECT tp.doc_id,
                   count(*)::INT AS n_kept,
                   string_agg(tp.tok, ' ' ORDER BY tp.pos) AS kept_text
            FROM tokpos tp
            LEFT JOIN removed r ON r.doc_id = tp.doc_id AND r.rpos = tp.pos
            WHERE r.rpos IS NULL
            GROUP BY tp.doc_id
        )
        SELECT tk.doc_id,
               len(tk.t)::INT AS n_tokens,
               (len(tk.t) - coalesce(kept.n_kept, 0))::INT AS n_removed,
               coalesce(kept.kept_text, '') AS kept_text
        FROM tk LEFT JOIN kept ON kept.doc_id = tk.doc_id
        ORDER BY tk.doc_id
    """
