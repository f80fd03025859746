"""Gopher repetition signals (Rae et al. 2021, §A1.2 — public paper)
over multi-line pages: the n-gram-repetition family that complements the
§A1.1 gates in `gopher.py`.

Per page, with every fraction 6-dp-rounded before thresholding so the
keep decision is bit-portable to the DuckDB oracle:

* ``top_{2,3,4}gram_char_frac`` — characters covered by the most
  frequent token n-gram (count × gram length) / joined-text chars,
  gates 0.20 / 0.18 / 0.16;
* ``dup_{5..10}gram_char_frac`` — characters in repeated n-grams BEYOND
  their first occurrence, Σ_{count>1} (count−1)·len(gram) / chars,
  gates 0.15 … 0.10 (the standard open-source accounting: occurrence-
  weighted, overlaps not collapsed — Gopher's prose leaves this open and
  the public reimplementations, e.g. NVIDIA NeMo Curator and Dolma,
  count occurrences the same way);
* ``dup_line_char_frac`` — characters in repeated lines beyond their
  first occurrence / joined-line chars, gate 0.20 (§A1.2's duplicate
  line character fraction).

Tie-breaking for "most frequent n-gram": ties go to the LONGER gram,
implemented as a packed-long ``max(count·2^20 + min(len,2^20−1))`` — one
BIGINT aggregate instead of a struct max, identical in DuckDB (the same
packed-long trick the crawl kernel uses where struct min_by broke
codegen).

Scale shape (100 TB): dup_line_char_frac is pure per-row array
arithmetic (no shuffle; O(distinct-lines x lines) per row, bounded by
page size). The nine n-gram families share ONE explode and TWO hash
aggregates — (page, n, gram-hash-60bit) then (page, n) — so the exchange
carries only (int, int, long) keys, never gram text, with map-side
partial aggregation; the final per-page pivot is a conditional-max
aggregate over ≤9 rows per page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import PORTABLE_HASH64_DUCKDB, portable_hash64
from .text import TOKEN_SPLIT_RE, ngrams, tokens

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)
MAX_TOP_NGRAM_CHAR_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
MAX_DUP_NGRAM_CHAR_FRAC = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
MAX_DUP_LINE_CHAR_FRAC = 0.20

_PACK = 1 << 20  # gram length packed into the low 20 bits


def _top_col(n: int) -> str:
    return f"top_{n}gram_char_frac"


def _dup_col(n: int) -> str:
    return f"dup_{n}gram_char_frac"


def repetition_signals(
    pages: DataFrame, id_col: str = "page_id", lines_col: str = "lines"
) -> DataFrame:
    """Per-page §A1.2 repetition signals + keep_repetition flag."""
    pid = F.col(id_col)
    lines = F.col(lines_col)
    tok = tokens(F.array_join(lines, " "))

    # joined-text char counts: sum of token lengths + single separators
    tok_chars = F.aggregate(tok, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    n_words = F.size(tok)
    text_chars = (tok_chars + F.greatest(n_words - 1, F.lit(0))).cast("double")

    line_chars = (
        F.aggregate(lines, F.lit(0).cast("long"), lambda a, l: a + F.length(l))
        + F.greatest(F.size(lines) - 1, F.lit(0))
    ).cast("double")
    # chars in repeated lines beyond the first occurrence: per-row only
    dup_line_mass = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("long"),
        lambda a, l: a
        + (F.size(F.filter(lines, lambda x: x == l)) - 1) * F.length(l),
    )

    base = pages.select(
        pid.alias("page_id"),
        tok.alias("tok"),
        text_chars.alias("text_chars"),
        F.round(dup_line_mass / line_chars, 6).alias("dup_line_char_frac"),
    )

    # ONE explode for all nine n values: array of (n, gram) structs.
    # NB: the transform lambda must stay single-argument — a second
    # parameter (even a defaulted one) makes pyspark pass the ELEMENT
    # INDEX into it, so n is captured via the enclosing function instead.
    def _tagged(n: int):
        return F.transform(
            ngrams(F.col("tok"), n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
        )

    gram_structs = F.flatten(F.array(*[_tagged(n) for n in (*TOP_NS, *DUP_NS)]))
    grams = base.select(
        "page_id", F.explode(gram_structs).alias("x")
    ).select(
        "page_id",
        F.col("x.n").alias("n"),
        portable_hash64(F.col("x.g")).alias("gh"),
        F.length(F.col("x.g")).alias("gl"),
    )
    per_gram = grams.groupBy("page_id", "n", "gh").agg(
        F.count("*").alias("c"), F.max("gl").alias("gl")
    )
    per_n = per_gram.groupBy("page_id", "n").agg(
        F.max(
            F.col("c").cast("long") * F.lit(_PACK)
            + F.least(F.col("gl").cast("long"), F.lit(_PACK - 1))
        ).alias("packed"),
        F.sum(
            F.when(F.col("c") > 1, (F.col("c") - 1).cast("long") * F.col("gl"))
            .otherwise(F.lit(0))
        ).alias("dup_mass"),
    )
    top_mass = (F.col("packed") / F.lit(_PACK)).cast("long") * F.pmod(
        F.col("packed"), F.lit(_PACK)
    )
    pivoted = per_n.groupBy("page_id").agg(
        *[
            F.max(F.when(F.col("n") == n, top_mass)).alias(f"_tm{n}")
            for n in TOP_NS
        ],
        *[
            F.max(F.when(F.col("n") == n, F.col("dup_mass"))).alias(f"_dm{n}")
            for n in DUP_NS
        ],
    )

    out = base.drop("tok").join(pivoted, "page_id", "left").select(
        "page_id",
        *[
            F.round(
                F.coalesce(F.col(f"_tm{n}"), F.lit(0)) / F.col("text_chars"), 6
            ).alias(_top_col(n))
            for n in TOP_NS
        ],
        *[
            F.round(
                F.coalesce(F.col(f"_dm{n}"), F.lit(0)) / F.col("text_chars"), 6
            ).alias(_dup_col(n))
            for n in DUP_NS
        ],
        "dup_line_char_frac",
    )
    keep = F.col("dup_line_char_frac") <= MAX_DUP_LINE_CHAR_FRAC
    for n in TOP_NS:
        keep = keep & (F.col(_top_col(n)) <= MAX_TOP_NGRAM_CHAR_FRAC[n])
    for n in DUP_NS:
        keep = keep & (F.col(_dup_col(n)) <= MAX_DUP_NGRAM_CHAR_FRAC[n])
    return out.withColumn("keep_repetition", keep)


def repetition_oracle_sql(pages_cte: str) -> str:
    """DuckDB mirror of `repetition_signals` over
    ``WITH pages AS ({pages_cte})`` — identical tokenizer, gram hash,
    packed-long top election, and 6-dp rounding."""
    toks = (
        "list_filter(regexp_split_to_array(lower(array_to_string(lines, ' ')), '"
        + TOKEN_SPLIT_RE
        + "'), t -> t <> '')"
    )
    gh = PORTABLE_HASH64_DUCKDB.format(col="g")
    top_cols = ",\n               ".join(
        f"round(coalesce(max(CASE WHEN n = {n} THEN top_mass END), 0)"
        f" * 1.0 / any_value(text_chars), 6) AS {_top_col(n)}"
        for n in TOP_NS
    )
    dup_cols = ",\n               ".join(
        f"round(coalesce(max(CASE WHEN n = {n} THEN dup_mass END), 0)"
        f" * 1.0 / any_value(text_chars), 6) AS {_dup_col(n)}"
        for n in DUP_NS
    )
    gates = " AND ".join(
        [f"{_top_col(n)} <= {MAX_TOP_NGRAM_CHAR_FRAC[n]}" for n in TOP_NS]
        + [f"{_dup_col(n)} <= {MAX_DUP_NGRAM_CHAR_FRAC[n]}" for n in DUP_NS]
        + [f"dup_line_char_frac <= {MAX_DUP_LINE_CHAR_FRAC}"]
    )
    ns = ", ".join(str(n) for n in (*TOP_NS, *DUP_NS))
    return f"""
        WITH pages AS ({pages_cte}),
        t AS (
            SELECT page_id, lines, {toks} AS tok FROM pages
        ),
        base AS (
            SELECT page_id, tok,
                   (list_sum(list_transform(tok, x -> length(x)))
                    + greatest(len(tok) - 1, 0))::DOUBLE AS text_chars,
                   round(list_sum(list_transform(list_distinct(lines),
                             l -> (len(list_filter(lines, x -> x = l)) - 1)
                                  * length(l))) * 1.0
                         / (list_sum(list_transform(lines, l -> length(l)))
                            + greatest(len(lines) - 1, 0)),
                         6) AS dup_line_char_frac
            FROM t
        ),
        grams AS (
            SELECT page_id, nv.n AS n,
                   unnest(list_transform(
                       range(1, greatest(len(tok) - nv.n + 1, 0) + 1),
                       i -> array_to_string(tok[i:i+nv.n-1], ' '))) AS g
            FROM base, (SELECT unnest([{ns}]) AS n) nv
        ),
        per_gram AS (
            SELECT page_id, n, {gh} AS ghash,
                   count(*)::BIGINT AS c, max(length(g))::BIGINT AS gl
            FROM grams GROUP BY page_id, n, ghash
        ),
        per_n AS (
            SELECT page_id, n,
                   max(c * {_PACK} + least(gl, {_PACK - 1})) AS packed,
                   sum(CASE WHEN c > 1 THEN (c - 1) * gl ELSE 0 END)::BIGINT
                       AS dup_mass
            FROM per_gram GROUP BY page_id, n
        ),
        masses AS (
            SELECT page_id, n, (packed // {_PACK}) * (packed % {_PACK}) AS top_mass,
                   dup_mass
            FROM per_n
        ),
        sig AS (
            SELECT b.page_id,
               {top_cols},
               {dup_cols},
               any_value(b.dup_line_char_frac) AS dup_line_char_frac
            FROM base b LEFT JOIN masses m
              ON m.page_id = b.page_id
            GROUP BY b.page_id
        )
        SELECT page_id,
               {", ".join(_top_col(n) for n in TOP_NS)},
               {", ".join(_dup_col(n) for n in DUP_NS)},
               dup_line_char_frac,
               ({gates}) AS keep_repetition
        FROM sig
        ORDER BY page_id
    """
