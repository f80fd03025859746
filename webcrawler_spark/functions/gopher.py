"""Gopher-style document-quality gating (Rae et al. 2021, "Scaling
Language Models: ... Gopher", §A1.1 — public paper) over multi-line pages.

Not in the reference — a training-data-pipeline addition required by the
brief ("quality scoring" family). Every signal is a pure Catalyst
expression or a partial-aggregating explode/groupBy, with a value-exact
DuckDB twin (`gopher_oracle_sql`) so the driver can verify it.

Signals per page (all ratios rounded to 6 dp BEFORE thresholding so the
keep decision is bit-portable across engines):

* n_lines, n_words            — size counts
* mean_word_len               — mean token length, gate [3, 10]
* frac_alpha_words            — tokens containing a letter, gate ≥ 0.8
* n_stopword_hits             — English stopword occurrences, gate ≥ 2
* frac_bullet_lines           — lines starting "- ", gate ≤ 0.9
* frac_ellipsis_lines         — lines ending "...", gate ≤ 0.3
* dup_line_frac               — 1 − distinct/total lines, gate ≤ 0.3
* top_bigram_frac             — occurrences of the modal token bigram /
                                total bigrams, gate ≤ 0.2

Scale shape (100 TB): everything except top_bigram_frac is per-row array
arithmetic (no shuffle). top_bigram_frac is ONE explode + groupBy(page,
bigram-hash) + groupBy(page) — both hash aggregates with map-side partial
aggregation, keyed by (int, long), never by raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import PORTABLE_HASH64_DUCKDB, portable_hash64
from .text import STOPWORDS_EN, TOKEN_SPLIT_RE, ngrams, stopword_hits, tokens

MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MIN_ALPHA_FRAC = 0.8
MIN_STOPWORD_HITS = 2
MAX_BULLET_FRAC = 0.9
MAX_ELLIPSIS_FRAC = 0.3
MAX_DUP_LINE_FRAC = 0.3
MAX_TOP_BIGRAM_FRAC = 0.2


def gopher_signals(pages: DataFrame, id_col: str = "page_id", lines_col: str = "lines") -> DataFrame:
    """Per-page Gopher quality signals + keep flag (see module docstring)."""
    pid = F.col(id_col)
    lines = F.col(lines_col)
    tok = tokens(F.array_join(lines, " "))

    base = pages.select(
        pid.alias("page_id"),
        F.size(lines).alias("n_lines"),
        tok.alias("tok"),
        F.size(lines).cast("double").alias("nl"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines).cast("double"), 6
        ).alias("dup_line_frac"),
        F.size(F.filter(lines, lambda l: l.startswith("- "))).cast("double").alias("n_bullet"),
        F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("double").alias("n_ellipsis"),
    ).select(
        "page_id",
        "n_lines",
        "tok",
        "dup_line_frac",
        F.size("tok").alias("n_words"),
        F.round(
            F.aggregate("tok", F.lit(0.0), lambda a, t: a + F.length(t))
            / F.size("tok").cast("double"),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.filter("tok", lambda t: t.rlike("[a-z]"))) / F.size("tok").cast("double"), 6
        ).alias("frac_alpha_words"),
        stopword_hits(F.col("tok"), STOPWORDS_EN).alias("n_stopword_hits"),
        F.round(F.col("n_bullet") / F.col("nl"), 6).alias("frac_bullet_lines"),
        F.round(F.col("n_ellipsis") / F.col("nl"), 6).alias("frac_ellipsis_lines"),
    )

    # modal-bigram frequency: explode + two hash aggregates, keyed by
    # (page_id, 60-bit gram hash) so the exchange never carries gram text
    bg = base.select("page_id", F.explode(ngrams(F.col("tok"), 2)).alias("g"))
    top = (
        bg.groupBy("page_id", portable_hash64(F.col("g")).alias("gh"))
        .agg(F.count("*").alias("c"))
        .groupBy("page_id")
        .agg(F.max("c").alias("top_cnt"))
    )

    out = base.join(top, "page_id", "left").select(
        "page_id",
        "n_lines",
        "n_words",
        "mean_word_len",
        "frac_alpha_words",
        "n_stopword_hits",
        "frac_bullet_lines",
        "frac_ellipsis_lines",
        "dup_line_frac",
        F.when(
            F.col("n_words") > 1,
            F.round(
                F.coalesce(F.col("top_cnt"), F.lit(0)) / (F.col("n_words") - 1).cast("double"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )
    return out.withColumn(
        "keep_gopher",
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("mean_word_len").between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        & (F.col("frac_alpha_words") >= MIN_ALPHA_FRAC)
        & (F.col("n_stopword_hits") >= MIN_STOPWORD_HITS)
        & (F.col("frac_bullet_lines") <= MAX_BULLET_FRAC)
        & (F.col("frac_ellipsis_lines") <= MAX_ELLIPSIS_FRAC)
        & (F.col("dup_line_frac") <= MAX_DUP_LINE_FRAC)
        & (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM_FRAC),
    )


def gopher_oracle_sql(pages_cte: str) -> str:
    """DuckDB mirror of `gopher_signals` over ``WITH pages AS ({pages_cte})``.

    Identical tokenizer, identical 60-bit gram hash, identical 6-dp
    rounding before thresholding.
    """
    toks = (
        "list_filter(regexp_split_to_array(lower(array_to_string(lines, ' ')), '"
        + TOKEN_SPLIT_RE
        + "'), t -> t <> '')"
    )
    sw = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    gh = PORTABLE_HASH64_DUCKDB.format(col="g")
    return f"""
        WITH pages AS ({pages_cte}),
        t AS (
            SELECT page_id, lines, {toks} AS tok FROM pages
        ),
        base AS (
            SELECT page_id,
                   len(lines)::INT AS n_lines,
                   len(tok)::INT AS n_words,
                   round(list_sum(list_transform(tok, x -> length(x))) * 1.0 / len(tok), 6) AS mean_word_len,
                   round(len(list_filter(tok, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(tok), 6) AS frac_alpha_words,
                   (len(tok) - len(list_filter(tok, x -> NOT list_contains([{sw}], x))))::INT AS n_stopword_hits,
                   round(len(list_filter(lines, x -> regexp_matches(x, '^- '))) * 1.0 / len(lines), 6) AS frac_bullet_lines,
                   round(len(list_filter(lines, x -> regexp_matches(x, '\\.\\.\\.$'))) * 1.0 / len(lines), 6) AS frac_ellipsis_lines,
                   round(1.0 - len(list_distinct(lines)) * 1.0 / len(lines), 6) AS dup_line_frac,
                   list_transform(range(1, greatest(len(tok) - 1, 0) + 1),
                                  i -> array_to_string(tok[i:i+1], ' ')) AS bg
            FROM t
        ),
        tops AS (
            SELECT page_id, max(c) AS top_cnt
            FROM (
                SELECT page_id, {gh} AS ghash, count(*) AS c
                FROM (SELECT page_id, unnest(bg) AS g FROM base)
                GROUP BY page_id, ghash
            )
            GROUP BY page_id
        ),
        sig AS (
            SELECT b.*,
                   CASE WHEN b.n_words > 1
                        THEN round(coalesce(tops.top_cnt, 0) * 1.0 / (b.n_words - 1), 6)
                        ELSE 0.0 END AS top_bigram_frac
            FROM base b LEFT JOIN tops USING (page_id)
        )
        SELECT page_id, n_lines, n_words, mean_word_len, frac_alpha_words,
               n_stopword_hits, frac_bullet_lines, frac_ellipsis_lines,
               dup_line_frac, top_bigram_frac,
               (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
                AND mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}
                AND frac_alpha_words >= {MIN_ALPHA_FRAC}
                AND n_stopword_hits >= {MIN_STOPWORD_HITS}
                AND frac_bullet_lines <= {MAX_BULLET_FRAC}
                AND frac_ellipsis_lines <= {MAX_ELLIPSIS_FRAC}
                AND dup_line_frac <= {MAX_DUP_LINE_FRAC}
                AND top_bigram_frac <= {MAX_TOP_BIGRAM_FRAC}) AS keep_gopher
        FROM sig
        ORDER BY page_id
    """
