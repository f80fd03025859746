"""BPE merge-pair statistics — the counting primitive a byte-pair-
encoding tokenizer trainer iterates (Sennrich et al. 2016): the
frequency of every adjacent symbol pair across the corpus, here for the
first merge step (symbols = characters).

A training-data pipeline runs this to fit the tokenizer ON the corpus
it just curated; the brief's "token counting (whitespace + a BPE-ish
regex)" axis gets its training-side counterpart.

Scale shape (100 TB) — the classic BPE trick, distributed: pair counts
are computed over the WORD VOCABULARY WITH MULTIPLICITIES, never the
corpus. One hash aggregate folds 10^13 token occurrences into a 10^7-row
(word, count) vocab; the pair explode then touches each distinct word
once, weighted by its count — the explode factor is word length, bounded
by ~40 chars, over vocab-sized input. The final top-K is
``orderBy().limit()`` = TakeOrderedAndProject (per-partition heaps, no
global sort shuffle).

Portability: pairs come from ``substring(word, i, 2)`` over an exploded
1..len-1 integer sequence — identical semantics in Spark and DuckDB
(splitting on the empty regex differs between engines; substring does
not). Counts are exact longs; ties in the top-K break on the pair's
binary string order (tokens are [a-z0-9], where UTF8-binary and DuckDB
collation agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    k: int = 50) -> DataFrame:
    """Top-``k`` adjacent character pairs by corpus frequency:
    (pair, n_positions, n_occurrences) — n_positions = distinct (word,
    position) sites in the vocab, n_occurrences = those sites weighted
    by each word's corpus count (BPE's merge score)."""
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
        .filter(F.length("word") >= 2)
    )
    pairs = vocab.select(
        "word", "wc",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
    ).select(
        F.expr("substring(word, i, 2)").alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_positions"),
            F.sum("wc").cast("long").alias("n_occurrences"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(k)
    )


def bpe_pair_counts_duckdb(toks_expr: str, table: str = "documents",
                           k: int = 50) -> str:
    """Full SELECT mirroring ``bpe_pair_counts``. ``toks_expr`` is the
    portable token-list fragment over the table's text column."""
    return f"""
        WITH bpe_vocab AS (
            SELECT word, count(*)::BIGINT AS wc FROM (
                SELECT unnest({toks_expr}) AS word FROM {table}
            ) GROUP BY 1 HAVING len(word) >= 2
        ),
        bpe_pairs AS (
            SELECT substring(word, i, 2) AS pair, wc FROM (
                SELECT word, wc, unnest(range(1, len(word))) AS i
                FROM bpe_vocab
            )
        )
        SELECT pair,
               count(*)::BIGINT AS n_positions,
               sum(wc)::BIGINT AS n_occurrences
        FROM bpe_pairs
        GROUP BY 1 ORDER BY n_occurrences DESC, pair LIMIT {k}
    """


# ---------------------------------------------------------------------------
# The merge LOOP (Sennrich et al. 2016 §3) — iterate: count pairs over the
# weighted vocab, pick the most frequent, rewrite every word by merging its
# occurrences greedily left-to-right, repeat. The trained artifact is the
# ordered merge-rule list.
#
# Scale shape (100 TB): the state carried between rounds is the SYMBOLIZED
# VOCAB — ~10^7 (syms:array<string>, wc) rows, never the corpus. Each round
# is (a) one map-combined hash aggregate over exploded adjacent pairs →
# TakeOrdered(1) to the driver (one tiny action, like PageRank's per-round
# dangling-mass read), and (b) a NARROW pure-Catalyst rewrite of the syms
# array (an `aggregate` fold — no shuffle, no Python). The vocab is
# persisted per round with the predecessor unpersisted, the same
# eager-materialize pattern as graph.pagerank, so lineage stays one round
# deep. N merges = N small jobs; nothing in the loop grows with corpus
# size, only with vocab size.
#
# Greedy-merge equivalence (both engines must pick the SAME occurrences):
# Sennrich's reference scan is `i=0; while i<len: if (s[i],s[i+1])==(x,y):
# emit xy, i+=2 else: emit s[i], i+=1`. Two provably-equivalent
# reformulations are used here:
#   * Spark: a left fold that merges when the accumulator's LAST element
#     equals x and the current element equals y. A just-emitted merged
#     symbol xy can never re-match as x (xy == x would need y = ''), so
#     the fold consumes occurrences exactly like the scan.
#   * DuckDB: match(i) = (s[i],s[i+1])==(x,y); consecutive-match chains
#     can only arise when x == y (else matches at i and i+1 would force
#     x = y); the scan takes the 1st, 3rd, 5th… match of each chain, so
#     "selected = odd position within a maximal consecutive-match island"
#     (gaps-and-islands windows) reproduces it without iteration.
# A hypothesis-style test pins both against a pure-Python scan.
#
# Portability: symbols are substrings of [a-z0-9]+ tokens, so every symbol
# is ASCII alnum — safe to inline in expr strings, and Spark UTF8-binary
# comparison == DuckDB default collation for the tie-break (count DESC,
# lhs ASC, rhs ASC). Counts are exact longs; no floats anywhere.
# ---------------------------------------------------------------------------

_ALNUM_RE = __import__("re").compile(r"^[a-z0-9]+$")


def _merge_fold_expr(a: str, b: str):
    """Narrow Catalyst fold applying merge (a,b) -> ab to a `syms` array,
    greedy left-to-right (see equivalence note above)."""
    assert _ALNUM_RE.match(a) and _ALNUM_RE.match(b), (a, b)
    ab = a + b
    return F.expr(
        "CASE WHEN size(syms) < 2 THEN syms ELSE "
        "aggregate(slice(syms, 2, size(syms) - 1), array(syms[0]), "
        f"(acc, x) -> IF(element_at(acc, -1) = '{a}' AND x = '{b}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{ab}')), "
        "concat(acc, array(x)))) END"
    )


def char_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(syms: array<string>, wc) — the corpus word vocabulary with
    multiplicities, each word split to single-character symbols. Words of
    length 1 carry no pairs and are dropped (they can never merge)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
        .filter(F.length("word") >= 2)
        .select(
            "word",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("syms"),
            "wc",
        )
    )


def _train(df: DataFrame, text_col: str, n_merges: int):
    """Run the merge loop; returns (rules list, final vocab (word, syms,
    wc), cache list) — the final vocab is persisted but possibly not yet
    materialized (its predecessor, still in the cache list, feeds it);
    the caller must unpersist everything in the cache list after its
    first action over the vocab.

    One action per round: the top-pair TakeOrdered(1) collect. The
    rewritten vocab is persisted LAZILY — the next round's collect (or
    the caller's first action) materializes it while its predecessor is
    still cached, so lineage never recomputes and each round costs one
    job instead of two (a count-to-materialize per round would double
    the driver's action count for no added safety: the predecessor is
    only unpersisted after the successor has been computed through)."""
    vocab = char_vocab(df, text_col).persist()
    prev = None
    rules: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                "wc",
                F.explode(
                    F.sequence(F.lit(1), F.size("syms") - 1)
                ).alias("i"),
                "syms",
            )
            .select(
                F.expr("element_at(syms, i)").alias("lhs"),
                F.expr("element_at(syms, i + 1)").alias("rhs"),
                "wc",
            )
            .groupBy("lhs", "rhs")
            .agg(F.sum("wc").cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        # this round's collect computed (and cached) `vocab`; its
        # predecessor can drop now
        if prev is not None:
            prev.unpersist()
        if not top:
            break
        a, b, n = top[0]["lhs"], top[0]["rhs"], int(top[0]["n"])
        rules.append((rank, a, b, a + b, n))
        nxt = vocab.select(
            "word", _merge_fold_expr(a, b).alias("syms"), "wc"
        ).persist()
        prev = vocab
        vocab = nxt
    caches = [vocab] if prev is None else [vocab, prev]
    return rules, vocab, caches


def bpe_merges(df: DataFrame, text_col: str = "text",
               n_merges: int = 12) -> DataFrame:
    """Train ``n_merges`` BPE merge rules over the corpus; returns the
    ordered rule list (merge_rank, lhs, rhs, merged, n_occurrences).
    Stops early if the vocab runs out of pairs."""
    spark = df.sparkSession
    rules, _vocab, caches = _train(df, text_col, n_merges)
    for c in caches:
        c.unpersist()
    return spark.createDataFrame(
        rules,
        "merge_rank int, lhs string, rhs string, merged string, "
        "n_occurrences long",
    )


def bpe_segment(df: DataFrame, text_col: str = "text",
                n_merges: int = 12, k: int = 100) -> DataFrame:
    """The ENCODE half of the tokenizer: the top-``k`` corpus words by
    frequency with their BPE segmentation after ``n_merges`` learned
    merges — (word, wc, n_syms, segmented). The loop's final vocab IS
    the segmentation of every distinct word, which is exactly how a
    100 TB encode runs: segment the ~10^7-row vocab once, then
    broadcast-join words back to the corpus — the per-token cost of
    encoding never touches corpus-sized data. Single-character words
    (excluded from training; they can never merge) segment trivially to
    themselves and are not listed. The result is localCheckpoint-severed
    so the caller holds no lineage over the unpersisted loop state
    (graph.pagerank's pattern)."""
    _rules, vocab, caches = _train(df, text_col, n_merges)
    res = (
        vocab.select(
            "word",
            "wc",
            F.size("syms").alias("n_syms"),
            F.concat_ws(" ", "syms").alias("segmented"),
        )
        .orderBy(F.desc("wc"), F.asc("word"))
        .limit(k)
        .localCheckpoint(eager=True)
    )
    for c in caches:
        c.unpersist()
    return res


def _merge_cte_chain(toks_expr: str, table: str, n_merges: int) -> list[str]:
    """The unrolled merge loop as a CTE list: round r = b{r} (top pair by
    count DESC, lhs, rhs) + a window-parity rewrite v{r} of v{r-1} (see
    equivalence note above). The vocab and best CTEs are MATERIALIZED —
    DuckDB inlines CTEs by default, and v{r} is referenced twice per
    round (pair count + rewrite), so inlining would double the plan tree
    every round (2^N blowup)."""
    ctes = [f"""v0 AS MATERIALIZED (
            SELECT word, wc,
                   list_transform(range(1, len(word) + 1),
                                  i -> word[i:i]) AS syms
            FROM (
                SELECT word, count(*)::BIGINT AS wc FROM (
                    SELECT unnest({toks_expr}) AS word FROM {table}
                ) GROUP BY 1 HAVING len(word) >= 2
            )
        )"""]
    for r in range(1, n_merges + 1):
        p = r - 1
        ctes.append(f"""b{r} AS MATERIALIZED (
            SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
                   sum(wc)::BIGINT AS n, {r} AS merge_rank
            FROM (SELECT syms, wc, unnest(range(1, len(syms))) AS i FROM v{p})
            GROUP BY 1, 2 ORDER BY n DESC, lhs, rhs LIMIT 1
        )""")
        # explode positions, flag matches, island-group them, keep odd
        # chain positions, emit merged symbol, drop consumed successors.
        # LEFT JOIN (not CROSS): an exhausted vocab yields an EMPTY b{r},
        # and the rewrite must then pass v{p} through unchanged (matching
        # the Spark loop's early break), not wipe it.
        ctes.append(f"""e{r} AS (
            SELECT word, wc, i AS pos, syms[i] AS sym,
                   coalesce(i < len(syms) AND syms[i] = b.lhs
                            AND syms[i + 1] = b.rhs, false) AS m,
                   b.lhs || b.rhs AS merged
            FROM (SELECT word, wc, syms,
                         unnest(range(1, len(syms) + 1)) AS i FROM v{p})
            LEFT JOIN b{r} b ON true
        )""")
        ctes.append(f"""s{r} AS (
            SELECT word, wc, pos, sym, m, merged,
                   m AND (row_number() OVER (
                       PARTITION BY word, grp ORDER BY pos) % 2 = 1) AS sel
            FROM (
                SELECT *, CASE WHEN m THEN pos - row_number() OVER (
                           PARTITION BY word, m ORDER BY pos) END AS grp
                FROM e{r}
            )
        )""")
        ctes.append(f"""v{r} AS MATERIALIZED (
            SELECT word, wc, list(sym2 ORDER BY pos) AS syms
            FROM (
                SELECT word, wc, pos,
                       CASE WHEN sel THEN merged ELSE sym END AS sym2,
                       coalesce(lag(sel) OVER (
                           PARTITION BY word ORDER BY pos), false) AS consumed
                FROM s{r}
            ) WHERE NOT consumed
            GROUP BY word, wc
        )""")
    return ctes


def bpe_merges_duckdb(toks_expr: str, table: str = "documents",
                      n_merges: int = 12) -> str:
    """DuckDB mirror of ``bpe_merges`` over the unrolled CTE chain."""
    ctes = _merge_cte_chain(toks_expr, table, n_merges)
    union = "\nUNION ALL\n".join(
        f"SELECT merge_rank, lhs, rhs, lhs || rhs AS merged, "
        f"n AS n_occurrences FROM b{r}" for r in range(1, n_merges + 1)
    )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT merge_rank::INT AS merge_rank, lhs, rhs, merged, "
              f"n_occurrences FROM ({union}) ORDER BY merge_rank")


def bpe_segment_duckdb(toks_expr: str, table: str = "documents",
                       n_merges: int = 12, k: int = 100) -> str:
    """DuckDB mirror of ``bpe_segment``: the chain's final vocab v{n} is
    the segmentation of every distinct word; top-k by (wc DESC, word)."""
    ctes = _merge_cte_chain(toks_expr, table, n_merges)
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT word, wc, len(syms)::INT AS n_syms,
               array_to_string(syms, ' ') AS segmented
        FROM v{n_merges} ORDER BY wc DESC, word LIMIT {k}""")
