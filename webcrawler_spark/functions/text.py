"""Text operators — tokenization, cleaning, language-ID, quality scoring,
fingerprinting. All pure Catalyst expressions (no Python UDFs in the hot
path); every expression has a documented DuckDB-SQL equivalent so the
driver's oracle can verify it value-for-value.

Reference parity:
* whitespace collapse  — WebCrawler.java:230-231 ``replaceAll("\\s{2,}"," ")``
* tokenizer            — processing.py:17-21 (nltk word_tokenize → keep
  alnum chars → lowercase). nltk isn't in this container; the engine's
  tokenizer is the documented approximation from SURVEY.md X14:
  lowercase → split on non-alphanumeric runs → drop empties.
* stopword filter      — processing.py:20 / stopwords.py (F12)

Training-pipeline additions (not in the reference, required by the brief):
language-ID heuristic, quality scoring, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import portable_hash64

# Small fixed stopword lists standing in for stopwords.py:1-42 (the
# reference ships a Slovene list; ours is seed-language-ID oriented).
STOPWORDS_EN = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)
STOPWORDS_SL = (
    "in", "je", "na", "za", "se", "da", "so", "ki", "pa", "bi",
    "po", "ne", "z", "s", "v", "do", "tudi", "kot", "od", "le",
)
STOPWORDS_DE = (
    "der", "die", "und", "das", "von", "zu", "mit", "den", "im", "ist",
    "ein", "eine", "auf", "für", "des", "sich", "nicht", "auch", "es", "dem",
)

TOKEN_SPLIT_RE = "[^a-z0-9]+"  # same regex text in Spark (Java) and DuckDB (RE2)


def collapse_ws(col: Column) -> Column:
    """F14: whitespace collapse (WebCrawler.java:230-231)."""
    return F.regexp_replace(col, r"\s{2,}", " ")


def tokens(col: Column) -> Column:
    """X14: lowercase → split on non-alnum runs → drop empties.

    DuckDB: ``list_filter(regexp_split_to_array(lower(x),'[^a-z0-9]+'), t -> t <> '')``
    """
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


TOKEN_SPLIT_RE_UNICODE = r"[^\p{L}\p{N}]+"


def tokens_unicode(col: Column) -> Column:
    """X14 unicode form for non-ASCII corpora (Slovene č/š/ž): lowercase →
    split on non-letter/digit runs (unicode classes) → drop empties.

    DuckDB (RE2): ``list_filter(regexp_split_to_array(lower(x),
    '[^\\p{L}\\p{N}]+'), t -> t <> '')`` — same class syntax.
    """
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE_UNICODE), lambda t: t != F.lit("")
    )


def remove_stopwords(tok: Column, stopwords: tuple[str, ...]) -> Column:
    """F12: drop stopwords from a token array (processing.py:20).

    NOTE: ``filter``, not ``array_except`` — array_except has SET semantics
    and silently deduplicates the kept tokens, which would corrupt
    frequencies and positions downstream (A4).
    DuckDB: ``list_filter(t, x -> not list_contains(sw, x))``.
    """
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.filter(tok, lambda t: ~F.array_contains(sw, t))


def stopword_hits(tok: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of stopword *occurrences* (not distinct stopwords).

    DuckDB: ``len(t) - len(list_filter(t, x -> not list_contains(sw, x)))``.
    """
    return F.size(tok) - F.size(remove_stopwords(tok, stopwords))


def lang_id(col: Column) -> Column:
    """Heuristic language-ID: argmax of per-language stopword hit counts.

    Ties break en > sl > de (ordered CASE). Returns 'und' when no hits.
    """
    t = tokens(col)
    en = stopword_hits(t, STOPWORDS_EN)
    sl = stopword_hits(t, STOPWORDS_SL)
    de = stopword_hits(t, STOPWORDS_DE)
    return (
        F.when((en >= sl) & (en >= de) & (en > 0), F.lit("en"))
        .when((sl >= de) & (sl > 0), F.lit("sl"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def quality_score(col: Column) -> Column:
    """Composite document-quality score in [0,1] — deterministic, portable.

    mean of three ratios:
      * length_ok   : min(n_chars / 500, 1)
      * alnum_ratio : alnum chars / all chars
      * word_len_ok : 1 if mean token length in [3, 12] else scaled
    """
    n_chars = F.length(col).cast("double")
    alnum = F.length(F.regexp_replace(col, "[^a-zA-Z0-9]", "")).cast("double")
    t = tokens(col)
    n_tok = F.size(t).cast("double")
    tok_chars = F.aggregate(
        t, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)
    )
    mean_tok_len = F.when(n_tok > 0, tok_chars / n_tok).otherwise(F.lit(0.0))
    length_ok = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    alnum_ratio = F.when(n_chars > 0, alnum / n_chars).otherwise(F.lit(0.0))
    word_len_ok = F.when(
        (mean_tok_len >= 3) & (mean_tok_len <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round((length_ok + alnum_ratio + word_len_ok) / F.lit(3.0), 6)


def fingerprint64(col: Column) -> Column:
    """Document fingerprint: portable 60-bit hash of the whitespace-collapsed,
    lowercased text — the J5 content-dedup key (DatabaseHandler.java:154-169
    exact-match semantics, made O(1) per row)."""
    return portable_hash64(F.lower(collapse_ws(col)))


def ngrams(tok: Column, n: int) -> Column:
    """Token n-grams as 'w1 w2 ... wn' strings (for Jaccard/minhash shingles).

    DuckDB: list_transform(range(1, len(t)-n+2), i -> array_to_string(t[i:i+n-1], ' '))
    """
    m = F.size(tok) - (n - 1)
    return F.when(
        m > 0,
        F.transform(
            F.sequence(F.lit(1), m), lambda i: F.concat_ws(" ", F.slice(tok, i, n))
        ),
    ).otherwise(F.array().cast("array<string>"))
