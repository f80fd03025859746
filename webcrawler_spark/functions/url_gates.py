"""FineWeb/RefinedWeb-style URL quality gates — document-level curation
decided from the URL alone, upstream of any content fetch: length cap,
digit-heavy slugs, path-depth cap, session-id query params, blocklist
terms, and the repeated-path-segment crawler-trap heuristic.

The reference's URL handling stops at scheme/containment/extension
filters (F1/F4/F7, WebCrawler.java); these gates are the
training-pipeline extension the brief asks for — the cheap pre-fetch
selection pass a 100 TB crawl runs on its frontier (every gate is a
narrow string expression: no shuffle, no UDF, fully pushdown-friendly).

The driver's `documents` table carries no URL, so `synthetic_urls`
derives one DETERMINISTICALLY from (doc_id, source) — in Spark and,
value-for-value, in DuckDB (`synthetic_urls_duckdb`) — planting every
trap shape the gates must catch: session-id query strings, repeated-
segment loops, deep archives, digit-heavy slugs, and blocklist words.

Portability: all flags are pure string/array predicates with the same
regex semantics in Java regex and RE2 (character classes and literal
alternations only; the one `(?i)` group is supported by both).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_URL_LEN = 160
MAX_PATH_DEPTH = 8
MAX_REPEATED_SEGMENTS = 1  # segments allowed to repeat before 'loop' fires

SESSION_RE = r"(?i)(phpsessid|jsessionid|sessionid|sid=)"
BLOCKLIST_RE = r"(casino|lottery|free-bonus)"


# ---------------------------------------------------------------------------
# deterministic synthetic URL corpus (documents carry no URL)
# ---------------------------------------------------------------------------

def synthetic_urls(docs: DataFrame, id_col: str = "doc_id",
                   source_col: str = "source") -> DataFrame:
    """(doc_id, url) — one URL per document, trap shapes planted by
    doc_id residue (disjoint residues so each gate is exercised alone;
    ~72% of ids take the clean branch)."""
    did = F.col(id_col)
    host = F.concat(F.col(source_col), F.lit(".gov.si"))
    slug = did.cast("string")
    url = (
        F.when(did % 17 == 0, F.concat(
            F.lit("http://"), host, F.lit("/login?PHPSESSID=abc"), slug))
        .when(did % 13 == 1, F.concat(
            F.lit("http://"), host,
            F.lit("/a/b/a/c/a/d/p"), slug))  # segment 'a' x3 -> loop trap
        .when(did % 11 == 2, F.concat(
            F.lit("http://"), host,
            F.lit("/y/2020/m/01/d/05/x/9/z/3/p"), slug))  # depth 11 > 8
        .when(did % 7 == 3, F.concat(
            F.lit("http://"), host, F.lit("/id/"), slug,
            F.lit("/2024010203040506070809101112131415161718")))  # digit-heavy
        .when(did % 5 == 4, F.concat(
            F.lit("http://"), host, F.lit("/promo/casino/p"), slug))
        .when(did % 19 == 5, F.concat(
            F.lit("http://"), host, F.lit("/deep/"),
            F.repeat(F.lit("section/very-long-archive-name-"), 6),
            F.lit("p"), slug))  # > MAX_URL_LEN
        .otherwise(F.concat(F.lit("http://"), host, F.lit("/docs/p"), slug))
    )
    return docs.select(did.alias("doc_id"), url.alias("url"))


def synthetic_urls_duckdb(table: str = "documents", id_col: str = "doc_id",
                          source_col: str = "source") -> str:
    """DuckDB CTE body producing the identical (doc_id, url) rows."""
    h = f"'http://' || {source_col} || '.gov.si'"
    s = f"{id_col}::VARCHAR"
    return f"""
        SELECT {id_col} AS doc_id,
            CASE
              WHEN {id_col} % 17 = 0 THEN {h} || '/login?PHPSESSID=abc' || {s}
              WHEN {id_col} % 13 = 1 THEN {h} || '/a/b/a/c/a/d/p' || {s}
              WHEN {id_col} % 11 = 2 THEN {h} || '/y/2020/m/01/d/05/x/9/z/3/p' || {s}
              WHEN {id_col} % 7 = 3 THEN {h} || '/id/' || {s} ||
                   '/2024010203040506070809101112131415161718'
              WHEN {id_col} % 5 = 4 THEN {h} || '/promo/casino/p' || {s}
              WHEN {id_col} % 19 = 5 THEN {h} || '/deep/' ||
                   repeat('section/very-long-archive-name-', 6) || 'p' || {s}
              ELSE {h} || '/docs/p' || {s}
            END AS url
        FROM {table}
    """


# ---------------------------------------------------------------------------
# the gates
# ---------------------------------------------------------------------------

def _path(url: Column) -> Column:
    # strip scheme+authority, then any query string: the path segments
    return F.regexp_replace(
        F.regexp_replace(url, r"^[a-z]+://[^/]*", ""), r"\?.*$", ""
    )


def url_gate_flags(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds the six gate flags plus `keep` (their conjunction):

    len_ok      — len(url) <= MAX_URL_LEN;
    digits_ok   — digits make up <= half the URL's characters;
    depth_ok    — path depth (segments) <= MAX_PATH_DEPTH;
    session_ok  — no session-id query parameter;
    blocklist_ok— no blocklisted term anywhere in the URL;
    loop_ok     — no path segment repeats more than
                  MAX_REPEATED_SEGMENTS extra times (crawler-loop trap).

    All narrow expressions — at frontier scale this is a pushdown-
    friendly filter on the scan, not a job."""
    u = F.col(url_col)
    n_digits = F.length(u) - F.length(F.regexp_replace(u, r"[0-9]", ""))
    segs = F.filter(F.split(_path(u), "/"), lambda t: t != F.lit(""))
    flags = urls.select(
        "*",
        (F.length(u) <= MAX_URL_LEN).alias("len_ok"),
        (n_digits * 2 <= F.length(u)).alias("digits_ok"),
        (F.size(segs) <= MAX_PATH_DEPTH).alias("depth_ok"),
        (~u.rlike(SESSION_RE)).alias("session_ok"),
        (~u.rlike(BLOCKLIST_RE)).alias("blocklist_ok"),
        (
            F.size(segs) - F.size(F.array_distinct(segs))
            <= MAX_REPEATED_SEGMENTS
        ).alias("loop_ok"),
    )
    return flags.withColumn(
        "keep",
        F.col("len_ok") & F.col("digits_ok") & F.col("depth_ok")
        & F.col("session_ok") & F.col("blocklist_ok") & F.col("loop_ok"),
    )


def url_gate_flags_duckdb(url_expr: str = "url") -> dict[str, str]:
    """Column-name → DuckDB expression, mirroring `url_gate_flags`."""
    u = url_expr
    path = f"regexp_replace(regexp_replace({u}, '^[a-z]+://[^/]*', ''), '\\?.*$', '')"
    segs = f"list_filter(string_split({path}, '/'), t -> t <> '')"
    n_digits = f"(len({u}) - len(regexp_replace({u}, '[0-9]', '', 'g')))"
    flags = {
        "len_ok": f"(len({u}) <= {MAX_URL_LEN})",
        "digits_ok": f"({n_digits} * 2 <= len({u}))",
        "depth_ok": f"(len({segs}) <= {MAX_PATH_DEPTH})",
        "session_ok": f"(NOT regexp_matches({u}, '{SESSION_RE}'))",
        "blocklist_ok": f"(NOT regexp_matches({u}, '{BLOCKLIST_RE}'))",
        "loop_ok": f"(len({segs}) - len(list_distinct({segs}))"
                   f" <= {MAX_REPEATED_SEGMENTS})",
    }
    flags["keep"] = "(" + " AND ".join(flags.values()) + ")"
    return flags
