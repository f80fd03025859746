"""Text expressions (X14/F12/F14, lang-id, quality, ngrams), portable
hashing (Spark ↔ DuckDB bit-parity), MIME maps (X1/X2)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from webcrawler_spark.functions.hashing import (
    PORTABLE_HASH64_DUCKDB,
    portable_hash64,
)
from webcrawler_spark.functions.mime import (
    CONTENT_TYPE_TO_DATA_TYPE,
    IMAGE_MIME,
    IMAGE_MIME_DEFAULT,
    data_type_code,
    image_mime,
    image_mime_py,
)
from webcrawler_spark.functions.text import (
    STOPWORDS_EN,
    collapse_ws,
    fingerprint64,
    lang_id,
    ngrams,
    quality_score,
    remove_stopwords,
    token_count,
    tokens,
)

SAMPLES = [
    "The quick brown fox and the lazy dog",
    "je na za se da tako kot vedno",
    "der und die das von einem Haus",
    "x",
    "",
    "  Multiple   spaces\t\tand\nnewlines  here ",
    "123 456 abc-def GHI_jkl",
]


def test_portable_hash_matches_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES if s], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", portable_hash64(F.col("s")).alias("h")).collect()}
    expr = PORTABLE_HASH64_DUCKDB.format(col="s")
    for s in SAMPLES:
        if not s:
            continue
        want = duckdb.sql(f"SELECT {expr} AS h FROM (SELECT ? AS s)", params=[s]).fetchone()[0]
        assert got[s] == want, s


def test_tokens_and_count(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    rows = df.select(
        tokens(F.col("s")).alias("t"), token_count(F.col("s")).alias("n")
    ).collect()
    import re

    for s, r in zip(SAMPLES, rows):
        want = [t for t in re.split("[^a-z0-9]+", s.lower()) if t]
        assert r["t"] == want, s
        assert r["n"] == len(want)


def test_collapse_ws(spark):
    df = spark.createDataFrame([("a  b   c \t\t d",)], "s string")
    # \s{2,} → single space; single separators are untouched (WebCrawler.java:230-231)
    assert df.select(collapse_ws(F.col("s")).alias("o")).first()["o"] == "a b c d"


def test_stopword_removal(spark):
    df = spark.createDataFrame([("the cat and the hat",)], "s string")
    out = df.select(
        remove_stopwords(tokens(F.col("s")), STOPWORDS_EN).alias("t")
    ).first()["t"]
    assert out == ["cat", "hat"]


def test_lang_id(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES[:5]], "s string")
    got = [r["l"] for r in df.select(lang_id(F.col("s")).alias("l")).collect()]
    assert got == ["en", "sl", "de", "und", "und"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    for r in df.select(quality_score(F.col("s")).alias("q")).collect():
        assert 0.0 <= r["q"] <= 1.0


def test_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "s string")
    rows = [r["g"] for r in df.select(ngrams(tokens(F.col("s")), 3).alias("g")).collect()]
    assert rows[0] == ["a b c", "b c d"]
    assert rows[1] == []
    assert rows[2] == []


def test_fingerprint_collapse_equivalence(spark):
    df = spark.createDataFrame([("A  b   C",), ("a b c",)], "s string")
    vals = [r["f"] for r in df.select(fingerprint64(F.col("s")).alias("f")).collect()]
    assert vals[0] == vals[1]  # identity = collapsed+lowercased text


def test_image_mime_exhaustive(spark):
    exts = list(IMAGE_MIME) + ["bogus", "PDF"]
    df = spark.createDataFrame([(e,) for e in exts], "e string")
    got = [r["m"] for r in df.select(image_mime(F.col("e")).alias("m")).collect()]
    want = [IMAGE_MIME[e] for e in IMAGE_MIME] + [IMAGE_MIME_DEFAULT, IMAGE_MIME_DEFAULT]
    assert got == want
    # reference quirks preserved verbatim (DatabaseHandler.java:280-310)
    assert IMAGE_MIME["apng"] == "image/apgn"
    assert IMAGE_MIME["svn"] == "image/svg+xml"
    assert image_mime_py("SVN") == "image/svg+xml"


def test_data_type_code(spark):
    cts = list(CONTENT_TYPE_TO_DATA_TYPE) + ["text/html"]
    df = spark.createDataFrame([(c,) for c in cts], "c string")
    got = [r["d"] for r in df.select(data_type_code(F.col("c")).alias("d")).collect()]
    assert got == ["PDF", "DOC", "DOCX", "PPT", "PPTX", None]
