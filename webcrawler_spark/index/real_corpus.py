"""S7: the reference's real indexing corpus (``input-indexing/`` — 1,416
gov.si HTML pages across 4 sites) scanned, cleaned and indexed the
reference's way (processing.py:25-37,75-121):

* directory scan per site, ``*.html`` only (``:80-86``)
* utf-8 read + ``<?xml … ?>`` declaration strip (``:25-30``)
* lxml ``Cleaner(style=True, kill_tags={nav, footer})`` + body
  ``text_content()`` → our stdlib DOM with the same effective kills
  (X13; lxml absent here): body-only, script/style/nav/footer plus the
  Cleaner-default form widgets (``html_text.INDEX_WIDGET_KILL``)
* nltk ``word_tokenize`` → keep alnum → lowercase → drop Slovene
  stopwords (``:17-21``) → the faithful rule-cascade tokenizer
  (``functions/nltk_tokenize.py``) + the reference's ported stopword
  list extended with its snippet-evidenced nltk members
  (``stopwords_sl.STOPWORDS_SL_RUNTIME``)

Parity, validated in tests/test_real_corpus_index.py against the
reference's published artifacts: 54/54 per-document query frequencies
exact, every legible published snippet window byte-exact, 'slovenije'
9,105 exact, 'proizvodnja' 2,266 exact, vocabulary 48,398 vs published
48,081 (+0.66%, the unrecovered nltk-stopword tail — see stopwords_sl).

``doc`` names are ``site/file`` exactly as the reference stores them
(processing.py:116).

Scale: a binaryFile scan parallelizes over files; decode+parse is one
Arrow-batched ``mapInPandas`` pass; the postings build is the same
explode→groupBy as the synthetic path (index/build.py). At 10^10 pages
the identical plan applies to a pages table instead of a file scan.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_spark.extract.html_text import INDEX_WIDGET_KILL, text_content_raw
from webcrawler_spark.functions.nltk_tokenize import tokens_nltk
from webcrawler_spark.functions.stopwords_sl import STOPWORDS_SL_RUNTIME
from webcrawler_spark.index.build import build_postings

INDEX_ROOT = "/root/reference/input-indexing"
INDEX_SITES = ("e-prostor.gov.si", "e-uprava.gov.si", "evem.gov.si", "podatki.gov.si")

_XML_DECL = re.compile(r"<\?xml.*?\?>")


def read_index_corpus(spark: SparkSession, root: str = INDEX_ROOT) -> DataFrame:
    """(doc, text) — visible text of every corpus page."""
    raw = (
        spark.read.format("binaryFile")
        .load([f"{root}/{site}/*.html" for site in INDEX_SITES])
        .select("path", "content")
        .repartition(64)  # 1,416 files ≈ 72 MB — spread the parse work
    )

    def decode(batches):
        for pdf in batches:
            docs, texts = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                parts = path.split("/")
                doc = f"{parts[-2]}/{parts[-1]}"
                html = bytes(content).decode("utf-8", errors="replace")
                html = _XML_DECL.sub("", html)
                docs.append(doc)
                # raw (uncollapsed) body text — what lxml hands nltk
                texts.append(text_content_raw(
                    html, body_only=True, extra_kill=INDEX_WIDGET_KILL))
            yield pd.DataFrame({"doc": docs, "text": texts})

    return raw.mapInPandas(decode, schema="doc string, text string")


def build_real_postings(corpus: DataFrame) -> DataFrame:
    """postings(doc, word, frequency, positions) over the real corpus,
    Slovene stopwords applied (F12), reference-exact tokenizer (X14)."""
    return build_postings(
        corpus,
        doc_col="doc",
        text_col="text",
        stopwords=tuple(sorted(STOPWORDS_SL_RUNTIME)),
        tokenizer=tokens_nltk,
    )


def corpus_stats(postings: DataFrame) -> DataFrame:
    """The report's headline aggregates (A5 + A8): vocabulary size, corpus
    token count, and the global max-frequency word via max_by
    (implementation-indexing/report/main.tex:96-98)."""
    totals = postings.groupBy("word").agg(F.sum("frequency").cast("long").alias("total"))
    key = F.concat(F.lpad(F.col("total").cast("string"), 10, "0"), F.lit("|"), F.col("word"))
    return totals.agg(
        F.count("*").cast("long").alias("vocabulary"),
        F.sum("total").cast("long").alias("n_tokens"),
        F.max_by("word", key).alias("top_word"),
        F.max("total").cast("long").alias("top_total"),
    )


def per_site_top_words(postings: DataFrame) -> DataFrame:
    """A8 per site: max-frequency word per corpus site via max_by."""
    site = F.split(F.col("doc"), "/").getItem(0)
    totals = (
        postings.withColumn("site", site)
        .groupBy("site", "word")
        .agg(F.sum("frequency").cast("long").alias("total"))
    )
    key = F.concat(F.lpad(F.col("total").cast("string"), 10, "0"), F.lit("|"), F.col("word"))
    return (
        totals.groupBy("site")
        .agg(F.max_by("word", key).alias("top_word"), F.max("total").cast("long").alias("top_total"))
        .orderBy("site")
    )
