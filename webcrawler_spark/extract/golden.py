"""Reference-site extraction with golden parity — the 4 real sites'
mode-A regex programs and mode-B XPath programs, run over the reference's
committed inputs (``input-extraction/<site>/*.html``) and asserted
field-for-field against its 8 committed ``data_*.json`` goldens.

The goldens were produced by mode B (XPath): ``SavingPercent`` keeps the
parens of the ``wholeSavings.split(" ")`` (run-extraction.py:160-163) and
rtvslo ``Content`` preserves raw ``string()`` whitespace (``:129``), both
impossible for mode A, which scrubs \\n\\t first (``:30``). So:

* ``mode_b_rows``  — byte-exact golden parity; the XPath-lite driver loops
  (``tr[i]`` fail_count=3, ``:136-177``; ``div[i]`` break, ``:199-229``;
  ``em[i]`` break, ``:186-193``) run per page inside one Arrow-batched
  ``mapInPandas`` pass (the reference's per-index lxml round-trips become
  one parsed tree per page).
* ``mode_a_rows``  — the same sites' regex programs (``:29-108``) as pure
  Catalyst ``regexp_extract(_all)`` plus the J6 key-joins: overstock
  fields keyed by ``PROD_ID`` (``:44-68``), ceneje by img ``alt``
  (``:88-105``); dict-merge semantics (first-occurrence order, last value
  wins) via ``min(pos)`` + ``max_by(value, pos)`` hash aggregation and
  left-outer joins with ``coalesce(field, '')`` for ``.get(key, '')``.

Both emit one long-format row per extracted value —
``(site, page, item, field, idx, value)`` — so dict pages, list pages and
array fields (Tags) compare uniformly; ``reconstruct`` rebuilds the
reference's nested JSON shape for the S8 golden sink byte-compare.

Scale: one task per page batch, no driver loops, no collects; the regex
programs are whole-stage-codegen Catalyst; the XPath programs parse each
page once. At 10^10 pages both are embarrassingly parallel over the page
table.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webcrawler_spark.extract.html_text import parse_html, xpath_first, xpath_raw

REFERENCE_ROOT = "/root/reference"
INPUT_DIR = f"{REFERENCE_ROOT}/input-extraction"
GOLDEN_DIR = f"{REFERENCE_ROOT}/implementation-extraction"

# site → pages (file stem = golden stem, run-extraction.py:372-391)
PAGES = {
    "rtvslo.si": [
        "Audi A6 50 TDI quattro_ nemir v premijskem razredu - RTVSLO.si",
        "Volvo XC 40 D4 AWD momentum_ suvereno med najboljše v razredu - RTVSLO.si",
    ],
    "overstock.com": ["jewelry01", "jewelry02"],
    "mimovrste.si": [
        "Continental guma PremiumContact 6 205_55R16 91V _ mimovrste=)",
        "Rokib dezinfekcijsko sredstvo za roke, 70% alkohola, 500 ml _ mimovrste=)",
    ],
    "ceneje.si": [
        "Rezultati iskanja_ ssd samsung 560 evo - Ceneje.si",
        "Tekalne steze - Ceneje.si",
    ],
}

# field order + list-ness per site, for JSON reconstruction (dict insertion
# order of run-extraction.py:126-229)
FIELD_SPECS = {
    "rtvslo.si": [("Title", False), ("SubTitle", False), ("Lead", False),
                  ("Content", False), ("Author", False), ("PublishedTime", False)],
    "overstock.com": [("Title", False), ("Content", False), ("ListPrice", False),
                      ("Price", False), ("Saving", False), ("SavingPercent", False)],
    "mimovrste.si": [("Title", False), ("Description", False), ("OldPrice", False),
                     ("Price", False), ("Availability", False), ("Tags", True),
                     ("Savings", False)],
    "ceneje.si": [("Image", False), ("Title", False), ("MinPrice", False),
                  ("Stores", False), ("Action", False)],
}
LIST_SITES = {"overstock.com", "ceneje.si"}  # pages are lists of item dicts

ROW_SCHEMA = "site string, page string, item int, field string, idx int, value string"


# ---------------------------------------------------------------------------
# S7: corpus reader (per-site encodings, run-extraction.py:351-357)
# ---------------------------------------------------------------------------

def read_extraction_corpus(spark: SparkSession, root: str = INPUT_DIR) -> DataFrame:
    """(site, page, html) — binaryFile scan + vectorized decode. The
    overstock pages decode as ``unicode_escape`` (run-extraction.py:354-355);
    text-mode reading implies universal newlines, so CRLF → LF after
    decoding."""
    paths = [f"{root}/{site}/*.html" for site in PAGES]
    raw = spark.read.format("binaryFile").load(paths).select("path", "content")

    def decode(batches):
        for pdf in batches:
            sites, pages, htmls = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                parts = path.split("/")
                site, fname = parts[-2], parts[-1]
                enc = "unicode_escape" if site == "overstock.com" else "utf-8"
                text = bytes(content).decode(enc)
                text = text.replace("\r\n", "\n").replace("\r", "\n")
                sites.append(site)
                pages.append(fname[:-5])
                htmls.append(text)
            yield pd.DataFrame({"site": sites, "page": pages, "html": htmls})

    return raw.mapInPandas(decode, schema="site string, page string, html string")


# ---------------------------------------------------------------------------
# mode B — XPath programs (run-extraction.py:121-231), golden-exact
# ---------------------------------------------------------------------------

def _mode_b_rtvslo(tree):
    # run-extraction.py:125-131; Content is raw string() (no extract_x_path)
    base = '//*[@id="main-container"]/div[3]/div'
    return {
        "Title": xpath_first(tree, base + "/header/h1/text()"),
        "SubTitle": xpath_first(tree, base + "/header/div[2]/text()"),
        "Lead": xpath_first(tree, base + "/header/p/text()"),
        "Content": (xpath_raw(tree, base + "/div[2]") or [""])[0],
        "Author": xpath_first(tree, base + "/div[1]/div[1]/div/text()"),
        "PublishedTime": xpath_first(tree, base + "/div[1]/div[2]/text()[1]"),
    }


def _mode_b_overstock(tree):
    # run-extraction.py:133-177: tr[i] loop, fail_count=3 stop, savings split
    out, i, fail = [], 1, 0
    while True:
        item = f"//table[@cellpadding='2']/tbody/tr[{i}]/"
        title = xpath_first(tree, item + "td[2]/a/b/text()")
        if fail > 3:
            break
        if len(title) == 0:
            fail += 1
            i += 1
            continue
        fail = 0
        inner = item + "td[2]/table/tbody/tr/"
        whole = xpath_first(tree, inner + "td[1]/table/tbody/tr[3]/td[2]/span/text()")
        comp = whole.split(" ")
        out.append({
            "Title": title,
            "Content": xpath_first(tree, inner + "td[2]/span/text()"),
            "ListPrice": xpath_first(tree, inner + "td[1]/table/tbody/tr[1]/td[2]/s/text()"),
            "Price": xpath_first(tree, inner + "td[1]/table/tbody/tr[2]/td[2]/span/b/text()"),
            "Saving": comp[0],
            "SavingPercent": comp[1] if len(comp) > 1 else "",
        })
        i += 1
    return out


def _mode_b_mimovrste(tree):
    # run-extraction.py:179-197: scalars + em[i] tag loop
    sec = '//*[@id="content"]/div/article/div[1]/section[2]'
    d = {
        "Title": xpath_first(tree, sec + "/h3/text()"),
        "Description": xpath_first(tree, sec + "/p[2]/text()"),
        "OldPrice": xpath_first(tree, sec + "/div[3]/div[1]/div[1]/div/del/text()"),
        "Price": xpath_first(tree, '//*[@class="price-wrapper"]/div[1]/div[1]/b/text()'),
        "Availability": xpath_first(tree, '//*[@class="delivery-wrapper"]/a/text()'),
    }
    tags, i = [], 1
    while True:
        tag = xpath_first(tree, sec + f"/p[1]/em[{i}]/text()")
        if len(tag) == 0:
            break
        tags.append(tag)
        i += 1
    d["Tags"] = tags
    d["Savings"] = xpath_first(tree, sec + "/div[3]/div[1]/div[2]/text()")
    return d


def _mode_b_ceneje(tree):
    # run-extraction.py:199-229: div[i] loop, break on empty title
    out, i = [], 1
    while True:
        item = f'//*[@id="productGrid"]/div[{i}]/'
        title = xpath_first(tree, item + "div/div[2]/h3/a/text()")
        if len(title) == 0:
            break
        out.append({
            "Image": xpath_first(tree, item + "div/div[1]/a/img/@src"),
            "Title": title,
            "MinPrice": xpath_first(tree, item + "div/div[2]/p/a[1]/b/text()"),
            "Stores": xpath_first(tree, item + "div/div[2]/p/a[2]/b/text()"),
            "Action": xpath_first(tree, item + "div/div[3]/a/text()"),
        })
        i += 1
    return out


_MODE_B = {
    "rtvslo.si": _mode_b_rtvslo,
    "overstock.com": _mode_b_overstock,
    "mimovrste.si": _mode_b_mimovrste,
    "ceneje.si": _mode_b_ceneje,
}


def extract_mode_b(site: str, html: str):
    """Nested reference shape (dict, or list of dicts) for one page."""
    return _MODE_B[site](parse_html(html))


def flatten(site: str, page: str, data) -> list[tuple]:
    """Nested page result → long rows (site, page, item, field, idx, value).
    Empty list fields emit a (idx=-1, '') marker so they round-trip."""
    items = data if isinstance(data, list) else [data]
    rows = []
    for j, d in enumerate(items):
        for field, is_list in FIELD_SPECS[site]:
            v = d.get(field, "" if not is_list else [])
            if is_list:
                if not v:
                    rows.append((site, page, j, field, -1, ""))
                for k, x in enumerate(v):
                    rows.append((site, page, j, field, k, x))
            else:
                rows.append((site, page, j, field, 0, v))
    return rows


def mode_b_rows(corpus: DataFrame) -> DataFrame:
    """Long-format mode-B extraction over a (site, page, html) corpus."""

    def run(batches):
        for pdf in batches:
            rows = []
            for site, page, html in zip(pdf["site"], pdf["page"], pdf["html"]):
                rows.extend(flatten(site, page, extract_mode_b(site, html)))
            yield pd.DataFrame(
                rows, columns=["site", "page", "item", "field", "idx", "value"]
            )

    return corpus.repartition("site", "page").mapInPandas(run, schema=ROW_SCHEMA)


def reconstruct(rows: list[tuple]):
    """Long rows (one page's) → the reference's nested JSON shape."""
    by_item: dict[int, dict] = {}
    site = rows[0][0]
    for _, _, item, field, idx, value in rows:
        d = by_item.setdefault(item, {})
        spec = dict(FIELD_SPECS[site])
        if spec[field]:
            lst = d.setdefault(field, [])
            if idx >= 0:
                lst.append((idx, value))
        else:
            d[field] = value
    out = []
    for item in sorted(by_item):
        d = by_item[item]
        ordered = {}
        for field, is_list in FIELD_SPECS[site]:
            v = d.get(field, [] if is_list else "")
            if is_list:
                v = [x for _, x in sorted(v)]
            ordered[field] = v
        out.append(ordered)
    return out if site in LIST_SITES else out[0]


def load_golden(site: str, page: str):
    with open(f"{GOLDEN_DIR}/data_{page}.json", encoding="utf-8") as f:
        return json.load(f)


def golden_rows() -> list[tuple]:
    """All 8 goldens flattened to the long format (the oracle's VALUES)."""
    rows = []
    for site, pages in PAGES.items():
        for page in pages:
            rows.extend(flatten(site, page, load_golden(site, page)))
    return rows


# ---------------------------------------------------------------------------
# mode A — regex programs (run-extraction.py:29-108), pure Catalyst + J6
# ---------------------------------------------------------------------------

# Python str.strip() (run-extraction.py:18) — Java \s misses NBSP etc.
_PYSPACE = "[\\s\u0085\u00a0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]"


def _pystrip(col):
    return F.regexp_replace(col, f"^{_PYSPACE}+|{_PYSPACE}+$", "")


def _clean(col):
    # X7 newline/tab scrub (run-extraction.py:30)
    return F.translate(col, "\n\t", "")


# scalar-site configs: field → (pattern, group); list fields under "repeated"
MODE_A_SCALAR = {
    "rtvslo.si": {  # run-extraction.py:33-40
        "fields": {
            "Title": "<h1>(.*?)</h1>",
            "SubTitle": '<div class="subtitle">(.*?)</div>',
            "Lead": '<p class="lead">(.*?)</p>',
            "Content": '<div class="article-body">(.*?)</div>[ ]*<div class="article-column">',
            "Author": '<div class="author-name">(.*?)</div>',
            "PublishedTime": '<div class="publish-meta">(.*?)<br>',
        },
        "repeated": {},
    },
    "mimovrste.si": {  # run-extraction.py:71-83
        "fields": {
            "Title": "<h3.*?>(.*?)</h3>",
            "Description": '<p.*?itemprop="description".*?>(.*?)<a',
            "OldPrice": '<del.*?class="rrp-price".*?>(.*?)</del>',
            "Price": '<b class="pro-price.*?>(.*?)</b>',
            "Availability": '<a data-sel="availability-detail".*?>(.*?)</a>',
            "Savings": '<div class="label--round-sale.*?>(.*?)</div>',
        },
        "repeated": {"Tags": '<em class="label.*?>(.*?)</em>'},
    },
}

# keyed-site configs (J6): anchor defines the item set + order; every field
# is (pattern, key_group, value_group, stripped?)
_OV_ITEM = '<td valign="top">\\W*<a.*?PROD_ID=([0-9]+)".*?'
_CJ_ITEM = '<div class="innerProductBox">.*?<img.*?alt="(.*?)".*?'
MODE_A_KEYED = {
    "overstock.com": {  # run-extraction.py:42-69
        "anchor": "Title",
        "fields": {
            "Title": (_OV_ITEM + "<b>(.*?)</b></a>", 1, 2, True),
            "Content": (_OV_ITEM + '<span class="normal">(.*?)<br>', 1, 2, True),
            "ListPrice": (_OV_ITEM + "<s>(.*?)</s>", 1, 2, True),
            "Price": (_OV_ITEM + '<span class="bigred"><b>(.*?)</b>', 1, 2, True),
            # the wholeSavings finditer fills two dicts from groups 2 and 3,
            # un-stripped (run-extraction.py:50-56)
            "Saving": (_OV_ITEM + '<span class="littleorange">(.*?) \\(([0-9]{0,2}%)\\)</span>', 1, 2, False),
            "SavingPercent": (_OV_ITEM + '<span class="littleorange">(.*?) \\(([0-9]{0,2}%)\\)</span>', 1, 3, False),
        },
    },
    "ceneje.si": {  # run-extraction.py:85-106
        "anchor": "Title",
        "fields": {
            "Image": (_CJ_ITEM + 'src="(.*?)"', 1, 2, True),
            "Title": (_CJ_ITEM + "<h3>\\W*<.*?>(.*?)</.*?>", 1, 2, True),
            "MinPrice": (_CJ_ITEM + "<b>(.*?)</b>", 1, 2, True),
            "Stores": (_CJ_ITEM + 'class="qtySellers">\\W*<b>(.*?)</b>', 1, 2, True),
            "Action": (_CJ_ITEM + '<div class="rBox">\\W*<.*?>(.*?)</.*?>', 1, 2, True),
        },
    },
}


def _scalar_site_rows(corpus: DataFrame, site: str) -> DataFrame:
    cfg = MODE_A_SCALAR[site]
    h = _clean(F.col("html"))
    entries = []
    for field, _ in FIELD_SPECS[site]:
        if field in cfg["fields"]:
            v = _pystrip(F.regexp_extract(h, cfg["fields"][field], 1))
            entries.append(F.struct(F.lit(field).alias("field"), F.lit(0).alias("idx"), v.alias("value")))
    df = corpus.filter(F.col("site") == site).select(
        "site", "page",
        F.array(*entries).alias("scalars"),
        *[
            F.transform(F.regexp_extract_all(h, F.lit(pat), F.lit(1)), _pystrip).alias(f"_rep_{name}")
            for name, pat in cfg["repeated"].items()
        ],
    )
    out = df.select(
        "site", "page", F.lit(0).alias("item"),
        F.explode("scalars").alias("e")
    ).select("site", "page", "item", "e.field", "e.idx", "e.value")
    for name in cfg["repeated"]:
        rep = df.select(
            "site", "page", F.lit(0).alias("item"), F.lit(name).alias("field"),
            F.when(F.size(f"_rep_{name}") == 0,
                   F.array(F.struct(F.lit(-1).alias("idx"), F.lit("").alias("value"))))
            .otherwise(F.transform(
                f"_rep_{name}",
                lambda x, i: F.struct(i.cast("int").alias("idx"), x.alias("value"))))
            .alias("es"),
        ).select("site", "page", "item", "field", F.explode("es").alias("e")) \
         .select("site", "page", "item", "field", "e.idx", "e.value")
        out = out.unionByName(rep)
    return out


def _keyed_site_rows(corpus: DataFrame, site: str) -> DataFrame:
    """J6: per-field (key, value) finditer dicts merged by key join."""
    cfg = MODE_A_KEYED[site]
    base = corpus.filter(F.col("site") == site).select(
        "site", "page", _clean(F.col("html")).alias("h")
    )
    anchors = None
    field_frames = []
    for field, _ in FIELD_SPECS[site]:
        pat, kg, vg, stripped = cfg["fields"][field]
        v = F.col("kv.v")
        if stripped:
            v = _pystrip(v)
        kv = (
            base.select(
                "site", "page",
                F.posexplode(
                    F.arrays_zip(
                        F.regexp_extract_all("h", F.lit(pat), F.lit(kg)).alias("k"),
                        F.regexp_extract_all("h", F.lit(pat), F.lit(vg)).alias("v"),
                    )
                ).alias("pos", "kv"),
            )
            .select("site", "page", "pos", F.col("kv.k").alias("key"), v.alias("value"))
        )
        # dict semantics: first-occurrence position, last value wins
        agg = kv.groupBy("site", "page", "key").agg(
            F.min("pos").alias("pos"), F.max_by("value", "pos").alias(field)
        )
        if field == cfg["anchor"]:
            anchors = agg
        else:
            field_frames.append((field, agg.drop("pos")))
    w = Window.partitionBy("site", "page").orderBy("pos")
    joined = anchors.withColumn("item", (F.row_number().over(w) - 1).cast("int"))
    for field, frame in field_frames:
        joined = joined.join(frame, ["site", "page", "key"], "left")
    melt = F.array(*[
        F.struct(F.lit(field).alias("field"), F.lit(0).alias("idx"),
                 F.coalesce(F.col(field), F.lit("")).alias("value"))
        for field, _ in FIELD_SPECS[site]
    ])
    return (
        joined.select("site", "page", "item", F.explode(melt).alias("e"))
        .select("site", "page", "item", "e.field", "e.idx", "e.value")
    )


def mode_a_rows(corpus: DataFrame) -> DataFrame:
    """Long-format mode-A extraction over a (site, page, html) corpus —
    pure Catalyst regexes + J6 key-joins, no Python in the data path."""
    parts = [
        _scalar_site_rows(corpus, "rtvslo.si"),
        _scalar_site_rows(corpus, "mimovrste.si"),
        _keyed_site_rows(corpus, "overstock.com"),
        _keyed_site_rows(corpus, "ceneje.si"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
