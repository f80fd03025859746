"""Mode-A extraction: per-site regex field extractors as a config-driven
Catalyst expression registry (SURVEY.md §3.2, X8/X9/X12).

The reference hardcodes an if-chain of site names, each with a dict of
field→regex (run-extraction.py:29-108). Here a site config is data:
``{"field": (pattern, group)}`` for scalar fields and
``{"field": pattern}`` in ``repeated`` for array fields — the whole
extraction compiles to one ``select`` of regexp_extract/_all columns, so
Catalyst runs it codegen'd with column pruning intact.

Quirks preserved for golden parity:
* every extracted field is trimmed (run-extraction.py:18,119 → X6)
* newline/tab scrub before matching (run-extraction.py:30,119 → X7)
* the "$79.01 (53%)" savings split into two fields keeps the parens on
  the percent (run-extraction.py:160-163 → X12)
* missing fields default to '' (run-extraction.py:62-66)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class SiteConfig:
    name: str
    fields: dict[str, str] = field(default_factory=dict)      # field -> regex (group 1)
    repeated: dict[str, str] = field(default_factory=dict)    # field -> regex, array result
    split_fields: dict[str, tuple[str, int]] = field(default_factory=dict)
    # split_fields: out_field -> (source_field, index) applied after extraction


# Synthetic "site templates" mirroring the reference's four sites' shapes
# (titles/prices/authors as scalars, tag lists as repeated groups).
DEFAULT_SITES = [
    SiteConfig(
        name="news",  # rtvslo-shaped (run-extraction.py:34-40)
        fields={
            "Title": r"<h1>(.*?)</h1>",
            "SubTitle": r"<h2>(.*?)</h2>",
            "Lead": r'<p class="lead">(.*?)</p>',
            "Author": r'<span class="author">(.*?)</span>',
            "PublishedTime": r'<time>(.*?)</time>',
        },
        repeated={"Tags": r'<a class="tag">(.*?)</a>'},
    ),
    SiteConfig(
        name="shop",  # jewelry/overstock-shaped (run-extraction.py:44-68,160-172)
        fields={
            "Title": r'<b class="title">(.*?)</b>',
            "ListPrice": r"<s>(.*?)</s>",
            "Price": r'<span class="price">(.*?)</span>',
            "SavingRaw": r'<span class="saving">(.*?)</span>',
            "Content": r'<p class="desc">(.*?)</p>',
        },
        split_fields={"Saving": ("SavingRaw", 1), "SavingPercent": ("SavingRaw", 2)},
    ),
]


def _clean(html: Column) -> Column:
    """X7: scrub newlines/tabs so '.' regexes behave like the reference's."""
    return F.translate(html, "\n\t", "")


def extract_site(df: DataFrame, cfg: SiteConfig, html_col: str = "html") -> DataFrame:
    """Compile a SiteConfig to a single select over `df` (one Catalyst pass)."""
    h = _clean(F.col(html_col))
    cols = [c for c in df.columns if c != html_col]
    out = [F.col(c) for c in cols]
    for name, pat in cfg.fields.items():
        out.append(F.trim(F.regexp_extract(h, pat, 1)).alias(name))
    for name, pat in cfg.repeated.items():
        out.append(
            F.transform(
                F.regexp_extract_all(h, F.lit(pat), F.lit(1)), lambda x: F.trim(x)
            ).alias(name)
        )
    res = df.select(*out)
    for out_name, (src, idx) in cfg.split_fields.items():
        # X12: "$79.01 (53%)".split(" ") → ['$79.01', '(53%)']
        res = res.withColumn(
            out_name,
            F.coalesce(F.element_at(F.split(F.col(src), " "), idx), F.lit("")),
        )
    if cfg.split_fields:
        res = res.drop(*{src for src, _ in cfg.split_fields.values()})
    return res
