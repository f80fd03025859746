"""Mode-B extraction: config-driven XPath-lite field extraction
(SURVEY.md §3.2, X10/X11).

The reference hardcodes absolute positional XPaths per site and drives
``tr[i]``/``div[i]`` loops from Python with a fail_count=3 stop
(run-extraction.py:126-231). Here a site config is data — scalar fields
are ``field → path`` (string() of first match), repeated fields are
``field → path-without-index`` returning every match as an array — and
the whole extraction is ONE mapInPandas pass per site (the driver loop
becomes ``xpath_all``, no per-index round trips).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame

from webcrawler_spark.extract.html_text import xpath_all, xpath_string


@dataclass
class XPathSiteConfig:
    name: str
    fields: dict[str, str] = field(default_factory=dict)     # field -> abs path
    repeated: dict[str, str] = field(default_factory=dict)   # field -> path (all matches)


DEFAULT_XPATH_SITES = [
    XPathSiteConfig(
        name="news",
        fields={
            "Title": "/html/body/h1",
            "Author": "/html/body/div[1]/span",
            "PublishedTime": "/html/body/div[1]/time",
        },
        repeated={"Tags": "/html/body/div[2]/a"},
    ),
    XPathSiteConfig(
        name="shop_table",  # the tr[i]-loop shape (run-extraction.py:136-177)
        fields={"Title": "/html/body/h1"},
        repeated={"Rows": "/html/body/table/tr"},
    ),
]


def extract_site_xpath(df: DataFrame, cfg: XPathSiteConfig, html_col: str = "html",
                       id_col: str = "id") -> DataFrame:
    scalar_items = sorted(cfg.fields.items())
    repeated_items = sorted(cfg.repeated.items())

    def run(batches):
        for pdf in batches:
            out = {id_col: pdf[id_col]}
            for name, path in scalar_items:
                out[name] = pdf[html_col].map(lambda h: xpath_string(h or "", path))
            for name, path in repeated_items:
                out[name] = pdf[html_col].map(lambda h: xpath_all(h or "", path))
            yield pd.DataFrame(out)

    schema = f"{id_col} long"
    for name, _ in scalar_items:
        schema += f", {name} string"
    for name, _ in repeated_items:
        schema += f", {name} array<string>"
    return df.mapInPandas(run, schema=schema)
