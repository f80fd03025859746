"""Link / image extraction from HTML — X3/X4 as pure Catalyst expressions.

The reference walks the rendered DOM with findEvery("<a>")/findEvery("<img>")
(WebCrawler.java:256-309) and mines onclick handlers by string-splitting on
location.href / document.location (:270-287). Over synthetic fixture HTML
(attribute-quoted, no exotic markup) the regex forms are exact; a real-web
deployment would swap in an lxml pandas UDF behind the same column contract
(SURVEY.md X4 note).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HREF_PATTERN = r'<a[^>]+href="([^"]*)"'
IMG_PATTERN = r'<img[^>]+src="([^"]*)"'
ONCLICK_PATTERN = r"(?:location\.href|document\.location)\s*=?\s*'([^']*)'"


def href_links(html: Column) -> Column:
    return F.regexp_extract_all(html, F.lit(HREF_PATTERN), F.lit(1))


def onclick_links(html: Column) -> Column:
    return F.regexp_extract_all(html, F.lit(ONCLICK_PATTERN), F.lit(1))


def all_candidate_links(html: Column) -> Column:
    """href links then onclick links — document order for admission seq."""
    return F.concat(href_links(html), onclick_links(html))


def img_srcs(html: Column) -> Column:
    return F.regexp_extract_all(html, F.lit(IMG_PATTERN), F.lit(1))
