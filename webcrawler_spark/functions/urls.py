"""URL canonicalization and admission predicates — pure Catalyst expressions.

Reference semantics (SURVEY.md §1.3-1, citations into /root/reference):

* reject ``javascript:`` / ``tel:`` / ``mailto:`` / empty  (CrawlerUrl.java:19-24)
* split off the ``#fragment``                              (CrawlerUrl.java:27)
* delete every literal ``.html`` substring                 (CrawlerUrl.java:28)
* strip the query string                                   (CrawlerUrl.java:44-51)
* host = URI host, lowercased, minus a leading ``www.``    (Utils.java:8-19)
* URL identity = the canonical URL string                  (CrawlerUrl.java:66-77)
* containment: host endswith ``.<seed>`` or == ``<seed>``  (WebCrawler.java:382-385)
* binary extensions short-circuit to BINARY pages          (DatabaseHandler.java:257-278)

Every function here has a pure-Python twin (suffix ``_py``) used by the
reference-semantics simulator; tests assert Spark/Python parity on random
URLs (idempotence: canon(canon(u)) == canon(u)).

All of this is Catalyst-only (regexp_replace / substring_index / parse_url)
so it stays inside whole-stage codegen — no Python in the admission hot
path, which at 10^10 frontier scale is the difference between a scan-bound
and a serde-bound job.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

REJECTED_SCHEMES = ("javascript:", "tel:", "mailto:")

# DatabaseHandler.java:257-278 extension list, verbatim
BINARY_EXTENSIONS = (
    "pdf", "doc", "docx", "xlsx", "zip", "rar", "csv",
    "ods", "mp3", "jpg", "png", "gif", "jpeg", "tif",
)

DEFAULT_SEED_DOMAINS = ("gov.si",)


def is_rejected_scheme(url: Column) -> Column:
    """F1: drop javascript:/tel:/mailto:/empty (CrawlerUrl.java:19-24)."""
    lowered = F.lower(F.trim(url))
    cond = (url.isNull()) | (F.trim(url) == "")
    for s in REJECTED_SCHEMES:
        cond = cond | lowered.startswith(s)
    return cond


def canonicalize_url(url: Column) -> Column:
    """F2: fragment-split → '.html'-delete → query-strip (CrawlerUrl.java:27-51).

    The final trim is a no-op for well-formed URLs (the reference rejects
    whitespace-bearing URLs at URI construction, CrawlerUrl.java:44-51);
    it keeps the function idempotent on degenerate inputs.
    """
    c = F.trim(url)
    c = F.substring_index(c, "#", 1)           # keep before fragment
    c = F.regexp_replace(c, r"\.html", "")     # delete every literal .html
    c = F.substring_index(c, "?", 1)           # strip query
    return F.trim(c)


# One regex, shared verbatim (via the (?i) flag) with the Python twin
# below. NOT java.net.URI / parse_url: URI construction allocates heavily
# per row (it was the dominant cost AND the scaling ceiling of the
# admission kernel — GC-bound), and a regex keeps the Spark side and the
# simulator twin bit-identical. Invalid URLs → NULL host → dropped by F3,
# matching the reference's URISyntaxException catch (CrawlerUrl.java:33-38).
_HOST_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([A-Za-z0-9.-]+)"


def url_host(url: Column) -> Column:
    """Host of a URL, lowercased, leading 'www.' stripped (Utils.java:8-19)."""
    h = F.lower(F.regexp_extract(F.trim(url), _HOST_PATTERN, 1))
    h = F.when(h == "", F.lit(None).cast("string")).otherwise(h)
    return F.regexp_replace(h, r"^www\.", "")


def _url_rest(url: Column) -> Column:
    """Everything after scheme://[userinfo@]host (the whole string when the
    URL has no scheme — mirroring the Python twin's fallback)."""
    return F.regexp_replace(
        F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?[A-Za-z0-9.-]+", ""
    )


def in_containment(host: Column, seed_domains: tuple[str, ...] = DEFAULT_SEED_DOMAINS) -> Column:
    """F4: host endswith '.<seed>' or equals '<seed>' (WebCrawler.java:382-385)."""
    cond = F.lit(False)
    for d in seed_domains:
        cond = cond | (host == d) | host.endswith("." + d)
    return cond


def url_extension(url: Column) -> Column:
    """Last '.'-separated component of the path, lowercased; empty if no dot."""
    path = F.substring_index(F.substring_index(_url_rest(url), "?", 1), "#", 1)
    last_seg = F.element_at(F.split(path, "/"), -1)
    return F.when(
        last_seg.contains("."), F.lower(F.element_at(F.split(last_seg, r"\."), -1))
    ).otherwise(F.lit(""))


def is_binary_extension(url: Column) -> Column:
    """F7: extension ∈ the reference's binary list (DatabaseHandler.java:257-278)."""
    return url_extension(url).isin(*BINARY_EXTENSIONS)


def onclick_urls(onclick: Column) -> Column:
    """X3: mine URLs out of onclick handlers (WebCrawler.java:270-287)."""
    return F.regexp_extract(
        onclick,
        r"""(?:location\.href|document\.location)\s*=?\s*['"]([^'"]+)""",
        1,
    )


# ---------------------------------------------------------------------------
# Pure-Python twins (simulator oracle; MUST stay in lockstep with the above)
# ---------------------------------------------------------------------------

def is_rejected_scheme_py(url: str | None) -> bool:
    if url is None or url.strip() == "":
        return True
    lowered = url.strip().lower()
    return any(lowered.startswith(s) for s in REJECTED_SCHEMES)


def canonicalize_url_py(url: str) -> str:
    c = url.strip()
    c = c.split("#", 1)[0]
    c = c.replace(".html", "")
    c = c.split("?", 1)[0]
    return c.strip()


_HOST_RE = re.compile(r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([a-z0-9.-]+)", re.IGNORECASE)


def url_host_py(url: str) -> str | None:
    m = _HOST_RE.match(url.strip())
    if not m:
        return None
    h = m.group(1).lower()
    return h[4:] if h.startswith("www.") else h


def in_containment_py(host: str | None, seed_domains=DEFAULT_SEED_DOMAINS) -> bool:
    if host is None:
        return False
    return any(host == d or host.endswith("." + d) for d in seed_domains)


def url_extension_py(url: str) -> str:
    m = _HOST_RE.match(url.strip())
    rest = url.strip()[m.end():] if m else url.strip()
    path = rest.split("?", 1)[0].split("#", 1)[0]
    last = path.split("/")[-1]
    return last.rsplit(".", 1)[-1].lower() if "." in last else ""


def is_binary_extension_py(url: str) -> bool:
    return url_extension_py(url) in BINARY_EXTENSIONS
