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


# ---------------------------------------------------------------------------
# Allocation discipline (the 100-TB lesson of the round kernel): this file
# is the admission hot path — every row of a 10^10-URL frontier flows
# through these expressions, and the *allocation volume per row*, not the
# op count, sets the multicore scaling ceiling (the memory bus is shared;
# profile: regex-based host extraction + unconditional regexp_replace made
# the kernel 12-16× slower AND capped 4→16-core scaling at 0.67). Rules:
#   * substring_index / substring / trim — zero-copy UTF8String views
#   * regexp_replace only behind a contains() guard (most URLs have no
#     '.html' to delete), rlike for match-only tests (no result string)
#   * no CASE WHEN wrapping of expensive subtrees that predicates will
#     duplicate (codegen CSE cannot hoist out of conditional branches)
# ---------------------------------------------------------------------------

_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"


def is_rejected_scheme(url: Column) -> Column:
    """F1: drop javascript:/tel:/mailto:/empty (CrawlerUrl.java:19-24).
    One case-insensitive anchored rlike — match-only, allocation-free."""
    return (
        url.isNull()
        | (F.trim(url) == "")
        | F.trim(url).rlike("^(?i)(javascript|tel|mailto):")
    )


def canonicalize_url(url: Column) -> Column:
    """F2: fragment-split → '.html'-delete → query-strip (CrawlerUrl.java:27-51).

    The final trim is a no-op for well-formed URLs (the reference rejects
    whitespace-bearing URLs at URI construction, CrawlerUrl.java:44-51);
    it keeps the function idempotent on degenerate inputs. The '.html'
    delete runs behind a contains() guard — identical result, but the
    common no-'.html' row allocates nothing.
    """
    c = F.substring_index(F.trim(url), "#", 1)       # keep before fragment
    c = F.when(c.contains(".html"), F.regexp_replace(c, r"\.html", "")).otherwise(c)
    c = F.substring_index(c, "?", 1)                 # strip query
    return F.trim(c)


def url_host(url: Column) -> Column:
    """Host of a URL, lowercased, leading 'www.' stripped (Utils.java:8-19).

    NULL when the URL has no valid ``scheme://`` prefix — the reference's
    URISyntaxException catch (CrawlerUrl.java:33-38). The scheme check is
    a match-only rlike; the host itself comes from substring views
    (after first '://' → before '/' → after '@' → before ':' port), which
    the Python twin mirrors operation-for-operation.
    """
    t = F.trim(url)
    # after the FIRST '://' (substring_index(-1) would take the last)
    rest = F.substring(t, F.instr(t, "://") + 3, F.lit(2_000_000_000))
    hostport = F.substring_index(F.substring_index(rest, "/", 1), "@", -1)
    h = F.lower(F.substring_index(hostport, ":", 1))
    h = F.when(h.startswith("www."), F.substring(h, 5, 2_000_000_000)).otherwise(h)
    # host-charset validity (match-only rlike): java.net.URI yields a null
    # host for reg-names outside [A-Za-z0-9.-] (e.g. foo_bar.gov.si), which
    # the reference's URISyntaxException catch drops — without this check
    # the substring-view extraction admitted such hosts
    return F.when(t.rlike(_SCHEME_RE) & (h != "") & h.rlike("^[a-z0-9.-]+$"), h)


def in_containment(host: Column, seed_domains: tuple[str, ...] = DEFAULT_SEED_DOMAINS) -> Column:
    """F4: host endswith '.<seed>' or equals '<seed>' (WebCrawler.java:382-385)."""
    cond = F.lit(False)
    for d in seed_domains:
        cond = cond | (host == d) | host.endswith("." + d)
    return cond


def url_extension(url: Column) -> Column:
    """Last '.'-separated component of the path, lowercased; empty if no
    dot in the last path segment and for host-only URLs (no '/' after the
    scheme — the host's own dots never produce an extension)."""
    t = F.trim(url)
    scheme_pos = F.instr(t, "://")
    # after the first '://'; scheme-less URLs keep the whole string (the
    # relative-href form the admission predicate also sees)
    rest = F.when(scheme_pos > 0, F.substring(t, scheme_pos + 3, F.lit(2_000_000_000))).otherwise(t)
    path = F.substring_index(F.substring_index(rest, "?", 1), "#", 1)
    last_seg = F.substring_index(path, "/", -1)
    has_ext = (path.contains("/") | (scheme_pos == 0)) & last_seg.contains(".")
    return F.when(has_ext, F.lower(F.substring_index(last_seg, ".", -1))).otherwise(F.lit(""))


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


_SCHEME_RE_PY = re.compile(_SCHEME_RE)


_HOST_CHARSET_RE_PY = re.compile(r"[a-z0-9.-]+\Z")


def url_host_py(url: str) -> str | None:
    t = url.strip()
    if not _SCHEME_RE_PY.match(t):
        return None
    rest = t[t.index("://") + 3:]
    hostport = rest.split("/", 1)[0].rsplit("@", 1)[-1]
    h = hostport.split(":", 1)[0].lower()
    if h.startswith("www."):
        h = h[4:]
    if not h or not _HOST_CHARSET_RE_PY.fullmatch(h):
        return None
    return h


def in_containment_py(host: str | None, seed_domains=DEFAULT_SEED_DOMAINS) -> bool:
    if host is None:
        return False
    return any(host == d or host.endswith("." + d) for d in seed_domains)


def url_extension_py(url: str) -> str:
    t = url.strip()
    i = t.find("://")
    rest = t[i + 3:] if i >= 0 else t
    path = rest.split("?", 1)[0].split("#", 1)[0]
    last = path.split("/")[-1]
    if ("/" in path or i < 0) and "." in last:
        return last.rsplit(".", 1)[-1].lower()
    return ""


def is_binary_extension_py(url: str) -> bool:
    return url_extension_py(url) in BINARY_EXTENSIONS
