"""Real-artifact robots parity against the reference's OWN crawl log.

``crawler/logs/logs1`` is the reference crawler's stdout from its real
March-2020 gov.si crawl: it contains the three robots.txt bodies the
crawler actually fetched (gov.si, e-uprava.gov.si, e-prostor.gov.si —
printed verbatim at WebCrawler.java:114) and 83 ``run: url = ...`` visit
lines (:204). Two things are checkable against those real bytes with no
network and no guessing:

* the S4 parser extracts exactly the rules visible in each body —
  including a capitalized ``User-Agent`` key, an ``Allow: /`` line, and
  a malformed final line where the Sitemap record is glued onto a
  Disallow value (e-prostor's real served bytes);
* our F9 access semantics never DENY a URL the reference demonstrably
  visited under those rules (83/83 logged visits pass), i.e. the
  longest-prefix interpretation is access-compatible with the robots
  library the reference shipped (robots-1.4.3.jar) on the real corpus.
"""

from __future__ import annotations

import os
from urllib.parse import urlsplit

import pytest

from webcrawler_spark.functions.robots import parse_robots_py

LOG = "/root/reference/crawler/logs/logs1"

pytestmark = pytest.mark.skipif(
    not os.path.exists(LOG), reason="reference crawl log not present")

_NOISE_PREFIXES = (
    "[", "run: url", "frontier size", "---", "link found",
    "Starting ChromeDriver", "Only local connections",
    "Please protect ports", "main:", "HASH =",
)


def _domain_of(url: str) -> str:
    # Utils.getDomainName: URI host minus a leading "www."
    host = urlsplit(url).hostname or ""
    return host[4:] if host.startswith("www.") else host


def _parse_log():
    """(visit urls in log order, domain -> verbatim robots body)."""
    with open(LOG, encoding="utf-8", errors="replace") as f:
        lines = f.read().splitlines()
    runs: list[str] = []
    robots: dict[str, str] = {}
    last_domain = None
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("run: url = "):
            url = ln[len("run: url = "):].strip()
            runs.append(url)
            last_domain = _domain_of(url)
        elif ln.startswith("robots = "):
            body = [ln[len("robots = "):]]
            i += 1
            while i < len(lines) and not lines[i].startswith(_NOISE_PREFIXES):
                body.append(lines[i])
                i += 1
            assert last_domain, "robots body before any run line"
            robots[last_domain] = "\n".join(body).rstrip("\n") + "\n"
            continue
        i += 1
    return runs, robots


def test_log_shape():
    runs, robots = _parse_log()
    assert len(runs) == 83  # the published crawl's visit count
    assert set(robots) == {"gov.si", "e-uprava.gov.si", "e-prostor.gov.si"}


def test_parse_real_govsi_body():
    _, robots = _parse_log()
    r = parse_robots_py(robots["gov.si"])
    assert r.disallow == ["/admin", "/resources", "/pomoc"]
    assert r.allow == []
    assert r.sitemaps == ["https://www.gov.si/sitemap.xml"]
    assert r.crawl_delay_s == 0 and not r.is_html_page


def test_parse_real_euprava_body():
    _, robots = _parse_log()
    r = parse_robots_py(robots["e-uprava.gov.si"])
    assert r.disallow == [
        "/e-uprava/oglasnadeska.html",
        "/*?view_mode*", "/*?bold_mode*", "/*?caps_mode*",
    ]
    assert r.sitemaps == []


def test_parse_real_eprostor_body():
    """Capitalized 'User-Agent' key, an Allow: / line, and the glommed
    'Disallow: /*&type=100Sitemap: ...' final line — parsed as served."""
    _, robots = _parse_log()
    r = parse_robots_py(robots["e-prostor.gov.si"])
    assert r.allow == ["/"]  # key case-insensitivity exercised for real
    assert "/typo3/" in r.disallow and "/t3lib/" in r.disallow
    # the glued line is ONE malformed Disallow value (the served bytes had
    # no newline before the Sitemap record), value split at the first ':'
    assert (
        "/*&type=100Sitemap: http://www.e-prostor.gov.si/?eID=dd_googlesitemap"
        in r.disallow
    )
    assert r.sitemaps == []  # the glued Sitemap never parses as a record


def test_all_logged_visits_pass_our_access_filter():
    """The reference visited these 83 URLs under the logged rules, so an
    access-compatible interpretation must allow every one of them."""
    runs, robots = _parse_log()
    rules = {d: parse_robots_py(b) for d, b in robots.items()}
    denied = []
    for url in runs:
        r = rules.get(_domain_of(url))
        if r is None:
            continue  # evem.gov.si: no robots fetched ⇒ allow-all (F9)
        s = urlsplit(url)
        path = s.path or "/"
        if s.query:
            path += "?" + s.query
        if not r.allows(path):
            denied.append(url)
    assert denied == []
